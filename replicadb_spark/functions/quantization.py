"""Scalar int8 quantization for embedding columns.

The 100 TB embedding-storage path: a 64-dim float32 vector is 256 bytes;
the int8 codes are 64 bytes (4x smaller), and ANN scoring over codes
(cf. similarity.ann_ivf_pq's ADC) loses little recall at 8 bits. This
module implements the symmetric per-DIMENSION affine scheme every
vector store ships: code = round((x - lo_d) / step_d) - 127 with
step_d = (hi_d - lo_d) / 254, so the reconstruction error is bounded by
step_d / 2 per dimension — a checkable contract, gated in the catalog
(emb_int8_quant_gate).

Scale shape:
- the (lo, hi) parameter table is ONE map-side-combined aggregate over
  per-partition Arrow partials (each task emits one d-row summary, the
  covariance-partials precedent from functions/decomposition.py) — the
  corpus never shuffles;
- the parameter table is d rows (bounded, like the PQ codebook), so it
  collects to the driver and broadcasts into the encode/decode kernels;
- encode and decode are zero-shuffle Arrow mapInPandas passes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def quant_params(df: DataFrame, vec_col: str) -> "list[tuple[float, float]]":
    """Per-dimension (lo, hi) over the corpus: one Arrow pass emitting a
    d-row partial per partition, merged by a d-key hash aggregate whose
    input is #partitions × d rows — bounded summary, not data."""
    partials = df.select(F.col(vec_col).alias("__v")).mapInPandas(
        _minmax_partial, schema="dim int, lo double, hi double"
    )
    rows = (
        partials.groupBy("dim")
        .agg(F.min("lo").alias("lo"), F.max("hi").alias("hi"))
        .orderBy("dim")
        .collect()  # d rows — bounded by the embedding width
    )
    return [(r["lo"], r["hi"]) for r in rows]


def _minmax_partial(batches):
    import numpy as np
    import pandas as pd

    lo = None
    hi = None
    for pdf in batches:
        if len(pdf) == 0:
            continue
        M = np.array(pdf["__v"].tolist(), dtype=np.float64)
        blo, bhi = M.min(axis=0), M.max(axis=0)
        lo = blo if lo is None else np.minimum(lo, blo)
        hi = bhi if hi is None else np.maximum(hi, bhi)
    if lo is not None:
        yield pd.DataFrame(
            {"dim": range(len(lo)), "lo": lo, "hi": hi}
        )


def quantize_int8(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    params: "list[tuple[float, float]]",
    *,
    keep: "list[str] | None" = None,
) -> DataFrame:
    """Encode vectors to int8 codes with the given per-dim (lo, hi).
    Constant dimensions (hi == lo) map to code 0. Zero shuffle — the
    params ride into the kernel as plan constants. ``keep`` columns of
    ``df`` ride through the kernel untouched (the bottomk_sample
    precedent) — a caller comparing codes back to a source column then
    needs no id join."""
    import numpy as np

    keep = list(keep or [])
    lo = np.array([p[0] for p in params])
    step = np.array([max(p[1] - p[0], 0.0) / 254.0 for p in params])
    safe = np.where(step == 0.0, 1.0, step)

    def encode(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            M = np.array(pdf["__v"].tolist(), dtype=np.float64)
            # params may be fitted on a different corpus: out-of-range
            # values SATURATE at the range ends instead of wrapping.
            # The clip runs in FLOAT space BEFORE the integer cast —
            # a huge overshoot on a near-constant dimension would
            # otherwise overflow int64 in the cast and land on the
            # wrong end despite a later clip.
            Cf = np.clip(np.rint((M - lo) / safe), 0.0, 254.0)
            C = (Cf - 127.0).astype(np.int64)
            C = np.where(step == 0.0, 0, C).astype(np.int8)
            out = {"id": pdf["__id"], "codes": list(C)}
            for c in keep:
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    dt = dict(df.dtypes)
    schema = f"id {dt[id_col]}, codes array<tinyint>" + "".join(
        f", {c} {dt[c]}" for c in keep
    )
    return df.select(
        F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"), *keep
    ).mapInPandas(encode, schema=schema)


def dequantize_int8(
    codes: DataFrame,
    params: "list[tuple[float, float]]",
    *,
    id_col: str = "id",
    codes_col: str = "codes",
    keep: "list[str] | None" = None,
) -> DataFrame:
    """Reconstruct doubles from int8 codes: x̂ = (code + 127)·step + lo.
    Zero shuffle, same kernel shape as encode (including ``keep``
    pass-through)."""
    import numpy as np

    keep = list(keep or [])
    lo = np.array([p[0] for p in params])
    step = np.array([max(p[1] - p[0], 0.0) / 254.0 for p in params])

    def decode(batches):
        import pandas as pd

        for pdf in batches:
            if len(pdf) == 0:
                continue
            C = np.array(pdf[codes_col].tolist(), dtype=np.float64)
            R = (C + 127.0) * step + lo
            out = {"id": pdf[id_col], "recon": list(R)}
            for c in keep:
                out[c] = pdf[c]
            yield pd.DataFrame(out)

    dt = dict(codes.dtypes)
    schema = f"id {dt[id_col]}, recon array<double>" + "".join(
        f", {c} {dt[c]}" for c in keep
    )
    return codes.mapInPandas(decode, schema=schema)
