"""Distributed PCA for embedding columns — the dimensionality-reduction
step (whitening, compression, ANN pre-processing) of an embedding
pipeline.

Shape: the covariance matrix of a d-dim embedding corpus is d×d no
matter how many rows exist, so the right 100 TB plan is

1. per-partition PARTIALS via one Arrow-batched pass: each partition
   emits (n, Σx, Σ x xᵀ) — three numpy reductions, one output row per
   partition;
2. a driver-side merge of ≤ partitions rows (bounded the same way the
   IVF-PQ codebook collect is) and one d×d ``numpy.linalg.eigh`` —
   microseconds for d ≤ a few thousand;
3. a broadcast of the (d×m) component matrix back into a vectorized
   projection, so the corpus streams through one mapInPandas GEMM and
   never shuffles.

``eigh`` on the symmetric covariance is deterministic for a fixed
input, and the partials merge is exact up to float summation order —
signs of eigenvectors are canonicalized (first nonzero coordinate
positive) so downstream outputs are stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def covariance_stats(df: DataFrame, vec_col: str) -> tuple[int, "object", "object"]:
    """(n, mean[d], cov[d,d]) of the embedding column, via per-partition
    partials and a bounded driver merge (≤ one row per partition)."""
    import numpy as np
    import pandas as pd

    def partials(batches):
        n = 0
        s = None
        ss = None
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf[vec_col].to_numpy())
            n += m.shape[0]
            s = m.sum(axis=0) if s is None else s + m.sum(axis=0)
            g = m.T @ m
            ss = g if ss is None else ss + g
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [s.tolist()], "ss": [ss.reshape(-1).tolist()]}
            )

    rows = (
        df.select(vec_col)
        .mapInPandas(partials, schema="n long, s array<double>, ss array<double>")
        .collect()
    )
    if not rows:
        raise ValueError(
            f"covariance_stats: no rows with a non-empty {vec_col!r} column"
        )
    n = sum(r["n"] for r in rows)
    s = np.sum([np.asarray(r["s"]) for r in rows], axis=0)
    d = s.shape[0]
    ss = np.sum([np.asarray(r["ss"]).reshape(d, d) for r in rows], axis=0)
    mean = s / n
    cov = ss / n - np.outer(mean, mean)
    return n, mean, cov


def pca_components(cov, m: int):
    """Top-m eigenvectors (d×m, sign-canonicalized) and ALL eigenvalues
    (descending) of a symmetric covariance matrix."""
    import numpy as np

    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1]
    vals = vals[order]
    vecs = vecs[:, order][:, :m]
    for j in range(vecs.shape[1]):
        col = vecs[:, j]
        nz = np.flatnonzero(np.abs(col) > 1e-12)
        if len(nz) and col[nz[0]] < 0:
            vecs[:, j] = -col
    return vecs, vals


def pca_project(
    df: DataFrame,
    vec_col: str,
    *,
    id_col: str,
    m: int,
    mean=None,
    components=None,
) -> DataFrame:
    """(id, proj array<double>[m]) — mean-centered projection onto the
    top-m principal components. One partials pass + one projection pass
    over the corpus; zero shuffles; the (d×m) component matrix rides
    the closure broadcast. Pass precomputed ``mean``/``components``
    (from covariance_stats + pca_components) to skip the partials pass
    — a caller that already decomposed should not pay a second full
    corpus scan."""
    import numpy as np
    import pandas as pd

    if (mean is None) != (components is None):
        raise ValueError("pass both mean and components, or neither")
    if mean is None:
        _, mean, cov = covariance_stats(df, vec_col)
        components, _ = pca_components(cov, m)
    comps = components[:, :m]

    def project(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()) - mean
            yield pd.DataFrame(
                {"id": pdf[id_col].to_numpy(), "proj": list((x @ comps).tolist())}
            )

    id_t = dict(df.dtypes)[id_col]
    return df.select(id_col, vec_col).mapInPandas(
        project, schema=f"id {id_t}, proj array<double>"
    )


def whiten_project(
    df: DataFrame,
    vec_col: str,
    *,
    id_col: str,
    m: int,
    eps: float = 1e-12,
) -> DataFrame:
    """(id, white array<double>[m]) — PCA-whitening: mean-center,
    project onto the top-m components, and scale each coordinate by
    1/sqrt(eigenvalue), so the output has identity covariance — the
    standard preprocessing before cosine/Euclidean retrieval when
    dimensions carry wildly different variances (and the contract the
    emb_whiten_gate checks).

    Same execution shape as pca_project: one bounded d×d partials pass
    for the decomposition, then a zero-shuffle Arrow projection with
    the scaled (d×m) matrix riding the closure. Eigenvalues below
    ``eps`` are clamped (degenerate directions stay finite, scaled to
    ~zero variance rather than exploding)."""
    import numpy as np
    import pandas as pd

    _, mean, cov = covariance_stats(df, vec_col)
    comps, vals = pca_components(cov, m)
    scale = 1.0 / np.sqrt(np.maximum(vals[:m], eps))
    W = comps[:, :m] * scale[None, :]

    def project(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.stack(pdf[vec_col].to_numpy()) - mean
            yield pd.DataFrame(
                {"id": pdf[id_col].to_numpy(), "white": list((x @ W).tolist())}
            )

    id_t = dict(df.dtypes)[id_col]
    return df.select(id_col, vec_col).mapInPandas(
        project, schema=f"id {id_t}, white array<double>"
    )
