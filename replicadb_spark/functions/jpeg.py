"""JPEG codec — pure stdlib ``struct`` + numpy, no libjpeg.

Decoder: baseline sequential (SOF0/SOF1, interleaved or multi-scan),
full progressive (SOF2: spectral selection + successive
approximation, DC/AC first and refinement scans, EOB runs), AND
lossless (SOF3: Annex H predictors 1-7, point transform, 2-16 bit
samples) with Huffman entropy coding — together the format of
essentially every JPEG in a web-scale training corpus. Handles
grayscale and YCbCr 3-component images, arbitrary integer sampling
factors (4:4:4, 4:2:2, 4:2:0, ...), restart markers in every scan
type, 16-bit quantization tables, multi-table DQT/DHT segments and
between-scan table redefinition. Hierarchical and arithmetic-coded
variants raise :class:`UnsupportedMediaError` loudly — no silent
garbage.

Architecture: every scan decodes into per-component COEFFICIENT
buffers (zigzag order); dequantization + IDCT + upsampling + color
conversion run once at the end. Sequential scans are the degenerate
single-pass case of the same machinery.

Encoder: a minimal baseline encoder plus a progressive encoder
(spec-shaped scan script: shifted DC first scan, per-component
spectral-selection AC first scans with EOB-run coding, AC refinement
scans with correction-bit buffering, DC refinement) — the stdlib-only
round-trip partners for the decoder in tests and fixtures. With the
same quantization both encoders produce the SAME coefficients, so
tests can assert progressive decode == baseline decode bit-for-bit.

Everything here implements the public ITU-T T.81 (JPEG) spec (Annex F
sequential, Annex G progressive; Huffman tables are Annex K's
"typical" tables). The reference engine (osalvador/ReplicaDB) never
decodes payloads — it replicates LOB bytes losslessly
(OrcFileManager.java:298-324); this module is part of the
beyond-reference multimodal surface.

Scale note: decode runs inside Arrow-batched ``mapInPandas`` workers
(see functions/multimodal.py) — payload bytes never leave the executor
that scanned them; only small feature rows shuffle. The per-block
Python loop is bounded by image size, not dataset size.
"""

from __future__ import annotations

import struct

import numpy as np

from replicadb_spark.functions.codecs import UnsupportedMediaError

# --- constants -------------------------------------------------------------


def _zigzag() -> np.ndarray:
    """Zigzag index k -> natural (row-major) index, per T.81 Figure 5."""
    out = []
    for s in range(15):
        coords = [(i, s - i) for i in range(max(0, s - 7), min(7, s) + 1)]
        if s % 2 == 0:
            coords.reverse()
        out.extend(r * 8 + c for r, c in coords)
    return np.array(out, dtype=np.int64)


ZIGZAG = _zigzag()


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis: spatial = C.T @ coef @ C."""
    n = np.arange(8)
    k = np.arange(8)[:, None]
    c = np.cos((2 * n + 1) * k * np.pi / 16.0) * 0.5
    c[0] *= 1.0 / np.sqrt(2.0)
    return c


_DCT = _dct_matrix()

# ITU T.81 Annex K.3 "typical" Huffman tables: (bits[16], values).
DC_LUM = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHR = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)


# Progressive AC scans additionally need the EOBn symbols (0x10..0xE0,
# run-length-of-end-of-band), which the Kraft-FULL Annex K tables have
# no room for (their code space is exactly exhausted). Real progressive
# encoders ship custom per-scan tables in DHT; this one flat canonical
# table (every symbol at 9 bits: EOB0..EOB14, ZRL, all (run, size)
# pairs with size 1..10) is such a table — correct, if not compact.
PROG_AC = (
    [0, 0, 0, 0, 0, 0, 0, 0, 176, 0, 0, 0, 0, 0, 0, 0],
    [r << 4 for r in range(15)]            # EOB0..EOB14
    + [0xF0]                               # ZRL
    + [(r << 4) | s for r in range(16) for s in range(1, 11)],
)


def _huff_decode_table(bits: list[int], vals: list[int]) -> dict:
    """Canonical Huffman (T.81 Annex C): {(length, code): symbol}."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_encode_table(bits: list[int], vals: list[int]) -> dict:
    """Canonical Huffman: {symbol: (code, length)}."""
    return {
        sym: (code, length)
        for (length, code), sym in _huff_decode_table(bits, vals).items()
    }


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map s received bits to a signed value."""
    if s and v < (1 << (s - 1)):
        return v - (1 << s) + 1
    return v


# --- bit I/O ---------------------------------------------------------------


class _BitReader:
    """MSB-first reader over an already-unstuffed entropy segment."""

    __slots__ = ("data", "pos", "bit")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("JPEG entropy segment exhausted")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode(self, table: dict) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | self.read_bit()
            length += 1
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


class _BitWriter:
    """MSB-first writer with 0xFF byte stuffing (T.81 F.1.2.3)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.nbits = 0

    def pad_to_byte(self) -> None:
        while self.nbits:
            self.write(1, 1)


# --- decoder ---------------------------------------------------------------

_SOF_UNSUPPORTED = {
    0xC5: "differential sequential JPEG (SOF5)",
    0xC6: "differential progressive JPEG (SOF6)",
    0xC7: "differential lossless JPEG (SOF7)",
    0xC9: "arithmetic-coded JPEG (SOF9)",
    0xCA: "arithmetic progressive JPEG (SOF10)",
    0xCB: "arithmetic lossless JPEG (SOF11)",
    0xCD: "differential arithmetic JPEG (SOF13)",
    0xCE: "differential arithmetic progressive JPEG (SOF14)",
    0xCF: "differential arithmetic lossless JPEG (SOF15)",
}


def _split_entropy(payload: bytes, start: int) -> tuple[list[bytes], int]:
    """Entropy data from ``start``: unstuff 0xFF00, split at RSTn.
    Returns (segments, position of the terminating marker's 0xFF)."""
    n = len(payload)
    segments: list[bytes] = []
    cur = bytearray()
    i = start
    while i < n:
        b = payload[i]
        if b == 0xFF:
            m = payload[i + 1] if i + 1 < n else 0xD9
            if m == 0x00:
                cur.append(0xFF)
                i += 2
                continue
            if 0xD0 <= m <= 0xD7:  # RSTn
                segments.append(bytes(cur))
                cur = bytearray()
                i += 2
                continue
            break  # any other marker ends the scan
        cur.append(b)
        i += 1
    segments.append(bytes(cur))
    return segments, i


def _refine_nonzero(reader: _BitReader, block, k: int, p1: int, m1: int):
    """Append a correction bit to an already-nonzero coefficient
    (T.81 G.1.2.3 / the decoder side of correction-bit buffering)."""
    if reader.read_bit():
        v = int(block[k])
        if (v & p1) == 0:
            block[k] = v + (p1 if v >= 0 else m1)


def _decode_ac_first(reader, block, ac_tbl, ss, se, al, eobrun: int) -> int:
    """AC first scan for one block (G.1.2.2, EOB-run coding)."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = reader.decode(ac_tbl)
        r, s = sym >> 4, sym & 0x0F
        if s:
            k += r
            if k > se:
                raise ValueError("JPEG AC run past band")
            block[k] = _extend(reader.receive(s), s) << al
            k += 1
        else:
            if r < 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.receive(r)
                return eobrun
            k += 16  # ZRL
    return 0


def _decode_ac_refine(reader, block, ac_tbl, ss, se, al, eobrun: int) -> int:
    """AC refinement scan for one block (G.1.2.3): new ±1·2^Al
    coefficients interleaved with correction bits for known-nonzero
    positions passed while skipping."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            sym = reader.decode(ac_tbl)
            r, s = sym >> 4, sym & 0x0F
            new_val = 0
            if s == 0:
                if r < 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.receive(r)
                    break  # rest of band handled by the correction tail
                # r == 15: ZRL — skip 16 zero-HISTORY positions
            else:
                if s != 1:
                    raise ValueError("JPEG AC refinement magnitude != 1")
                new_val = p1 if reader.read_bit() else m1
            while k <= se:
                if int(block[k]) != 0:
                    _refine_nonzero(reader, block, k, p1, m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if new_val and k <= se:
                block[k] = new_val
            k += 1
    if eobrun > 0:
        while k <= se:
            if int(block[k]) != 0:
                _refine_nonzero(reader, block, k, p1, m1)
            k += 1
        eobrun -= 1
    return eobrun


def _predict_lossless(a: int, b: int, c: int, sel: int) -> int:
    """T.81 table H.1 predictors over (a=left, b=above, c=above-left)."""
    if sel == 1:
        return a
    if sel == 2:
        return b
    if sel == 3:
        return c
    if sel == 4:
        return a + b - c
    if sel == 5:
        return a + ((b - c) >> 1)
    if sel == 6:
        return b + ((a - c) >> 1)
    return (a + b) >> 1  # sel == 7


def _decode_lossless(frame, scans) -> np.ndarray:
    """Lossless (SOF3) process: Huffman-coded prediction differences,
    no DCT/quantization, sample precision 2-16. Components carry no
    defined color space (T.81 leaves it out; libjpeg applies none), so
    3-component frames are returned as RGB directly. Prediction rules
    per H.1.2: default 2^(P-Pt-1) at scan start and after every
    restart; predictor 1 along the first line; predictor 2 for the
    first sample of other lines; the scan's selector elsewhere; all
    diff arithmetic modulo 2^16."""
    comps = frame["comps"]
    if len(comps) not in (1, 3):
        raise UnsupportedMediaError(f"{len(comps)}-component lossless JPEG")
    if any(c["h"] != 1 or c["v"] != 1 for c in comps):
        raise UnsupportedMediaError("subsampled lossless JPEG")
    fh, fw, prec = frame["h"], frame["w"], frame["prec"]
    planes = [np.zeros((fh, fw), np.int64) for _ in comps]
    by_id = {c["id"]: j for j, c in enumerate(comps)}
    out_shift = 0
    for scan in scans:
        sel, pt = scan["ss"], scan["al"]
        out_shift = pt
        if not 1 <= sel <= 7:
            raise ValueError(f"lossless JPEG predictor {sel}")
        order = []
        for s in scan["comps"]:
            tbl = scan["htables"].get((0, s["td"]))
            if tbl is None:
                raise ValueError(f"JPEG missing DC Huffman table {s['td']}")
            order.append((by_id[s["id"]], tbl))
        default = 1 << (prec - pt - 1)
        total = fh * fw
        ri = scan["ri"] or total
        unit = 0
        for seg_bytes in scan["segments"]:
            if unit >= total:
                break
            reader = _BitReader(seg_bytes)
            fresh = True  # first sample after scan start / restart
            for _ in range(min(ri, total - unit)):
                y, x = divmod(unit, fw)
                for j, tbl in order:
                    p = planes[j]
                    if fresh:
                        pred = default
                    elif y == 0:
                        pred = int(p[0, x - 1])
                    elif x == 0:
                        pred = int(p[y - 1, 0])
                    else:
                        pred = _predict_lossless(
                            int(p[y, x - 1]), int(p[y - 1, x]),
                            int(p[y - 1, x - 1]), sel,
                        )
                    s_ = reader.decode(tbl)
                    diff = 32768 if s_ == 16 else _extend(reader.receive(s_), s_)
                    p[y, x] = (pred + diff) & 0xFFFF
                fresh = False
                unit += 1
    maxv = (1 << prec) - 1
    full = []
    for p in planes:
        v = (p << out_shift).astype(np.float64)
        if prec == 8 and out_shift == 0:
            full.append(p.astype(np.uint8))
        else:
            full.append(
                np.clip(np.rint(v * 255.0 / maxv), 0, 255).astype(np.uint8)
            )
    if len(full) == 1:
        return np.ascontiguousarray(np.repeat(full[0][:, :, None], 3, axis=2))
    return np.ascontiguousarray(np.stack(full, axis=2))


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline (SOF0/SOF1), progressive (SOF2), or lossless
    (SOF3) JPEG to (h, w, 3) uint8 RGB (lossless planes above 8-bit
    precision are rescaled to the uint8 range).

    Grayscale decodes to a replicated-channel RGB array, matching the
    other decoders in functions/codecs.py. Arithmetic-coded and
    differential frames raise :class:`UnsupportedMediaError` naming
    the variant.
    """
    if payload[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG payload")
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    progressive = False
    lossless = False
    restart_interval = 0
    scans: list[dict] = []
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack_from(">H", payload, pos + 2)[0]
        seg = payload[pos + 4 : pos + 2 + seg_len]
        if marker == 0xDB:  # DQT — possibly several tables per segment
            i = 0
            while i < len(seg):
                prec, tq = seg[i] >> 4, seg[i] & 0x0F
                i += 1
                if prec:
                    vals = np.frombuffer(seg, ">u2", count=64, offset=i)
                    i += 128
                else:
                    vals = np.frombuffer(seg, np.uint8, count=64, offset=i)
                    i += 64
                qtables[tq] = vals.astype(np.int32)  # zigzag order
        elif marker == 0xC4:  # DHT — possibly several tables per segment
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0x0F
                bits = list(seg[i + 1 : i + 17])
                nv = sum(bits)
                vals = list(seg[i + 17 : i + 17 + nv])
                htables[(tc, th)] = _huff_decode_table(bits, vals)
                i += 17 + nv
        elif marker in (0xC0, 0xC1, 0xC2, 0xC3):  # DCT frames + lossless
            progressive = marker == 0xC2
            lossless = marker == 0xC3
            prec, fh, fw, ncomp = struct.unpack_from(">BHHB", seg, 0)
            if lossless:
                if not 2 <= prec <= 16:
                    raise ValueError(f"lossless JPEG precision {prec}")
            elif prec != 8:
                raise UnsupportedMediaError(f"{prec}-bit JPEG")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = struct.unpack_from("BBB", seg, 6 + 3 * c)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps, "prec": prec}
        elif marker in _SOF_UNSUPPORTED:
            raise UnsupportedMediaError(_SOF_UNSUPPORTED[marker])
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            sc = [
                {"id": seg[1 + 2 * j], "td": seg[2 + 2 * j] >> 4,
                 "ta": seg[2 + 2 * j] & 0x0F}
                for j in range(ns)
            ]
            ss_, se_, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
            segments, next_pos = _split_entropy(payload, pos + 2 + seg_len)
            scans.append({
                "comps": sc, "ss": ss_, "se": se_,
                "ah": ahal >> 4, "al": ahal & 0x0F,
                "segments": segments,
                "htables": dict(htables),  # tables active AT this scan
                "ri": restart_interval,
            })
            pos = next_pos
            continue
        pos += 2 + seg_len
    if frame is None or not scans:
        raise ValueError("JPEG missing SOF/SOS")
    if lossless:
        return _decode_lossless(frame, scans)
    comps = frame["comps"]
    if len(comps) not in (1, 3):
        raise UnsupportedMediaError(
            f"{len(comps)}-component JPEG (CMYK?)"
        )
    fh, fw = frame["h"], frame["w"]
    if len(comps) == 1:
        comps[0]["h"] = comps[0]["v"] = 1
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    for c in comps:
        if hmax % c["h"] or vmax % c["v"]:
            raise UnsupportedMediaError(
                f"non-integer sampling ratio {c['h']}x{c['v']} vs {hmax}x{vmax}"
            )
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    by_id = {c["id"]: j for j, c in enumerate(comps)}
    # coefficient buffers (zigzag order) over the padded interleaved grid
    coefs = [
        np.zeros((mcuy * c["v"], mcux * c["h"], 64), np.int32) for c in comps
    ]
    # non-interleaved block grids cover ceil(component size / 8)
    nblocks = [
        (
            -(-(-(-fh * c["v"] // vmax)) // 8),
            -(-(-(-fw * c["h"] // hmax)) // 8),
        )
        for c in comps
    ]

    for scan in scans:
        _decode_scan(
            scan, comps, by_id, coefs, nblocks, mcux, mcuy,
            progressive, qtables,
        )

    planes = []
    for j, c in enumerate(comps):
        if c["tq"] not in qtables:
            raise ValueError(f"JPEG missing quant table {c['tq']}")
        qt = qtables[c["tq"]]
        bh, bw = coefs[j].shape[:2]
        plane = np.zeros((bh * 8, bw * 8), np.float64)
        for by in range(bh):
            for bx in range(bw):
                zz = coefs[j][by, bx]
                if not zz.any():
                    continue
                coef = np.zeros(64, np.float64)
                coef[ZIGZAG] = zz * qt
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _DCT.T @ coef.reshape(8, 8) @ _DCT
                )
        planes.append(plane)

    full = []
    for j, c in enumerate(comps):
        p = planes[j] + 128.0
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:fh, :fw])
    if len(full) == 1:
        g = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
        return np.ascontiguousarray(np.repeat(g[:, :, None], 3, axis=2))
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(np.rint(rgb), 0, 255).astype(np.uint8)


def _decode_scan(
    scan, comps, by_id, coefs, nblocks, mcux, mcuy, progressive, qtables
) -> None:
    """Decode one scan's entropy segments into the coefficient buffers."""
    ss, se, ah, al = scan["ss"], scan["se"], scan["ah"], scan["al"]
    htables = scan["htables"]
    sc = scan["comps"]
    if not progressive:
        ss, se, ah, al = 0, 63, 0, 0
    dc_scan = ss == 0
    ac_scan = not (ss == 0 and se == 0)
    if progressive and ss > 0 and len(sc) != 1:
        raise ValueError("progressive AC scan must be single-component")
    if progressive and dc_scan and se != 0:
        raise ValueError("progressive DC scan must have Se=0")

    order = []  # (comp_idx, dc_table, ac_table)
    for s in sc:
        j = by_id[s["id"]]
        dc_tbl = ac_tbl = None
        if dc_scan and ah == 0:
            dc_tbl = htables.get((0, s["td"]))
            if dc_tbl is None:
                raise ValueError(f"JPEG missing DC Huffman table {s['td']}")
        if ac_scan:
            ac_tbl = htables.get((1, s["ta"]))
            if ac_tbl is None:
                raise ValueError(f"JPEG missing AC Huffman table {s['ta']}")
        order.append((j, dc_tbl, ac_tbl))

    interleaved = len(sc) > 1
    if interleaved:
        total_units = mcux * mcuy
    else:
        j = order[0][0]
        bh, bw = nblocks[j]
        total_units = bh * bw
    ri = scan["ri"] or total_units
    unit = 0
    for seg_bytes in scan["segments"]:
        if unit >= total_units:
            break
        reader = _BitReader(seg_bytes)
        preds = [0] * len(comps)
        eobrun = 0
        for _ in range(min(ri, total_units - unit)):
            if interleaved:
                my, mx = divmod(unit, mcux)
                for j, dc_tbl, ac_tbl in order:
                    ch, cv = comps[j]["h"], comps[j]["v"]
                    for by in range(cv):
                        for bx in range(ch):
                            block = coefs[j][my * cv + by, mx * ch + bx]
                            preds[j], eobrun = _decode_block(
                                reader, block, dc_tbl, ac_tbl, ss, se,
                                ah, al, preds[j], eobrun, progressive,
                            )
            else:
                j, dc_tbl, ac_tbl = order[0]
                bh, bw = nblocks[j]
                by, bx = divmod(unit, bw)
                block = coefs[j][by, bx]
                preds[j], eobrun = _decode_block(
                    reader, block, dc_tbl, ac_tbl, ss, se, ah, al,
                    preds[j], eobrun, progressive,
                )
            unit += 1


def _decode_block(
    reader, block, dc_tbl, ac_tbl, ss, se, ah, al, pred, eobrun, progressive
):
    """Decode one block's contribution for the current scan type."""
    if not progressive:
        s = reader.decode(dc_tbl)
        pred += _extend(reader.receive(s), s)
        block[0] = pred
        k = 1
        while k <= 63:
            sym = reader.decode(ac_tbl)
            r, s = sym >> 4, sym & 0x0F
            if s == 0:
                if r == 15:
                    k += 16
                    continue
                break  # EOB
            k += r
            if k > 63:
                raise ValueError("JPEG AC run past block")
            block[k] = _extend(reader.receive(s), s)
            k += 1
        return pred, 0
    if ss == 0 and se == 0:  # DC scan
        if ah == 0:
            s = reader.decode(dc_tbl)
            pred += _extend(reader.receive(s), s)
            block[0] = pred << al
        else:  # DC refinement: one raw bit
            if reader.read_bit():
                block[0] = int(block[0]) | (1 << al)
        return pred, eobrun
    if ah == 0:
        eobrun = _decode_ac_first(reader, block, ac_tbl, ss, se, al, eobrun)
    else:
        eobrun = _decode_ac_refine(reader, block, ac_tbl, ss, se, al, eobrun)
    return pred, eobrun


# --- encoder ---------------------------------------------------------------


def _encode_block(
    writer: _BitWriter,
    block: np.ndarray,
    qt: np.ndarray,
    pred: int,
    dc_tbl: dict,
    ac_tbl: dict,
) -> int:
    """FDCT + quantize + Huffman-encode one 8x8 block; returns new DC."""
    zz = _quantize_block(block, qt)
    dc = int(zz[0])
    diff = dc - pred
    mag = abs(diff)
    s = int(mag).bit_length()
    code, length = dc_tbl[s]
    writer.write(code, length)
    if s:
        writer.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, 64):
        v = int(zz[k])
        if k > last_nz:
            code, length = ac_tbl[0x00]  # EOB
            writer.write(code, length)
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_tbl[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        s = int(abs(v)).bit_length()
        code, length = ac_tbl[(run << 4) | s]
        writer.write(code, length)
        writer.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    return dc


def _quantize_block(block: np.ndarray, qt: np.ndarray) -> np.ndarray:
    """FDCT + quantize one 8x8 spatial block to zigzag coefficients."""
    coef = _DCT @ (block - 128.0) @ _DCT.T
    return np.rint(coef.reshape(64)[ZIGZAG] / qt).astype(np.int64)


def _color_planes(rgb: np.ndarray, subsample: bool):
    """RGB/grayscale input → (planes, sampling factors)."""
    gray = rgb.ndim == 2
    h, w = rgb.shape[:2]
    if gray:
        return [rgb.astype(np.float64)], [(1, 1)]
    x = rgb.astype(np.float64)
    r, g, b = x[:, :, 0], x[:, :, 1], x[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    if subsample:
        pcb = np.pad(cb, ((0, h % 2), (0, w % 2)), mode="edge")
        pcr = np.pad(cr, ((0, h % 2), (0, w % 2)), mode="edge")
        cb = pcb.reshape(pcb.shape[0] // 2, 2, -1, 2).mean(axis=(1, 3))
        cr = pcr.reshape(pcr.shape[0] // 2, 2, -1, 2).mean(axis=(1, 3))
        return [y, cb, cr], [(2, 2), (1, 1), (1, 1)]
    return [y, cb, cr], [(1, 1), (1, 1), (1, 1)]


def _pad_planes(planes, samp, mcux, mcuy):
    out = []
    for p, (sh, sv) in zip(planes, samp):
        th, tw = mcuy * 8 * sv, mcux * 8 * sh
        out.append(
            np.pad(
                p,
                ((0, th - p.shape[0]), (0, tw - p.shape[1])),
                mode="edge",
            )
        )
    return out


def _jpeg_headers(
    h: int, w: int, samp, qt, ntab: int, sof_marker: int,
    restart_interval: int, ac_tables=(AC_LUM, AC_CHR),
) -> bytearray:
    """SOI..tables..SOFn(..DRI) common to both encoders."""
    nplanes = len(samp)
    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
    out += struct.pack(">HHBB", 1, 1, 0, 0)  # density 1x1, no thumbnail
    for t in range(ntab):
        out += b"\xff\xdb" + struct.pack(">HB", 67, t)
        out += bytes(int(v) for v in qt)
    out += bytes((0xFF, sof_marker)) + struct.pack(
        ">HBHHB", 8 + 3 * nplanes, 8, h, w, nplanes
    )
    for j, (sh, sv) in enumerate(samp):
        out += struct.pack("BBB", j + 1, (sh << 4) | sv, min(j, ntab - 1))
    for tc, tables in ((0, (DC_LUM, DC_CHR)), (1, ac_tables)):
        for th in range(ntab):
            bits, vals = tables[th]
            out += b"\xff\xc4" + struct.pack(
                ">HB", 19 + len(vals), (tc << 4) | th
            )
            out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    return out


def encode_jpeg(
    rgb: np.ndarray,
    quant: int = 1,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode (h, w, 3) RGB or (h, w) grayscale uint8 as baseline JPEG.

    ``quant`` is the uniform quantization step (1 = near-lossless, the
    fixture setting); ``subsample=True`` uses 4:2:0 chroma (2x2 luma
    sampling factors); ``restart_interval`` emits DRI + RSTn markers
    every that many MCUs — together these exercise every decoder path.
    """
    rgb = np.asarray(rgb)
    h, w = rgb.shape[:2]
    if not 1 <= quant <= 255:
        raise ValueError("quant must be in 1..255")
    qt = np.full(64, quant, np.int64)
    planes, samp = _color_planes(rgb, subsample)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    padded = _pad_planes(planes, samp, mcux, mcuy)

    ntab = 1 if len(planes) == 1 else 2
    dc_enc = [_huff_encode_table(*DC_LUM), _huff_encode_table(*DC_CHR)]
    ac_enc = [_huff_encode_table(*AC_LUM), _huff_encode_table(*AC_CHR)]

    out = _jpeg_headers(h, w, samp, qt, ntab, 0xC0, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(planes), len(planes))
    for j in range(len(planes)):
        t = min(j, ntab - 1)
        out += struct.pack("BB", j + 1, (t << 4) | t)
    out += b"\x00\x3f\x00"  # Ss=0 Se=63 AhAl=0

    writer = _BitWriter()
    preds = [0] * len(planes)
    total_mcus = mcux * mcuy
    rst = 0
    for mcu in range(total_mcus):
        if restart_interval and mcu and mcu % restart_interval == 0:
            writer.pad_to_byte()
            out += bytes(writer.out)
            out += bytes((0xFF, 0xD0 + (rst & 7)))
            rst += 1
            writer = _BitWriter()
            preds = [0] * len(planes)
        my, mx = divmod(mcu, mcux)
        for j, (sh, sv) in enumerate(samp):
            t = min(j, ntab - 1)
            for by in range(sv):
                for bx in range(sh):
                    y0 = (my * sv + by) * 8
                    x0 = (mx * sh + bx) * 8
                    block = padded[j][y0 : y0 + 8, x0 : x0 + 8]
                    preds[j] = _encode_block(
                        writer, block, qt, preds[j], dc_enc[t], ac_enc[t]
                    )
    writer.pad_to_byte()
    out += bytes(writer.out)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- progressive encoder ---------------------------------------------------


class _ProgState:
    """Per-scan EOB-run + correction-bit buffering (T.81 G.1.2.2-3)."""

    def __init__(self, writer: _BitWriter, ac_tbl: "dict | None"):
        self.writer = writer
        self.ac_tbl = ac_tbl
        self.eobrun = 0
        self.pending: list[int] = []

    def flush_eobrun(self) -> None:
        if self.eobrun > 0:
            nbits = self.eobrun.bit_length() - 1
            code, length = self.ac_tbl[nbits << 4]
            self.writer.write(code, length)
            if nbits:
                self.writer.write(self.eobrun - (1 << nbits), nbits)
            self.eobrun = 0
        for b in self.pending:
            self.writer.write(b, 1)
        self.pending = []


def _enc_dc_prog(writer, zz, pred, dc_tbl, ah, al) -> int:
    """Progressive DC: first scan (Huffman diff of dc >> Al) or
    refinement (one raw bit)."""
    dc = int(zz[0]) >> al  # DC point transform: arithmetic shift
    if ah == 0:
        diff = dc - pred
        s = int(abs(diff)).bit_length()
        code, length = dc_tbl[s]
        writer.write(code, length)
        if s:
            writer.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
        return dc
    writer.write(dc & 1, 1)
    return pred


def _enc_ac_first(state: _ProgState, zz, ss, se, al) -> None:
    """AC first scan for one block with EOB-run folding."""
    w = state.writer
    r = 0
    for k in range(ss, se + 1):
        v = int(zz[k])
        t = abs(v) >> al  # AC point transform rounds toward zero
        if t == 0:
            r += 1
            continue
        state.flush_eobrun()
        while r > 15:
            code, length = state.ac_tbl[0xF0]
            w.write(code, length)
            r -= 16
        v2 = t if v >= 0 else -t
        s = t.bit_length()
        code, length = state.ac_tbl[(r << 4) | s]
        w.write(code, length)
        w.write(v2 if v2 >= 0 else v2 + (1 << s) - 1, s)
        r = 0
    if r > 0:
        state.eobrun += 1
        if state.eobrun == 0x7FFF:
            state.flush_eobrun()


def _enc_ac_refine(state: _ProgState, zz, ss, se, al) -> None:
    """AC refinement scan for one block: newly-nonzero ±1·2^Al
    coefficients plus buffered correction bits (T.81 G.1.2.3)."""
    w = state.writer
    absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
    eob = 0  # index AFTER the last newly-nonzero coefficient
    for i, t in enumerate(absv):
        if t == 1:
            eob = i + 1
    r = 0
    br: list[int] = []
    for i, t in enumerate(absv):
        if t == 0:
            r += 1
            continue
        while r > 15 and i < eob:
            state.flush_eobrun()
            code, length = state.ac_tbl[0xF0]
            w.write(code, length)
            r -= 16
            for b in br:
                w.write(b, 1)
            br = []
        if t > 1:
            br.append(t & 1)
            continue
        state.flush_eobrun()
        code, length = state.ac_tbl[(r << 4) | 1]
        w.write(code, length)
        w.write(1 if int(zz[ss + i]) >= 0 else 0, 1)
        for b in br:
            w.write(b, 1)
        br = []
        r = 0
    if r > 0 or br:
        state.eobrun += 1
        state.pending.extend(br)
        if state.eobrun == 0x7FFF:
            state.flush_eobrun()


def encode_jpeg_progressive(
    rgb: np.ndarray,
    quant: int = 1,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode (h, w, 3) RGB or (h, w) grayscale uint8 as a progressive
    (SOF2) JPEG with a spec-shaped scan script:

    1. interleaved DC first scan at Al=1;
    2. per component, AC first scans for bands 1-5 and 6-63 at Al=2
       (spectral selection + EOB-run coding);
    3. per component, AC refinement 1-63 from Ah=2 to Al=1, then
       Ah=1 to Al=0 (correction-bit buffering);
    4. DC refinement scan (raw bits) from Ah=1 to Al=0.

    Identical quantization to :func:`encode_jpeg` produces identical
    coefficients, so ``decode(progressive) == decode(baseline)``
    exactly — the fixture contract tests rely on. ``restart_interval``
    emits DRI + per-scan RSTn markers (EOB runs flushed at every
    restart), exercising the decoder's progressive restart paths."""
    rgb = np.asarray(rgb)
    h, w = rgb.shape[:2]
    if not 1 <= quant <= 255:
        raise ValueError("quant must be in 1..255")
    qt = np.full(64, quant, np.int64)
    planes, samp = _color_planes(rgb, subsample)
    ncomp = len(planes)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    padded = _pad_planes(planes, samp, mcux, mcuy)

    # quantized coefficients for every block, padded interleaved grid
    coefs = []
    for j, (sh, sv) in enumerate(samp):
        bh, bw = mcuy * sv, mcux * sh
        arr = np.zeros((bh, bw, 64), np.int64)
        for by in range(bh):
            for bx in range(bw):
                arr[by, bx] = _quantize_block(
                    padded[j][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8], qt
                )
        coefs.append(arr)
    # non-interleaved grids (ceil of component size / 8)
    nblocks = [
        (
            -(-(-(-h * sv // vmax)) // 8),
            -(-(-(-w * sh // hmax)) // 8),
        )
        for sh, sv in samp
    ]

    ntab = 1 if ncomp == 1 else 2
    dc_enc = [_huff_encode_table(*DC_LUM), _huff_encode_table(*DC_CHR)]
    prog_ac = _huff_encode_table(*PROG_AC)
    ac_enc = [prog_ac, prog_ac]

    out = _jpeg_headers(
        h, w, samp, qt, ntab, 0xC2, restart_interval,
        ac_tables=(PROG_AC, PROG_AC),
    )

    script: list[dict] = [
        {"comps": list(range(ncomp)), "ss": 0, "se": 0, "ah": 0, "al": 1}
    ]
    for j in range(ncomp):
        script.append({"comps": [j], "ss": 1, "se": 5, "ah": 0, "al": 2})
        script.append({"comps": [j], "ss": 6, "se": 63, "ah": 0, "al": 2})
    for j in range(ncomp):
        script.append({"comps": [j], "ss": 1, "se": 63, "ah": 2, "al": 1})
    for j in range(ncomp):
        script.append({"comps": [j], "ss": 1, "se": 63, "ah": 1, "al": 0})
    script.append(
        {"comps": list(range(ncomp)), "ss": 0, "se": 0, "ah": 1, "al": 0}
    )

    for scan in script:
        sjs, ss, se = scan["comps"], scan["ss"], scan["se"]
        ah, al = scan["ah"], scan["al"]
        out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(sjs), len(sjs))
        for j in sjs:
            t = min(j, ntab - 1)
            out += struct.pack("BB", j + 1, (t << 4) | t)
        out += struct.pack("BBB", ss, se, (ah << 4) | al)

        interleaved = len(sjs) > 1
        if interleaved:
            total_units = mcux * mcuy
        else:
            bh, bw = nblocks[sjs[0]]
            total_units = bh * bw
        ri = restart_interval or total_units
        writer = _BitWriter()
        state = _ProgState(
            writer, ac_enc[min(sjs[0], ntab - 1)] if ss else None
        )
        preds = [0] * ncomp
        rst = 0
        unit = 0
        while unit < total_units:
            if restart_interval and unit and unit % ri == 0:
                state.flush_eobrun()
                writer.pad_to_byte()
                out += bytes(writer.out)
                out += bytes((0xFF, 0xD0 + (rst & 7)))
                rst += 1
                writer = _BitWriter()
                state = _ProgState(writer, state.ac_tbl)
                preds = [0] * ncomp
            if interleaved:
                my, mx = divmod(unit, mcux)
                for j in sjs:
                    sh, sv = samp[j]
                    t = min(j, ntab - 1)
                    for by in range(sv):
                        for bx in range(sh):
                            zz = coefs[j][my * sv + by, mx * sh + bx]
                            preds[j] = _enc_dc_prog(
                                writer, zz, preds[j], dc_enc[t], ah, al
                            )
            else:
                j = sjs[0]
                bh, bw = nblocks[j]
                by, bx = divmod(unit, bw)
                zz = coefs[j][by, bx]
                if ss == 0:
                    t = min(j, ntab - 1)
                    preds[j] = _enc_dc_prog(
                        writer, zz, preds[j], dc_enc[t], ah, al
                    )
                elif ah == 0:
                    _enc_ac_first(state, zz, ss, se, al)
                else:
                    _enc_ac_refine(state, zz, ss, se, al)
            unit += 1
        state.flush_eobrun()
        writer.pad_to_byte()
        out += bytes(writer.out)
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --- lossless (SOF3) encoder ------------------------------------------------

# One DC-class Huffman table covering every diff category 0..16 at a
# flat 5-bit code length (Kraft sum 17/32; the all-ones code unused).
_LOSSLESS_BITS = [0, 0, 0, 0, 17] + [0] * 11
_LOSSLESS_VALS = list(range(17))


def encode_jpeg_lossless(
    img: np.ndarray,
    predictor: int = 1,
    *,
    point_transform: int = 0,
    precision: int = 8,
    restart_interval: int = 0,
) -> bytes:
    """Encode (h, w) grayscale or (h, w, 3) RGB integer samples as a
    LOSSLESS (SOF3) JPEG — the round-trip partner pinning the decoder:
    with ``point_transform=0``, decode(encode(x)) == x bit-for-bit.

    ``predictor`` selects T.81 table H.1 (1-7); ``point_transform``
    shifts samples down Pt bits before prediction (decode returns them
    shifted back up); ``precision`` is the sample bit depth 2-16
    (values must already fit). Components are written as-is — lossless
    JPEG defines no color transform. Restart intervals (in samples)
    reset the prediction to 2^(P-Pt-1), mirroring the decoder."""
    img = np.asarray(img)
    if img.ndim == 2:
        planes = [img.astype(np.int64)]
    elif img.ndim == 3 and img.shape[2] == 3:
        planes = [img[:, :, j].astype(np.int64) for j in range(3)]
    else:
        raise ValueError("expected (h, w) or (h, w, 3) samples")
    if not 2 <= precision <= 16:
        raise ValueError("precision must be 2..16")
    if not 1 <= predictor <= 7:
        raise ValueError("predictor must be 1..7")
    if any(int(p.max(initial=0)) >= (1 << precision) for p in planes):
        raise ValueError(f"samples exceed {precision}-bit precision")
    h, w = planes[0].shape
    pt = point_transform
    shifted = [p >> pt for p in planes]

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xc3" + struct.pack(
        ">HBHHB", 8 + 3 * len(planes), precision, h, w, len(planes)
    )
    for j in range(len(planes)):
        out += struct.pack("BBB", j + 1, 0x11, 0)  # 1x1 sampling, Tq unused
    out += b"\xff\xc4" + struct.pack(">HB", 19 + len(_LOSSLESS_VALS), 0x00)
    out += bytes(_LOSSLESS_BITS) + bytes(_LOSSLESS_VALS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * len(planes), len(planes))
    for j in range(len(planes)):
        out += struct.pack("BB", j + 1, 0x00)
    out += struct.pack("BBB", predictor, 0, pt)  # Ss=sel, Se=0, AhAl=0|Pt

    enc = _huff_encode_table(_LOSSLESS_BITS, _LOSSLESS_VALS)
    default = 1 << (precision - pt - 1)
    writer = _BitWriter()
    total = h * w
    ri = restart_interval or total
    unit = 0
    rst = 0
    while unit < total:
        if unit:  # restart boundary between intervals
            writer.pad_to_byte()
            out += bytes(writer.out)
            out += bytes((0xFF, 0xD0 + (rst & 7)))
            rst += 1
            writer = _BitWriter()
        fresh = True
        for _ in range(min(ri, total - unit)):
            y, x = divmod(unit, w)
            for p in shifted:
                if fresh:
                    pred = default
                elif y == 0:
                    pred = int(p[0, x - 1])
                elif x == 0:
                    pred = int(p[y - 1, 0])
                else:
                    pred = _predict_lossless(
                        int(p[y, x - 1]), int(p[y - 1, x]),
                        int(p[y - 1, x - 1]), predictor,
                    )
                diff = ((int(p[y, x]) - pred + 32768) & 0xFFFF) - 32768
                if diff == -32768:  # encoded as SSSS=16, no extra bits
                    code, length = enc[16]
                    writer.write(code, length)
                    continue
                s = abs(diff).bit_length()
                code, length = enc[s]
                writer.write(code, length)
                if s:
                    v = diff if diff >= 0 else diff + (1 << s) - 1
                    writer.write(v, s)
            fresh = False
            unit += 1
    writer.pad_to_byte()
    out += bytes(writer.out)
    out += b"\xff\xd9"  # EOI
    return bytes(out)
