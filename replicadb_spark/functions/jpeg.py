"""Baseline JPEG codec — pure stdlib ``struct`` + numpy, no libjpeg.

Decoder: baseline sequential DCT (SOF0/SOF1) with Huffman entropy
coding — the format of essentially every JPEG in a web-scale training
corpus. Handles grayscale and YCbCr 3-component images, arbitrary
integer sampling factors (4:4:4, 4:2:2, 4:2:0, ...), restart markers,
16-bit quantization tables, and multi-table DQT/DHT segments.
Progressive (SOF2), lossless, hierarchical and arithmetic-coded
variants raise :class:`UnsupportedMediaError` loudly — no silent
garbage.

Encoder: a minimal baseline encoder (uniform quantization tables,
ITU T.81 Annex K Huffman tables, optional 2x2 chroma subsampling and
restart intervals). Its job is to be the stdlib-only round-trip
partner for the decoder in tests and fixtures — with ``quant=1`` the
decode error is bounded by DCT/color rounding (a few grey levels), so
fixture tests can assert tight tolerances without shipping binary
blobs.

Everything here implements the public ITU-T T.81 (JPEG) spec; the
Huffman tables are the spec's own Annex K "typical" tables. The
reference engine (osalvador/ReplicaDB) never decodes payloads — it
replicates LOB bytes losslessly (OrcFileManager.java:298-324); this
module is part of the beyond-reference multimodal surface.

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
    0xC2: "progressive JPEG (SOF2)",
    0xC3: "lossless JPEG (SOF3)",
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


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline (SOF0/SOF1) JPEG to (h, w, 3) uint8 RGB.

    Grayscale decodes to a replicated-channel RGB array, matching the
    other decoders in functions/codecs.py. Non-baseline frames raise
    :class:`UnsupportedMediaError` naming the variant.
    """
    if payload[:3] != b"\xff\xd8\xff":
        raise ValueError("not a JPEG payload")
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    scan_comps = None
    scan_data_start = None
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
        elif marker in (0xC0, 0xC1):  # baseline / extended sequential
            prec, fh, fw, ncomp = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise UnsupportedMediaError(f"{prec}-bit JPEG")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = struct.unpack_from("BBB", seg, 6 + 3 * c)
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in _SOF_UNSUPPORTED:
            raise UnsupportedMediaError(_SOF_UNSUPPORTED[marker])
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = [
                {"id": seg[1 + 2 * j], "td": seg[2 + 2 * j] >> 4,
                 "ta": seg[2 + 2 * j] & 0x0F}
                for j in range(ns)
            ]
            scan_data_start = pos + 2 + seg_len
            break
        pos += 2 + seg_len
    if frame is None or scan_comps is None:
        raise ValueError("JPEG missing SOF/SOS")
    if len(scan_comps) != len(frame["comps"]):
        raise UnsupportedMediaError("multi-scan (non-interleaved) JPEG")
    if len(frame["comps"]) not in (1, 3):
        raise UnsupportedMediaError(
            f"{len(frame['comps'])}-component JPEG (CMYK?)"
        )

    # split entropy data into restart segments, removing byte stuffing
    segments: list[bytes] = []
    cur = bytearray()
    i = scan_data_start
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

    comps = frame["comps"]
    fh, fw = frame["h"], frame["w"]
    if len(comps) == 1:
        # single-component scans are never interleaved (T.81 A.2.3)
        for c in comps:
            c["h"] = c["v"] = 1
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    for c in comps:
        if hmax % c["h"] or vmax % c["v"]:
            raise UnsupportedMediaError(
                f"non-integer sampling ratio {c['h']}x{c['v']} vs {hmax}x{vmax}"
            )
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    planes = [
        np.zeros((mcuy * 8 * c["v"], mcux * 8 * c["h"]), np.float64)
        for c in comps
    ]
    by_id = {c["id"]: j for j, c in enumerate(comps)}
    order = []  # (comp_idx, dc_table, ac_table, qtable)
    for sc in scan_comps:
        j = by_id[sc["id"]]
        for tbl in ((0, sc["td"]), (1, sc["ta"])):
            if tbl not in htables:
                raise ValueError(f"JPEG missing Huffman table {tbl}")
        tq = comps[j]["tq"]
        if tq not in qtables:
            raise ValueError(f"JPEG missing quant table {tq}")
        order.append(
            (j, htables[(0, sc["td"])], htables[(1, sc["ta"])], qtables[tq])
        )

    total_mcus = mcux * mcuy
    per_seg = restart_interval or total_mcus
    mcu = 0
    for seg_bytes in segments:
        if mcu >= total_mcus:
            break
        reader = _BitReader(seg_bytes)
        preds = [0] * len(comps)
        for _ in range(min(per_seg, total_mcus - mcu)):
            my, mx = divmod(mcu, mcux)
            for j, dc_tbl, ac_tbl, qt in order:
                ch, cv = comps[j]["h"], comps[j]["v"]
                for by in range(cv):
                    for bx in range(ch):
                        zz = np.zeros(64, np.int32)
                        s = reader.decode(dc_tbl)
                        diff = _extend(reader.receive(s), s)
                        preds[j] += diff
                        zz[0] = preds[j]
                        k = 1
                        while k < 64:
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
                            zz[k] = _extend(reader.receive(s), s)
                            k += 1
                        coef = np.zeros(64, np.float64)
                        coef[ZIGZAG] = zz * qt
                        block = _DCT.T @ coef.reshape(8, 8) @ _DCT
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[j][y0 : y0 + 8, x0 : x0 + 8] = block
            mcu += 1

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
    coef = _DCT @ (block - 128.0) @ _DCT.T
    zz = np.rint(coef.reshape(64)[ZIGZAG] / qt).astype(np.int64)
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
    gray = rgb.ndim == 2
    h, w = rgb.shape[:2]
    if not 1 <= quant <= 255:
        raise ValueError("quant must be in 1..255")
    qt = np.full(64, quant, np.int64)

    if gray:
        planes = [rgb.astype(np.float64)]
        samp = [(1, 1)]
    else:
        x = rgb.astype(np.float64)
        r, g, b = x[:, :, 0], x[:, :, 1], x[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            # pad to even, 2x2 box-mean the chroma planes
            pcb = np.pad(cb, ((0, h % 2), (0, w % 2)), mode="edge")
            pcr = np.pad(cr, ((0, h % 2), (0, w % 2)), mode="edge")
            cb = pcb.reshape(pcb.shape[0] // 2, 2, -1, 2).mean(axis=(1, 3))
            cr = pcr.reshape(pcr.shape[0] // 2, 2, -1, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]

    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    padded = []
    for p, (sh, sv) in zip(planes, samp):
        th, tw = mcuy * 8 * sv, mcux * 8 * sh
        padded.append(
            np.pad(
                p,
                ((0, th - p.shape[0]), (0, tw - p.shape[1])),
                mode="edge",
            )
        )

    ntab = 1 if gray else 2
    dc_enc = [_huff_encode_table(*DC_LUM), _huff_encode_table(*DC_CHR)]
    ac_enc = [_huff_encode_table(*AC_LUM), _huff_encode_table(*AC_CHR)]

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
    out += struct.pack(">HHBB", 1, 1, 0, 0)  # density 1x1, no thumbnail
    for t in range(ntab):
        out += b"\xff\xdb" + struct.pack(">HB", 67, t)
        out += bytes(int(v) for v in qt)
    out += b"\xff\xc0" + struct.pack(
        ">HBHHB", 8 + 3 * len(planes), 8, h, w, len(planes)
    )
    for j, (sh, sv) in enumerate(samp):
        out += struct.pack("BBB", j + 1, (sh << 4) | sv, min(j, ntab - 1))
    for tc, tables in ((0, (DC_LUM, DC_CHR)), (1, (AC_LUM, AC_CHR))):
        for th in range(ntab):
            bits, vals = tables[th]
            out += b"\xff\xc4" + struct.pack(">HB", 19 + len(vals), (tc << 4) | th)
            out += bytes(bits) + bytes(vals)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
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
