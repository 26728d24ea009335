"""Pure-stdlib media codecs for the multimodal kernels.

Real decoders for the container-friendly formats that need no codec
library: BMP (24/32-bit BGR(A), 1/4/8-bit paletted, BI_RLE8/BI_RLE4
runs) and PPM "P6" images via struct/numpy, PNG (all bit depths 1-16,
sequential and Adam7-interlaced) via stdlib ``zlib``, GIF87a/89a
(variable-width LZW, interlacing, local palettes, and ANIMATION —
frame compositing with GCE transparency + disposal 0/1/2/3), WAV
audio (integer PCM via the stdlib ``wave`` module; IEEE-float and
G.711 mu-law/A-law via the fallback RIFF parser), baseline TIFF
(strips; none/LZW/PackBits compression, horizontal predictor,
gray/RGB/palette, both byte orders, 8/16-bit), and
baseline/progressive JPEG in functions/jpeg.py. Formats that genuinely need external codecs
(MP3, video containers, arithmetic-coded JPEG, …)
still raise NotImplementedError with the library they'd require —
functions/multimodal.py dispatches on magic bytes and falls through to
that error, keeping the stub surface honest while making the decode
step REAL for the formats a pure-Python container can handle.

Reference parity note: the closest reference analog is binary/LOB
round-trip fidelity (OrcFileManager.java:298-324 writes LOB bytes
losslessly); this module is the "do something real with the bytes"
step the reference never needed because it only replicates payloads.

Scale: decoders run inside Arrow-batched mapInPandas workers — payload
bytes stay on the executor that scanned them, pixel/PCM math is numpy
(vectorized, no per-sample Python), and only small feature rows leave
the worker.
"""

from __future__ import annotations

import io
import struct
import wave

import numpy as np


class UnsupportedMediaError(NotImplementedError):
    """Raised for formats that need an external codec library."""


def sniff_format(payload: bytes | None) -> str:
    """Best-effort container sniff from magic bytes."""
    if not payload:
        return "empty"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:2] in (b"P6", b"P5"):
        return "ppm"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:3] == b"\xff\xd8\xff":
        return "jpeg"
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return "png"
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        return "gif"
    if payload[:4] in (b"II*\x00", b"MM\x00*"):
        return "tiff"
    return "unknown"


def _bmp_rle_decode(data: bytes, h: int, w: int, rle4: bool) -> np.ndarray:
    """Decode a BI_RLE8/BI_RLE4 pixel stream into an (h, w) uint8 index
    array in BOTTOM-UP row order (RLE bitmaps are always bottom-up).
    Pixels skipped by end-of-line/delta escapes are undefined per the
    spec; they decode as palette index 0, matching common rasterizers."""
    idx = np.zeros((h, w), dtype=np.uint8)
    pos = x = y = 0
    n = len(data)
    while pos + 1 < n:
        count, val = data[pos], data[pos + 1]
        pos += 2
        if count > 0:  # encoded run
            end = min(x + count, w)
            if rle4:
                run = np.empty(end - x, dtype=np.uint8)
                run[0::2] = val >> 4
                run[1::2] = val & 0x0F
            else:
                run = np.full(end - x, val, dtype=np.uint8)
            if y < h:
                idx[y, x:end] = run
            x = end
            continue
        if val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            break
        elif val == 2:  # delta: skip (dx, dy)
            if pos + 1 >= n:
                raise ValueError("truncated BMP RLE delta")
            x = min(x + data[pos], w)
            y += data[pos + 1]
            pos += 2
        else:  # absolute mode: `val` literal pixels, word-aligned
            npix = val
            nbytes = ((npix + 1) // 2 if rle4 else npix)
            nbytes += nbytes & 1  # pad to 2-byte boundary
            if pos + nbytes > n:
                raise ValueError("truncated BMP RLE absolute run")
            raw = np.frombuffer(data, dtype=np.uint8, count=nbytes, offset=pos)
            if rle4:
                lit = np.empty(2 * len(raw), dtype=np.uint8)
                lit[0::2] = raw >> 4
                lit[1::2] = raw & 0x0F
                lit = lit[:npix]
            else:
                lit = raw[:npix]
            end = min(x + npix, w)
            if y < h:
                idx[y, x:end] = lit[: end - x]
            x = end
            pos += nbytes
        if y >= h and val not in (1,):
            break
    return idx[::-1]  # bottom-up → top-down


def decode_bmp(payload: bytes) -> np.ndarray:
    """Decode a BMP (BITMAPINFOHEADER+; 24/32-bit BGR(A), or 1/4/8-bit
    paletted, uncompressed or BI_RLE8/BI_RLE4) to an (h, w, 3) uint8
    RGB array. Paletted pixels go through the BGRA color table
    (biClrUsed entries, 2^bpp when 0)."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    if hdr_size < 40:
        raise UnsupportedMediaError("BITMAPCOREHEADER BMP not supported")
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if compression not in (0, 1, 2):
        raise UnsupportedMediaError(f"compressed BMP (type {compression})")
    if compression == 1 and bpp != 8:
        raise ValueError(f"BI_RLE8 requires 8-bit pixels, got {bpp}")
    if compression == 2 and bpp != 4:
        raise ValueError(f"BI_RLE4 requires 4-bit pixels, got {bpp}")
    if bpp not in (1, 4, 8, 24, 32):
        raise UnsupportedMediaError(f"{bpp}-bit BMP")
    bottom_up = height > 0
    h, w = abs(height), width

    def palette(n_default: int) -> np.ndarray:
        n_colors = struct.unpack_from("<I", payload, 46)[0] or n_default
        pal_off = 14 + hdr_size
        if len(payload) < pal_off + 4 * n_colors:
            raise ValueError("truncated BMP color table")
        return np.frombuffer(
            payload, dtype=np.uint8, count=4 * n_colors, offset=pal_off
        ).reshape(n_colors, 4)[:, 2::-1]  # BGRA -> RGB

    if compression in (1, 2):
        if not bottom_up:
            raise ValueError("RLE BMP must be bottom-up (positive height)")
        pal = palette(1 << bpp)
        idx = _bmp_rle_decode(payload[data_off:], h, w, compression == 2)
        if idx.max(initial=0) >= len(pal):
            raise ValueError("BMP pixel index outside color table")
        return np.ascontiguousarray(pal[idx])

    row_size = ((bpp * w + 31) // 32) * 4
    need = data_off + row_size * h
    if len(payload) < need:
        raise ValueError(f"truncated BMP: {len(payload)} < {need} bytes")
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_size * h, offset=data_off
    ).reshape(h, row_size)
    if bpp <= 8:
        pal = palette(1 << bpp)
        if bpp == 8:
            idx = rows[:, :w]
        elif bpp == 4:
            nib = np.empty((h, 2 * row_size), dtype=np.uint8)
            nib[:, 0::2] = rows >> 4
            nib[:, 1::2] = rows & 0x0F
            idx = nib[:, :w]
        else:  # 1-bit: MSB-first bit unpacking
            idx = np.unpackbits(rows, axis=1)[:, :w]
        if idx.max(initial=0) >= len(pal):
            raise ValueError("BMP pixel index outside color table")
        rgb = pal[idx]
    else:
        nch = bpp // 8
        px = rows[:, : w * nch].reshape(h, w, nch)
        rgb = px[:, :, 2::-1]  # BGR(A) -> RGB, alpha dropped
    if bottom_up:
        rgb = rgb[::-1]
    return np.ascontiguousarray(rgb)


def decode_ppm(payload: bytes) -> np.ndarray:
    """Decode a binary PPM (P6) / PGM (P5), any maxval 1..65535
    (two-byte big-endian samples above 255, per the Netpbm spec), to
    (h, w, 3) uint8 RGB."""
    if payload[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM payload")
    gray = payload[:2] == b"P5"
    # header = magic + 3 ints, separated by whitespace; '#' comments run
    # to end-of-line; a single whitespace byte ends the header
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # the single whitespace after maxval
    w, h, maxval = tokens
    if not 1 <= maxval <= 65535:
        raise ValueError(f"PPM maxval {maxval} outside the Netpbm range")
    nch = 1 if gray else 3
    if maxval > 255:  # two-byte big-endian samples
        px = np.frombuffer(
            payload, dtype=">u2", count=w * h * nch, offset=pos
        ).astype(np.float64)
    else:
        px = np.frombuffer(
            payload, dtype=np.uint8, count=w * h * nch, offset=pos
        ).astype(np.float64)
    if maxval != 255:
        # Netpbm samples are relative to maxval — rescale to full-range
        # uint8 so e.g. a maxval=15 image doesn't decode near-black
        px = np.rint(px * (255.0 / maxval))
    px = px.astype(np.uint8)
    if gray:
        return np.repeat(px.reshape(h, w, 1), 3, axis=2)
    return px.reshape(h, w, 3).copy()


# Adam7 interlace passes (PNG spec §8.2): (x0, y0, dx, dy)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_unfilter(raw: bytes, off: int, h: int, stride: int, bpp: int):
    """Invert the five scanline filters (PNG spec §9) over ``h`` rows of
    ``stride`` bytes starting at ``raw[off]``; filtering always operates
    on BYTES with pixel lag ``bpp``, whatever the bit depth. Returns
    (rows uint8 (h, stride), new offset)."""
    recon = np.zeros((h, stride), np.int32)
    for y in range(h):
        f = raw[off]
        out = np.frombuffer(raw, np.uint8, count=stride, offset=off + 1).astype(
            np.int32
        )
        off += 1 + stride
        prev = recon[y - 1] if y else np.zeros(stride, np.int32)
        if f == 0:
            pass
        elif f == 2:  # Up — fully vectorized
            out = (out + prev) & 0xFF
        elif f == 1:  # Sub — sequential in x over the pixel lag
            for x in range(bpp, stride):
                out[x] = (out[x] + out[x - bpp]) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                a = out[x - bpp] if x >= bpp else 0
                out[x] = (out[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = int(out[x - bpp]) if x >= bpp else 0
                c = int(prev[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[x] = (out[x] + pr) & 0xFF
        else:
            raise ValueError(f"PNG filter type {f}")
        recon[y] = out
    return recon.astype(np.uint8), off


def _png_samples(rows: np.ndarray, w: int, channels: int, depth: int):
    """(h, stride) reconstructed bytes → (h, w*channels) samples in the
    ORIGINAL depth range (big-endian 16-bit pairs; MSB-first sub-byte
    packing per spec §7.2)."""
    h = rows.shape[0]
    n = w * channels
    if depth == 8:
        return rows[:, :n].astype(np.uint16)
    if depth == 16:
        hi = rows[:, 0 : 2 * n : 2].astype(np.uint16)
        lo = rows[:, 1 : 2 * n : 2].astype(np.uint16)
        return (hi << 8) | lo
    bits = np.unpackbits(rows, axis=1)
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint16)
    vals = (bits.reshape(h, -1, depth) * weights).sum(axis=2, dtype=np.uint16)
    return vals[:, :n]


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a PNG (gray, RGB, palette, gray+alpha, RGBA; bit depths
    1/2/4/8/16; sequential or Adam7-interlaced) to (h, w, 3) uint8 RGB
    — pure stdlib: ``zlib`` inflates the IDAT stream, numpy
    reconstructs the five scanline filters per pass (spec §9, byte-wise
    with the pixel-lag bpp), sub-byte samples unpack MSB-first, 16-bit
    samples fold to 8 by dropping the low byte (the spec's sBIT-free
    downconversion), low-depth grays rescale by 255/(2^d−1), and alpha
    is dropped. Interlaced images deinterlace by scattering each pass
    onto its (x0+i·dx, y0+j·dy) grid."""
    import zlib

    if payload[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not a PNG payload")
    pos, ihdr, plte, idat = 8, None, None, []
    while pos + 8 <= len(payload):
        ln, typ = struct.unpack_from(">I4s", payload, pos)
        data = payload[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # length + type + data + crc
        if typ == b"IHDR":
            ihdr = data
        elif typ == b"PLTE":
            plte = data
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise UnsupportedMediaError(f"PNG color type {ctype}")
    valid_depths = {0: (1, 2, 4, 8, 16), 3: (1, 2, 4, 8)}.get(
        ctype, (8, 16)
    )
    if depth not in valid_depths:
        raise ValueError(f"PNG color type {ctype} with {depth}-bit depth")
    if interlace not in (0, 1):
        raise UnsupportedMediaError(f"PNG interlace method {interlace}")
    raw = zlib.decompress(b"".join(idat))
    passes = _ADAM7 if interlace else ((0, 0, 1, 1),)
    bpp = max(1, (channels * depth) // 8)

    dims = []
    need = 0
    for x0, y0, dx, dy in passes:
        wp = (w - x0 + dx - 1) // dx
        hp = (h - y0 + dy - 1) // dy
        stride = (wp * channels * depth + 7) // 8
        if wp > 0 and hp > 0:
            need += hp * (1 + stride)
        dims.append((x0, y0, dx, dy, wp, hp, stride))
    if len(raw) < need:
        raise ValueError("truncated PNG pixel data")

    samples = np.zeros((h, w, channels), np.uint16)
    off = 0
    for x0, y0, dx, dy, wp, hp, stride in dims:
        if wp <= 0 or hp <= 0:
            continue
        rows, off = _png_unfilter(raw, off, hp, stride, bpp)
        s = _png_samples(rows, wp, channels, depth).reshape(hp, wp, channels)
        samples[y0::dy, x0::dx] = s

    if ctype == 3:
        if plte is None:
            raise ValueError("paletted PNG without PLTE")
        pal = np.frombuffer(plte, np.uint8).reshape(-1, 3)
        idx = samples[:, :, 0]
        if idx.max(initial=0) >= len(pal):
            raise ValueError("PNG pixel index outside palette")
        return np.ascontiguousarray(pal[idx])
    if depth == 16:
        px = (samples >> 8).astype(np.uint8)
    elif depth == 8:
        px = samples.astype(np.uint8)
    else:  # low-depth gray: rescale to full range
        px = np.rint(
            samples.astype(np.float64) * (255.0 / ((1 << depth) - 1))
        ).astype(np.uint8)
    if ctype == 0:
        return np.ascontiguousarray(np.repeat(px, 3, axis=2))
    if ctype == 2:
        return np.ascontiguousarray(px)
    if ctype == 4:
        return np.ascontiguousarray(np.repeat(px[:, :, :1], 3, axis=2))
    return np.ascontiguousarray(px[:, :, :3])  # RGBA -> RGB


def encode_png(rgb: np.ndarray) -> bytes:
    """Encode (h, w, 3) uint8 RGB as a minimal filter-0 PNG — the
    stdlib-only round-trip partner of :func:`decode_png`."""
    import zlib

    h, w = rgb.shape[:2]

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    body = np.ascontiguousarray(rgb, dtype=np.uint8)
    scan = b"".join(b"\x00" + body[y].tobytes() for y in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(scan))
        + chunk(b"IEND", b"")
    )


def decode_image(payload: bytes) -> np.ndarray:
    """Dispatch on magic bytes → (h, w, 3) uint8 RGB. BMP, PPM/PGM (any
    maxval), PNG (all depths, interlaced or not) and
    baseline/progressive JPEG decode for real (see functions/jpeg.py),
    as does GIF (first composited frame; decode_gif_frames for the
    animation); only genuinely exotic variants (arithmetic JPEG,
    BITFIELDS/core-header BMP, …) raise UnsupportedMediaError."""
    fmt = sniff_format(payload)
    if fmt == "bmp":
        return decode_bmp(payload)
    if fmt == "ppm":
        return decode_ppm(payload)
    if fmt == "png":
        return decode_png(payload)
    if fmt == "gif":
        return decode_gif(payload)
    if fmt == "tiff":
        return decode_tiff(payload)
    if fmt == "jpeg":
        from replicadb_spark.functions.jpeg import decode_jpeg

        return decode_jpeg(payload)
    raise UnsupportedMediaError(
        f"image decode for {fmt!r} is not supported in this container"
    )


def encode_ppm(rgb: np.ndarray) -> bytes:
    """Encode (h, w, 3) uint8 RGB as binary PPM (P6) — the stdlib-only
    round-trip target for resize_images."""
    h, w = rgb.shape[:2]
    return b"P6\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(
        rgb, dtype=np.uint8
    ).tobytes()


def resize_nearest(rgb: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample to (height, width, 3) — pure numpy
    index arithmetic (pixel-center mapping, the classic NN rule)."""
    h, w = rgb.shape[:2]
    ys = ((np.arange(height) + 0.5) * h / height).astype(np.int64).clip(0, h - 1)
    xs = ((np.arange(width) + 0.5) * w / width).astype(np.int64).clip(0, w - 1)
    return rgb[ys][:, xs]


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """Decode PCM WAV to (mono float64 samples in [-1, 1], sample_rate).
    Thin wrapper over :func:`decode_wav_full` for callers that don't
    need the source sample width."""
    x, rate, _sw = decode_wav_full(payload)
    return x, rate


def _riff_chunks(payload: bytes) -> "tuple[bytes, bytes, bytes | None]":
    """(fmt body, data body, fact body|None) from a RIFF/WAVE
    container — the fallback framing parser for formats the stdlib
    ``wave`` module refuses (IEEE float, G.711, ADPCM). Chunk sizes
    are word-padded per RIFF; ``fact`` carries the true sample count
    for block-compressed formats."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = data = fact = None
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        sz = struct.unpack_from("<I", payload, pos + 4)[0]
        body = payload[pos + 8 : pos + 8 + sz]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        elif cid == b"fact":
            fact = body
        pos += 8 + sz + (sz & 1)
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    return fmt, data, fact


def decode_wav_full(payload: bytes) -> tuple[np.ndarray, int, int]:
    """Decode WAV to (mono float64 samples in [-1, 1], sample_rate,
    sample_width_bytes).

    Integer PCM: 8-bit unsigned (offset 128), 16/24/32-bit signed
    little-endian — the stdlib ``wave`` module parses the RIFF framing;
    numpy does the sample math. IEEE float WAV (format code 3, 32/64
    bit), which the stdlib refuses, goes through the fallback RIFF
    parser, as do G.711 mu-law/A-law telephony WAVs (format codes 7/6
    — the CCITT segment expansion, vectorized) and IMA/DVI ADPCM
    (format 17, mono or interleaved multi-channel: per-block state
    machines, fact-chunk sample trim) and MS ADPCM (format 2, custom
    coefficient tables honored); remaining compressed formats
    (MP3-in-WAV, GSM, …) stay honest UnsupportedMediaError. Multi-channel audio is mixed down by mean."""
    try:
        with wave.open(io.BytesIO(payload), "rb") as wf:
            nch = wf.getnchannels()
            sw = wf.getsampwidth()
            rate = wf.getframerate()
            raw = wf.readframes(wf.getnframes())
    except wave.Error:
        fmt, raw, fact = _riff_chunks(payload)
        code, nch, rate = struct.unpack_from("<HHI", fmt, 0)
        block_align = struct.unpack_from("<H", fmt, 12)[0]
        bits = struct.unpack_from("<H", fmt, 14)[0]
        if code == 3 and bits in (32, 64):
            x = np.frombuffer(raw, dtype=f"<f{bits // 8}").astype(np.float64)
            x = np.clip(x, -1.0, 1.0)  # float WAV nominal range
        elif code == 7 and bits == 8:  # G.711 mu-law
            x = _mulaw_decode(np.frombuffer(raw, dtype=np.uint8))
        elif code == 6 and bits == 8:  # G.711 A-law
            x = _alaw_decode(np.frombuffer(raw, dtype=np.uint8))
        elif code == 2 and bits == 4:  # MS ADPCM
            # fmt extension: cbSize, samples-per-block, nCoefs, coef pairs
            spb = nco = None
            coefs = _MS_COEFS
            if len(fmt) >= 22:
                spb, nco = struct.unpack_from("<HH", fmt, 18)
                if nco and len(fmt) >= 22 + 4 * nco:
                    coefs = [
                        struct.unpack_from("<hh", fmt, 22 + 4 * k)
                        for k in range(nco)
                    ]
            n_samp = (
                struct.unpack_from("<I", fact, 0)[0] if fact else None
            )
            x = _ms_adpcm_decode(raw, block_align, nch, coefs, spb, n_samp)
            return x, rate, 2  # reconstructs a 16-bit lattice
        elif code == 17 and bits == 4:  # IMA/DVI ADPCM, any channels
            n_samp = (
                struct.unpack_from("<I", fact, 0)[0] if fact else None
            )
            x = _ima_adpcm_decode(raw, block_align, nch, n_samp)
            return x, rate, 2  # reconstructs a 16-bit lattice
        else:
            raise UnsupportedMediaError(
                f"WAV format code {code} ({bits}-bit)"
            )
        if nch > 1:
            x = x[: len(x) - len(x) % nch].reshape(-1, nch).mean(axis=1)
        return x, rate, bits // 8
    if sw == 1:
        x = np.frombuffer(raw, dtype=np.uint8).astype(np.float64)
        x = (x - 128.0) / 128.0
    elif sw == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif sw == 3:
        b = np.frombuffer(raw, dtype=np.uint8)
        b = b[: len(b) - len(b) % 3].reshape(-1, 3).astype(np.int64)
        v = b[:, 0] | (b[:, 1] << 8) | (b[:, 2] << 16)
        v = np.where(v >= 1 << 23, v - (1 << 24), v)
        x = v.astype(np.float64) / 8388608.0
    elif sw == 4:
        x = np.frombuffer(raw, dtype="<i4").astype(np.float64) / 2147483648.0
    else:
        raise UnsupportedMediaError(f"{sw * 8}-bit WAV")
    if nch > 1:
        x = x.reshape(-1, nch).mean(axis=1)
    return x, rate, sw


def _mulaw_decode(u: np.ndarray) -> np.ndarray:
    """G.711 mu-law bytes → float64 in [-1, 1] (CCITT segment
    expansion: complement, 3-bit exponent / 4-bit mantissa, bias 0x84;
    full scale ±32124 on the 16-bit lattice). Vectorized — no
    per-sample Python."""
    v = (~u).astype(np.int64) & 0xFF
    t = (((v & 0x0F) << 3) + 0x84) << ((v & 0x70) >> 4)
    x = np.where(v & 0x80, 0x84 - t, t - 0x84)
    return x.astype(np.float64) / 32768.0


def _alaw_decode(a: np.ndarray) -> np.ndarray:
    """G.711 A-law bytes → float64 in [-1, 1] (CCITT: XOR 0x55,
    segmented expansion; full scale ±32256 on the 16-bit lattice)."""
    v = (a.astype(np.int64)) ^ 0x55
    t = (v & 0x0F) << 4
    seg = (v & 0x70) >> 4
    t = np.where(
        seg == 0, t + 8,
        np.where(seg == 1, t + 0x108, (t + 0x108) << np.maximum(seg - 1, 0)),
    )
    x = np.where(v & 0x80, t, -t)
    return x.astype(np.float64) / 32768.0


def _gif_lzw_decode(data: bytes, min_code_size: int, npix: int) -> np.ndarray:
    """GIF's variable-width LZW (3–12 bit codes, little-endian bit
    packing, clear/EOI, deferred-clear table cap at 4096) → exactly
    ``npix`` palette indices. The loop is per-CODE, not per-pixel —
    each dictionary hit emits its whole run."""
    clear = 1 << min_code_size
    eoi = clear + 1

    def fresh():
        return [bytes([i]) for i in range(clear)] + [b"", b""]

    table = fresh()
    width = min_code_size + 1
    out = bytearray()
    prev = None
    bitpos = 0
    total = len(data) * 8
    while bitpos + width <= total and len(out) < npix:
        i = bitpos >> 3
        word = int.from_bytes(data[i : i + 3], "little")
        code = (word >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        if code == clear:
            table = fresh()
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            if code >= clear:
                raise ValueError("corrupt GIF LZW stream (non-literal start)")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt GIF LZW stream (code beyond table)")
        out += entry
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    if len(out) < npix:
        raise ValueError(
            f"GIF LZW stream ended early ({len(out)}/{npix} pixels)"
        )
    return np.frombuffer(bytes(out[:npix]), dtype=np.uint8)


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gif_parse(payload: bytes):
    """(screen_w, screen_h, bg_index, global_palette|None, frames) —
    frames are dicts with placement, decoded index raster, local
    palette, and the preceding graphic-control (transparency/disposal/
    delay) state. Plain-text/comment/application extensions skip."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h, flags, bg, _ar = struct.unpack_from("<HHBBB", payload, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(
            payload, dtype=np.uint8, count=3 * n, offset=pos
        ).reshape(n, 3)
        pos += 3 * n
    frames = []
    gce = None
    while pos < len(payload):
        b0 = payload[pos]
        if b0 == 0x3B:  # trailer
            break
        if b0 == 0x21:  # extension: label + sub-blocks
            label = payload[pos + 1]
            pos += 2
            blocks = []
            while payload[pos] != 0:
                sz = payload[pos]
                blocks.append(payload[pos + 1 : pos + 1 + sz])
                pos += 1 + sz
            pos += 1
            if label == 0xF9 and blocks:
                b = blocks[0]
                gce = {
                    "disposal": (b[0] >> 2) & 0x07,
                    "transparent": b[3] if (b[0] & 1) else None,
                    "delay_ms": struct.unpack_from("<H", b, 1)[0] * 10,
                }
            continue
        if b0 == 0x2C:  # image descriptor
            x, y, iw, ih, ifl = struct.unpack_from("<HHHHB", payload, pos + 1)
            pos += 10
            lct = None
            if ifl & 0x80:
                n = 2 << (ifl & 0x07)
                lct = np.frombuffer(
                    payload, dtype=np.uint8, count=3 * n, offset=pos
                ).reshape(n, 3)
                pos += 3 * n
            mcs = payload[pos]
            pos += 1
            data = bytearray()
            while payload[pos] != 0:
                sz = payload[pos]
                data += payload[pos + 1 : pos + 1 + sz]
                pos += 1 + sz
            pos += 1
            idx = _gif_lzw_decode(bytes(data), mcs, iw * ih).reshape(ih, iw)
            if ifl & 0x40:  # interlaced: stored rows land on pass order
                dest = [
                    r
                    for start, step in _GIF_INTERLACE_PASSES
                    for r in range(start, ih, step)
                ]
                full = np.empty_like(idx)
                full[np.asarray(dest, dtype=np.int64)] = idx
                idx = full
            frames.append(
                {"x": x, "y": y, "idx": idx, "lct": lct, "gce": gce}
            )
            gce = None
            continue
        raise ValueError(f"unknown GIF block 0x{b0:02x}")
    if not frames:
        raise ValueError("GIF with no image data")
    return w, h, bg, gct, frames


def decode_gif_animation(
    payload: bytes,
) -> "list[tuple[np.ndarray, int]]":
    """Decode EVERY frame of a (possibly animated) GIF87a/89a to
    ``(composited (screen_h, screen_w, 3) uint8 RGB, delay_ms)`` —
    LZW, interlacing, local palettes, GCE transparency, and disposal
    methods 0/1 (leave), 2 (restore background), 3 (restore previous)
    all handled; this is the real decode step behind GIF frame
    sampling (functions/multimodal.extract_gif_frames keeps the
    Spark-side plumbing, this supplies the pixels)."""
    w, h, bg, gct, frames = _gif_parse(payload)
    if gct is not None and bg < len(gct):
        bg_rgb = gct[bg]
    else:
        bg_rgb = np.zeros(3, dtype=np.uint8)
    canvas = np.broadcast_to(bg_rgb, (h, w, 3)).copy()
    out = []
    for f in frames:
        pal = f["lct"] if f["lct"] is not None else gct
        if pal is None:
            raise ValueError("GIF frame with no palette")
        gce = f["gce"] or {}
        disposal = gce.get("disposal", 0)
        transparent = gce.get("transparent")
        idx = f["idx"]
        ih, iw = idx.shape
        y0, x0 = f["y"], f["x"]
        y1, x1 = min(y0 + ih, h), min(x0 + iw, w)
        idx = idx[: y1 - y0, : x1 - x0]
        before = canvas.copy() if disposal == 3 else None
        rect = canvas[y0:y1, x0:x1]
        px = pal[np.minimum(idx, len(pal) - 1)]
        if transparent is not None:
            keep = (idx == transparent)[:, :, None]
            rect[:] = np.where(keep, rect, px)
        else:
            rect[:] = px
        out.append((canvas.copy(), gce.get("delay_ms", 0)))
        if disposal == 2:
            canvas[y0:y1, x0:x1] = bg_rgb
        elif disposal == 3:
            canvas = before
    return out


def decode_gif_frames(payload: bytes) -> "list[np.ndarray]":
    """Composited RGB rasters only (see decode_gif_animation)."""
    return [rgb for rgb, _delay in decode_gif_animation(payload)]


def decode_gif(payload: bytes) -> np.ndarray:
    """First composited frame of a GIF as (h, w, 3) uint8 RGB."""
    return decode_gif_frames(payload)[0]


def _tiff_lzw_decode(data: bytes, max_out: int) -> bytes:
    """TIFF-flavor LZW (spec §13): 8-bit symbols, codes MSB-first
    big-endian, 256=ClearCode, 257=EOI, and the EARLY code-width
    change (width grows when the next entry would be 2^width - 1,
    one code sooner than GIF)."""
    CLEAR, EOI = 256, 257

    def fresh():
        return [bytes([i]) for i in range(256)] + [b"", b""]

    table = fresh()
    width = 9
    out = bytearray()
    prev = None
    bitpos = 0
    total = len(data) * 8
    while bitpos + width <= total and len(out) < max_out:
        i = bitpos >> 3
        word = int.from_bytes(data[i : i + 3].ljust(3, b"\x00"), "big")
        code = (word >> (24 - (bitpos & 7) - width)) & ((1 << width) - 1)
        bitpos += width
        if code == CLEAR:
            table = fresh()
            width = 9
            prev = None
            continue
        if code == EOI:
            break
        if prev is None:
            if code >= CLEAR:
                raise ValueError("corrupt TIFF LZW stream")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            if len(table) < 4096:
                table.append(prev + entry[:1])
        elif code == len(table) and len(table) < 4096:
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt TIFF LZW stream")
        out += entry
        prev = entry
        # EARLY change: the writer widens one code before the table
        # actually fills (TIFF spec: "add 1 to the code size when the
        # next code would be 2^width - 1")
        if len(table) == (1 << width) - 1 and width < 12:
            width += 1
    return bytes(out[:max_out])


def _packbits_decode(data: bytes, max_out: int) -> bytes:
    """Apple PackBits (TIFF compression 32773): n in 0..127 → copy
    n+1 literals; n in -127..-1 → repeat next byte 1-n times; -128 is
    a no-op."""
    out = bytearray()
    pos = 0
    while pos < len(data) and len(out) < max_out:
        n = data[pos]
        pos += 1
        if n < 128:
            out += data[pos : pos + n + 1]
            pos += n + 1
        elif n > 128:
            out += bytes([data[pos]]) * (257 - n)
            pos += 1
        # n == 128: no-op
    return bytes(out[:max_out])


def decode_tiff(payload: bytes) -> np.ndarray:
    """Baseline TIFF 6.0 → (h, w, 3) uint8 RGB: both byte orders,
    strip organization, compression 1 (none) / 5 (LZW, with the
    horizontal-differencing predictor) / 8 (Adobe Deflate) / 32773
    (PackBits), photometric
    gray (incl. WhiteIsZero), RGB(A), and palette-color; 8-bit and
    16-bit samples (16-bit scales down). Tiled layout, other
    compressions (JPEG-in-TIFF, Deflate, CCITT fax) and exotic sample
    layouts raise UnsupportedMediaError by name — the honest-gate
    convention."""
    if payload[:4] == b"II*\x00":
        en = "<"
    elif payload[:4] == b"MM\x00*":
        en = ">"
    else:
        raise ValueError("not a TIFF payload")
    ifd_off = struct.unpack_from(en + "I", payload, 4)[0]
    n_entries = struct.unpack_from(en + "H", payload, ifd_off)[0]
    _TYPE_SIZE = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8}
    _TYPE_FMT = {1: "B", 3: "H", 4: "I"}
    tags: dict[int, list[int]] = {}
    for k in range(n_entries):
        off = ifd_off + 2 + 12 * k
        tag, typ, cnt = struct.unpack_from(en + "HHI", payload, off)
        if typ not in _TYPE_FMT:
            continue  # rationals and ASCII are metadata we don't need
        size = _TYPE_SIZE[typ] * cnt
        if size <= 4:
            vo = off + 8
        else:
            vo = struct.unpack_from(en + "I", payload, off + 8)[0]
        tags[tag] = list(
            struct.unpack_from(en + str(cnt) + _TYPE_FMT[typ], payload, vo)
        )

    def one(tag, default=None):
        v = tags.get(tag)
        if v is None:
            if default is None:
                raise ValueError(f"TIFF missing required tag {tag}")
            return default
        return v[0]

    w, h = one(256), one(257)
    comp = one(259, 1)
    photo = one(262)
    spp = one(277, 1)
    bits = tags.get(258, [8] * spp)
    if tags.get(322) or tags.get(323):
        raise UnsupportedMediaError("tiled TIFF")
    if comp not in (1, 5, 8, 32773):
        raise UnsupportedMediaError(f"TIFF compression {comp}")
    if any(b not in (8, 16) for b in bits) or len(set(bits)) != 1:
        raise UnsupportedMediaError(f"TIFF bits-per-sample {bits}")
    depth = bits[0] // 8
    offsets = tags.get(273)
    counts = tags.get(279)
    if not offsets or not counts:
        raise ValueError("TIFF missing strip offsets/byte counts")
    rows_per_strip = one(278, h)
    predictor = one(317, 1)

    stride = w * spp * depth
    raw = bytearray()
    for si, (so, sc) in enumerate(zip(offsets, counts)):
        body = payload[so : so + sc]
        nrows = min(rows_per_strip, h - si * rows_per_strip)
        want = nrows * stride
        if comp == 5:
            body = _tiff_lzw_decode(body, want)
        elif comp == 8:  # Adobe Deflate: plain zlib per strip
            import zlib

            body = zlib.decompress(bytes(body))
        elif comp == 32773:
            body = _packbits_decode(body, want)
        if len(body) < want:
            raise ValueError("TIFF strip ended early")
        raw += body[:want]

    if depth == 2:
        arr = np.frombuffer(bytes(raw), dtype=en + "u2").astype(np.int64)
    else:
        arr = np.frombuffer(bytes(raw), dtype=np.uint8).astype(np.int64)
    arr = arr.reshape(h, w, spp)
    if predictor == 2:  # horizontal differencing, per sample per row
        arr = np.cumsum(arr, axis=1) & ((1 << bits[0]) - 1)
    elif predictor != 1:
        raise UnsupportedMediaError(f"TIFF predictor {predictor}")
    if depth == 2:
        arr = arr >> 8  # scale 16-bit samples to 8
    arr = arr.astype(np.uint8)

    if photo in (0, 1):  # gray (0 = WhiteIsZero)
        g = arr[:, :, 0]
        if photo == 0:
            g = 255 - g
        return np.repeat(g[:, :, None], 3, axis=2)
    if photo == 2:  # RGB(A) — extra samples dropped
        if spp < 3:
            raise ValueError("RGB TIFF with <3 samples per pixel")
        return np.ascontiguousarray(arr[:, :, :3])
    if photo == 3:  # palette-color: ColorMap is 16-bit, R then G then B
        cmap = tags.get(320)
        if not cmap:
            raise ValueError("palette TIFF missing ColorMap")
        n = len(cmap) // 3
        pal = (
            np.array(cmap, dtype=np.int64).reshape(3, n).T >> 8
        ).astype(np.uint8)
        idx = np.minimum(arr[:, :, 0].astype(np.int64), n - 1)
        return pal[idx]
    raise UnsupportedMediaError(f"TIFF photometric {photo}")


_IMA_STEPS = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
)
_IMA_INDEX = (-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8)


def _ima_adpcm_decode_block(block: bytes, nch: int) -> "list[list[int]]":
    """One IMA ADPCM block → per-channel int16 samples. Each channel's
    4-byte header predictor IS its first output sample; the data
    region is 4-byte words round-robin per channel (so 8 consecutive
    samples of one channel per word), each byte carrying two 4-bit
    codes LOW nibble first (IMA/DVI convention)."""
    preds, idxs, outs = [], [], []
    for ch in range(nch):
        preds.append(struct.unpack_from("<h", block, 4 * ch)[0])
        idxs.append(min(max(block[4 * ch + 2], 0), 88))
        outs.append([preds[ch]])
    pos = 4 * nch
    while pos < len(block):
        for ch in range(nch):
            word = block[pos : pos + 4]
            pos += 4
            if not word:
                break
            pred, index = preds[ch], idxs[ch]
            for byte in word:
                for nib in (byte & 0x0F, byte >> 4):
                    step = _IMA_STEPS[index]
                    vpdiff = step >> 3
                    if nib & 4:
                        vpdiff += step
                    if nib & 2:
                        vpdiff += step >> 1
                    if nib & 1:
                        vpdiff += step >> 2
                    pred = pred - vpdiff if nib & 8 else pred + vpdiff
                    pred = max(-32768, min(32767, pred))
                    index = max(0, min(88, index + _IMA_INDEX[nib]))
                    outs[ch].append(pred)
            preds[ch], idxs[ch] = pred, index
    return outs


def _ima_adpcm_decode(
    raw: bytes, block_align: int, nch: int, n_samples: "int | None"
) -> np.ndarray:
    """IMA ADPCM data chunk → mono float64 in [-1, 1] (multi-channel
    mixed down by mean, the module's convention). Blocks are
    independent (each restarts from its own headers), so a partial
    trailing block decodes as far as its bytes go; ``n_samples`` per
    channel (the WAV ``fact`` chunk) trims codec padding when
    present."""
    chans: list[list[int]] = [[] for _ in range(nch)]
    for off in range(0, len(raw), block_align):
        block = raw[off : off + block_align]
        if len(block) < 4 * nch + 1:
            break
        for ch, got in enumerate(_ima_adpcm_decode_block(block, nch)):
            chans[ch].extend(got)
    n = min(len(c) for c in chans)
    if n_samples is not None:
        n = min(n, n_samples)
    x = np.asarray([c[:n] for c in chans], dtype=np.float64)
    return x.mean(axis=0) / 32768.0


_MS_ADAPT = (
    230, 230, 230, 230, 307, 409, 512, 614,
    768, 614, 512, 409, 307, 230, 230, 230,
)
_MS_COEFS = (
    (256, 0), (512, -256), (0, 0), (192, 64),
    (240, 0), (460, -208), (392, -232),
)


def _ms_adpcm_decode_block(block: bytes, nch: int, coefs) -> "list[list[int]]":
    """One MS ADPCM block → per-channel int16 samples. Header:
    per-channel predictor index (1B each), per-channel initial delta
    (int16), per-channel sample1, per-channel sample2; sample2 is the
    EARLIER of the two seed samples, so output order per channel is
    (sample2, sample1, decoded…). Data nibbles are HIGH nibble first
    and round-robin across channels PER NIBBLE."""
    preds = []
    pos = 0
    for ch in range(nch):
        pi = block[pos]
        pos += 1
        if pi >= len(coefs):
            raise ValueError(f"MS ADPCM predictor index {pi}")
        preds.append(coefs[pi])
    deltas = [
        struct.unpack_from("<h", block, pos + 2 * ch)[0] for ch in range(nch)
    ]
    pos += 2 * nch
    s1 = [
        struct.unpack_from("<h", block, pos + 2 * ch)[0] for ch in range(nch)
    ]
    pos += 2 * nch
    s2 = [
        struct.unpack_from("<h", block, pos + 2 * ch)[0] for ch in range(nch)
    ]
    pos += 2 * nch
    outs = [[s2[ch], s1[ch]] for ch in range(nch)]
    ch = 0
    for byte in block[pos:]:
        for nib in (byte >> 4, byte & 0x0F):
            c1, c2 = preds[ch]
            signed = nib - 16 if nib >= 8 else nib
            # C truncating division by 256 (the MS spec's and real
            # encoders' semantics), NOT >> 8: floor division drifts
            # 1 LSB low on negative products and the error feeds back
            # through s1/s2 (ADVICE r11)
            q = s1[ch] * c1 + s2[ch] * c2
            pred = -((-q) >> 8) if q < 0 else q >> 8
            sample = pred + deltas[ch] * signed
            sample = max(-32768, min(32767, sample))
            outs[ch].append(sample)
            deltas[ch] = max(16, (_MS_ADAPT[nib] * deltas[ch]) >> 8)
            s2[ch], s1[ch] = s1[ch], sample
            ch = (ch + 1) % nch
    return outs


def _ms_adpcm_decode(
    raw: bytes,
    block_align: int,
    nch: int,
    coefs,
    samples_per_block: "int | None",
    n_samples: "int | None",
) -> np.ndarray:
    """MS ADPCM data chunk → mono float64 in [-1, 1] (multi-channel
    mixed down by mean). Blocks restart from their own headers;
    ``samples_per_block`` (fmt extension) bounds each block's output
    and ``n_samples`` (fact chunk) trims the total."""
    chans: list[list[int]] = [[] for _ in range(nch)]
    header = 7 * nch
    for off in range(0, len(raw), block_align):
        block = raw[off : off + block_align]
        if len(block) < header:
            break
        got = _ms_adpcm_decode_block(block, nch, coefs)
        for ch in range(nch):
            g = got[ch]
            if samples_per_block is not None:
                g = g[:samples_per_block]
            chans[ch].extend(g)
    n = min(len(c) for c in chans)
    if n_samples is not None:
        n = min(n, n_samples)
    x = np.asarray([c[:n] for c in chans], dtype=np.float64)
    return x.mean(axis=0) / 32768.0
