"""REAL multimodal decode (functions/codecs.py + the fake=False kernel
paths): pure-stdlib BMP/PPM image decode, PPM re-encode round-trip, and
PCM WAV audio decode — fixtures generated bit-for-bit in the test, no
codec library involved (VERDICT r5 item 5)."""

import io
import math
import struct
import wave

import numpy as np
import pytest

from replicadb_spark.functions import codecs
from replicadb_spark.functions import multimodal as MM


# ---------------------------------------------------------------- fixtures

def make_bmp(rgb: np.ndarray, *, bottom_up: bool = True, bpp: int = 24) -> bytes:
    """Minimal uncompressed BITMAPINFOHEADER BMP encoder (test-only)."""
    h, w = rgb.shape[:2]
    nch = bpp // 8
    row_size = ((bpp * w + 31) // 32) * 4
    px = rgb[:, :, ::-1]  # RGB -> BGR
    if bpp == 32:
        px = np.concatenate([px, np.zeros((h, w, 1), np.uint8)], axis=2)
    rows = np.zeros((h, row_size), np.uint8)
    rows[:, : w * nch] = px.reshape(h, w * nch)
    if bottom_up:
        rows = rows[::-1]
    data = rows.tobytes()
    off = 14 + 40
    header = b"BM" + struct.pack("<IHHI", off + len(data), 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h if bottom_up else -h, 1, bpp, 0,
        len(data), 2835, 2835, 0, 0,
    )
    return header + info + data


def make_ppm(rgb: np.ndarray) -> bytes:
    h, w = rgb.shape[:2]
    return b"P6\n# comment\n%d %d\n255\n" % (w, h) + rgb.tobytes()


def make_wav(samples: np.ndarray, rate: int = 8000, sampwidth: int = 2) -> bytes:
    """samples in [-1, 1] → PCM WAV bytes via the stdlib wave module."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(sampwidth)
        wf.setframerate(rate)
        if sampwidth == 2:
            wf.writeframes((samples * 32767).astype("<i2").tobytes())
        else:
            wf.writeframes(
                ((samples * 127) + 128).clip(0, 255).astype(np.uint8).tobytes()
            )
    return buf.getvalue()


TEST_RGB = np.array(
    [[[255, 0, 0], [0, 255, 0], [0, 0, 255]],
     [[0, 0, 0], [128, 128, 128], [255, 255, 255]]],
    dtype=np.uint8,
)  # 2 rows x 3 cols


# ------------------------------------------------------------- pure codecs

def test_bmp_roundtrip_bottom_up_and_top_down():
    for bottom_up in (True, False):
        out = codecs.decode_bmp(make_bmp(TEST_RGB, bottom_up=bottom_up))
        assert out.shape == (2, 3, 3)
        np.testing.assert_array_equal(out, TEST_RGB)


def test_bmp_32bit_alpha_dropped():
    out = codecs.decode_bmp(make_bmp(TEST_RGB, bpp=32))
    np.testing.assert_array_equal(out, TEST_RGB)


def test_bmp_rejects_bitfields_and_truncated():
    raw = bytearray(make_bmp(TEST_RGB))
    struct.pack_into("<I", raw, 30, 3)  # BI_BITFIELDS
    with pytest.raises(NotImplementedError):
        codecs.decode_bmp(bytes(raw))
    # RLE8 on a 24-bit image is malformed, not unsupported
    struct.pack_into("<I", raw, 30, 1)  # BI_RLE8
    with pytest.raises(ValueError, match="RLE8"):
        codecs.decode_bmp(bytes(raw))
    with pytest.raises(ValueError):
        codecs.decode_bmp(make_bmp(TEST_RGB)[:40])


def make_pal_bmp(
    w: int,
    h: int,
    bpp: int,
    pal_rgb: list,
    pixel_data: bytes,
    *,
    compression: int = 0,
) -> bytes:
    """Paletted BMP builder (test-only): BGRA color table + raw pixel
    stream (pre-padded rows for compression=0, an RLE stream for 1/2)."""
    pal = b"".join(bytes([b, g, r, 0]) for (r, g, b) in pal_rgb)
    off = 14 + 40 + len(pal)
    header = b"BM" + struct.pack("<IHHI", off + len(pixel_data), 0, 0, off)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, bpp, compression, len(pixel_data),
        2835, 2835, len(pal_rgb), 0,
    )
    return header + info + pal + pixel_data


PAL8 = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 9, 9), (7, 7, 7), (5, 5, 5)]


def test_bmp_rle8_runs_absolute_delta_and_eol():
    """BI_RLE8: encoded runs, absolute mode (word-aligned), delta skip
    (undefined pixels → index 0), end-of-line, end-of-bitmap."""
    # stream rows are bottom-up: first stream row = BOTTOM image row
    stream = bytes(
        [3, 1]            # run: 1,1,1
        + [0, 3, 2, 0, 1, 0]  # absolute: 2,0,1 (+1 pad byte to word)
        + [0, 0]          # end of line
        + [2, 2]          # run: 2,2
        + [0, 2, 2, 0]    # delta: skip 2 right (undefined → 0)
        + [2, 5]          # run: 5,5
        + [0, 1]          # end of bitmap
    )
    out = codecs.decode_bmp(make_pal_bmp(6, 2, 8, PAL8, stream, compression=1))
    pal = np.array(PAL8, np.uint8)
    want_idx = np.array(
        [[2, 2, 0, 0, 5, 5],   # top row = second stream row
         [1, 1, 1, 2, 0, 1]],  # bottom row = first stream row
    )
    np.testing.assert_array_equal(out, pal[want_idx])


def test_bmp_rle4_nibble_runs_and_absolute():
    """BI_RLE4: run pixels alternate the byte's high/low nibbles;
    absolute mode packs two pixels per byte, word-aligned."""
    stream = bytes(
        [5, 0x12]          # run of 5: 1,2,1,2,1
        + [0, 3, 0x34, 0x50]  # absolute 3 px: 3,4,5 (2 bytes, aligned)
        + [0, 0]           # end of line
        + [8, 0x05]        # run of 8: 0,5,0,5,...
        + [0, 1]           # end of bitmap
    )
    out = codecs.decode_bmp(make_pal_bmp(8, 2, 4, PAL8, stream, compression=2))
    pal = np.array(PAL8, np.uint8)
    want_idx = np.array(
        [[0, 5, 0, 5, 0, 5, 0, 5],
         [1, 2, 1, 2, 1, 3, 4, 5]],
    )
    np.testing.assert_array_equal(out, pal[want_idx])


def test_bmp_uncompressed_4bit_and_1bit():
    # 4-bit: 3 px/row → 2 data bytes, padded to 4; rows bottom-up
    rows4 = bytes([0x12, 0x00, 0, 0]) + bytes([0x30, 0x40, 0, 0])
    out4 = codecs.decode_bmp(make_pal_bmp(3, 2, 4, PAL8, rows4))
    pal = np.array(PAL8, np.uint8)
    np.testing.assert_array_equal(out4, pal[np.array([[3, 0, 4], [1, 2, 0]])])
    # 1-bit: MSB-first; 0b10110000 → px 1,0,1,1 (w=4)
    rows1 = bytes([0b10110000, 0, 0, 0])
    out1 = codecs.decode_bmp(
        make_pal_bmp(4, 1, 1, [(0, 0, 0), (255, 255, 255)], rows1)
    )
    np.testing.assert_array_equal(
        out1, np.array([[[0, 0, 0], [255, 255, 255]][i]
                        for i in [1, 0, 1, 1]], np.uint8).reshape(1, 4, 3)
    )


def test_ppm_decode_with_comment_header():
    np.testing.assert_array_equal(codecs.decode_ppm(make_ppm(TEST_RGB)), TEST_RGB)


def test_ppm_maxval_rescaled_to_full_range():
    # Netpbm samples are relative to maxval: a maxval=15 image whose
    # samples hit 15 must decode to 255, not stay near-black
    vals = np.array([[[15, 0, 7]]], dtype=np.uint8)
    payload = b"P6\n1 1\n15\n" + vals.tobytes()
    out = codecs.decode_ppm(payload)
    np.testing.assert_array_equal(out, [[[255, 0, 119]]])
    # gray variant (P5) through the same rescale
    pgm = b"P5\n2 1\n15\n" + bytes([15, 8])
    out = codecs.decode_ppm(pgm)
    np.testing.assert_array_equal(out[0, :, 0], [255, 136])


def test_ppm_16bit_samples():
    """maxval > 255: two-byte big-endian samples, rescaled by maxval —
    65535 → 255, 32768 → 128; the P5 gray variant replicates."""
    import struct as _s

    payload = (b"P6\n2 1\n65535\n"
               + _s.pack(">6H", 65535, 0, 32768, 257, 514, 65535))
    out = codecs.decode_ppm(payload)
    np.testing.assert_array_equal(
        out, [[[255, 0, 128], [1, 2, 255]]]
    )
    pgm = b"P5\n1 1\n1023\n" + _s.pack(">H", 1023)
    np.testing.assert_array_equal(codecs.decode_ppm(pgm), [[[255, 255, 255]]])
    with pytest.raises(ValueError, match="maxval"):
        codecs.decode_ppm(b"P6\n1 1\n70000\n" + b"\x00" * 6)


def test_ppm_encode_decode_roundtrip():
    np.testing.assert_array_equal(
        codecs.decode_ppm(codecs.encode_ppm(TEST_RGB)), TEST_RGB
    )


def test_sniff_and_dispatch():
    assert codecs.sniff_format(make_bmp(TEST_RGB)) == "bmp"
    assert codecs.sniff_format(make_ppm(TEST_RGB)) == "ppm"
    assert codecs.sniff_format(make_wav(np.zeros(8))) == "wav"
    assert codecs.sniff_format(b"\xff\xd8\xff\xe0") == "jpeg"
    # baseline JPEG decodes for real now (functions/jpeg.py); a sniffed
    # but malformed JPEG payload is a data error, not a missing codec
    with pytest.raises(ValueError):
        codecs.decode_image(b"\xff\xd8\xff\xe0 jpeg")
    # GIF decodes for real now; a sniffed-but-malformed GIF payload is
    # a data error, not a missing codec
    with pytest.raises(ValueError):
        codecs.decode_image(b"GIF89a not a real gif")
    with pytest.raises(NotImplementedError):
        codecs.decode_image(b"\x00\x00unknown container")


def test_resize_nearest_identity_and_downscale():
    np.testing.assert_array_equal(codecs.resize_nearest(TEST_RGB, 3, 2), TEST_RGB)
    small = codecs.resize_nearest(TEST_RGB, 1, 1)
    assert small.shape == (1, 1, 3)
    # pixel-center rule: center of 2x3 → row 1, col 1 → gray 128
    np.testing.assert_array_equal(small[0, 0], [128, 128, 128])


def test_wav_decode_sine_rms_and_rate():
    t = np.arange(8000) / 8000.0
    sine = 0.5 * np.sin(2 * math.pi * 440 * t)
    x, rate = codecs.decode_wav(make_wav(sine, rate=8000))
    assert rate == 8000 and len(x) == 8000
    # RMS of a 0.5-amplitude sine = 0.5/sqrt(2)
    assert np.sqrt((x ** 2).mean()) == pytest.approx(0.5 / math.sqrt(2), rel=1e-3)


def test_wav_8bit_decode():
    x, rate = codecs.decode_wav(make_wav(np.array([0.0, 0.5, -0.5]), sampwidth=1))
    assert rate == 8000
    assert x[0] == pytest.approx(0.0, abs=0.01)
    assert x[1] == pytest.approx(0.5, abs=0.01)


# ------------------------------------------------- Spark kernels, fake=False

def test_extract_image_features_real(spark):
    rows = [
        (1, "image", "image/bmp", bytearray(make_bmp(TEST_RGB)), None, None, None),
        (2, "image", "image/x-ppm", bytearray(make_ppm(TEST_RGB)), None, None, None),
        (3, "image", None, None, None, None, None),
    ]
    media = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    got = {
        r["media_id"]: r
        for r in MM.extract_image_features(media, feat_dim=4, fake=False).collect()
    }
    for mid in (1, 2):
        assert (got[mid]["width"], got[mid]["height"]) == (3, 2)
        assert got[mid]["mean_byte"] == pytest.approx(float(TEST_RGB.mean()))
        assert sum(got[mid]["feature"]) == pytest.approx(1.0)
        assert len(got[mid]["feature"]) == 4
    # identical pixels through two different containers → identical features
    assert got[1]["feature"] == got[2]["feature"]
    assert got[3]["width"] is None and got[3]["n_bytes"] == 0


def test_resize_images_real_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, bytearray(make_bmp(TEST_RGB)))], "media_id long, payload binary"
    )
    out = MM.resize_images(df, width=6, height=4, fake=False).collect()[0]
    resized = codecs.decode_ppm(bytes(out["payload"]))
    assert resized.shape == (4, 6, 3)
    np.testing.assert_array_equal(resized, codecs.resize_nearest(TEST_RGB, 6, 4))


def test_extract_audio_features_real(spark):
    t = np.arange(4000) / 8000.0
    sine = 0.5 * np.sin(2 * math.pi * 440 * t)  # 0.5 s
    df = spark.createDataFrame(
        [(1, bytearray(make_wav(sine))), (2, None, )],
        "media_id long, payload binary",
    ).withColumn("duration_ms", F_lit_long(0))
    got = {
        r["media_id"]: r
        for r in MM.extract_audio_features(df, fake=False).collect()
    }
    assert got[1]["duration_ms"] == 500
    assert got[1]["rms"] == pytest.approx(0.5 / math.sqrt(2), rel=1e-3)
    assert got[1]["peak"] == pytest.approx(0.5 * 32768, rel=1e-2)
    assert got[2]["duration_ms"] == 0 and got[2]["rms"] == 0.0


def test_extract_audio_features_real_8bit_peak_scale(spark):
    # peak reports TRUE raw magnitude at the source bit depth: an
    # 8-bit 0.5-amplitude sample peaks at ~64 (byte deviation from the
    # 128 center), not ~16384 (ADVICE r6: was scaled by 2^15)
    df = spark.createDataFrame(
        [(1, bytearray(make_wav(np.array([0.0, 0.5, -0.25]), sampwidth=1)), 0)],
        "media_id long, payload binary, duration_ms long",
    )
    got = MM.extract_audio_features(df, fake=False).collect()[0]
    assert got["peak"] == pytest.approx(64, abs=2)


def test_extract_audio_features_real_rejects_nonwav(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"ID3 mp3 frame"), 0)],
        "media_id long, payload binary, duration_ms long",
    )
    with pytest.raises(Exception, match="ffmpeg|librosa|NotImplementedError"):
        MM.extract_audio_features(df, fake=False).collect()


def F_lit_long(v):
    from pyspark.sql import functions as F

    return F.lit(v).cast("long")


def test_bmp_8bit_palette_lookup():
    """8-bit BMP pixels are palette indices, not luminance — a
    non-grayscale color table must come through the lookup."""
    # palette: index 0 = red, 1 = green, 2 = blue (stored BGRA)
    pal = bytes([0, 0, 255, 0,  0, 255, 0, 0,  255, 0, 0, 0])
    w, h = 3, 1
    row = bytes([0, 1, 2]) + b"\0"  # padded to 4
    off = 14 + 40 + len(pal)
    header = b"BM" + struct.pack("<IHHI", off + len(row), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 8, 0, len(row),
                       2835, 2835, 3, 0)
    out = codecs.decode_bmp(header + info + pal + row)
    np.testing.assert_array_equal(
        out, [[[255, 0, 0], [0, 255, 0], [0, 0, 255]]]
    )


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _filter_rows(raw_rows: np.ndarray, filters: list[int], bpp: int) -> bytes:
    """Apply the requested filter per scanline FORWARD (the encoder
    side of spec §9, byte-wise with pixel lag bpp) so the decoder must
    invert each."""
    h, stride = raw_rows.shape
    scan = b""
    prev = np.zeros(stride, np.int32)
    for y in range(h):
        cur = raw_rows[y].astype(np.int32)
        f = filters[y]
        enc = cur.copy()
        for x in range(stride):
            a = int(cur[x - bpp]) if x >= bpp else 0
            b = int(prev[x])
            c = int(prev[x - bpp]) if x >= bpp else 0
            if f == 1:
                enc[x] = (cur[x] - a) & 0xFF
            elif f == 2:
                enc[x] = (cur[x] - b) & 0xFF
            elif f == 3:
                enc[x] = (cur[x] - ((a + b) >> 1)) & 0xFF
            elif f == 4:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc[x] = (cur[x] - pr) & 0xFF
        scan += bytes([f]) + enc.astype(np.uint8).tobytes()
        prev = cur
    return scan


def _make_png(raw_rows: np.ndarray, filters: list[int], ctype: int = 2,
              plte: bytes | None = None, depth: int = 8,
              interlace: int = 0) -> bytes:
    """Hand-built PNG from pre-packed scanline BYTES (one row per
    scanline; 16-bit samples big-endian, sub-byte samples MSB-packed)."""
    import zlib

    h, stride = raw_rows.shape
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    bpp = max(1, channels * depth // 8)
    w = stride * 8 // (channels * depth)
    scan = _filter_rows(raw_rows, filters, bpp)
    ihdr = struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, interlace)
    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    if plte is not None:
        out += _png_chunk(b"PLTE", plte)
    return out + _png_chunk(b"IDAT", zlib.compress(scan)) + _png_chunk(b"IEND", b"")


def test_png_roundtrip_all_filter_types():
    rng = np.random.RandomState(7)
    rgb = rng.randint(0, 256, size=(5, 4, 3), dtype=np.uint8)
    raw = rgb.reshape(5, 12)
    # one scanline per filter type (0,1,2,3,4)
    png = _make_png(raw, [0, 1, 2, 3, 4])
    assert codecs.sniff_format(png) == "png"
    np.testing.assert_array_equal(codecs.decode_png(png), rgb)
    # encoder round-trip (filter 0 everywhere)
    np.testing.assert_array_equal(codecs.decode_png(codecs.encode_png(rgb)), rgb)


def test_png_gray_palette_and_alpha():
    # grayscale (ctype 0) replicates to 3 channels
    g = np.array([[0, 128, 255]], dtype=np.uint8)
    png = _make_png(g, [0], ctype=0)
    np.testing.assert_array_equal(codecs.decode_png(png), np.repeat(g[:, :, None], 3, 2))
    # palette (ctype 3): index rows through PLTE
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R,G,B entries
    idx = np.array([[0, 1, 2]], dtype=np.uint8)
    png = _make_png(idx, [0], ctype=3, plte=plte)
    np.testing.assert_array_equal(
        codecs.decode_png(png), [[[255, 0, 0], [0, 255, 0], [0, 0, 255]]]
    )
    # RGBA (ctype 6): alpha dropped
    rgba = np.array([[10, 20, 30, 99, 40, 50, 60, 0]], dtype=np.uint8)
    png = _make_png(rgba, [4], ctype=6)
    np.testing.assert_array_equal(
        codecs.decode_png(png), [[[10, 20, 30], [40, 50, 60]]]
    )
    # gray+alpha (ctype 4)
    ga = np.array([[77, 255, 200, 0]], dtype=np.uint8)
    png = _make_png(ga, [2], ctype=4)
    np.testing.assert_array_equal(
        codecs.decode_png(png), [[[77, 77, 77], [200, 200, 200]]]
    )


def test_png_16bit_rgb_and_gray():
    """16-bit samples (big-endian pairs) decode and fold to the high
    byte; filtering is byte-wise with bpp = channels*2."""
    rng = np.random.RandomState(3)
    hi = rng.randint(0, 256, size=(3, 4, 3), dtype=np.uint8)
    samples16 = (hi.astype(np.uint16) << 8) | rng.randint(
        0, 256, size=(3, 4, 3)
    ).astype(np.uint16)
    rows = samples16.reshape(3, 12).astype(">u2").view(np.uint8)
    png = _make_png(rows, [0, 2, 4], ctype=2, depth=16)
    np.testing.assert_array_equal(codecs.decode_png(png), hi)
    # 16-bit grayscale replicates the high byte to 3 channels
    g16 = samples16[:, :, 0]
    rows = g16.reshape(3, 4).astype(">u2").view(np.uint8)
    png = _make_png(rows, [0, 1, 3], ctype=0, depth=16)
    np.testing.assert_array_equal(
        codecs.decode_png(png), np.repeat(hi[:, :, :1], 3, axis=2)
    )


def test_png_low_depth_gray_and_palette():
    # 2-bit gray: MSB-first packing — 0b10 0b11 0b00 0b00 → samples
    # 2,3,0,0, rescaled by 255/3 = 85 → 170,255,0,0
    bits = np.array([[0b10110000]], dtype=np.uint8)
    png = _make_png(bits, [0], ctype=0, depth=2)
    got = codecs.decode_png(png)
    np.testing.assert_array_equal(got[0, :, 0], [170, 255, 0, 0])
    # 1-bit gray: 0/255 bilevel
    png = _make_png(np.array([[0b10100000]], dtype=np.uint8), [0],
                    ctype=0, depth=1)
    np.testing.assert_array_equal(
        codecs.decode_png(png)[0, :, 0], [255, 0, 255, 0, 0, 0, 0, 0]
    )
    # 4-bit palette indices
    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 9, 9, 9])
    idx = np.array([[0x01, 0x23]], dtype=np.uint8)  # indices 0,1,2,3 (w=4)
    png = _make_png(idx, [0], ctype=3, plte=plte, depth=4)
    np.testing.assert_array_equal(
        codecs.decode_png(png),
        [[[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]]],
    )


def test_png_adam7_interlace_roundtrip():
    """Adam7: each pass is its own filtered scanline run; the decoder
    scatters passes back onto the (x0+i·dx, y0+j·dy) grids."""
    import zlib

    rng = np.random.RandomState(11)
    for h, w in ((1, 1), (2, 3), (8, 8), (9, 10), (5, 16)):
        rgb = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        passes = [(0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
                  (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2)]
        scan = b""
        for x0, y0, dx, dy in passes:
            sub = rgb[y0::dy, x0::dx]
            hp, wp = sub.shape[:2]
            if hp == 0 or wp == 0:
                continue
            rows = sub.reshape(hp, wp * 3)
            filters = [int(rng.randint(0, 5)) for _ in range(hp)]
            scan += _filter_rows(rows, filters, 3)
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1)
        png = (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
               + _png_chunk(b"IDAT", zlib.compress(scan))
               + _png_chunk(b"IEND", b""))
        np.testing.assert_array_equal(codecs.decode_png(png), rgb)


def test_png_invalid_inputs():
    with pytest.raises(ValueError):
        codecs.decode_png(b"not a png")
    # depth/color-type combination outside the spec
    ihdr = struct.pack(">IIBBBBB", 1, 1, 4, 2, 0, 0, 0)
    bad = (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
           + _png_chunk(b"IDAT", b"x") + _png_chunk(b"IEND", b""))
    with pytest.raises(ValueError):
        codecs.decode_png(bad)
    # truncated pixel data still dies by name
    import zlib

    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0)
    short = (b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
             + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 5))
             + _png_chunk(b"IEND", b""))
    with pytest.raises(ValueError, match="truncated"):
        codecs.decode_png(short)


def test_extract_image_features_real_png(spark):
    """The same pixels through BMP and PNG containers produce identical
    feature rows — PNG is now a REAL decode path end-to-end in Spark."""
    png = codecs.encode_png(TEST_RGB)
    rows = [
        (1, "image", "image/bmp", bytearray(make_bmp(TEST_RGB)), None, None, None),
        (2, "image", "image/png", bytearray(png), None, None, None),
    ]
    media = spark.createDataFrame(rows, MM.MEDIA_SCHEMA)
    got = {
        r["media_id"]: r
        for r in MM.extract_image_features(media, feat_dim=4, fake=False).collect()
    }
    assert (got[2]["width"], got[2]["height"]) == (3, 2)
    assert got[1]["feature"] == got[2]["feature"]
    assert got[1]["mean_byte"] == got[2]["mean_byte"]


def test_png_random_filter_fuzz():
    """30 random images, every scanline with a random filter type: the
    decoder inverts whatever the encoder side chose, bit-for-bit."""
    rng = np.random.RandomState(99)
    for _ in range(30):
        h, w = int(rng.randint(1, 9)), int(rng.randint(1, 9))
        rgb = rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)
        filters = [int(rng.randint(0, 5)) for _ in range(h)]
        png = _make_png(rgb.reshape(h, w * 3), filters)
        np.testing.assert_array_equal(codecs.decode_png(png), rgb)


def make_float_wav(samples: np.ndarray, rate: int = 8000, bits: int = 32) -> bytes:
    """IEEE-float WAV builder (format code 3) — the stdlib wave module
    can't write these, so the RIFF framing is laid out by hand."""
    data = samples.astype(f"<f{bits // 8}").tobytes()
    fmt = struct.pack("<HHIIHH", 3, 1, rate, rate * bits // 8, bits // 8, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_wav_float32_and_float64_decode():
    t = np.linspace(0, 1, 800, endpoint=False)
    sig = (0.5 * np.sin(2 * np.pi * 440 * t))
    for bits in (32, 64):
        x, rate, sw = codecs.decode_wav_full(make_float_wav(sig, bits=bits))
        assert rate == 8000 and sw == bits // 8
        tol = 1e-6 if bits == 32 else 0.0
        assert np.abs(x - sig).max() <= tol


def test_wav_24bit_pcm_decode():
    t = np.linspace(0, 1, 400, endpoint=False)
    sig = 0.25 * np.sin(2 * np.pi * 220 * t)
    ints = np.clip(np.rint(sig * 8388608), -8388608, 8388607).astype(np.int64)
    frames = b"".join(
        int(v & 0xFFFFFF).to_bytes(3, "little") for v in ints
    )
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(3)
        wf.setframerate(8000)
        wf.writeframes(frames)
    x, rate, sw = codecs.decode_wav_full(buf.getvalue())
    assert (rate, sw) == (8000, 3)
    np.testing.assert_allclose(x, ints / 8388608.0, atol=0)


def test_wav_compressed_formats_stay_honest():
    # G.711 and mono IMA ADPCM decode for real now; MS ADPCM (format
    # code 2) and STEREO IMA remain honest gates — raise, not garbage
    data = bytes(64)

    def wav(code, nch, bits, align=256):
        fmt = struct.pack("<HHIIHH", code, nch, 8000, 4055, align, bits)
        body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        body += b"data" + struct.pack("<I", len(data)) + data
        return b"RIFF" + struct.pack("<I", len(body)) + body

    with pytest.raises(NotImplementedError, match="format code 85"):
        codecs.decode_wav_full(wav(0x55, 1, 0))  # MP3-in-WAV stays gated


# ---------------------------------------------------------------- GIF + G.711


def _lzw_encode(indices, mcs):
    """Greedy longest-match GIF LZW encoder (test-side independent
    implementation): clear, matches, EOI; grows the code width exactly
    when the NEXT table entry would overflow it."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    width = mcs + 1
    out = bytearray()
    acc = nbits = 0

    def emit(code, w):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += w
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear, width)
    run = b""
    for px in bytes(indices):
        cand = run + bytes([px])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            # the decoder appends one entry per data code AFTER the
            # first (its table = our next_code - 1), and widens when
            # ITS table reaches 2^width — mirror that exact point
            # (giflib/PIL convention)
            if next_code == (1 << width) + 1 and width < 12:
                width += 1
        run = bytes([px])
    if run:
        emit(table[run], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_bytes(w, h, palette, frames, bg=0, interlace_frame=None):
    """Assemble a GIF89a: global palette (padded to a power of two),
    one image block per (x, y, iw, ih, indices, gce) frame."""
    import struct as st

    n = 2
    while n < len(palette):
        n *= 2
    pal = list(palette) + [(0, 0, 0)] * (n - len(palette))
    depth = n.bit_length() - 2  # field stores size-1 exponent
    out = bytearray(b"GIF89a")
    out += st.pack("<HHBBB", w, h, 0x80 | depth, bg, 0)
    for r, g, b in pal:
        out += bytes([r, g, b])
    for i, (x, y, iw, ih, idx, gce) in enumerate(frames):
        if gce is not None:
            flags = (gce.get("disposal", 0) << 2) | (
                1 if gce.get("transparent") is not None else 0
            )
            out += bytes([0x21, 0xF9, 4, flags])
            out += st.pack("<H", gce.get("delay_cs", 0))
            out += bytes([gce.get("transparent") or 0, 0])
        ifl = 0x40 if interlace_frame == i else 0
        out += b"\x2c" + st.pack("<HHHHB", x, y, iw, ih, ifl)
        mcs = max(2, (n - 1).bit_length())
        out += bytes([mcs])
        data = _lzw_encode(bytes(idx), mcs)
        for off in range(0, len(data), 255):
            chunk = data[off : off + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)


PAL4 = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (255, 255, 255)]


def test_gif_single_frame_roundtrip():
    from replicadb_spark.functions.codecs import decode_gif, sniff_format

    idx = [0, 1, 2, 3, 3, 2, 1, 0, 0, 0, 1, 1]  # 4x3
    payload = _gif_bytes(4, 3, PAL4, [(0, 0, 4, 3, idx, None)])
    assert sniff_format(payload) == "gif"
    rgb = decode_gif(payload)
    assert rgb.shape == (3, 4, 3)
    flat = rgb.reshape(-1, 3)
    for i, want in enumerate(idx):
        assert tuple(flat[i]) == PAL4[want], i


def test_gif_lzw_dictionary_growth_and_wide_codes():
    """A long repetitive raster forces real dictionary growth (codes
    beyond the literal range, incl. the code==next_code self-reference)
    and at least one width increase."""
    import numpy as np

    from replicadb_spark.functions.codecs import decode_gif

    rng = [0, 0, 1, 1, 2, 2, 3, 3] * 32  # 16x16 with long runs
    payload = _gif_bytes(16, 16, PAL4, [(0, 0, 16, 16, rng, None)])
    rgb = decode_gif(payload)
    want = np.array([PAL4[i] for i in rng], dtype="uint8").reshape(16, 16, 3)
    assert (rgb == want).all()


def test_gif_interlaced_rows_reorder():
    import numpy as np

    from replicadb_spark.functions.codecs import decode_gif

    # 8 rows, 2 cols; dest row r gets color index r % 4. Stored order
    # for interlace: passes 0,8 / 4,8 / 2,4 / 1,2 → dest rows
    # [0,4,2,6,1,3,5,7] — supply indices in THAT storage order.
    dest_order = [0, 4, 2, 6, 1, 3, 5, 7]
    stored = []
    for r in dest_order:
        stored += [r % 4, r % 4]
    payload = _gif_bytes(
        2, 8, PAL4, [(0, 0, 2, 8, stored, None)], interlace_frame=0
    )
    rgb = decode_gif(payload)
    want = np.array(
        [[PAL4[r % 4]] * 2 for r in range(8)], dtype="uint8"
    )
    assert (rgb == want).all()


def test_gif_animation_transparency_and_disposal():
    import numpy as np

    from replicadb_spark.functions.codecs import decode_gif_frames

    # frame 1: full 4x4 of color 0; frame 2: 2x2 patch at (1,1) where
    # one pixel is transparent (shows frame 1 through), disposal=2
    # (restore background = color 0 here, bg index 0); frame 3: full
    # color 1 — must not show the patch.
    f1 = [0] * 16
    f2 = [3, 2, 2, 2]
    frames = [
        (0, 0, 4, 4, f1, None),
        (1, 1, 2, 2, f2, {"disposal": 2, "transparent": 3}),
        (0, 0, 4, 4, [1] * 16, None),
    ]
    payload = _gif_bytes(4, 4, PAL4, frames)
    out = decode_gif_frames(payload)
    assert len(out) == 3
    assert (out[0] == np.array(PAL4[0], dtype="uint8")).all()
    # frame 2: patch visible except the transparent corner
    assert tuple(out[1][1, 1]) == PAL4[0]  # transparent → frame 1 shows
    assert tuple(out[1][1, 2]) == PAL4[2]
    assert tuple(out[1][2, 1]) == PAL4[2]
    assert tuple(out[1][0, 0]) == PAL4[0]
    assert (out[2] == np.array(PAL4[1], dtype="uint8")).all()


def _mulaw_ref(b):
    u = ~b & 0xFF
    t = ((u & 0x0F) << 3) + 0x84
    t <<= (u & 0x70) >> 4
    return (0x84 - t) if (u & 0x80) else (t - 0x84)


def _alaw_ref(b):
    a = b ^ 0x55
    t = (a & 0x0F) << 4
    seg = (a & 0x70) >> 4
    if seg == 0:
        t += 8
    elif seg == 1:
        t += 0x108
    else:
        t = (t + 0x108) << (seg - 1)
    return t if (a & 0x80) else -t


def test_g711_expansion_matches_scalar_reference_everywhere():
    import numpy as np

    from replicadb_spark.functions.codecs import _alaw_decode, _mulaw_decode

    all_bytes = np.arange(256, dtype=np.uint8)
    mu = _mulaw_decode(all_bytes)
    al = _alaw_decode(all_bytes)
    for b in range(256):
        assert mu[b] == _mulaw_ref(b) / 32768.0, f"mu-law byte {b}"
        assert al[b] == _alaw_ref(b) / 32768.0, f"A-law byte {b}"
    # canonical identities: 0xFF is mu-law digital zero; full scale hit
    assert mu[0xFF] == 0.0
    assert abs(mu).max() * 32768 == 32124
    assert abs(al).max() * 32768 == 32256


def _g711_wav(code: int, data: bytes, rate=8000, nch=1) -> bytes:
    import struct as st

    fmt = st.pack("<HHIIHH", code, nch, rate, rate * nch, nch, 8)
    body = b"WAVE" + b"fmt " + st.pack("<I", len(fmt)) + fmt
    body += b"data" + st.pack("<I", len(data)) + data
    if len(data) & 1:
        body += b"\x00"
    return b"RIFF" + st.pack("<I", len(body)) + body


def test_g711_wav_decode_end_to_end():
    from replicadb_spark.functions.codecs import decode_wav_full

    data = bytes([0xFF, 0x7F, 0x00, 0x80, 0x55, 0xAA])
    x, rate, sw = decode_wav_full(_g711_wav(7, data))
    assert rate == 8000 and sw == 1 and len(x) == 6
    assert x[0] == 0.0  # mu-law digital zero
    assert x[0] == _mulaw_ref(0xFF) / 32768.0
    xa, _, _ = decode_wav_full(_g711_wav(6, data))
    assert xa[0] == _alaw_ref(0xFF) / 32768.0
    # stereo mixdown path
    xs, _, _ = decode_wav_full(_g711_wav(7, data, nch=2))
    assert len(xs) == 3


# -------------------------------------------------------------------- TIFF


def _tiff_lzw_encode(data: bytes) -> bytes:
    """Greedy TIFF-flavor LZW encoder (test-side): MSB-first packing,
    256/257 clear/EOI, width grows in step with the decoder's EARLY
    change (decoder table = our next_code - 1; it widens when its
    table reaches 2^width - 1)."""
    CLEAR, EOI = 256, 257
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    out = bytearray()
    acc = nbits = 0

    def emit(code, w):
        nonlocal acc, nbits
        acc = (acc << w) | code
        nbits += w
        while nbits >= 8:
            out.append((acc >> (nbits - 8)) & 0xFF)
            nbits -= 8

    emit(CLEAR, width)
    run = b""
    for px in data:
        cand = run + bytes([px])
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        run = bytes([px])
    if run:
        emit(table[run], width)
    emit(EOI, width)
    if nbits:
        out.append((acc << (8 - nbits)) & 0xFF)
    return bytes(out)


def _packbits_encode(data: bytes) -> bytes:
    """Naive PackBits: runs of >=3 as repeats, else literal chunks."""
    out = bytearray()
    i = 0
    while i < len(data):
        j = i
        while j < len(data) and j - i < 127 and data[j] == data[i]:
            j += 1
        if j - i >= 3:
            out += bytes([257 - (j - i), data[i]])
            i = j
        else:
            k = i
            while (
                k < len(data)
                and k - i < 127
                and not (
                    k + 2 < len(data)
                    and data[k] == data[k + 1] == data[k + 2]
                )
            ):
                k += 1
            out += bytes([k - i - 1]) + data[i:k]
            i = k
    return bytes(out)


def _tiff_bytes(order, w, h, photo, spp, bits, comp, rows_per_strip,
                strips, extra_tags=()):
    """Assemble a single-IFD TIFF: header, strip data, out-of-line
    values, IFD. ``strips`` are ALREADY encoded per ``comp``."""
    import struct as st

    e = "<" if order == "II" else ">"
    out = bytearray(b"II*\x00" if order == "II" else b"MM\x00*")
    out += b"\x00\x00\x00\x00"  # IFD offset, patched below
    offs = []
    for sdat in strips:
        offs.append(len(out))
        out += sdat
    entries = [
        (256, 3, [w]), (257, 3, [h]), (258, 3, list(bits)),
        (259, 3, [comp]), (262, 3, [photo]), (273, 4, offs),
        (277, 3, [spp]), (278, 3, [rows_per_strip]),
        (279, 4, [len(s) for s in strips]),
    ] + list(extra_tags)
    entries.sort()
    tsz = {1: 1, 3: 2, 4: 4}
    tfm = {1: "B", 3: "H", 4: "I"}
    ext = bytearray()
    ext_base = len(out)
    ifd_off = None
    packed = []
    for tag, typ, vals in entries:
        size = tsz[typ] * len(vals)
        if size <= 4:
            vb = st.pack(e + str(len(vals)) + tfm[typ], *vals).ljust(4, b"\x00")
        else:
            vb = None  # out-of-line; offset assigned now
            voff = ext_base + len(ext)
            ext += st.pack(e + str(len(vals)) + tfm[typ], *vals)
            vb = st.pack(e + "I", voff)
        packed.append(st.pack(e + "HHI", tag, typ, len(vals)) + vb)
    out += ext
    ifd_off = len(out)
    out += st.pack(e + "H", len(packed))
    for pb in packed:
        out += pb
    out += st.pack(e + "I", 0)
    st.pack_into(e + "I", out, 4, ifd_off)
    return bytes(out)


TIFF_RGB = np.array(
    [[[255, 0, 0], [0, 255, 0], [0, 0, 255], [10, 20, 30]],
     [[0, 0, 0], [128, 128, 128], [255, 255, 255], [1, 2, 3]],
     [[50, 60, 70], [5, 5, 5], [200, 100, 0], [0, 200, 100]]],
    dtype=np.uint8,
)  # 3 rows x 4 cols


def test_tiff_uncompressed_both_endians_multi_strip():
    for order in ("II", "MM"):
        raw = TIFF_RGB.tobytes()
        stride = 4 * 3
        strips = [raw[:2 * stride], raw[2 * stride:]]  # 2 rows + 1 row
        payload = _tiff_bytes(order, 4, 3, 2, 3, (8, 8, 8), 1, 2, strips)
        assert codecs.sniff_format(payload) == "tiff"
        out = codecs.decode_tiff(payload)
        np.testing.assert_array_equal(out, TIFF_RGB)
        np.testing.assert_array_equal(codecs.decode_image(payload), TIFF_RGB)


def test_tiff_packbits_gray_and_whiteiszero():
    g = np.array([[0, 0, 0, 0, 7, 9], [255, 255, 255, 255, 255, 1]],
                 dtype=np.uint8)
    strip = _packbits_encode(g.tobytes())
    payload = _tiff_bytes("II", 6, 2, 1, 1, (8,), 32773, 2, [strip])
    out = codecs.decode_tiff(payload)
    np.testing.assert_array_equal(out, np.repeat(g[:, :, None], 3, axis=2))
    # WhiteIsZero inverts
    payload0 = _tiff_bytes("II", 6, 2, 0, 1, (8,), 32773, 2, [strip])
    np.testing.assert_array_equal(
        codecs.decode_tiff(payload0),
        np.repeat((255 - g)[:, :, None], 3, axis=2),
    )


def test_tiff_lzw_with_horizontal_predictor():
    # predictor 2: strip stores per-row horizontal deltas mod 256
    arr = TIFF_RGB.astype(np.int64)
    deltas = arr.copy()
    deltas[:, 1:] = (arr[:, 1:] - arr[:, :-1]) & 0xFF
    strip = _tiff_lzw_encode(deltas.astype(np.uint8).tobytes())
    payload = _tiff_bytes(
        "II", 4, 3, 2, 3, (8, 8, 8), 5, 3, [strip],
        extra_tags=[(317, 3, [2])],
    )
    np.testing.assert_array_equal(codecs.decode_tiff(payload), TIFF_RGB)


def test_tiff_lzw_long_runs_exercise_table_growth():
    # >256 distinct pairs → real dictionary growth beyond 9-bit codes
    g = np.tile(np.arange(256, dtype=np.uint8), 24).reshape(8, 768)
    strip = _tiff_lzw_encode(g.tobytes())
    payload = _tiff_bytes("II", 768, 8, 1, 1, (8,), 5, 8, [strip])
    out = codecs.decode_tiff(payload)
    np.testing.assert_array_equal(out[:, :, 0], g)


def test_tiff_palette_color():
    pal_r = [65535, 0, 0, 30000]
    pal_g = [0, 65535, 0, 20000]
    pal_b = [0, 0, 65535, 10000]
    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    payload = _tiff_bytes(
        "MM", 2, 2, 3, 1, (8,), 1, 2, [idx.tobytes()],
        extra_tags=[(320, 3, pal_r + pal_g + pal_b)],
    )
    out = codecs.decode_tiff(payload)
    want = np.array(
        [[[255, 0, 0], [0, 255, 0]],
         [[0, 0, 255], [30000 >> 8, 20000 >> 8, 10000 >> 8]]],
        dtype=np.uint8,
    )
    np.testing.assert_array_equal(out, want)


def test_tiff_16bit_scales_down():
    hi = (TIFF_RGB.astype(np.uint16) << 8) | 0x7F
    for order, en in (("II", "<"), ("MM", ">")):
        payload = _tiff_bytes(
            order, 4, 3, 2, 3, (16, 16, 16), 1, 3,
            [hi.astype(en + "u2").tobytes()],
        )
        np.testing.assert_array_equal(codecs.decode_tiff(payload), TIFF_RGB)


def test_tiff_honest_gates():
    strip = TIFF_RGB.tobytes()
    jpeg_in_tiff = _tiff_bytes("II", 4, 3, 2, 3, (8, 8, 8), 7, 3, [strip])
    with pytest.raises(NotImplementedError, match="compression 7"):
        codecs.decode_tiff(jpeg_in_tiff)
    tiled = _tiff_bytes(
        "II", 4, 3, 2, 3, (8, 8, 8), 1, 3, [strip],
        extra_tags=[(322, 3, [16]), (323, 3, [16])],
    )
    with pytest.raises(NotImplementedError, match="tiled"):
        codecs.decode_tiff(tiled)


def test_tiff_deflate_with_predictor():
    import zlib

    arr = TIFF_RGB.astype(np.int64)
    deltas = arr.copy()
    deltas[:, 1:] = (arr[:, 1:] - arr[:, :-1]) & 0xFF
    strip = zlib.compress(deltas.astype(np.uint8).tobytes())
    payload = _tiff_bytes(
        "MM", 4, 3, 2, 3, (8, 8, 8), 8, 3, [strip],
        extra_tags=[(317, 3, [2])],
    )
    np.testing.assert_array_equal(codecs.decode_tiff(payload), TIFF_RGB)


# -------------------------------------------------------------- IMA ADPCM


def _ima_encode(samples_i16, block_samples=505):
    """Test-side mono IMA ADPCM encoder mirroring the decoder's state
    machine; returns (blocks bytes, block_align, the encoder's own
    reconstruction) — decode must equal the reconstruction EXACTLY."""
    from replicadb_spark.functions.codecs import _IMA_INDEX, _IMA_STEPS

    out = bytearray()
    recon = []
    block_align = 4 + (block_samples - 1 + 1) // 2
    i = 0
    index = 0
    while i < len(samples_i16):
        chunk = samples_i16[i : i + block_samples]
        i += block_samples
        pred = int(chunk[0])
        out += struct.pack("<hBB", pred, index, 0)
        recon.append(pred)
        nibs = []
        for s in chunk[1:]:
            step = _IMA_STEPS[index]
            diff = int(s) - pred
            nib = 0
            if diff < 0:
                nib = 8
                diff = -diff
            if diff >= step:
                nib |= 4
                diff -= step
            if diff >= step >> 1:
                nib |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                nib |= 1
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
            recon.append(pred)
            nibs.append(nib)
        if len(nibs) % 2:
            nibs.append(0)  # codec padding (trimmed via fact chunk)
        for lo, hi in zip(nibs[0::2], nibs[1::2]):
            out += bytes([lo | (hi << 4)])
        pad = block_align - 4 - len(nibs) // 2
        out += bytes(max(0, pad))
    return bytes(out), block_align, recon


def test_ima_adpcm_wav_roundtrip():
    import numpy as np

    t = np.arange(1200)
    wave_i16 = (
        12000 * np.sin(2 * np.pi * 440 * t / 8000)
        + 3000 * np.sin(2 * np.pi * 97 * t / 8000)
    ).astype(np.int64)
    data, align, recon = _ima_encode(wave_i16, block_samples=505)
    fmt = struct.pack("<HHIIHHHH", 17, 1, 8000, 4055, align, 4, 2, 505)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"fact" + struct.pack("<II", 4, len(wave_i16))[:8]
    body += b"data" + struct.pack("<I", len(data)) + data
    payload = b"RIFF" + struct.pack("<I", len(body)) + body

    x, rate, sw = codecs.decode_wav_full(payload)
    assert rate == 8000 and sw == 2
    assert len(x) == len(wave_i16)  # fact-chunk trim: no codec padding
    got = np.round(x * 32768).astype(np.int64)
    # decoder state machine == encoder's tracked reconstruction, bit-exact
    np.testing.assert_array_equal(got, np.array(recon[: len(wave_i16)]))
    # and the reconstruction is a faithful ADPCM of the source
    err = np.abs(got - wave_i16)
    assert float(np.mean(err)) < 600  # ~2% of full scale on a smooth tone


def test_ima_adpcm_stereo_mixdown():
    """Stereo IMA ADPCM: per-channel headers + 4-byte-word channel
    round-robin; the decoder mixes down by mean. Build a block whose
    channels are constant-zero nibbles from different predictors —
    the mean is then exactly the predictor average at every sample."""
    import numpy as np

    from replicadb_spark.functions.codecs import _IMA_STEPS

    # nib 0 on index 0: vpdiff = step>>3 = 0 (step 7) — pred stays put
    blk = bytearray()
    blk += struct.pack("<hBB", 1000, 0, 0)   # ch0 header
    blk += struct.pack("<hBB", -2000, 0, 0)  # ch1 header
    blk += bytes(8)  # one word per channel: 8 zero nibbles each
    assert _IMA_STEPS[0] >> 3 == 0
    align = len(blk)
    fmt = struct.pack("<HHIIHHHH", 17, 2, 8000, 8110, align, 4, 2, 9)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"fact" + struct.pack("<II", 4, 9)
    body += b"data" + struct.pack("<I", len(blk)) + bytes(blk)
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    x, rate, sw = codecs.decode_wav_full(payload)
    assert rate == 8000 and len(x) == 9
    np.testing.assert_allclose(x, (1000 - 2000) / 2 / 32768.0)


def _ms_encode(samples_i16, block_samples, predictor=0):
    """Test-side mono MS ADPCM encoder mirroring the decoder state
    machine (fixed predictor); returns (blocks, block_align, recon)."""
    from replicadb_spark.functions.codecs import _MS_ADAPT, _MS_COEFS

    c1, c2 = _MS_COEFS[predictor]
    out = bytearray()
    recon = []
    n_data = block_samples - 2
    block_align = 7 + (n_data + 1) // 2
    i = 0
    while i < len(samples_i16):
        chunk = [int(v) for v in samples_i16[i : i + block_samples]]
        i += block_samples
        if len(chunk) < 2:
            break
        s2, s1 = chunk[0], chunk[1]
        delta = 400
        out += bytes([predictor]) + struct.pack("<hhh", delta, s1, s2)
        recon += [s2, s1]
        nibs = []
        for s in chunk[2:]:
            q = s1 * c1 + s2 * c2  # C truncating division, like real
            pred = -((-q) >> 8) if q < 0 else q >> 8  # encoders
            signed = max(-8, min(7, int(round((s - pred) / delta))))
            nib = signed + 16 if signed < 0 else signed
            sample = max(-32768, min(32767, pred + delta * signed))
            recon.append(sample)
            nibs.append(nib)
            delta = max(16, (_MS_ADAPT[nib] * delta) >> 8)
            s2, s1 = s1, sample
        if len(nibs) % 2:
            nibs.append(0)
        for hi, lo in zip(nibs[0::2], nibs[1::2]):
            out += bytes([(hi << 4) | lo])
        out += bytes(block_align - 7 - len(nibs) // 2)
    return bytes(out), block_align, recon


def test_ms_adpcm_truncating_predictor_division():
    """ADVICE r11: the MS predictor divides by 256 with C truncation
    toward zero, not floor. Hand-built known vector where they differ:
    predictor 4 = (240, 0), seeds s1 = -1, s2 = 0 → q = -240, so
    truncating pred = 0 where floor ('>> 8') would give -1 — and the
    -1 would feed back through s1/s2. Independent of the mirror
    encoder by construction."""
    import numpy as np

    blk = bytes([4]) + struct.pack("<hhh", 16, -1, 0) + bytes([0x00])
    align = len(blk)
    fmt = struct.pack("<HHIIHHHHH", 2, 1, 8000, 4000, align, 4, 4, 4, 0)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"fact" + struct.pack("<II", 4, 4)
    body += b"data" + struct.pack("<I", len(blk)) + blk
    payload = b"RIFF" + struct.pack("<I", len(body)) + body
    x, rate, sw = codecs.decode_wav_full(payload)
    assert rate == 8000 and sw == 2
    got = np.round(x * 32768).astype(np.int64)
    # order: sample2, sample1, then the two decoded zero-nibbles —
    # both predict 0 under truncation ([-1, floor] would read -1)
    np.testing.assert_array_equal(got, [0, -1, 0, 0])


def test_ms_adpcm_wav_roundtrip():
    import numpy as np

    t = np.arange(900)
    wave_i16 = (
        9000 * np.sin(2 * np.pi * 330 * t / 8000)
    ).astype(np.int64)
    spb = 300
    data, align, recon = _ms_encode(wave_i16, spb)
    fmt = struct.pack("<HHIIHHHHH", 2, 1, 8000, 4055, align, 4, 4, spb, 0)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"fact" + struct.pack("<II", 4, len(wave_i16))
    body += b"data" + struct.pack("<I", len(data)) + data
    payload = b"RIFF" + struct.pack("<I", len(body)) + body

    x, rate, sw = codecs.decode_wav_full(payload)
    assert rate == 8000 and sw == 2
    assert len(x) == len(wave_i16)
    got = np.round(x * 32768).astype(np.int64)
    np.testing.assert_array_equal(got, np.array(recon[: len(wave_i16)]))
    err = np.abs(got - wave_i16)
    assert float(np.mean(err)) < 900  # faithful on a smooth tone
