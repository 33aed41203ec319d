"""Multimodal binary-column plumbing: real BMP/netpbm codecs (pure
numpy), Pillow-gated JPEG/PNG, hash-stub fallback for synthetic
bytes."""

from __future__ import annotations

import struct

import pytest

from datacamp_etl_spark.operators import multimodal as M


def _bmp_bytes(width: int, height: int, rgb=(200, 100, 50)) -> bytes:
    """Minimal uncompressed 24bpp bottom-up BMP."""
    row = (bytes(reversed(rgb)) * width)  # BGR triples
    pad = (-len(row)) % 4
    pixel_data = (row + b"\x00" * pad) * height
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0,
                       len(pixel_data), 2835, 2835, 0, 0)
    hdr = b"BM" + struct.pack("<IHHI", 14 + 40 + len(pixel_data), 0, 0, 14 + 40)
    return hdr + info + pixel_data


def _ppm_bytes(width: int, height: int, rgb=(10, 20, 30)) -> bytes:
    return (
        f"P6\n# comment\n{width} {height}\n255\n".encode()
        + bytes(rgb) * (width * height)
    )


def _pgm_bytes(width: int, height: int, v: int = 77) -> bytes:
    return f"P5\n{width} {height}\n255\n".encode() + bytes([v]) * width * height


def _media(spark):
    rows = [
        (1, "image", "image/png", b"\x89PNG-fake-1", (0, 0, None, None)),
        (2, "image", "image/png", b"\x89PNG-fake-2", (0, 0, None, None)),
        (3, "video", "video/mp4", b"\x00mp4-fake", (640, 480, 3500, "h264")),
        (4, "audio", "audio/wav", b"RIFF-fake", (None, None, 2000, "pcm")),
        (5, "image", "image/png", None, (None, None, None, None)),
    ]
    return M.media_table(spark, rows)


def test_decode_images(spark):
    out = {r["media_id"]: r for r in M.decode_images(_media(spark)).collect()}
    assert set(out) == {1, 2}          # only images with content
    r = out[1]
    assert 1 <= r["width"] <= 64 and 1 <= r["height"] <= 64
    assert r["n_bytes"] == len(b"\x89PNG-fake-1")
    assert len(r["content_sha"]) == 64
    # deterministic
    again = {x["media_id"]: x for x in M.decode_images(_media(spark)).collect()}
    assert again[1]["width"] == r["width"]


def test_extract_features_feeds_similarity(spark):
    feats = M.extract_features(_media(spark).where("content IS NOT NULL"), dim=16)
    rows = feats.collect()
    assert len(rows) == 4
    assert all(len(r["embedding"]) == 16 for r in rows)
    assert all(0.0 <= v <= 1.0 for r in rows for v in r["embedding"])

    # plumb into the similarity operator unchanged
    from datacamp_etl_spark.operators.similarity import brute_force_topk

    q = list(rows[0]["embedding"])
    top = brute_force_topk(
        feats, q, id_col="media_id", vec_col="embedding", k=2
    ).collect()
    assert top[0]["media_id"] == rows[0]["media_id"]


def test_decode_real_bmp_and_netpbm(spark):
    rows = [
        (10, "image", "image/bmp", _bmp_bytes(5, 3), (None,) * 4),
        (11, "image", "image/x-portable-pixmap", _ppm_bytes(7, 2), (None,) * 4),
        (12, "image", "image/x-portable-graymap", _pgm_bytes(4, 6), (None,) * 4),
    ]
    out = {
        r["media_id"]: r
        for r in M.decode_images(M.media_table(spark, rows)).collect()
    }
    # REAL dimensions, not the hash fake
    assert (out[10]["width"], out[10]["height"]) == (5, 3)
    assert (out[11]["width"], out[11]["height"]) == (7, 2)
    assert (out[12]["width"], out[12]["height"]) == (4, 6)


def test_decode_bmp_kernel_pixel_values():
    # decoder unit contract: luma of a solid (200,100,50) RGB image
    w, h, gray = M._decode_bmp(_bmp_bytes(3, 2))
    expected = (200 * 299 + 100 * 587 + 50 * 114) // 1000
    assert (w, h) == (3, 2)
    assert set(gray) == {expected}
    w, h, gray = M._decode_netpbm(_pgm_bytes(2, 2, v=77))
    assert (w, h, set(gray)) == (2, 2, {77})


def test_extract_features_real_histogram(spark):
    # a solid-color real image must put ~all histogram mass in ONE bin
    rows = [(20, "image", "image/bmp", _bmp_bytes(8, 8), (None,) * 4)]
    feats = M.extract_features(M.media_table(spark, rows), dim=16).collect()
    vec = feats[0]["embedding"]
    assert len(vec) == 16
    assert max(vec) == pytest.approx(1.0)
    assert sum(vec) == pytest.approx(1.0)


def test_decode_pil_path_when_available(spark):
    PIL = pytest.importorskip("PIL")  # noqa: F841 — absent in container
    from io import BytesIO

    from PIL import Image

    buf = BytesIO()
    Image.new("RGB", (9, 4), (1, 2, 3)).save(buf, format="PNG")
    rows = [(30, "image", "image/png", buf.getvalue(), (None,) * 4)]
    out = M.decode_images(M.media_table(spark, rows)).collect()[0]
    assert (out["width"], out["height"]) == (9, 4)


def test_undecodable_bytes_fall_back_to_stub(spark):
    # truncated BMP header: magic matches but the decoder must refuse
    # and fall through to the deterministic stub, not crash
    rows = [(40, "image", "image/bmp", b"BM\x00\x01", (None,) * 4)]
    out = M.decode_images(M.media_table(spark, rows)).collect()[0]
    assert 1 <= out["width"] <= 64 and 1 <= out["height"] <= 64


def test_sample_frames(spark):
    frames = M.sample_frames(_media(spark), every_ms=1000).collect()
    # video id 3 has 3500ms -> frames at 0,1000,2000,3000
    assert [r["frame_no"] for r in frames] == [0, 1, 2, 3]
    assert all(r["media_id"] == 3 for r in frames)
    assert len({r["frame_sha"] for r in frames}) == 4


def _png_bytes(width, height, pixels, color_type, filters, palette=None):
    """Minimal PNG writer for decoder tests: `pixels` is an
    (h, w, nch) uint8 array of RECONSTRUCTED samples; each row is
    stored with the requested filter type (the test computes the
    filtered representation the decoder must invert)."""
    import struct
    import zlib

    import numpy as np

    nch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[color_type]
    px = np.asarray(pixels, dtype=np.int32).reshape(height, width * nch)
    lines = bytearray()
    for y in range(height):
        f = filters[y % len(filters)]
        rec = px[y]
        prior = px[y - 1] if y > 0 else np.zeros_like(rec)
        if f == 0:
            filt = rec
        elif f == 1:
            left = np.concatenate([np.zeros(nch, np.int32), rec[:-nch]])
            filt = (rec - left) % 256
        elif f == 2:
            filt = (rec - prior) % 256
        elif f == 3:
            left = np.concatenate([np.zeros(nch, np.int32), rec[:-nch]])
            filt = (rec - ((left + prior) >> 1)) % 256
        else:  # Paeth
            left = np.concatenate([np.zeros(nch, np.int32), rec[:-nch]])
            ul = np.concatenate([np.zeros(nch, np.int32), prior[:-nch]])
            p = left + prior - ul
            pa, pb, pc = abs(p - left), abs(p - prior), abs(p - ul)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prior, ul)
            )
            filt = (rec - pred) % 256
        lines.append(f)
        lines.extend(filt.astype(np.uint8).tobytes())

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if palette is not None:
        out += chunk(b"PLTE", bytes(palette))
    out += chunk(b"IDAT", zlib.compress(bytes(lines)))
    return out + chunk(b"IEND", b"")


def test_png_decode_pure_python_all_filters():
    """The no-dependency PNG decoder must invert every PNG filter
    type and match the BMP/netpbm gray formula — PNG is a REAL format
    in this container even though Pillow is absent."""
    import numpy as np

    from datacamp_etl_spark.operators.multimodal import _decode_png

    rng = np.random.default_rng(7)
    # RGB, every filter type across rows
    rgb = rng.integers(0, 256, size=(5, 4, 3), dtype=np.uint8)
    raw = _png_bytes(4, 5, rgb, color_type=2, filters=[0, 1, 2, 3, 4])
    w, h, gray = _decode_png(raw)
    assert (w, h) == (4, 5)
    r = rgb.astype(np.uint32)
    want = ((r[:, :, 0] * 299 + r[:, :, 1] * 587 + r[:, :, 2] * 114) // 1000)
    assert np.array_equal(
        np.frombuffer(gray, dtype=np.uint8).reshape(5, 4),
        want.astype(np.uint8),
    )
    # grayscale with Paeth everywhere
    g = rng.integers(0, 256, size=(3, 6, 1), dtype=np.uint8)
    w, h, gray = _decode_png(_png_bytes(6, 3, g, color_type=0, filters=[4]))
    assert (w, h) == (6, 3)
    assert np.array_equal(
        np.frombuffer(gray, dtype=np.uint8).reshape(3, 6), g[:, :, 0]
    )
    # RGBA (alpha ignored for luma) and palette
    rgba = rng.integers(0, 256, size=(2, 2, 4), dtype=np.uint8)
    w, h, gray = _decode_png(_png_bytes(2, 2, rgba, color_type=6, filters=[1, 2]))
    rr = rgba[:, :, :3].astype(np.uint32)
    assert np.array_equal(
        np.frombuffer(gray, dtype=np.uint8).reshape(2, 2),
        ((rr[:, :, 0] * 299 + rr[:, :, 1] * 587 + rr[:, :, 2] * 114) // 1000
         ).astype(np.uint8),
    )
    pal = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])  # R, G, B entries
    idx = np.array([[0, 1], [2, 0]], dtype=np.uint8)[:, :, None]
    w, h, gray = _decode_png(
        _png_bytes(2, 2, idx, color_type=3, filters=[0], palette=pal)
    )
    assert np.frombuffer(gray, dtype=np.uint8).reshape(2, 2).tolist() == [
        [299 * 255 // 1000, 587 * 255 // 1000],
        [114 * 255 // 1000, 299 * 255 // 1000],
    ]
    # refusals fall through (None), never crash: truncated, 16-bit
    assert _decode_png(raw[:20]) is None
    import struct as _s
    import zlib as _z
    bad_ihdr = _s.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    bad = (b"\x89PNG\r\n\x1a\n"
           + _s.pack(">I", len(bad_ihdr)) + b"IHDR" + bad_ihdr
           + _s.pack(">I", _z.crc32(b"IHDR" + bad_ihdr) & 0xFFFFFFFF))
    assert _decode_png(bad) is None


def test_png_decode_through_spark_pipeline(spark):
    """PNG rows flow through decode_images' mapInPandas with REAL
    dimensions (no Pillow in this container — the pure decoder)."""
    import numpy as np

    rgb = np.zeros((4, 9, 3), dtype=np.uint8)
    rgb[:, :, 0] = 200  # solid red
    raw = _png_bytes(9, 4, rgb, color_type=2, filters=[0, 1, 2, 4])
    rows = [(31, "image", "image/png", raw, (None,) * 4)]
    out = M.decode_images(M.media_table(spark, rows)).collect()[0]
    assert (out["width"], out["height"]) == (9, 4)


def test_wav_decode_all_depths():
    """The pure WAV decoder must invert the PCM16 writer and handle
    8/24/32-bit int, float32, and stereo-to-mono averaging."""
    import struct

    import numpy as np

    from datacamp_etl_spark.operators.multimodal import (
        _decode_wav,
        _encode_wav,
    )

    s = (np.sin(np.arange(400) * 0.1) * 30000).astype(np.int16)
    rate, nch, mono = _decode_wav(_encode_wav(s, 8000))
    assert (rate, nch) == (8000, 1)
    assert np.allclose(mono, s / 32768.0)

    def wav(fmt_code, bits, data, nch=1, rate=16000):
        ba = nch * bits // 8
        return (
            b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, fmt_code, nch, rate,
                                    rate * ba, ba, bits)
            + b"data" + struct.pack("<I", len(data)) + data
        )

    # 8-bit unsigned: 128 is zero
    r, c, m = _decode_wav(wav(1, 8, bytes([128, 255, 0])))
    assert np.allclose(m, [0.0, 127 / 128, -1.0])
    # 24-bit signed little-endian
    r, c, m = _decode_wav(wav(1, 24, b"\x00\x00\x40" + b"\x00\x00\xc0"))
    assert np.allclose(m, [0.5, -0.5])
    # 32-bit float
    r, c, m = _decode_wav(wav(3, 32, struct.pack("<2f", 0.25, -1.0)))
    assert np.allclose(m, [0.25, -1.0])
    # stereo averages to mono
    st = np.array([10000, -10000, 20000, 0], dtype="<i2").tobytes()
    r, c, m = _decode_wav(wav(1, 16, st, nch=2))
    assert c == 2 and np.allclose(m, [0.0, 10000 / 32768])
    # refusals: not RIFF, unsupported codec id
    assert _decode_wav(b"OggS" + b"\x00" * 60) is None
    assert _decode_wav(wav(85, 16, b"\x00\x00")) is None  # mp3-in-wav


def test_audio_features_and_resample(spark):
    import numpy as np

    from datacamp_etl_spark.operators.multimodal import (
        _decode_wav,
        _encode_wav,
        audio_features,
        resample_audio,
    )

    # 440 Hz sine at 16 kHz: zcr ~ 2*440/16000, rms ~ amp/sqrt(2)
    t = np.arange(16000)
    sine = (np.sin(2 * np.pi * 440 * t / 16000) * 20000).astype(np.int16)
    rows = [
        (1, "audio", "audio/wav", _encode_wav(sine, 16000), (None,) * 4),
        (2, "audio", "audio/mpeg", b"\xff\xfb junk", (None,) * 4),
    ]
    feats = {
        r["media_id"]: r
        for r in audio_features(M.media_table(spark, rows)).collect()
    }
    f1 = feats[1]
    assert f1["duration_ms"] == 1000 and f1["sample_rate"] == 16000
    assert abs(f1["rms"] - (20000 / 32768) / np.sqrt(2)) < 0.01
    assert abs(f1["zcr"] - 2 * 440 / 16000) < 0.005
    assert feats[2]["rms"] is None  # undecodable -> soft NULL row

    # resample halves the rate; duration and pitch-relative zcr hold
    out = resample_audio(M.media_table(spark, rows), 8000).collect()
    assert len(out) == 1  # undecodable row dropped
    rate, _, mono = _decode_wav(bytes(out[0]["content"]))
    assert rate == 8000
    assert abs(len(mono) - 8000) <= 1
    zc = np.count_nonzero(np.diff(mono >= 0)) / (len(mono) - 1)
    assert abs(zc - 2 * 440 / 8000) < 0.01


# ---------------------------------------------------------------------
# Baseline JPEG: pure-Python decoder (round 7 — the last decode path
# that had never executed anywhere). The encoder below is an
# INDEPENDENT minimal baseline-JPEG writer (forward DCT, flat
# quantization, fixed-length canonical Huffman tables), so the
# round-trip tests decoder-vs-spec, not decoder-vs-itself — the same
# strategy as _png_bytes above.
# ---------------------------------------------------------------------

def _jpeg_tables():
    """Fixed-length canonical Huffman tables: DC symbols 0..11 at code
    length 4, AC symbols (EOB, ZRL, every run/size) at length 8. Both
    leave the all-ones code unused as the spec requires."""
    dc_syms = list(range(12))
    ac_syms = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 11)
    ]
    dc_counts = [0] * 16
    dc_counts[3] = len(dc_syms)  # length 4
    ac_counts = [0] * 16
    ac_counts[7] = len(ac_syms)  # length 8
    dc_codes = {sym: (i, 4) for i, sym in enumerate(dc_syms)}
    ac_codes = {sym: (i, 8) for i, sym in enumerate(ac_syms)}
    return dc_syms, dc_counts, dc_codes, ac_syms, ac_counts, ac_codes


class _JpegWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def bits(self, value, length):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.bits(1, 1)  # pad with 1s


def _jpeg_bytes(px, *, subsampling="4:4:4", restart_interval=0):
    """Minimal baseline JFIF encoder: `px` is (h, w) uint8 grayscale
    or (h, w, 3) uint8 RGB. Flat all-ones quantization tables keep the
    only loss at DCT rounding (and chroma subsampling when 4:2:0)."""
    import numpy as np

    px = np.asarray(px, dtype=np.float64)
    gray = px.ndim == 2
    h, w = px.shape[:2]
    dc_syms, dc_counts, dc_codes, ac_syms, ac_counts, ac_codes = (
        _jpeg_tables()
    )
    x = np.arange(8)
    u = x[:, None]
    A = np.cos((2 * x[None, :] + 1) * u * np.pi / 16) * np.where(
        u == 0, np.sqrt(1 / 8), 0.5
    )
    zigzag = [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]

    def pad_to(plane, mh, mw):
        ph = -(-plane.shape[0] // mh) * mh
        pw = -(-plane.shape[1] // mw) * mw
        return np.pad(plane, ((0, ph - plane.shape[0]),
                              (0, pw - plane.shape[1])), mode="edge")

    if gray:
        comps = [{"id": 1, "h": 1, "v": 1, "plane": px}]
    else:
        r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsampling == "4:2:0":
            yp = pad_to(y, 2, 2)
            cb = (cb[0::2, 0::2] + pad_to(cb, 2, 2)[0::2, 1::2]
                  + pad_to(cb, 2, 2)[1::2, 0::2]
                  + pad_to(cb, 2, 2)[1::2, 1::2]) / 4  # noqa: E501 — 2x2 mean
            cr = (cr[0::2, 0::2] + pad_to(cr, 2, 2)[0::2, 1::2]
                  + pad_to(cr, 2, 2)[1::2, 0::2]
                  + pad_to(cr, 2, 2)[1::2, 1::2]) / 4
            comps = [
                {"id": 1, "h": 2, "v": 2, "plane": yp},
                {"id": 2, "h": 1, "v": 1, "plane": cb},
                {"id": 3, "h": 1, "v": 1, "plane": cr},
            ]
        else:
            comps = [
                {"id": 1, "h": 1, "v": 1, "plane": y},
                {"id": 2, "h": 1, "v": 1, "plane": cb},
                {"id": 3, "h": 1, "v": 1, "plane": cr},
            ]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    for c in comps:
        c["plane"] = pad_to(c["plane"], mcuy * c["v"] * 8, mcux * c["h"] * 8
                            )[: mcuy * c["v"] * 8, : mcux * c["h"] * 8]
        c["pred"] = 0

    wr = _JpegWriter()

    def put_magnitude(v, codes):
        size = int(abs(v)).bit_length()
        amp = v if v >= 0 else v + (1 << size) - 1
        return size, amp

    def encode_block(c, by, bx):
        blk = c["plane"][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
        coef = np.round(A @ blk @ A.T).astype(np.int64)
        zz = coef.flatten()[zigzag]
        size, amp = put_magnitude(int(zz[0]) - c["pred"], dc_codes)
        c["pred"] = int(zz[0])
        code, ln = dc_codes[size]
        wr.bits(code, ln)
        if size:
            wr.bits(int(amp), size)
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, ln = ac_codes[0xF0]
                wr.bits(code, ln)
                run -= 16
            size, amp = put_magnitude(v, ac_codes)
            code, ln = ac_codes[(run << 4) | size]
            wr.bits(code, ln)
            wr.bits(int(amp), size)
            run = 0
        if run:
            code, ln = ac_codes[0x00]
            wr.bits(code, ln)

    rst = 0
    for m in range(mcux * mcuy):
        if restart_interval and m and m % restart_interval == 0:
            wr.flush()
            wr.out += bytes([0xFF, 0xD0 + rst % 8])
            rst += 1
            for c in comps:
                c["pred"] = 0
        my, mx = divmod(m, mcux)
        for c in comps:
            for by in range(c["v"]):
                for bx in range(c["h"]):
                    encode_block(c, my * c["v"] + by, mx * c["h"] + bx)
    wr.flush()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") \
            + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([len(comps)])
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], 0])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(dc_counts) + bytes(dc_syms))
    out += seg(0xC4, bytes([0x10]) + bytes(ac_counts) + bytes(ac_syms))
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([len(comps)])
    for c in comps:
        sos += bytes([c["id"], 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += wr.out
    out += b"\xff\xd9"
    return bytes(out)


def test_jpeg_decode_grayscale_roundtrip():
    import numpy as np

    rng = np.random.RandomState(7)
    px = rng.randint(0, 256, size=(24, 16)).astype(np.uint8)
    w, h, gray = M._decode_jpeg(_jpeg_bytes(px))
    assert (w, h) == (16, 24)
    got = np.frombuffer(gray, dtype=np.uint8).reshape(24, 16).astype(int)
    err = np.abs(got - px.astype(int))
    # flat q=1: the only loss is forward-DCT rounding
    assert err.max() <= 4 and err.mean() <= 1.5


def test_jpeg_decode_non_multiple_of_8_dims():
    import numpy as np

    px = (np.add.outer(np.arange(9) * 7, np.arange(13) * 11) % 256
          ).astype(np.uint8)
    w, h, gray = M._decode_jpeg(_jpeg_bytes(px))
    assert (w, h) == (13, 9)
    got = np.frombuffer(gray, dtype=np.uint8).reshape(9, 13).astype(int)
    assert np.abs(got - px.astype(int)).max() <= 4


def test_jpeg_decode_color_444_matches_luma():
    import numpy as np

    rng = np.random.RandomState(11)
    rgb = rng.randint(0, 256, size=(16, 8, 3)).astype(np.uint8)
    w, h, gray = M._decode_jpeg(_jpeg_bytes(rgb))
    assert (w, h) == (8, 16)
    want = (
        rgb[:, :, 0].astype(np.uint32) * 299
        + rgb[:, :, 1].astype(np.uint32) * 587
        + rgb[:, :, 2].astype(np.uint32) * 114
    ) // 1000
    got = np.frombuffer(gray, dtype=np.uint8).reshape(16, 8).astype(int)
    # DCT rounding on 3 planes + YCbCr<->RGB round trips
    assert np.abs(got - want.astype(int)).max() <= 6


def test_jpeg_decode_420_subsampling():
    import numpy as np

    # constant chroma everywhere -> 2x2 chroma averaging is lossless,
    # isolating the 4:2:0 assembly/upsample path from subsample loss
    luma = (np.add.outer(np.arange(20) * 5, np.arange(26) * 3) % 200 + 20
            ).astype(np.float64)
    r = np.clip(luma + 1.402 * 20, 0, 255)
    g = np.clip(luma - 0.344136 * (-30) - 0.714136 * 20, 0, 255)
    b = np.clip(luma + 1.772 * (-30), 0, 255)
    rgb = np.stack([r, g, b], axis=-1).astype(np.uint8)
    w, h, gray = M._decode_jpeg(_jpeg_bytes(rgb, subsampling="4:2:0"))
    assert (w, h) == (26, 20)
    want = (
        rgb[:, :, 0].astype(np.uint32) * 299
        + rgb[:, :, 1].astype(np.uint32) * 587
        + rgb[:, :, 2].astype(np.uint32) * 114
    ) // 1000
    got = np.frombuffer(gray, dtype=np.uint8).reshape(20, 26).astype(int)
    assert np.abs(got - want.astype(int)).max() <= 6


def test_jpeg_decode_restart_markers():
    import numpy as np

    rng = np.random.RandomState(3)
    px = rng.randint(0, 256, size=(16, 32)).astype(np.uint8)
    plain = M._decode_jpeg(_jpeg_bytes(px))
    rst = M._decode_jpeg(_jpeg_bytes(px, restart_interval=1))
    assert plain is not None and rst is not None
    assert plain == rst  # identical coefficients -> identical pixels


def test_jpeg_progressive_returns_none():
    # SOF2 (progressive) must fall through, not crash or mis-decode
    sof2 = bytes([0xFF, 0xC2, 0x00, 0x0B, 8, 0, 8, 0, 8, 1, 1, 0x11, 0])
    assert M._decode_jpeg(b"\xff\xd8" + sof2 + b"\xff\xd9") is None
    # truncated scan data must return None, not raise — use a noisy
    # image so the entropy-coded scan is genuinely longer than the cut
    import numpy as np

    rng = np.random.RandomState(1)
    full = _jpeg_bytes(rng.randint(0, 256, size=(16, 16)).astype(np.uint8))
    cut = full[: full.index(b"\xff\xda") + 20]
    assert M._decode_jpeg(cut) is None


def test_jpeg_through_spark_pipeline(spark):
    import numpy as np

    px = (np.add.outer(np.arange(12) * 9, np.arange(10) * 13) % 256
          ).astype(np.uint8)
    rows = [(60, "image", "image/jpeg", _jpeg_bytes(px), (None,) * 4)]
    out = M.decode_images(M.media_table(spark, rows)).collect()[0]
    assert (out["width"], out["height"]) == (10, 12)
    feats = M.extract_features(M.media_table(spark, rows), dim=16).collect()
    assert len(feats[0]["embedding"]) == 16
