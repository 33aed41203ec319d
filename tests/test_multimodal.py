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
