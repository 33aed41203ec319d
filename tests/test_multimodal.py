"""Multimodal binary-column plumbing (codec kernels stubbed)."""

from __future__ import annotations

from datacamp_etl_spark.operators import multimodal as M


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


def test_sample_frames(spark):
    frames = M.sample_frames(_media(spark), every_ms=1000).collect()
    # video id 3 has 3500ms -> frames at 0,1000,2000,3000
    assert [r["frame_no"] for r in frames] == [0, 1, 2, 3]
    assert all(r["media_id"] == 3 for r in frames)
    assert len({r["frame_sha"] for r in frames}) == 4
