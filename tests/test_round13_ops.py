"""Round-13 operator tests: ADVICE r12 fixes (href word-boundary
false positive, image-index grid geometry guard) plus the round's new
compositions."""
from __future__ import annotations

import pytest


def _media_ids(spark, ids):
    from datacamp_etl_spark.operators.multimodal import synthetic_bmp_media

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    return synthetic_bmp_media(df)


# ------------------------------------------------- html_outlinks fix

def test_html_outlinks_ignores_data_href(spark):
    """ADVICE r12: \\bhref also matched suffixed attributes like
    data-href (hyphen is a word boundary); the pattern now requires
    whitespace before the attribute name."""
    from datacamp_etl_spark.operators.html import html_outlinks

    html = (
        '<a data-href="https://fake.example.com/">not a link</a>'
        '<a href="https://real.example.com/">real</a>'
        '<a class="x" href="/rel">rel</a>'
    )
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    rows = sorted(
        (r["href"], r["host"], r["anchor_text"])
        for r in html_outlinks(df).collect()
    )
    assert rows == [
        ("/rel", "", "rel"),
        ("https://real.example.com/", "real.example.com", "real"),
    ]


# ------------------------------------- image_index_append grid guard

def test_image_index_append_stamps_grid(spark):
    from datacamp_etl_spark.operators.multimodal import (
        image_dhash,
        image_index_append,
    )

    base = image_dhash(_media_ids(spark, [1, 2]))  # pre-stamp base
    appended = image_index_append(base, _media_ids(spark, [3]))
    assert "grid" in appended.columns
    rows = {r["media_id"]: r["grid"] for r in appended.collect()}
    assert rows == {1: 8, 2: 8, 3: 8}


def test_image_index_append_grid_mismatch_fails_loudly(spark):
    from datacamp_etl_spark.operators.multimodal import (
        image_dhash,
        image_index_append,
    )

    base = image_dhash(_media_ids(spark, [1]))
    stamped = image_index_append(base, _media_ids(spark, [2]), grid=8)
    # appending with a different grid onto a stamped index must fail
    # at the first action (lazy raise_error guard), not drift
    mixed = image_index_append(stamped, _media_ids(spark, [3]), grid=7)
    with pytest.raises(Exception, match="mixed-geometry|grid"):
        mixed.collect()


def test_outlink_host_pagerank_invariants(spark, sf_dir):
    """Composition glue check (the per-stage operators carry their own
    hand-case tests): rank mass conserves to 1 across the host graph,
    every returned host touches at least one edge, hosts are distinct,
    and out-degrees replay the distinct host-pair edge count."""
    from datacamp_etl_spark.queries import QUERIES

    rows = QUERIES["outlink_host_pagerank"](spark, sf_dir).collect()
    assert rows
    assert abs(sum(r["rank"] for r in rows) - 1.0) < 1e-3
    hosts = [r["host"] for r in rows]
    assert len(hosts) == len(set(hosts))
    for r in rows:
        assert r["out_deg"] >= 0 and r["in_deg"] >= 0
        assert r["out_deg"] + r["in_deg"] > 0
    assert sum(r["out_deg"] for r in rows) == sum(
        r["in_deg"] for r in rows
    )


def test_image_index_append_same_grid_passes_guard(spark):
    from datacamp_etl_spark.operators.multimodal import (
        image_dhash,
        image_index_append,
    )

    base = image_dhash(_media_ids(spark, [1]))
    stamped = image_index_append(base, _media_ids(spark, [2]), grid=8)
    again = image_index_append(
        stamped, _media_ids(spark, [3]), grid=8, generation=2
    )
    rows = {r["media_id"]: (r["generation"], r["grid"])
            for r in again.collect()}
    assert rows == {1: (0, 8), 2: (1, 8), 3: (2, 8)}
