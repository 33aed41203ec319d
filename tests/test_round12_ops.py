"""Round-12 operators: LSH-candidates hard-negative mining (the
scale path the exact inliner's bound points at).

Every assertion is against a hand-verifiable invariant: opposite
vectors can never share a sign-projection bucket (every plane's dot
flips sign), positively-scaled copies always do (every sign is
preserved), and zero planes degenerate to the exhaustive exact path.
"""

from __future__ import annotations

import pytest


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )


def test_hard_negatives_lsh_blocks_opposite_vectors(spark):
    from datacamp_etl_spark.operators.similarity import (
        hard_negatives,
        hard_negatives_lsh,
    )

    # scaled copies of the anchor share every plane sign (same
    # bucket); the antipodal vector flips every plane sign (never
    # the same bucket) -- true for ANY plane values with nonzero dots
    rows = [
        (1, [1.0, 0.0], 0),
        (2, [0.9, 0.0], 1),
        (3, [2.0, 0.0], 1),
        (4, [-1.0, 0.0], 1),
    ]
    emb = _emb(spark, rows)
    got = hard_negatives_lsh(
        emb.where("vec_id = 1"), emb, dim=2, k=5, num_planes=4
    ).collect()
    assert sorted(r["neighbor_id"] for r in got) == [2, 3]
    assert all(r["cosine"] == 1.0 for r in got)
    # the exact path DOES return the antipodal row (rank 3)
    exact = hard_negatives(emb.where("vec_id = 1"), emb, k=5).collect()
    assert sorted(r["neighbor_id"] for r in exact) == [2, 3, 4]


def test_hard_negatives_lsh_label_filter_and_self_exclusion(spark):
    from datacamp_etl_spark.operators.similarity import hard_negatives_lsh

    rows = [
        (1, [1.0, 0.0], 0),
        (2, [1.1, 0.0], 0),  # same bucket, same label -> excluded
        (3, [0.9, 0.0], 1),
    ]
    emb = _emb(spark, rows)
    got = hard_negatives_lsh(
        emb.where("vec_id = 1"), emb, dim=2, k=5, num_planes=4
    ).collect()
    assert [r["neighbor_id"] for r in got] == [3]
    assert got[0]["rank"] == 1


def test_hard_negatives_lsh_zero_planes_matches_exact_path(spark):
    from datacamp_etl_spark.operators.similarity import (
        hard_negatives,
        hard_negatives_lsh,
    )

    # num_planes=0 puts everything in bucket 0 -> exhaustive
    # candidates -> identical to the exact inlined path
    rows = [
        (1, [1.0, 0.2], 0),
        (2, [0.8, 0.3], 1),
        (3, [0.1, 1.0], 1),
        (4, [-0.5, 0.4], 1),
        (5, [0.7, 0.7], 0),
        (6, [0.6, -0.1], 1),
    ]
    emb = _emb(spark, rows)
    anchors = emb.where("vec_id <= 2")
    lsh = sorted(
        map(
            tuple,
            hard_negatives_lsh(
                anchors, emb, dim=2, k=3, num_planes=0
            ).collect(),
        )
    )
    exact = sorted(
        map(tuple, hard_negatives(anchors, emb, k=3).collect())
    )
    assert lsh == exact and len(lsh) > 0


def test_hard_negatives_lsh_bucket_cap_drops_mega_bucket(spark):
    from datacamp_etl_spark.operators.similarity import hard_negatives_lsh

    # all corpus rows are positive scalings -> one bucket of 4; a cap
    # of 3 drops the whole bucket (the mega-bucket guard), cap=None
    # keeps it
    rows = [(i, [float(i), 0.0], i % 2) for i in range(1, 5)]
    emb = _emb(spark, rows)
    anchors = emb.where("vec_id = 1")
    capped = hard_negatives_lsh(
        anchors, emb, dim=2, k=5, num_planes=4, max_bucket_size=3
    ).collect()
    assert capped == []
    uncapped = hard_negatives_lsh(
        anchors, emb, dim=2, k=5, num_planes=4
    ).collect()
    assert sorted(r["neighbor_id"] for r in uncapped) == [2, 4]


# ------------------------------------------------------ html_extract

def _one(spark, html):
    from datacamp_etl_spark.operators.html import html_extract

    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    return html_extract(df).collect()[0]["text"]


def test_html_extract_nested_tags_and_link_density(spark):
    html = (
        "<div><p>Real <b>content</b> with many plain words here</p>"
        '<div><a href="/a">One</a> <a href="/b">Two</a></div></div>'
    )
    # inner div is pure links -> dropped; bold tag stripped inline
    assert _one(spark, html) == "Real content with many plain words here"


def test_html_extract_strips_script_style_with_content(spark):
    html = (
        "<p>keep this text</p><script>var hidden = 'secret';</script>"
        "<style>.x { color: blue }</style><p>and this too</p>"
    )
    assert _one(spark, html) == "keep this text\nand this too"
    # a '<' INSIDE a script body must not break the tag stripper
    tricky = "<p>before</p><script>if (a < b) { go(); }</script><p>after</p>"
    assert _one(spark, tricky) == "before\nafter"


def test_html_extract_entity_decode_order(spark):
    # &amp; decodes LAST: '&amp;lt;' must become '&lt;', never '<';
    # '&lt;b&gt;' decodes to a literal '<b>' (never re-stripped)
    html = "<p>A &amp;lt; B and &lt;b&gt; stays &quot;here&quot;</p>"
    assert _one(spark, html) == 'A &lt; B and <b> stays "here"'


def test_html_extract_head_comment_and_blank_blocks(spark):
    html = (
        "<html><head><title>Meta Title</title></head><body>"
        "<!-- hidden comment --><h1>Heading</h1><p>  </p>"
        "<p>body text</p></body></html>"
    )
    # head content and comments never surface; whitespace-only
    # blocks are dropped
    assert _one(spark, html) == "Heading\nbody text"


def test_html_extract_mixed_link_block_kept(spark):
    html = (
        '<p>Visit <a href="/m">link</a> and read plenty of plain '
        "prose words</p>"
    )
    # link chars (4) * 1e6 <= 5e5 * text chars -> kept, anchor text
    # inlined
    assert _one(spark, html) == (
        "Visit link and read plenty of plain prose words"
    )


def test_html_extract_threshold_validation(spark):
    import pytest as _pytest

    from datacamp_etl_spark.operators.html import html_extract

    df = spark.createDataFrame([(1, "<p>x</p>")], "doc_id long, html string")
    with _pytest.raises(ValueError, match="max_link_density_ppm"):
        html_extract(df, max_link_density_ppm=2_000_000)


# ------------------------------------- image index append + staleness

def _media_ids(spark, ids):
    from datacamp_etl_spark.operators.multimodal import synthetic_bmp_media

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    return synthetic_bmp_media(df)


def test_image_index_append_stamps_generations(spark):
    from datacamp_etl_spark.operators.multimodal import (
        image_dhash,
        image_index_append,
    )

    base = image_dhash(_media_ids(spark, [1, 2]))  # no generation col
    appended = image_index_append(base, _media_ids(spark, [3]))
    rows = {r["media_id"]: r["generation"] for r in appended.collect()}
    assert rows == {1: 0, 2: 0, 3: 1}
    # appending again with an explicit generation stacks correctly
    g2 = image_index_append(appended, _media_ids(spark, [4]), generation=2)
    rows = {r["media_id"]: r["generation"] for r in g2.collect()}
    assert rows == {1: 0, 2: 0, 3: 1, 4: 2}


def test_image_index_stats_counts_and_shares(spark):
    from datacamp_etl_spark.operators.multimodal import (
        image_dhash,
        image_index_append,
        image_index_stats,
    )

    # media 3201 is the IDENTICAL image to media 1 (class 1, flip 1),
    # so their signatures agree on every band; media 2 is another
    # class. Base = {1, 2}; append = {3201}.
    base = image_dhash(_media_ids(spark, [1, 2]))
    appended = image_index_append(base, _media_ids(spark, [3201]))
    rows = image_index_stats(appended).collect()
    assert [r["band"] for r in rows] == list(range(7))
    for r in rows:
        assert r["n_base"] == 2 and r["n_appended"] == 1
        assert r["n_total"] == 3
        # 3 of 21 postings -> exact integer ppm
        assert r["share_ppm"] == (1_000_000 * 3) // 21
        # the duplicate pair always shares its band bucket
        assert r["max_bucket"] >= 2 and r["n_buckets"] in (1, 2)
        assert r["n_over_cap"] == 0


def test_image_index_stats_without_generation_is_all_base(spark):
    from datacamp_etl_spark.operators.multimodal import (
        image_dhash,
        image_index_stats,
    )

    rows = image_index_stats(image_dhash(_media_ids(spark, [1]))).collect()
    assert all(
        r["n_base"] == 1 and r["n_appended"] == 0 for r in rows
    )


def test_streaming_gate_reads_appended_index(spark):
    from datacamp_etl_spark.operators.multimodal import (
        image_dhash,
        image_index_append,
        streaming_image_near_dup_filter,
    )

    # index: base covers image 1; the append adds image 2. Stream:
    # 3201 duplicates the BASE image, 1602 duplicates the APPENDED
    # image (class 2, flip 2 == id 2), 5 is a fresh class.
    idx = image_index_append(
        image_dhash(_media_ids(spark, [1])), _media_ids(spark, [2])
    )
    stream = _media_ids(spark, [3201, 1602, 5])
    got = {
        r["media_id"]
        for r in streaming_image_near_dup_filter(stream, idx).collect()
    }
    assert got == {5}


# ------------------------------------------------------ html_outlinks

def test_html_outlinks_extracts_href_host_and_text(spark):
    from datacamp_etl_spark.operators.html import html_outlinks

    html = (
        '<p><a href="https://A.Example.COM/x">Read <b>this</b></a>'
        ' and <a href="/rel/1">a local one</a></p>'
    )
    df = spark.createDataFrame([(7, html)], "doc_id long, html string")
    rows = sorted(
        map(tuple, html_outlinks(df).collect())
    )
    assert rows == [
        (7, "/rel/1", "", "a local one"),
        (7, "https://A.Example.COM/x", "a.example.com", "Read this"),
    ]


def test_html_outlinks_suppresses_script_and_comment_anchors(spark):
    from datacamp_etl_spark.operators.html import html_outlinks

    html = (
        '<script>var s = "<a href="https://ghost.net/">g</a>";</script>'
        '<!-- <a href="https://hidden.net/">h</a> -->'
        '<p><a href="https://real.net/">real</a></p>'
    )
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    rows = html_outlinks(df).collect()
    assert [(r["host"], r["anchor_text"]) for r in rows] == [
        ("real.net", "real")
    ]


def test_html_outlinks_skips_anchor_without_href(spark):
    from datacamp_etl_spark.operators.html import html_outlinks

    html = '<p><a name="top">no link</a><a href="https://x.io/">y</a></p>'
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    rows = html_outlinks(df).collect()
    assert [(r["href"], r["host"]) for r in rows] == [
        ("https://x.io/", "x.io")
    ]
