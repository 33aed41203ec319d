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


# --------------------------------------------- URL path templates

def test_url_path_template_hex_before_digits(spark):
    from datacamp_etl_spark.operators.urls import url_path_template

    df = spark.createDataFrame(
        [
            (1, "https://h.com/cal/2024/7/3"),
            (2, "https://h.com/s/deadbeef01"),
            (3, "https://h.com/a/12ab"),
            (4, "https://h.com/x/DEADBEEF?p=1"),
            (5, "https://h.com"),
            (6, "not a url"),
        ],
        "doc_id long, url string",
    )
    got = {
        r["doc_id"]: r["tpl"]
        for r in df.select(
            "doc_id", url_path_template("url").alias("tpl")
        ).collect()
    }
    assert got[1] == "/cal/{n}/{n}/{n}"
    assert got[2] == "/s/{h}"          # 10 hex chars -> one {h}
    assert got[3] == "/a/{n}ab"        # 4 hex chars: digits only
    assert got[4] == "/x/{h}"          # uppercase hex; query excluded
    assert got[5] == "/"               # empty path normalized
    assert got[6] is None              # non-URL -> NULL


def test_template_stats_trap_verdict(spark):
    from datacamp_etl_spark.operators.urls import template_stats

    rows = [(i, f"https://t.com/sess/{i:05d}") for i in range(100)]
    rows += [(200 + i, "https://t.com/about") for i in range(100)]
    rows += [(400, "https://t.com/k/123456789")]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {
        r["template"]: (r["n_urls"], r["n_distinct"], r["is_trap"])
        for r in template_stats(df, trap_min_urls=100).collect()
    }
    assert got["/sess/{n}"] == (100, 100, True)    # all-distinct trap
    assert got["/about"] == (100, 1, False)        # one real page
    # a >=8-char run from the hex alphabet collapses to {h} even when
    # all-digit (RE2 has no lookahead to demand a letter; ids that
    # long are ids either way)
    assert got["/k/{h}"] == (1, 1, False)


# --------------------------------------------------- robots parsing

ROBOTS = """# policies
User-Agent: *
Disallow: /private
Disallow:
Allow: /private/ok

user-agent: graftbot
user-agent: otherbot
Disallow: /only-graft
"""


def test_parse_robots_star_vs_specific(spark):
    from datacamp_etl_spark.operators.urls import parse_robots

    df = spark.createDataFrame(
        [("h.com", ROBOTS)], "host string, robots_txt string"
    )
    star = {
        (r["path_prefix"], r["is_allow"])
        for r in parse_robots(df, agent="nobody").collect()
    }
    # empty-value Disallow dropped; only the * group applies
    assert star == {("/private", False), ("/private/ok", True)}

    spec = {
        (r["path_prefix"], r["is_allow"])
        for r in parse_robots(df, agent="GraftBot").collect()
    }
    # a specific group exists -> * groups ignored; agent match is
    # case-insensitive; consecutive user-agent lines share one group
    assert spec == {("/only-graft", False)}


def test_crawl_allowed_longest_match_and_tie(spark):
    from datacamp_etl_spark.operators.urls import crawl_allowed

    rules = spark.createDataFrame(
        [
            ("h.com", "/a", False, 2),
            ("h.com", "/a/ok", True, 5),
            ("h.com", "/tie", False, 4),
            ("h.com", "/tie", True, 4),
        ],
        "host string, path_prefix string, is_allow boolean,"
        " prefix_len long",
    )
    urls = spark.createDataFrame(
        [
            (1, "https://h.com/a/blocked"),
            (2, "https://h.com/a/ok/page"),
            (3, "https://h.com/free"),
            (4, "https://other.com/a/x"),
            (5, "https://h.com/tie"),
        ],
        "doc_id long, url string",
    )
    got = {
        r["doc_id"]: (r["allowed"], r["matched_prefix"])
        for r in crawl_allowed(urls, rules).collect()
    }
    assert got[1] == (False, "/a")       # prefix match blocks
    assert got[2] == (True, "/a/ok")     # longest match wins
    assert got[3] == (True, None)        # no rule -> allowed
    assert got[4] == (True, None)        # host without rules
    assert got[5] == (True, "/tie")      # length tie -> Allow wins


# ------------------------------------------------------------ HITS

def test_hits_hand_case(spark):
    """Hand-computed 2-iteration exact-integer HITS on a 4-edge
    bipartite graph: u1->{x,y}, u2->{x}, u3->{y}.

    Round 1: a_raw(x)=2e6, a_raw(y)=2e6 -> a=(500000, 500000);
    h_raw(u1)=1e6, h_raw(u2)=5e5, h_raw(u3)=5e5
      -> h=(500000, 250000, 250000).
    Round 2: a_raw(x)=750000, a_raw(y)=750000 -> a=(500000, 500000);
    h_raw(u1)=1e6, u2=5e5, u3=5e5 -> h=(500000, 250000, 250000).
    """
    from datacamp_etl_spark.operators.graph import hits

    edges = spark.createDataFrame(
        [(1, "x"), (1, "y"), (2, "x"), (3, "y")],
        "src long, dst string",
    )
    got = {
        (r["side"], r["node"]): r["score_ppm"]
        for r in hits(edges, iterations=2).collect()
    }
    assert got == {
        ("authority", "x"): 500000,
        ("authority", "y"): 500000,
        ("hub", "1"): 500000,
        ("hub", "2"): 250000,
        ("hub", "3"): 250000,
    }


def test_hits_duplicate_edges_collapse(spark):
    """The edge set is DISTINCT by contract: repeating an edge must
    not change any score."""
    from datacamp_etl_spark.operators.graph import hits

    once = spark.createDataFrame(
        [(1, "x"), (2, "x"), (2, "y")], "src long, dst string"
    )
    twice = spark.createDataFrame(
        [(1, "x"), (1, "x"), (2, "x"), (2, "y"), (2, "y")],
        "src long, dst string",
    )
    as_set = lambda df: {  # noqa: E731
        (r["side"], r["node"], r["score_ppm"]) for r in df.collect()
    }
    assert as_set(hits(once)) == as_set(hits(twice))


def test_hits_l1_conservation(spark):
    """Each side sums to scale minus only integer-floor dust
    (0 <= dust < side cardinality)."""
    from datacamp_etl_spark.operators.graph import hits

    edges = spark.createDataFrame(
        [(u, f"t{u % 3}") for u in range(17)]
        + [(u, f"t{(u * 7) % 5}") for u in range(11)],
        "src long, dst string",
    )
    rows = hits(edges, iterations=2).collect()
    for side, n in (("hub", 17), ("authority", 5)):
        total = sum(r["score_ppm"] for r in rows if r["side"] == side)
        assert 1_000_000 - n < total <= 1_000_000


def test_tokenizer_fertility_invariants(spark, sf_dir):
    """Composition glue (bpe_encode carries its own oracle + hand
    tests): every language bucket appears, fertility >= 1e6 ppm (BPE
    emits at least one token per word), and doc counts fold back to
    the corpus total."""
    from datacamp_etl_spark.queries import QUERIES

    rows = QUERIES["tokenizer_fertility"](spark, sf_dir).collect()
    langs = {r["lang"] for r in rows}
    assert langs == {"de", "en", "es", "fr", "zh"}
    assert sum(r["n_docs"] for r in rows) == 500
    for r in rows:
        assert r["n_tokens"] >= r["n_words"] > 0
        assert r["fertility_ppm"] >= 1_000_000


def test_hits_weighted_hand_case(spark):
    """Weighted HITS on u1->x(w=3), u1->y(w=1), u2->y(w=2).

    R1: a_raw=(3e6, 3e6) -> a=(500000, 500000);
        h_raw(u1)=2e6, h_raw(u2)=1e6 -> h=(666666, 333333).
    R2: a_raw(x)=1999998, a_raw(y)=1333332 -> a=(600000, 400000)
        (both divisions land exactly);
        h_raw(u1)=2200000, h_raw(u2)=800000 -> h=(733333, 266666).
    """
    from datacamp_etl_spark.operators.graph import hits

    edges = spark.createDataFrame(
        [(1, "x", 3), (1, "y", 1), (2, "y", 2)],
        "src long, dst string, w long",
    )
    got = {
        (r["side"], r["node"]): r["score_ppm"]
        for r in hits(edges, weight="w", iterations=2).collect()
    }
    assert got == {
        ("authority", "x"): 600000,
        ("authority", "y"): 400000,
        ("hub", "1"): 733333,
        ("hub", "2"): 266666,
    }


def test_crawl_budget_plan_invariants(spark, sf_dir):
    """Composition glue (robots gate, template stats and
    canonicalization each carry their own oracles + hand tests):
    budget ppm sums to ~1e6 over hosts with nonzero allowed mass,
    fully-blocked hosts get zero budget, and blocked_ppm is exact."""
    from datacamp_etl_spark.queries import QUERIES

    rows = QUERIES["crawl_budget_plan"](spark, sf_dir).collect()
    assert rows
    total = sum(r["budget_ppm"] for r in rows)
    assert 1_000_000 - len(rows) < total <= 1_000_000
    for r in rows:
        assert 0 <= r["blocked_ppm"] <= 1_000_000
        if r["blocked_ppm"] == 1_000_000:
            assert r["budget_ppm"] == 0 and r["allowed_distinct"] == 0
