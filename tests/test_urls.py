"""URL canonicalization + host curation (operators/urls.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datacamp_etl_spark.operators.urls import (
    canonicalize_url,
    host_stats,
    url_host,
)


def _canon(spark, url: str):
    [r] = (
        spark.createDataFrame([(url,)], "url string")
        .select(
            canonicalize_url("url").alias("c"),
            url_host("url").alias("h"),
        )
        .collect()
    )
    return r["c"], r["h"]


def test_canonicalize_full_mess(spark):
    c, h = _canon(
        spark,
        "  HTTP://WWW.Example.COM:80/Path/A?z=1&utm_source=x&a=2"
        "&gclid=abc&b=#frag  ",
    )
    # scheme+host lowered, :80 dropped for http, tracking params off,
    # survivors sorted, fragment off, path case preserved, the
    # empty-value param 'b=' survives (it is not a tracking key)
    assert c == "http://www.example.com/Path/A?a=2&b=&z=1"
    assert h == "www.example.com"


def test_default_port_rules(spark):
    assert _canon(spark, "https://h.com:443/x")[0] == "https://h.com/x"
    assert _canon(spark, "http://h.com:80/x")[0] == "http://h.com/x"
    # mismatched "default" port is NOT default for that scheme — kept
    assert _canon(spark, "http://h.com:443/x")[0] == "http://h.com:443/x"
    assert _canon(spark, "https://h.com:8443/x")[0] == "https://h.com:8443/x"


def test_empty_path_and_query(spark):
    assert _canon(spark, "https://H.com")[0] == "https://h.com/"
    assert _canon(spark, "https://h.com?")[0] == "https://h.com/"
    assert (
        _canon(spark, "https://h.com?utm_source=a&utm_medium=b")[0]
        == "https://h.com/"
    )


def test_userinfo_preserved_verbatim(spark):
    # userinfo is identity-bearing — never case-folded; host still is
    c, h = _canon(spark, "ftp://UserX:Pw@Host.COM/d")
    assert c == "ftp://UserX:Pw@host.com/d"
    assert h == "host.com"


def test_non_url_shapes_are_null(spark):
    for bad in ("not a url", "h.com/path", "", "://x", "1234"):
        c, h = _canon(spark, bad)
        assert c is None and h is None, bad


def test_param_sort_is_bytewise(spark):
    c, _ = _canon(spark, "https://h.com/p?b=2&B=1&a=3")
    # uppercase sorts before lowercase in byte order
    assert c == "https://h.com/p?B=1&a=3&b=2"


def test_host_stats_exact(spark):
    df = spark.createDataFrame(
        [
            ("https://A.com/x",),
            ("https://a.com/x#f",),  # same canonical as row 1
            ("https://a.com/y",),
            ("https://b.com/",),
            ("garbage",),  # not URL-shaped: excluded
        ],
        "url string",
    )
    rows = {r["host"]: r for r in host_stats(df, "url").collect()}
    assert rows["a.com"]["n_urls"] == 3
    assert rows["a.com"]["n_distinct"] == 2
    assert rows["b.com"]["n_urls"] == 1
    assert rows["a.com"]["share_ppm"] == 750_000
    assert rows["b.com"]["share_ppm"] == 250_000


def test_canonical_is_idempotent(spark):
    urls = [
        "HTTP://WWW.Example.COM:80/Path?z=1&utm_source=x&a=2#f",
        "https://h.com",
        "ftp://U@Host.COM:21/d?b=&a=1",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    once = df.select(canonicalize_url("url").alias("c"))
    twice = once.select(canonicalize_url("c").alias("c2"))
    assert [r["c"] for r in once.collect()] == [
        r["c2"] for r in twice.collect()
    ]
