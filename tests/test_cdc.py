"""CDC digest + diff (P4, J1, J2)."""

from __future__ import annotations

import hashlib

from datacamp_etl_spark.operators.cdc import record_md5, table_diff


def test_record_md5_matches_reference_shape(spark):
    df = spark.createDataFrame([(1, "a", None), (2, "b", "x")], ["k", "f1", "f2"])
    out = record_md5(df, "k", ["f1", "f2"]).collect()
    got = {r["k"]: r["md5_sum"] for r in out}
    # NULL-safe plain concat: MD5(CONCAT(COALESCE(f1,''),COALESCE(f2,'')))
    assert got[1] == hashlib.md5(b"a").hexdigest()
    assert got[2] == hashlib.md5(b"bx").hexdigest()


def test_table_diff_news_and_changes(spark):
    source = spark.createDataFrame(
        [(1, "same"), (2, "changed-new"), (4, "brand-new")], ["k", "v"]
    )
    target = spark.createDataFrame(
        [(1, "same"), (2, "changed-old"), (3, "deleted")], ["k", "v"]
    )
    out = {(r["k"], r["diff"]) for r in table_diff(source, target, "k", ["v"]).collect()}
    assert out == {(4, "n"), (2, "c")}
