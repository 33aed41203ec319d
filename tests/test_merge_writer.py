"""Partition-scoped MERGE TableWriter (sources/warehouse.py:merge) —
SURVEY §7 risk #1: matched-update / not-matched-insert that rewrites
ONLY touched partitions, under the per-table run lock."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from datacamp_etl_spark.sources.warehouse import (
    TableLockedError,
    Warehouse,
)


def _file_state(root: str) -> dict[str, tuple[int, float]]:
    """path -> (size, mtime) for every data file under root."""
    out = {}
    for r, _d, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(r, f)
                st = os.stat(p)
                out[os.path.relpath(p, root)] = (st.st_size, st.st_mtime)
    return out


@pytest.fixture()
def wh(spark, tmp_path):
    return Warehouse(spark, str(tmp_path), "ds")


def _seed(spark, wh, n=100, buckets=8):
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % buckets).alias("b"),
        (F.col("id") * 10).alias("v"),
    )
    wh.save(df, "t", partition_by=["b"])
    return df


def test_merge_rewrites_only_touched_partitions(spark, wh):
    _seed(spark, wh)
    before = _file_state(wh.path("t"))
    # updates touch keys 3 and 11 -> buckets 3 only
    src = spark.createDataFrame([(3, 999), (11, 888)], "k long, nv long")
    res = wh.merge(src, "t", "k", update_cols={"v": "nv"}, insert=False)
    assert res["touched_partitions"] == [[3]]
    after = _file_state(wh.path("t"))
    untouched_b = {
        p for p in before if not p.startswith("b=3" + os.sep)
    }
    # every file outside b=3 is byte-for-byte the same file
    for p in untouched_b:
        assert after[p] == before[p], p
    # b=3 was rewritten (different file names or mtimes)
    assert {p for p in before if p.startswith("b=3" + os.sep)} != {
        p for p in after if p.startswith("b=3" + os.sep)
    } or any(
        after[p] != before[p]
        for p in after
        if p.startswith("b=3" + os.sep)
    )
    rows = {r["k"]: r["v"] for r in wh.table("t").collect()}
    assert rows[3] == 999 and rows[11] == 888
    assert rows[4] == 40 and len(rows) == 100


def test_merge_inserts_need_partition_cols(spark, wh):
    _seed(spark, wh)
    src = spark.createDataFrame([(200, 1)], "k long, v long")
    with pytest.raises(ValueError, match="partition columns"):
        wh.merge(src, "t", "k", insert=True)


def test_merge_insert_and_update_together(spark, wh):
    _seed(spark, wh)
    src = spark.createDataFrame(
        [(5, 5 % 8, 555), (200, 200 % 8, 777)], "k long, b long, v long"
    )
    res = wh.merge(src, "t", "k")
    assert res["touched_partitions"] == [[0], [5]]
    rows = {r["k"]: r["v"] for r in wh.table("t").collect()}
    assert rows[5] == 555  # matched update
    assert rows[200] == 777  # not-matched insert
    assert len(rows) == 101


def test_merge_no_matches_is_a_noop(spark, wh):
    _seed(spark, wh)
    before = _file_state(wh.path("t"))
    src = spark.createDataFrame([(5000, 1)], "k long, nv long")
    res = wh.merge(src, "t", "k", update_cols={"v": "nv"}, insert=False)
    assert res["touched_partitions"] == []
    assert _file_state(wh.path("t")) == before


def test_table_lock_contention_and_release(spark, wh):
    _seed(spark, wh)
    with wh.table_lock("t", owner="run-a"):
        with pytest.raises(TableLockedError, match="run-a"):
            with wh.table_lock("t", owner="run-b"):
                pass
        # merge() takes the lock itself -> contended too
        src = spark.createDataFrame([(3, 9)], "k long, nv long")
        with pytest.raises(TableLockedError):
            wh.merge(src, "t", "k", update_cols={"v": "nv"}, insert=False)
    # released: works now
    res = wh.merge(src, "t", "k", update_cols={"v": "nv"}, insert=False)
    assert res["touched_partitions"] == [[3]]


def test_merge_unpartitioned_degenerates_to_rewrite(spark, wh):
    df = spark.range(10).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    wh.save(df, "flat")
    src = spark.createDataFrame([(1, 99), (50, 77)], "k long, v long")
    wh.merge(src, "flat", "k")
    rows = {r["k"]: r["v"] for r in wh.table("flat").collect()}
    assert rows[1] == 99 and rows[50] == 77 and len(rows) == 11


def test_update_join_entry_parity_across_writer_paths(spark, sf_dir):
    """The flag-routed entries must produce identical rows on both
    writer paths (the CORRECTNESS contract either way)."""
    from datacamp_etl_spark.queries import QUERIES

    def run(name):
        got = sorted(
            map(tuple, QUERIES[name](spark, sf_dir).collect())
        )
        return got

    for name in ("update_join", "scd2_customer_segment"):
        base = run(name)
        os.environ["SPARK_GRAFT_WRITER"] = "merge"
        try:
            merged = run(name)
        finally:
            del os.environ["SPARK_GRAFT_WRITER"]
        assert merged == base, name
