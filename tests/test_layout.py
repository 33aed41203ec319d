"""Physical layout [EXT]: compaction, sorted writes, bucketed tables."""

from __future__ import annotations

import pyarrow.parquet as pq
import glob
import os

from pyspark.sql import functions as F

from datacamp_etl_spark.sources import layout
from tests.conftest import load


def test_compact_small_files(spark, sf_dir, tmp_path):
    """64 tiny files -> a handful, same rows."""
    path = str(tmp_path / "shattered")
    orders = load(spark, sf_dir, "orders")
    orders.repartition(64).write.parquet(path)
    assert layout.file_stats(path)["n_files"] == 64

    report = layout.compact(spark, path, target_bytes=1 << 30)
    assert report["after"]["n_files"] == 1
    assert report["before"]["n_files"] == 64

    got = spark.read.parquet(path)
    assert got.count() == orders.count()
    assert sorted(got.columns) == sorted(orders.columns)


def test_compact_preserves_contents_exactly(spark, sf_dir, tmp_path):
    path = str(tmp_path / "t")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    li.repartition(16).write.parquet(path)
    before = sorted(map(tuple, spark.read.parquet(path).collect()))
    layout.compact(spark, path, target_bytes=1 << 30, sort_by=["l_orderkey"])
    after = sorted(map(tuple, spark.read.parquet(path).collect()))
    assert before == after


def test_write_sorted_files_have_disjoint_ranges(spark, sf_dir, tmp_path):
    """Range-partition + in-file sort -> each file owns a disjoint
    o_orderkey range (tight row-group stats = data skipping)."""
    path = str(tmp_path / "sorted")
    orders = load(spark, sf_dir, "orders")
    layout.write_sorted(orders, path, sort_by=["o_orderkey"], range_partitions=4)

    ranges = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        col_idx = md.schema.names.index("o_orderkey")
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(col_idx).statistics
            mins.append(st.min)
            maxs.append(st.max)
        ranges.append((min(mins), max(maxs)))
    ranges.sort()
    assert len(ranges) >= 2
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo, ranges  # disjoint key ranges across files


def test_write_sorted_max_records_splits_files(spark, sf_dir, tmp_path):
    path = str(tmp_path / "capped")
    orders = load(spark, sf_dir, "orders")  # sf0.001: 1500 rows
    n = orders.count()
    layout.write_sorted(
        orders.coalesce(1), path, sort_by=["o_orderkey"], max_records_per_file=500
    )
    stats = layout.file_stats(path)
    assert stats["n_files"] >= (n + 499) // 500


def test_write_bucketed_zero_exchange_join(spark, sf_dir, tmp_path):
    from datacamp_etl_spark import plans

    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    layout.write_bucketed(
        o, "lo_orders", str(tmp_path / "o"), bucket_by="o_orderkey",
        buckets=4, sort_by="o_orderkey",
    )
    layout.write_bucketed(
        li, "lo_lineitem", str(tmp_path / "l"), bucket_by="l_orderkey",
        buckets=4, sort_by="l_orderkey",
    )
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("lo_orders").join(
            spark.table("lo_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        assert plans.count_exchanges(joined) == 0, plans.explain_str(joined)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS lo_orders")
        spark.sql("DROP TABLE IF EXISTS lo_lineitem")


def test_zorder_clusters_both_dimensions(spark, tmp_path):
    """Z-ordered files hold tight min/max boxes in BOTH columns: the
    mean per-file span must shrink well below the global span on each
    dimension (a plain x-sort would leave y spans ~global)."""
    import glob

    import pyarrow.parquet as pq

    from datacamp_etl_spark.sources.layout import write_zordered

    # 64x64 grid, shuffled order
    df = (
        spark.range(4096)
        .selectExpr(
            "CAST(id % 64 AS LONG) AS x",
            "CAST(id DIV 64 AS LONG) AS y",
        )
        .orderBy(F.md5(F.concat_ws(":", F.col("x"), F.col("y"))))
    )
    out = str(tmp_path / "zord")
    write_zordered(df, out, ["x", "y"], num_files=16, bits=6)

    spans = {"x": [], "y": []}
    for f in glob.glob(out + "/*.parquet"):
        t = pq.read_table(f)
        for c in ("x", "y"):
            col = t.column(c).to_pylist()
            if col:
                spans[c].append(max(col) - min(col))
    for c in ("x", "y"):
        mean_span = sum(spans[c]) / len(spans[c])
        # global span is 63; 16 z-tiles over a 64x64 grid should box
        # each dimension into ~a quarter of the domain or less
        assert mean_span <= 32, (c, spans[c])
    # round-trip integrity
    assert spark.read.parquet(out).count() == 4096


def test_zorder_key_rejects_bit_overflow_and_all_null(spark):
    """Interleaving must fit a signed 64-bit key, and an all-NULL
    column has no min/max to scale by — both raise, never corrupt."""
    import pytest

    from datacamp_etl_spark.sources.layout import zorder_key

    df = spark.range(10).selectExpr(
        "id AS a", "id AS b", "id AS c", "id AS d", "id AS e",
        "CAST(NULL AS LONG) AS nl",
    )
    with pytest.raises(ValueError, match="does not fit a signed"):
        zorder_key(df, ["a", "b", "c", "d", "e"], bits=16)
    with pytest.raises(ValueError, match="entirely NULL"):
        zorder_key(df, ["a", "nl"], bits=8)
    # 5 cols x 12 bits = 60 interleaved bits: fine
    assert zorder_key(df, ["a", "b", "c", "d", "e"], bits=12) is not None
