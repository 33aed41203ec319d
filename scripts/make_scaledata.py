"""Deterministic scale-up of the driver's sf0.1 fixture to sfN.

The driver only ships sf{0.001,0.01,0.1}; the 100 TB story needs
evidence above sf0.1 (VERDICT r4 #1: "run the headline bench at sf1
and fix anything superlinear"). This script replicates every sf0.1
table ``factor`` times with KEY-SPACE OFFSETS so foreign keys stay
consistent and key cardinality scales with volume (a naive row-copy
would multiply key skew instead):

- orders/lineitem/customer/part/supplier: replica ``i`` shifts every
  key by ``i * ceil_pow10(max_key+1)`` — joins fan out exactly as a
  10x-bigger TPC-H would.
- events: event_id/user_id shift; ts jitters by ``i`` seconds so
  replicas don't collapse into identical timestamps.
- documents: doc_id shifts; replicas append a short replica token to
  ``text`` so cross-replica pairs are NEAR-duplicates (shingle
  overlap high but not 1.0), preserving the dedup workload's shape
  instead of multiplying exact-dup groups 10x.
- embeddings: vec_id shifts; replicas add deterministic per-component
  noise (~1%) so cross-replica vectors are near- but not exact
  duplicates (semantic_dedup/LSH workloads keep realistic geometry).
- region/nation are dimensions and stay fixed.

Replica 0 is byte-identical to sf0.1, so every query's sf0.1 result
is a subset/projection of its scaled behavior. Pure Spark DataFrame
ops, no Python row loops; output is written with a partition count
scaled to the factor.

Usage: python scripts/make_scaledata.py [factor] [out_dir]
       (defaults: 10, /root/repo/.localdata/sf1)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402

SRC = "/root/testdata/sf0.1"


def _pow10_stride(df: DataFrame, col: str) -> int:
    mx = df.agg(F.max(col)).collect()[0][0] or 0
    stride = 1
    while stride <= mx:
        stride *= 10
    return stride


def _replicate(df: DataFrame, factor: int) -> DataFrame:
    return df.crossJoin(
        df.sparkSession.range(factor).select(F.col("id").alias("__rep"))
    )


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.localdata/sf1"
    os.makedirs(out, exist_ok=True)

    from datacamp_etl_spark.session import get_spark

    spark = get_spark("make-scaledata")
    rd = lambda tb: spark.read.parquet(f"{SRC}/{tb}.parquet")  # noqa: E731

    orders, lineitem, customer = rd("orders"), rd("lineitem"), rd("customer")
    part, supplier = rd("part"), rd("supplier")
    ok = _pow10_stride(orders, "o_orderkey")
    ck = _pow10_stride(customer, "c_custkey")
    pk = _pow10_stride(part, "p_partkey")
    sk = _pow10_stride(supplier, "s_suppkey")

    def shift(col: str, stride: int):
        return (F.col(col) + F.col("__rep") * stride).alias(col)

    writes: list[tuple[str, DataFrame, int]] = []

    writes.append((
        "orders",
        _replicate(orders, factor).select(
            shift("o_orderkey", ok), shift("o_custkey", ck),
            "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority",
        ),
        4 * factor,
    ))
    writes.append((
        "lineitem",
        _replicate(lineitem, factor).select(
            shift("l_orderkey", ok), shift("l_partkey", pk),
            shift("l_suppkey", sk), "l_linenumber", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
            "l_linestatus", "l_shipdate",
        ),
        8 * factor,
    ))
    writes.append((
        "customer",
        _replicate(customer, factor).select(
            shift("c_custkey", ck), "c_name", "c_nationkey", "c_acctbal",
            "c_mktsegment",
        ),
        factor,
    ))
    writes.append((
        "part",
        _replicate(part, factor).select(
            shift("p_partkey", pk), "p_name", "p_brand", "p_type", "p_size",
            "p_retailprice",
        ),
        factor,
    ))
    writes.append((
        "supplier",
        _replicate(supplier, factor).select(
            shift("s_suppkey", sk), "s_name", "s_nationkey", "s_acctbal",
        ),
        factor,
    ))

    events = rd("events")
    ek = _pow10_stride(events, "event_id")
    uk = _pow10_stride(events, "user_id")
    writes.append((
        "events",
        _replicate(events, factor).select(
            shift("event_id", ek),
            (F.col("ts") + F.make_interval(secs=F.col("__rep").cast("double")))
            .alias("ts"),
            shift("user_id", uk),
            "event_type", "value", "props",
        ),
        4 * factor,
    ))

    docs = rd("documents")
    dk = _pow10_stride(docs, "doc_id")
    rep_suffix = F.when(F.col("__rep") == 0, F.lit("")).otherwise(
        F.concat(F.lit(" rep"), F.col("__rep").cast("string"))
    )
    writes.append((
        "documents",
        _replicate(docs, factor).select(
            shift("doc_id", dk),
            F.concat(F.col("text"), rep_suffix).alias("text"),
            "lang", "source",
            (F.col("n_chars") + F.length(rep_suffix)).alias("n_chars"),
        ),
        2 * factor,
    ))

    emb = rd("embeddings")
    vk = _pow10_stride(emb, "vec_id")
    # deterministic ~1% per-component jitter, zero for replica 0:
    # noise(dim i) = ((xxhash64(vec_id, rep, i) mod 1000)/1000 - 0.5) * 0.02
    jitter = F.transform(
        F.col("embedding"),
        lambda x, i: (
            x.cast("double")
            + F.signum(F.col("__rep").cast("double"))  # 0 for replica 0
            * (
                (F.pmod(F.xxhash64(F.col("vec_id"), F.col("__rep"), i), F.lit(1000))
                 / 1000.0 - 0.5) * 0.02
            )
        ).cast("float"),
    )
    writes.append((
        "embeddings",
        _replicate(emb, factor).select(
            shift("vec_id", vk), jitter.alias("embedding"), "label",
        ),
        factor,
    ))

    for tb in ("region", "nation"):
        writes.append((tb, rd(tb), 1))

    for tb, df, nparts in writes:
        df.repartition(nparts).write.mode("overwrite").parquet(
            f"{out}/{tb}.parquet"
        )
        print(f"wrote {tb}")

    for tb in ("lineitem", "orders", "documents", "embeddings", "events"):
        n = spark.read.parquet(f"{out}/{tb}.parquet").count()
        print(f"{tb}: {n} rows")
    spark.stop()


if __name__ == "__main__":
    main()
