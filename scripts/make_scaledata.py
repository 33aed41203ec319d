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

``--organic`` (VERDICT r5 #5) swaps the documents table's replica
tokens for ORGANIC near-duplicate structure: each source document
seeds a cluster whose copy count is drawn from a power law (Zipf
tail, deterministic from ``xxhash64(doc_id)``, capped, then rescaled
so the corpus still totals ~factor x n), and each copy applies
CONTROLLED token-level edits — a per-copy edit rate of 2-10% drives
deterministic token drops and substitutions, so intra-cluster
Jaccard spans a realistic band instead of the replica tokens' single
near-1.0 point. Copy 0 is always the unmodified original. Every
other table scales exactly as in replica mode.

Usage: python scripts/make_scaledata.py [factor] [out_dir] [--organic]
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


def _organic_documents(docs: DataFrame, factor: int, stride: int) -> DataFrame:
    """Documents scaled with planted near-dup clusters: power-law copy
    counts (deterministic Zipf tail, rescaled to ~factor x n total) and
    controlled per-copy token edits (2-10% drop + substitute rates)."""
    # copy count = 1 + rescaled Zipf tail min(200, u^(-1/1.1)) - 1:
    # the "+1 then rescale the EXCESS" form keeps a large singleton
    # mass (u near 1 -> exactly 1 copy) while the heavy tail carries
    # the volume — matching observed web-dup cluster-size power laws
    u = (F.pmod(F.xxhash64("doc_id"), F.lit(10000)) + 1) / 10000.0
    seeded = docs.withColumn(
        "__raw", F.least(F.lit(200.0), F.pow(u, F.lit(-1.0 / 1.1)))
    )
    total_raw, n = seeded.agg(F.sum("__raw"), F.count("*")).first()
    scale = (factor - 1) * n / max(float(total_raw) - n, 1.0)
    seeded = seeded.withColumn(
        "__cnt",
        1 + F.round((F.col("__raw") - 1) * scale).cast("int"),
    )
    copies = seeded.select(
        "doc_id", "text", "lang", "source",
        F.explode(
            F.sequence(F.lit(0), F.col("__cnt") - 1)
        ).alias("__copy"),
    )
    # controlled edits: per-copy rate 2-10%; token i drops when
    # h(i) < rate, survivors substitute (suffix mutation) when
    # h(i + 1000) < rate; copy 0 is the unmodified original
    ed = (F.pmod(F.xxhash64("doc_id", "__copy"), F.lit(9)) + 2).alias("__ed")
    copies = copies.withColumn("__ed", ed)

    def h(i):
        return F.pmod(F.xxhash64(F.col("doc_id"), F.col("__copy"), i), F.lit(100))

    toks = F.split(F.col("text"), " ")
    kept = F.filter(
        toks, lambda x, i: (F.col("__copy") == 0) | (h(i) >= F.col("__ed"))
    )
    mutated = F.transform(
        kept,
        lambda x, i: F.when(
            (F.col("__copy") != 0) & (h(i + 1000) < F.col("__ed")),
            F.concat(x, F.lit("q")),
        ).otherwise(x),
    )
    text = F.array_join(mutated, " ")
    return copies.select(
        (F.col("doc_id") + F.col("__copy") * stride).alias("doc_id"),
        text.alias("text"),
        "lang", "source",
        F.length(text).alias("n_chars"),
    )


def main() -> None:
    organic = "--organic" in sys.argv[1:]
    # --only-documents: write just the documents table (the organic
    # fixture shares every other table with the replica sf1 — the
    # caller links them in rather than regenerating ~2 GB twice)
    only_docs = "--only-documents" in sys.argv[1:]
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    factor = int(args[0]) if args else 10
    out = args[1] if len(args) > 1 else (
        "/root/repo/.localdata/sf1organic" if organic
        else "/root/repo/.localdata/sf1"
    )
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
    if organic:
        writes.append((
            "documents", _organic_documents(docs, factor, dk), 2 * factor,
        ))
    else:
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

    if only_docs:
        writes = [w for w in writes if w[0] == "documents"]

    for tb, df, nparts in writes:
        df.repartition(nparts).write.mode("overwrite").parquet(
            f"{out}/{tb}.parquet"
        )
        print(f"wrote {tb}")

    count_tables = (
        ("documents",) if only_docs
        else ("lineitem", "orders", "documents", "embeddings", "events")
    )
    for tb in count_tables:
        n = spark.read.parquet(f"{out}/{tb}.parquet").count()
        print(f"{tb}: {n} rows")
    spark.stop()


if __name__ == "__main__":
    main()
