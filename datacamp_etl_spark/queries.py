"""Query registry: every implemented operator exposed as a
(spark_fn, oracle_sql) pair for the driver's DuckDB correctness gate.

Each entry name corresponds to a SURVEY §2 operator (or an [EXT]
north-star operator). The Spark side uses the engine's operator
modules; the oracle side is ANSI SQL over the same parquet views.

Cross-engine determinism rules (why the casts below exist):
- double sums are order-dependent -> aggregate DECIMAL casts (exact,
  order-independent, identical textual form in Spark and DuckDB)
- double -> string differs between engines (Java "1.0E7") -> any
  stringified numeric goes through DECIMAL first
- ranking ties are broken with the key column so row_number is
  deterministic in both engines
"""

from __future__ import annotations

import os
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from datacamp_etl_spark.operators import loading as L
from datacamp_etl_spark.operators.cdc import table_diff
from datacamp_etl_spark.operators.mapping import number_value, sql_value, string_value

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load a testdata table. The events table carries parquet
    TIMESTAMP(NANOS) which Spark cannot read natively; it is read via
    the nanosAsLong legacy conf and converted to a microsecond
    timestamp (truncation — mirrored in oracles via
    ``date_trunc('microseconds', ts)``)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        return df.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return spark.read.parquet(path)


# =====================================================================
# Reference parity: Loading operator family
# =====================================================================

@register(
    "mapped_append",
    """
    SELECT o_orderkey AS order_key,
           o_custkey AS cust_key,
           o_orderstatus AS status,
           o_totalprice AS total,
           'tpch' AS source_system,
           1 AS priority_rank,
           substr(CAST(o_orderdate AS VARCHAR), 1, 4) AS order_year,
           CAST(NULL AS VARCHAR) AS validity,
           'loaded' AS record_status
    FROM orders
    WHERE o_totalprice > 1000
    """,
)
def q_mapped_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K1+P1 (loading.rb:75-158): mapped append with all five sql_value
    kinds and a WHERE condition using the @TABLE staging alias."""
    mapping = {
        "order_key": "o_orderkey",
        "cust_key": "o_custkey",
        "status": "o_orderstatus",
        "total": "o_totalprice",
        "source_system": string_value("tpch"),
        "priority_rank": number_value(1),
        "order_year": sql_value("substr(CAST(o_orderdate AS STRING), 1, 4)"),
        "validity": None,
    }
    out = L.mapped_append(
        t(spark, sf_dir, "orders"), mapping, condition="@TABLE.o_totalprice > 1000"
    )
    return out.withColumn("validity", F.col("validity").cast("string")).withColumn(
        "priority_rank", F.col("priority_rank").cast("int")
    )


@register(
    "update_join",
    """
    SELECT c.c_custkey,
           c.c_name,
           c.c_nationkey,
           COALESCE(s.new_bal, c.c_acctbal) AS c_acctbal,
           c.c_mktsegment
    FROM customer c
    LEFT JOIN (
        SELECT o_custkey, max(o_totalprice) AS new_bal
        FROM orders GROUP BY o_custkey
    ) s ON c.c_custkey = s.o_custkey
    """,
)
def q_update_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2/J3 (loading.rb:160-196): keyed update-join — overwrite matched
    dataset rows from staging, pass unmatched through."""
    customer = t(spark, sf_dir, "customer")
    staging = (
        t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(F.max("o_totalprice").alias("new_bal"))
    )
    return L.update_with_map(customer, staging, {"c_acctbal": "new_bal"}, "c_custkey")


@register(
    "finalize_dataset",
    """
    SELECT o_orderkey AS order_key,
           'new' AS record_status,
           'system_loading' AS created_by,
           'ok' AS quality_status,
           42 AS batch_id,
           CAST(NULL AS DATE) AS validity_date,
           TRUE AS is_hidden
    FROM orders
    """,
)
def q_finalize_dataset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K4 (loading.rb:203-221): lifecycle promotion loaded->new with
    stamped columns (created_at excluded: nondeterministic NOW())."""
    ds = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("order_key"),
        F.lit("loaded").alias("record_status"),
    )
    out = L.finalize_dataset(ds, batch_id=42)
    return out.select(
        "order_key", "record_status", "created_by", "quality_status",
        F.col("batch_id").cast("int").alias("batch_id"), "validity_date", "is_hidden",
    )


@register(
    "identity_projection",
    """
    SELECT event_id, user_id, event_type, value
    FROM events
    """,
)
def q_identity_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 (loading.rb:52-62): identity mapping excluding system columns.
    The events table stands in for a staging table; its `ts`/`props`
    columns play the excluded system columns."""
    df = t(spark, sf_dir, "events")
    mapping = L.identity_mapping(df, exclude=("ts", "props"))
    return df.select(*[F.col(v).alias(k) for k, v in mapping.items()])


@register(
    "md5_digest",
    """
    SELECT p_partkey,
           md5(concat(coalesce(p_name, ''), coalesce(p_brand, ''),
                      coalesce(p_type, ''), coalesce(CAST(p_size AS VARCHAR), '')))
             AS md5_sum
    FROM part
    """,
)
def q_md5_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 (loading.rb:254-270): NULL-safe plain-concat MD5 row digest."""
    from datacamp_etl_spark.operators.cdc import record_md5

    return record_md5(
        t(spark, sf_dir, "part"), "p_partkey", ["p_name", "p_brand", "p_type", "p_size"]
    )


_DIFF_SRC = """
    SELECT o_orderkey,
           o_orderstatus,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS VARCHAR) AS total_s
    FROM orders
"""
_DIFF_TGT = """
    SELECT o_orderkey,
           o_orderstatus,
           CAST(CAST(CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1
                          ELSE o_totalprice END AS DECIMAL(18,2)) AS VARCHAR) AS total_s
    FROM orders WHERE o_orderkey % 10 <> 0
"""


@register(
    "table_diff",
    f"""
    WITH src AS ({_DIFF_SRC}), tgt AS ({_DIFF_TGT})
    SELECT s.o_orderkey, 'n' AS diff
    FROM src s LEFT JOIN tgt t ON s.o_orderkey = t.o_orderkey
    WHERE t.o_orderkey IS NULL
    UNION ALL
    SELECT s.o_orderkey, 'c' AS diff
    FROM src s JOIN tgt t ON s.o_orderkey = t.o_orderkey
    WHERE s.o_orderstatus <> t.o_orderstatus OR s.total_s <> t.total_s
    """,
)
def q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1+J2 (loading.rb:223-250): MD5 CDC diff — new ('n') via
    left_anti, changed ('c') via inner join + digest inequality. Target
    is a synthesized mutation of orders (10% deleted -> new, every 7th
    perturbed -> changed)."""
    orders = t(spark, sf_dir, "orders")
    total_s = F.col("o_totalprice").cast("decimal(18,2)").cast("string")
    src = orders.select("o_orderkey", "o_orderstatus", total_s.alias("total_s"))
    tgt = orders.where(F.col("o_orderkey") % 10 != 0).select(
        "o_orderkey",
        "o_orderstatus",
        F.when(F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") + 1)
        .otherwise(F.col("o_totalprice"))
        .cast("decimal(18,2)")
        .cast("string")
        .alias("total_s"),
    )
    return table_diff(src, tgt, "o_orderkey", ["o_orderstatus", "total_s"])


@register(
    "incremental_load",
    """
    SELECT event_type,
           count(*) AS n_events,
           sum(CAST(value AS DECIMAL(18,2))) AS sum_value
    FROM events
    WHERE date_trunc('microseconds', ts) > TIMESTAMP '2024-01-04 00:00:00'
    GROUP BY event_type
    """,
)
def q_incremental_load(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2 (loading.rb:142-145): incremental watermark predicate over the
    events staging table + downstream aggregation."""
    df = L.incremental_filter(
        t(spark, sf_dir, "events"), "2024-01-04 00:00:00", watermark_column="ts"
    )
    return df.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("sum_value"),
    )


# =====================================================================
# Analytics breadth (Spark SQL engine over the star schema)
# =====================================================================

@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           sum(CAST(l_quantity AS DECIMAL(18,2))) AS sum_qty,
           sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS sum_base_price,
           sum(CAST(l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS sum_disc_price,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: scan-heavy groupBy with decimal-exact sums."""
    li = t(spark, sf_dir, "lineitem")
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).alias("sum_qty"),
            F.sum(price).alias("sum_base_price"),
            F.sum(price * (1 - disc)).alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    """
    SELECT l.l_orderkey,
           sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> join -> agg -> top-k.
    customer is broadcast (small dim); lineitem never shuffles wider
    than (orderkey, revenue)."""
    c = t(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") < F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    l = t(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp")
    )
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        1 - F.col("l_discount").cast("decimal(18,2)")
    )
    return (
        l.join(F.broadcast(o.join(F.broadcast(c), o.o_custkey == c.c_custkey)),
               l.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(rev).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    """
    SELECT n.n_name,
           sum(CAST(l.l_extendedprice AS DECIMAL(18,2))
               * (1 - CAST(l.l_discount AS DECIMAL(18,2)))) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
    GROUP BY n.n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape (no c_nation = s_nation clause; testdata schema
    keeps it simpler): star join with all dims broadcast."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    rev = F.col("l_extendedprice").cast("decimal(18,2)") * (
        1 - F.col("l_discount").cast("decimal(18,2)")
    )
    dims = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "n_name")
    )
    return (
        l.join(F.broadcast(o), l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(dims), l.l_suppkey == dims.s_suppkey)
        .groupBy("n_name")
        .agg(F.sum(rev).alias("revenue"))
    )


@register(
    "topk_orders_per_customer",
    """
    SELECT * FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
)
def q_topk_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window top-k per group (SURVEY §2.7 — free upgrade over the
    reference). Ties broken by key for cross-engine determinism."""
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), "o_orderkey")
    return (
        t(spark, sf_dir, "orders")
        .select(
            "o_custkey", "o_orderkey", "o_totalprice",
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 3)
    )
