"""Strict local replica of the driver's CORRECTNESS gate.

Runs every queries() entry on Spark and its oracle_sql() on DuckDB at
the given sf dir, and compares with REPRESENTATION-SENSITIVE string
values (the driver hashes stringified cells, so Decimal('1.20') vs
float 1.2 is a mismatch even though the values are equal). Prints one
JSON object per query and a summary.

Usage: python scripts/selfcheck_strict.py [sf_dir] [name ...]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_run(sf_dir: str, sql: str):
    con = duckdb.connect()
    for tb in TABLES:
        path = os.path.join(sf_dir, f"{tb}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {tb} AS SELECT * FROM read_parquet('{path}')"
            )
    return con.execute(sql).fetchdf()


def _cell(v) -> str:
    import numpy as np
    import pandas as pd

    if isinstance(v, (list, tuple, np.ndarray)):
        return str(list(v))
    try:
        if pd.isna(v):  # None / NaN / NaT all normalize to NULL
            return "NULL"
    except (TypeError, ValueError):
        pass
    return str(v)


def norm_frame(pdf):
    """Sort columns by name, stringify every cell (NA -> NULL), sort rows."""
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    mat = [[_cell(v) for v in row] for row in pdf.itertuples(index=False)]
    mat.sort()
    return cols, mat


def value_hash(mat) -> str:
    h = hashlib.md5()
    for row in mat:
        h.update("\x1f".join(row).encode())
        h.update(b"\x1e")
    return h.hexdigest()


def _pq_file_col_spans(path: str, cols: list[str]) -> dict[str, float]:
    """Per-parquet-file min/max spans from the footers, averaged over
    files and normalized by the global span: ~1.0 means every file
    covers the whole value range (no clustering), ~1/n_files means
    perfect disjoint clustering. Zero data read — footers only."""
    import pyarrow.parquet as pq

    per_file: dict[str, list[tuple[float, float]]] = {c: [] for c in cols}
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(root, f)).metadata
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
            for c in cols:
                mns, mxs = [], []
                for rg in range(md.num_row_groups):
                    st = md.row_group(rg).column(idx[c]).statistics
                    mns.append(float(st.min))
                    mxs.append(float(st.max))
                per_file[c].append((min(mns), max(mxs)))
    out = {}
    for c, spans in per_file.items():
        glo = max(x for _, x in spans) - min(n for n, _ in spans)
        avg = sum(x - n for n, x in spans) / len(spans)
        out[c] = avg / glo if glo else 1.0
    return out


def run_layout_checks(spark, sf_dir: str) -> list[dict]:
    """Oracle-style gates for the physical-layout operators
    (sources/layout.py): assertions on FILE STATISTICS as data, not
    just pytest invariants. Emitted as selfcheck records so layout
    regressions fail the same gate queries do."""
    import math
    import shutil

    from datacamp_etl_spark.sources.evolution import read_evolved
    from datacamp_etl_spark.sources.layout import (
        compact,
        file_stats,
        write_zordered,
    )

    scratch = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".localdata", "layout-selfcheck",
    )
    shutil.rmtree(scratch, ignore_errors=True)
    os.makedirs(scratch, exist_ok=True)
    records = []
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    n_orders = orders.count()
    try:
        # --- compact: 64 fragmented files -> ceil(bytes/target) files,
        # rows preserved, per-file size within 2x of target
        frag = os.path.join(scratch, "frag")
        orders.repartition(64).write.mode("overwrite").parquet(frag)
        before = file_stats(frag)
        target = max(1, before["total_bytes"] // 4)
        res = compact(spark, frag, target_bytes=target, sort_by=["o_orderkey"])
        want_files = max(1, math.ceil(before["total_bytes"] / target))
        got_rows = spark.read.parquet(frag).count()
        rec = {
            "name": "layout_compact",
            "before_files": before["n_files"],
            "after_files": res["after"]["n_files"],
            "want_files": want_files,
            "rows_before": n_orders,
            "rows_after": got_rows,
        }
        rec["pass"] = (
            before["n_files"] == 64
            and res["after"]["n_files"] == want_files
            and got_rows == n_orders
        )
        records.append(rec)

        # --- write_zordered: per-file footer spans on BOTH curve
        # columns must shrink materially vs an unclustered write
        plain = os.path.join(scratch, "plain")
        orders.repartition(8).write.mode("overwrite").parquet(plain)
        zord = os.path.join(scratch, "zord")
        write_zordered(
            orders, zord, ["o_custkey", "o_totalprice"], num_files=8
        )
        plain_spans = _pq_file_col_spans(plain, ["o_custkey", "o_totalprice"])
        z_spans = _pq_file_col_spans(zord, ["o_custkey", "o_totalprice"])
        z_rows = spark.read.parquet(zord).count()
        rec = {
            "name": "layout_zorder_span",
            "plain_span_frac": {k: round(v, 4) for k, v in plain_spans.items()},
            "zorder_span_frac": {k: round(v, 4) for k, v in z_spans.items()},
            "rows": z_rows,
        }
        rec["pass"] = (
            z_rows == n_orders
            # every curve dimension clusters: file boxes cover < 60%
            # of the global span on average, and beat the plain write
            and all(v < 0.6 for v in z_spans.values())
            and all(z_spans[c] < plain_spans[c] for c in z_spans)
        )
        records.append(rec)

        # --- read_evolved: three generations with drifted schemas
        # conform to the target and union without mis-binding
        g1 = os.path.join(scratch, "gen1")
        g2 = os.path.join(scratch, "gen2")
        orders.select("o_orderkey", "o_custkey").limit(100).write.mode(
            "overwrite"
        ).parquet(g1)
        orders.selectExpr(
            "o_custkey", "o_orderkey", "CAST(o_totalprice AS FLOAT) AS o_totalprice"
        ).limit(50).write.mode("overwrite").parquet(g2)
        target_ddl = "o_orderkey bigint, o_custkey bigint, o_totalprice double"
        ev = read_evolved(spark, [g1, g2], target_ddl)
        rec = {
            "name": "layout_read_evolved",
            "rows": ev.count(),
            "schema": ev.schema.simpleString(),
            "gen1_nulls": ev.where("o_totalprice IS NULL").count(),
        }
        rec["pass"] = (
            rec["rows"] == 150
            and rec["gen1_nulls"] == 100
            and rec["schema"]
            == "struct<o_orderkey:bigint,o_custkey:bigint,o_totalprice:double>"
        )
        records.append(rec)
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    return records


def run_skew_checks(spark, sf_dir: str) -> list[dict]:
    """Skewed-key gate (FIXTURES.md 'skewed orders'): one customer is
    deterministically assigned ~20% of all orders, then the salted
    join must (a) produce EXACTLY the plain join's aggregate result
    and (b) not run slower than 2x the plain join — evidence that the
    skew machinery is correct and non-pathological, beyond AQE config
    flags."""
    import time

    from pyspark.sql import functions as F

    from datacamp_etl_spark.operators.skew import salted_join

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    customer = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    hot = customer.agg(F.min("c_custkey")).collect()[0][0]
    skewed = orders.withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") % 5 == 0, F.lit(hot)).otherwise(
            F.col("o_custkey")
        ),
    )
    right = customer.select("c_custkey", "c_mktsegment").withColumnRenamed(
        "c_custkey", "o_custkey"
    )

    def agg(df):
        return sorted(
            map(
                tuple,
                df.groupBy("c_mktsegment")
                .agg(
                    F.count("*").alias("n"),
                    F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("s"),
                )
                .collect(),
            )
        )

    t0 = time.perf_counter()
    plain = agg(skewed.join(right, "o_custkey"))
    t_plain = time.perf_counter() - t0
    t0 = time.perf_counter()
    salted = agg(salted_join(skewed, right, ["o_custkey"], salt=16))
    t_salted = time.perf_counter() - t0
    hot_share = (
        skewed.where(F.col("o_custkey") == hot).count() / max(1, skewed.count())
    )
    rec = {
        "name": "skew_salted_join_parity",
        "hot_key_share": round(hot_share, 3),
        "plain_sec": round(t_plain, 3),
        "salted_sec": round(t_salted, 3),
        "groups": len(plain),
        "pass": bool(plain == salted and plain and t_salted < 2 * t_plain + 1.0),
    }
    return [rec]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("selfcheck")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", "8g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from datacamp_etl_spark.operators.spread import release_engine_caches
    from datacamp_etl_spark.queries import ORACLE, QUERIES

    names = [n for n in sorted(QUERIES) if not only or n in only]
    n_pass = n_fail = n_weak = 0
    failures = []
    for name in names:
        rec = {"name": name}
        try:
            sdf = QUERIES[name](spark, sf_dir)
            spdf = sdf.toPandas()
            rec["spark_rows"] = len(spdf)
            if name not in ORACLE:
                rec["oracle"] = "none (rows-only)"
                n_weak += 1
                print(json.dumps(rec))
                continue
            opdf = duck_run(sf_dir, ORACLE[name])
            rec["oracle_rows"] = len(opdf)
            rec["rows_match"] = len(spdf) == len(opdf)
            s_cols, s_mat = norm_frame(spdf)
            o_cols, o_mat = norm_frame(opdf)
            rec["schema_match"] = s_cols == o_cols
            rec["hash_match"] = value_hash(s_mat) == value_hash(o_mat)
            if rec["rows_match"] and rec["schema_match"] and rec["hash_match"]:
                n_pass += 1
            else:
                n_fail += 1
                diffs = [
                    (a, b) for a, b in zip(s_mat, o_mat) if a != b
                ][:2]
                rec["first_diffs"] = diffs
                if not rec["schema_match"]:
                    rec["cols"] = [s_cols, o_cols]
                failures.append(name)
        except Exception as e:  # noqa: BLE001
            rec["err"] = f"{type(e).__name__}: {e}"[:500]
            n_fail += 1
            failures.append(name)
        release_engine_caches()
        print(json.dumps(rec), flush=True)

    # layout + skew gates run with the full registry or on request
    extra: list[dict] = []
    if not only or only & {"layout", "layout_compact", "layout_zorder_span",
                           "layout_read_evolved"}:
        extra += run_layout_checks(spark, sf_dir)
    if not only or "skew" in only:
        extra += run_skew_checks(spark, sf_dir)
    for rec in extra:
        if rec["pass"]:
            n_pass += 1
        else:
            n_fail += 1
            failures.append(rec["name"])
        print(json.dumps(rec), flush=True)

    print(
        json.dumps(
            {
                "summary": True,
                "pass": n_pass,
                "fail": n_fail,
                "rows_only": n_weak,
                "failures": failures,
            }
        )
    )
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
