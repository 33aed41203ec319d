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
