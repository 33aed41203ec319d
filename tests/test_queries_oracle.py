"""Local replica of the driver's correctness gate: run every
queries() entry on Spark and its oracle_sql() on DuckDB over the same
parquet, compare row counts + order-insensitive values."""

from __future__ import annotations

import math
import os

import duckdb
import pytest

from datacamp_etl_spark.queries import ORACLE, QUERIES

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _duck(sql: str):
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    return con.execute(sql).fetchdf()


def _norm_cell(v):
    if v is None:
        return "NULL"
    import decimal

    if isinstance(v, decimal.Decimal):
        v = float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return f"{v:.6f}"
    try:
        import pandas as pd

        if v is pd.NaT or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
    except Exception:
        pass
    s = str(v)
    return s


def _normalize(rows, columns):
    cols = sorted(columns)
    out = []
    for r in rows:
        out.append(tuple(_norm_cell(r[c]) for c in cols))
    return sorted(out)


@pytest.mark.parametrize("name", sorted(ORACLE))
def test_query_matches_oracle(spark, name):
    sdf = QUERIES[name](spark, SF_DIR)
    spark_rows = [row.asDict() for row in sdf.collect()]
    ddf = _duck(ORACLE[name])
    duck_rows = ddf.to_dict("records")

    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs oracle {len(duck_rows)}"
    )
    assert sorted(sdf.columns) == sorted(ddf.columns.tolist()), (
        f"{name}: columns {sorted(sdf.columns)} vs {sorted(ddf.columns.tolist())}"
    )
    s_norm = _normalize(spark_rows, sdf.columns)
    d_norm = _normalize(duck_rows, ddf.columns.tolist())
    mismatches = [
        (a, b) for a, b in zip(s_norm, d_norm) if a != b
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"
