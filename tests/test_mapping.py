"""Mapping DSL (P1) — the five sql_value kinds (loading.rb:101-132)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from datacamp_etl_spark.operators.mapping import (
    apply_mapping,
    date_value,
    number_value,
    sql_value,
    string_value,
)


def test_five_value_kinds(spark):
    df = spark.createDataFrame(
        [("a", "5.1.2021"), ("b", "15.12.2021")], ["name", "dstr"]
    )
    mapping = {
        "ref": "name",                      # column reference
        "lit": string_value("hello"),       # string literal
        "num": number_value(42),            # numeric literal
        "raw": sql_value("upper(name)"),    # raw SQL expression
        "dt": date_value("dstr"),           # STR_TO_DATE(v, '%d.%m.%Y')
        "nul": None,                        # NULL
    }
    rows = {r["ref"]: r for r in apply_mapping(df, mapping).collect()}
    assert rows["a"]["lit"] == "hello"
    assert rows["a"]["num"] == 42
    assert rows["a"]["raw"] == "A"
    # single-digit day/month parity (SURVEY §7 risk 4)
    assert rows["a"]["dt"] == datetime.date(2021, 1, 5)
    assert rows["b"]["dt"] == datetime.date(2021, 12, 15)
    assert rows["a"]["nul"] is None


def test_mapping_preserves_field_order(spark):
    df = spark.range(1)
    out = apply_mapping(df, {"b": sql_value("1"), "a": sql_value("2")})
    assert out.columns == ["b", "a"]


def test_column_passthrough(spark):
    df = spark.range(3)
    out = apply_mapping(df, {"x": F.col("id") * 2})
    assert [r["x"] for r in out.orderBy("x").collect()] == [0, 2, 4]
