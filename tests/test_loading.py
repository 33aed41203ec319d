"""Loading operator family (K1-K4, P2, F1, F2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from datacamp_etl_spark.operators import loading as L
from datacamp_etl_spark.operators.mapping import string_value


def _staging(spark):
    return spark.createDataFrame(
        [
            (1, "2021-01-01 00:00:00", None, "alice", 10.0),
            (2, "2021-06-01 00:00:00", None, "bob", 20.0),
            (3, "2021-12-01 00:00:00", None, "carol", 30.0),
        ],
        "id long, date_created string, etl_loaded_date timestamp, name string, amount double",
    ).withColumn("date_created", F.to_timestamp("date_created"))


def test_identity_mapping_excludes_system_columns(spark):
    df = _staging(spark)
    assert L.identity_mapping(df) == {"name": "name", "amount": "amount"}


def test_mapped_append_stamps_record_status(spark):
    out = L.mapped_append(
        _staging(spark),
        {"customer": "name", "src": string_value("crm")},
    )
    assert out.columns == ["customer", "src", "record_status"]
    assert {r["record_status"] for r in out.collect()} == {"loaded"}


def test_mapped_append_condition_with_table_alias(spark):
    # Reference F1: '@TABLE' in conditions refers to the staging alias
    # (loading.rb:187).
    out = L.mapped_append(
        _staging(spark), {"customer": "name"}, condition="@TABLE.amount > 15"
    )
    assert sorted(r["customer"] for r in out.collect()) == ["bob", "carol"]


def test_update_with_map_overwrites_matched_only(spark):
    dataset = spark.createDataFrame(
        [(1, "old-a", "x"), (2, "old-b", "y"), (9, "keep", "z")],
        ["id", "name", "extra"],
    )
    staging = spark.createDataFrame(
        [(1, "new-a"), (2, "new-b"), (7, "no-match")], ["id", "name"]
    )
    out = L.update_with_map(dataset, staging, {"name": "name"}, "id")
    got = {r["id"]: (r["name"], r["extra"]) for r in out.collect()}
    assert got == {1: ("new-a", "x"), 2: ("new-b", "y"), 9: ("keep", "z")}


def test_update_with_map_rejects_key_overwrite(spark):
    df = spark.range(1)
    try:
        L.update_with_map(df, df, {"id": "id"}, "id")
        raise AssertionError("expected ValueError")
    except ValueError:
        pass


def test_finalize_dataset_promotes_loaded_rows(spark):
    ds = spark.createDataFrame(
        [("a", "loaded"), ("b", "new"), ("c", "loaded")], ["k", "record_status"]
    )
    out = L.finalize_dataset(ds, batch_id=7)
    rows = {r["k"]: r for r in out.collect()}
    assert rows["a"]["record_status"] == "new"
    assert rows["a"]["batch_id"] == 7
    assert rows["a"]["created_by"] == "system_loading"
    assert rows["a"]["quality_status"] == "ok"
    assert rows["a"]["is_hidden"] is True
    assert rows["a"]["validity_date"] is None
    assert rows["a"]["created_at"] is not None
    # untouched row keeps nulls
    assert rows["b"]["record_status"] == "new"
    assert rows["b"]["batch_id"] is None


def test_incremental_filter(spark):
    df = _staging(spark)
    out = L.incremental_filter(df, "2021-03-01")
    assert sorted(r["id"] for r in out.collect()) == [2, 3]


def test_set_loaded_flag(spark):
    out = L.set_loaded_flag(_staging(spark))
    assert all(r["etl_loaded_date"] is not None for r in out.collect())
