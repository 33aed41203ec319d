"""Phase-0 end-to-end slice (SURVEY §7): orders parquet as staging ->
mapped append with all five sql_value kinds -> finalize -> batch row +
status transitions. Exercises O3, K1, K4, K8, P1-P3, C1-C6."""

from __future__ import annotations

import os

from datacamp_etl_spark.jobs.loading_job import LoadingJob
from datacamp_etl_spark.operators.mapping import number_value, sql_value, string_value

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


class OrdersLoading(LoadingJob):
    def run(self):
        src = self.manager.spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
        self.staging.save(src, "orders_staging")
        mapping = {
            "order_key": "o_orderkey",
            "cust_key": "o_custkey",
            "status": "o_orderstatus",
            "total": "o_totalprice",
            "source_system": string_value("tpch"),
            "priority_rank": number_value(1),
            "year_str": sql_value("substr(cast(o_orderdate as string), 1, 4)"),
            "nothing": None,
        }
        self.append_table_with_map(
            "orders_staging", "orders_dataset", mapping,
            {"condition": "@TABLE.o_totalprice > 1000", "etl_loaded_date": False},
        )
        self.finalize_dataset_loading("orders_dataset")


def test_orders_loading_end_to_end(manager):
    job = OrdersLoading(manager)
    manager.run_job(job)
    assert job.status == "ok", job.message

    out = manager.dataset.table("orders_dataset")
    n_src = manager.spark.read.parquet(os.path.join(SF_DIR, "orders.parquet")).where(
        "o_totalprice > 1000"
    ).count()
    assert out.count() == n_src
    row = out.limit(1).collect()[0]
    assert row["source_system"] == "tpch"
    assert row["priority_rank"] == 1
    assert row["nothing"] is None
    assert row["record_status"] == "new"          # finalized
    assert row["created_by"] == "system_loading"
    assert row["batch_id"] == job.batch_id

    # K8 batch provenance
    batches = manager.store.read("etl_batches")
    assert len(batches) == 1
    assert batches.iloc[0]["batch_type"] == "loading"
    assert batches.iloc[0]["batch_source"] == "orders"
    assert batches.iloc[0]["username"] == "system_loading"

    # O3 status rows
    statuses = manager.store.read("etl_job_status")
    assert list(statuses["status"]) == ["ok"]
    assert statuses.iloc[0]["phase"] == "finalize"
