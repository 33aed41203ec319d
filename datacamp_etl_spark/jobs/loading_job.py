"""Loading job base class (reference ``lib/etl/loading.rb``).

``ETL::Loading`` couples the Loading operator family (K1-K8) to the job
lifecycle: ``prepare`` records an ``etl_batches`` provenance row (K8,
``loading.rb:29-46``); helpers run mapped appends/updates and
finalization against the warehouse; ``set_loaded_flag`` stamps the
staging watermark (K3).

Declared-but-unpopulated reference surface carried over:
``output_tables``, ``temporary_tables``, ``enumeration_tables``
attr_readers (``loading.rb:25``).
"""

from __future__ import annotations

from datetime import datetime, timezone
from typing import Any, Mapping as TMapping

from pyspark.sql import DataFrame

from datacamp_etl_spark.jobs.job import Job
from datacamp_etl_spark.operators import loading as L
from datacamp_etl_spark.operators.cdc import record_md5, table_diff

__all__ = ["LoadingJob"]


class LoadingJob(Job):
    job_type = "loading"

    def __init__(self, manager, bundle=None):
        super().__init__(manager, bundle)
        self.batch_id: int | None = None
        self.data_source_name: str | None = None
        self.data_source_url: str | None = None
        self.output_tables: list[str] = []
        self.temporary_tables: list[str] = []
        self.enumeration_tables: list[str] = []

    # -- K8: batch provenance (loading.rb:29-46) -----------------------
    def prepare(self) -> None:
        now = datetime.now(timezone.utc).replace(tzinfo=None)
        name = self.data_source_name or self.defaults.get("data_source_name")
        url = self.data_source_url or self.defaults.get("data_source_url")
        self.batch_id = self.manager.store.insert(
            "etl_batches",
            {
                "batch_type": "loading",
                "batch_source": self.name,
                "data_source_name": name,
                "data_source_url": url,
                "batch_date": now,
                "username": "system_loading",
                "created_at": now,
                "updated_at": now,
            },
        )

    # -- staging/dataset access ---------------------------------------
    @property
    def staging(self):
        return self.manager.staging

    @property
    def dataset(self):
        return self.manager.dataset

    def staging_system_columns(self) -> tuple[str, ...]:
        return L.STAGING_SYSTEM_COLUMNS

    def create_identity_mapping(self, source_table: str) -> dict[str, str]:
        return L.identity_mapping(self.staging.table(source_table))

    # -- K1 (loading.rb:134-158) --------------------------------------
    def append_table_with_map(
        self,
        source_table: str,
        dataset_table: str,
        mapping: TMapping[str, Any],
        options: dict[str, Any] | None = None,
    ) -> None:
        options = options or {}
        self.phase = "mapping"
        src = self.staging.table(source_table)
        out = L.mapped_append(src, mapping, condition=options.get("condition"))
        self.dataset.save(out, dataset_table, mode="append")
        if options.get("etl_loaded_date", True):
            self.set_loaded_flag(source_table)
        self.output_tables.append(dataset_table)

    # -- K2 (loading.rb:160-196) --------------------------------------
    def update_table_with_map(
        self,
        source_table: str,
        dataset_table: str,
        mapping: TMapping[str, Any],
        key: str,
        options: dict[str, Any] | None = None,
    ) -> None:
        options = options or {}
        self.phase = "updating"
        ds = self.dataset.table(dataset_table)
        sta = self.staging.table(source_table)
        out = L.update_with_map(ds, sta, mapping, key, condition=options.get("condition"))
        self.dataset.rewrite(out, dataset_table)
        if options.get("etl_loaded_date", True):
            self.set_loaded_flag(source_table)

    # -- K3 (loading.rb:198-201) --------------------------------------
    def set_loaded_flag(self, source_table: str) -> None:
        sta = self.staging.table(source_table)
        self.staging.rewrite(L.set_loaded_flag(sta), source_table)

    # -- K4 (loading.rb:203-221) --------------------------------------
    def finalize_dataset_loading(self, dataset_table: str) -> None:
        self.phase = "finalize"
        assert self.batch_id is not None, "prepare() must run first"
        ds = self.dataset.table(dataset_table)
        self.dataset.rewrite(L.finalize_dataset(ds, self.batch_id), dataset_table)

    # -- CDC (loading.rb:223-270) -------------------------------------
    def create_record_md5_table(
        self,
        source_table: str,
        target_table: str,
        key_field: str,
        fields: list[str],
    ) -> None:
        df = record_md5(self.staging.table(source_table), key_field, fields)
        self.staging.save(df, target_table)
        self.temporary_tables.append(target_table)

    def create_table_diff(
        self,
        source_table: str,
        target_table: str,
        diff_table: str,
        key_field: str,
        fields: list[str],
    ) -> None:
        diff = table_diff(
            self.staging.table(source_table),
            self.staging.table(target_table),
            key_field,
            fields,
        )
        self.staging.save(diff, diff_table)
        self.temporary_tables.append(diff_table)

    def drop_staging_table(self, table: str) -> None:
        self.staging.drop(table)

    def create_staging_table_index(self, target_table: str, key_field: str) -> None:
        """Reference K7 (``loading.rb:276-282``). Spark has no secondary
        indexes; the nearest analog is clustering the table by the key so
        later diff joins co-locate — a repartition-on-key rewrite."""
        df = self.staging.table(target_table).repartition(key_field)
        self.staging.rewrite(df, target_table)

    def finalize(self) -> None:
        """Drop temporary tables (the reference drops tmp md5/diff
        tables explicitly in job code; auto-cleanup here)."""
        for t in self.temporary_tables:
            self.staging.drop(t)
        self.temporary_tables.clear()
