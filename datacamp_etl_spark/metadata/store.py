"""Parquet-backed metadata store for the control plane.

Reference system tables, DDL at ``install/etl_tables.mysql.sql:1-54``,
bootstrapped by ``ETLManager#create_etl_manager_structures``
(``etl_manager.rb:62-69``); names at ``etl_manager.rb:36-41``.

Design decision (Spark-first does not mean Spark-everywhere): these
tables are KB-scale run metadata — schedules, status rows, config KV,
batch provenance. Driving a distributed engine for single-row upserts
would be the wrong tool, so the store is driver-side pyarrow with
atomic file replacement; ``to_spark`` exposes any table as a DataFrame
for joins with data-plane tables (e.g. the monitoring view J4). On a
cluster the base path lives on shared storage (object store / DBFS);
single-writer semantics match the reference's sequential scheduler
(``etl_manager.rb:127-136``).
"""

from __future__ import annotations

import os
import tempfile
import threading
from typing import Any, TYPE_CHECKING

import pyarrow as pa
import pyarrow.parquet as pq

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd
    from pyspark.sql import DataFrame, SparkSession

__all__ = ["MetadataStore", "SYSTEM_TABLES"]

#: Reference ``etl_manager.rb:36-41`` (+ legacy ``etl_jobs`` for the
#: monitoring view ``install/etl_tables.mysql.sql:27-38``).
SYSTEM_TABLES = (
    "etl_schedules",
    "etl_defaults",
    "etl_job_status",
    "etl_batches",
    "etl_jobs",
)

#: Minimal schemas mirroring ``install/etl_tables.mysql.sql`` and the
#: DataMapper models (``etl_job_schedule.rb``, ``etl_job_status.rb``,
#: ``etl_default_association.rb``, ``lib/etl/batch.rb``).
_SCHEMAS: dict[str, pa.Schema] = {
    "etl_schedules": pa.schema(
        [
            ("id", pa.int64()),
            ("job_name", pa.string()),
            ("argument", pa.string()),
            ("is_enabled", pa.int32()),
            ("schedule", pa.string()),
            ("force_run", pa.int32()),
            ("run_order", pa.int32()),
            ("last_run_date", pa.timestamp("us")),
        ]
    ),
    "etl_defaults": pa.schema(
        [
            ("id", pa.int64()),
            ("domain", pa.string()),
            ("default_key", pa.string()),
            ("default_value", pa.string()),
        ]
    ),
    "etl_job_status": pa.schema(
        [
            ("id", pa.int64()),
            ("job_name", pa.string()),
            ("job_id", pa.int64()),
            ("status", pa.string()),
            ("phase", pa.string()),
            ("message", pa.string()),
            ("start_time", pa.timestamp("us")),
            ("end_time", pa.timestamp("us")),
        ]
    ),
    "etl_batches": pa.schema(
        [
            ("id", pa.int64()),
            ("batch_type", pa.string()),
            ("batch_source", pa.string()),
            ("data_source_name", pa.string()),
            ("data_source_url", pa.string()),
            ("valid_due_date", pa.date32()),
            ("batch_date", pa.timestamp("us")),
            ("username", pa.string()),
            ("created_at", pa.timestamp("us")),
            ("updated_at", pa.timestamp("us")),
        ]
    ),
    "etl_jobs": pa.schema(
        [
            ("id", pa.int64()),
            ("name", pa.string()),
            ("job_type", pa.string()),
            ("is_enabled", pa.int32()),
            ("run_order", pa.int32()),
            ("last_run_date", pa.timestamp("us")),
            ("last_run_status", pa.string()),
            ("schedule", pa.string()),
            ("last_success_date", pa.timestamp("us")),
            ("force_run", pa.int32()),
        ]
    ),
}


class MetadataStore:
    """CRUD over the system tables with serial ids and atomic writes."""

    def __init__(self, base_path: str):
        self.base_path = base_path
        os.makedirs(base_path, exist_ok=True)
        self._lock = threading.RLock()

    # -- bootstrap (reference O6) -------------------------------------
    def create_structures(self, force: bool = False) -> None:
        """Reference ``create_etl_manager_structures`` (O6,
        ``etl_manager.rb:62-69``): create-if-missing, or reset with
        ``force=True`` (the tests' ``force: true`` fixture)."""
        for name, schema in _SCHEMAS.items():
            path = self._path(name)
            if force or not os.path.exists(path):
                self._write(name, schema.empty_table())

    def check_schema(self) -> bool:
        """Reference ``check_etl_schema`` (``etl_manager.rb:51-58``) —
        done right (the original referenced undefined state)."""
        return all(os.path.exists(self._path(t)) for t in _SCHEMAS)

    # -- generic CRUD --------------------------------------------------
    def _path(self, table: str) -> str:
        return os.path.join(self.base_path, f"{table}.parquet")

    def _read_table(self, table: str) -> pa.Table:
        path = self._path(table)
        if not os.path.exists(path):
            return _SCHEMAS[table].empty_table()
        return pq.read_table(path)

    def _write(self, table: str, data: pa.Table) -> None:
        path = self._path(table)
        fd, tmp = tempfile.mkstemp(dir=self.base_path, suffix=".parquet.tmp")
        os.close(fd)
        try:
            pq.write_table(data, tmp)
            os.replace(tmp, path)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)

    def read(self, table: str) -> "pd.DataFrame":
        return self._read_table(table).to_pandas()

    def next_id(self, table: str) -> int:
        tbl = self._read_table(table)
        if tbl.num_rows == 0:
            return 1
        col = tbl.column("id")
        return int(pa.compute.max(col).as_py() or 0) + 1

    def insert(self, table: str, row: dict[str, Any]) -> int:
        """Append one row; allocates ``id`` if absent; returns it."""
        with self._lock:
            tbl = self._read_table(table)
            row = dict(row)
            if row.get("id") is None:
                row["id"] = self.next_id(table)
            schema = _SCHEMAS[table]
            full = {f.name: [row.get(f.name)] for f in schema}
            new = pa.table(full, schema=schema)
            self._write(table, pa.concat_tables([tbl, new]))
            return int(row["id"])

    def update(self, table: str, row_id: int, values: dict[str, Any]) -> None:
        """In-place update of one row by id (read-modify-replace)."""
        with self._lock:
            df = self.read(table)
            mask = df["id"] == row_id
            for k, v in values.items():
                df.loc[mask, k] = v
            self._write_pandas(table, df)

    def delete_where(self, table: str, **eq: Any) -> int:
        with self._lock:
            df = self.read(table)
            mask = None
            for k, v in eq.items():
                m = df[k] == v
                mask = m if mask is None else (mask & m)
            if mask is None:
                return 0
            n = int(mask.sum())
            if n:
                self._write_pandas(table, df[~mask])
            return n

    def _write_pandas(self, table: str, df: "pd.DataFrame") -> None:
        schema = _SCHEMAS[table]
        self._write(table, pa.Table.from_pandas(df, schema=schema, preserve_index=False))

    # -- Spark bridge --------------------------------------------------
    def to_spark(self, spark: "SparkSession", table: str) -> "DataFrame":
        """Expose a metadata table as a Spark DataFrame (e.g. for the
        monitoring view J4, ``install/etl_tables.mysql.sql:56-64``)."""
        path = self._path(table)
        if os.path.exists(path) and pq.read_metadata(path).num_rows > 0:
            return spark.read.parquet(path)
        return spark.createDataFrame(self.read(table))
