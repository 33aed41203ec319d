"""Warehouse: named staging/dataset tables on immutable storage.

The reference works against two RDBMS schemas — ``staging`` and
``dataset``/``datastore`` (``job_manager.rb:37``, ``loading.rb:93``) —
with CTAS/DROP for temp tables (``loading.rb:224-274``) and a staging
key index (``loading.rb:276-282``). Here a "schema" is a namespace
directory of parquet tables.

- K5 CTAS            -> :meth:`Warehouse.save` (overwrite)
- K1 append          -> :meth:`Warehouse.save` (mode='append')
- K6 DROP IF EXISTS  -> :meth:`Warehouse.drop`
- K7 index creation  -> no secondary indexes in Spark; the analog is a
  partition/bucket layout: pass ``partition_by`` (date columns for
  pruning) or repartition by join key before save.

Scale: writes support ``partition_by`` so incremental predicates (F2)
become partition pruning at the scan; readers get plain
``spark.read.parquet`` semantics (pushdown, column pruning).

In-place UPDATE (K2/K3/K4) on immutable files is handled by
:meth:`rewrite`: write-to-new-path + atomic swap, so a failed rewrite
never corrupts the table (SURVEY §7 risk 1).
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession

__all__ = ["Warehouse"]


class Warehouse:
    """A namespace of parquet tables rooted at ``base_path/schema``."""

    def __init__(self, spark: SparkSession, base_path: str, schema: str = "staging"):
        self.spark = spark
        self.base_path = base_path
        self.schema = schema
        os.makedirs(self._schema_path(), exist_ok=True)

    def _schema_path(self) -> str:
        return os.path.join(self.base_path, self.schema)

    def path(self, table: str) -> str:
        return os.path.join(self._schema_path(), table)

    def exists(self, table: str) -> bool:
        p = self.path(table)
        return os.path.isdir(p) and any(
            f.endswith(".parquet") for f in os.listdir(p)
        )

    def table(self, table: str) -> DataFrame:
        return self.spark.read.parquet(self.path(table))

    def table_columns(self, table: str) -> list[str]:
        """Reference S4: information_schema column scan
        (``column_names_for_table``, ``loading.rb:64-73``)."""
        return self.table(table).columns

    def save(
        self,
        df: DataFrame,
        table: str,
        *,
        mode: str = "overwrite",
        partition_by: list[str] | None = None,
    ) -> None:
        writer = df.write.mode(mode)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(self.path(table))

    def rewrite(self, df: DataFrame, table: str) -> None:
        """Full-table rewrite with atomic swap — the immutable-storage
        realization of the reference's in-place UPDATEs (K2/K3/K4).

        The new contents are materialized to a scratch path first (the
        input plan typically *reads* the same table, so writing in place
        would race the scan), then swapped in.
        """
        final = self.path(table)
        tmp = final + ".rewrite-" + uuid.uuid4().hex[:8]
        df.write.mode("overwrite").parquet(tmp)
        old = final + ".old-" + uuid.uuid4().hex[:8]
        if os.path.exists(final):
            os.rename(final, old)
            try:
                os.rename(tmp, final)
            finally:
                shutil.rmtree(old, ignore_errors=True)
        else:
            os.rename(tmp, final)

    def drop(self, table: str) -> None:
        """Reference K6: DROP TABLE IF EXISTS (``loading.rb:272-274``)."""
        shutil.rmtree(self.path(table), ignore_errors=True)

    def register_view(self, table: str, view_name: str | None = None) -> None:
        self.table(table).createOrReplaceTempView(view_name or table)
