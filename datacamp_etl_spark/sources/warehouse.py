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

import contextlib
import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["Warehouse", "TableLockedError"]


class TableLockedError(RuntimeError):
    """Another run holds the per-table write lock."""


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

    # ------------------------------------------------------------------
    # MERGE path (SURVEY §7 risk #1): partition-scoped
    # matched-update / not-matched-insert behind the same writer seam
    # as :meth:`rewrite`. rewrite() stays the small-table default;
    # merge() is the 100 TB dataset-table path — a K2 update that
    # touches 0.1% of partitions must not rewrite the other 99.9%.
    # ------------------------------------------------------------------

    @contextlib.contextmanager
    def table_lock(self, table: str, *, owner: str = ""):
        """Per-table run lock: O_EXCL lockfile next to the table dir
        (atomic on POSIX and on the object-store FS shims that
        emulate it). The reference runs jobs sequentially
        (``etl_manager.rb:127-136``); this is the concurrent-runs
        guard SURVEY §7 risk #1 prescribes for join+rewrite/merge on
        immutable storage. Raises :class:`TableLockedError` with the
        holder's info when contended — no blocking, no stealing;
        crashed-run locks are an operator decision to remove."""
        lock_path = self.path(table) + ".lock"
        payload = json.dumps(
            {"owner": owner, "pid": os.getpid(), "ts": time.time()}
        )
        try:
            fd = os.open(lock_path, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
        except FileExistsError:
            try:
                holder = open(lock_path).read()
            except OSError:  # racing release
                holder = "?"
            raise TableLockedError(
                f"table {table!r} is locked by {holder}"
            ) from None
        try:
            os.write(fd, payload.encode())
            os.close(fd)
            yield
        finally:
            with contextlib.suppress(OSError):
                os.remove(lock_path)

    def partition_columns(self, table: str) -> list[str]:
        """Partition columns of a table, introspected from the
        ``col=value`` directory chain (the parquet layout is the
        catalog here, as information_schema was in the reference)."""
        cols: list[str] = []
        cur = self.path(table)
        while True:
            subs = [
                d for d in sorted(os.listdir(cur))
                if "=" in d and os.path.isdir(os.path.join(cur, d))
            ]
            if not subs:
                return cols
            cols.append(subs[0].split("=", 1)[0])
            cur = os.path.join(cur, subs[0])

    def merge(
        self,
        source: DataFrame,
        table: str,
        keys: list[str] | str,
        *,
        update_cols: dict[str, str] | None = None,
        insert: bool = True,
        owner: str = "",
    ) -> dict:
        """Partition-scoped MERGE: ``WHEN MATCHED (by keys) THEN
        UPDATE SET target.c = source.<update_cols[c]>, WHEN NOT
        MATCHED THEN INSERT`` — reading and rewriting ONLY the
        partitions the source touches (dynamic partition overwrite);
        untouched partitions' files are not opened, let alone
        rewritten.

        Contract:
        - the target table was written with ``partition_by`` (the
          ``col=value`` layout is introspected); an unpartitioned
          table degenerates to a locked full rewrite — use
          :meth:`rewrite` there;
        - ``insert=True`` requires the source to CARRY the partition
          columns, and their values must be key-functional (same key
          -> same partition: a hash bucket of the key, or an
          immutable attribute) so matched rows live where their
          source row points; with ``insert=False`` the touched
          partitions are derived by a key semi-join against the
          target and the source needs no partition columns;
        - ``update_cols`` maps target column -> source column;
          default: every common non-key, non-partition column.

        The whole operation runs under :meth:`table_lock` — the
        dynamic overwrite commits partition-by-partition, so
        concurrent merges on the same table must serialize (the
        reference's sequential-run contract made explicit).
        Returns ``{"touched_partitions": [...], "n_source": int}``.
        """
        keys = [keys] if isinstance(keys, str) else list(keys)
        part_cols = self.partition_columns(table)
        with self.table_lock(table, owner=owner):
            target = self.table(table)
            if not part_cols:
                # degenerate path: keep merge semantics, full rewrite
                merged = self._merged_frame(
                    target, source, keys, [], update_cols, insert
                )
                self.rewrite(merged, table)
                return {"touched_partitions": [], "n_source": source.count()}

            if insert:
                missing = [c for c in part_cols if c not in source.columns]
                if missing:
                    raise ValueError(
                        "insert=True merge needs partition columns in "
                        f"the source; missing {missing}"
                    )
                touched = source.select(*part_cols).distinct().collect()
            else:
                touched = (
                    target.join(
                        source.select(*keys).distinct(), keys, "left_semi"
                    )
                    .select(*part_cols)
                    .distinct()
                    .collect()
                )
            tvals = [tuple(r[c] for c in part_cols) for r in touched]
            if not tvals:
                return {"touched_partitions": [], "n_source": 0}

            pred = None
            for vals in tvals:
                clause = None
                for c, v in zip(part_cols, vals):
                    eq = F.col(c) == F.lit(v)
                    clause = eq if clause is None else clause & eq
                pred = clause if pred is None else pred | clause
            scoped = target.where(pred)  # partition-pruned scan
            merged = self._merged_frame(
                scoped, source, keys, part_cols, update_cols, insert
            )
            (
                merged.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(*part_cols)
                .parquet(self.path(table))
            )
            return {
                "touched_partitions": sorted(map(list, tvals)),
                "n_source": source.count(),
            }

    @staticmethod
    def _merged_frame(
        target: DataFrame,
        source: DataFrame,
        keys: list[str],
        part_cols: list[str],
        update_cols: dict[str, str] | None,
        insert: bool,
    ) -> DataFrame:
        if update_cols is None:
            update_cols = {
                c: c
                for c in target.columns
                if c in source.columns
                and c not in keys
                and c not in part_cols
            }
        # one update row per key (deterministic, as in update_with_map)
        src = source.select(
            *[F.col(k) for k in keys],
            *[
                F.col(s).alias(f"__src_{t}")
                for t, s in update_cols.items()
            ],
        ).dropDuplicates(keys)
        # matched detection must not rely on a nullable update value:
        # carry an explicit indicator through the join
        src_ind = src.withColumn("__matched", F.lit(True))
        tgt = target.alias("__t")
        joined = tgt.join(src_ind.alias("__s"), keys, "left")
        out_cols = []
        for c in target.columns:
            if c in update_cols:
                out_cols.append(
                    F.when(
                        F.col("__matched"), F.col(f"__src_{c}")
                    ).otherwise(F.col(f"__t.{c}")).alias(c)
                )
            else:
                out_cols.append(F.col(f"__t.{c}").alias(c))
        updated = joined.select(*out_cols)
        if not insert:
            return updated
        inserts = source.join(
            target.select(*keys).dropDuplicates(keys), keys, "left_anti"
        ).select(
            *[
                (
                    F.col(c).cast(target.schema[c].dataType)
                    if c in source.columns
                    else F.lit(None).cast(target.schema[c].dataType)
                ).alias(c)
                for c in target.columns
            ]
        )
        return updated.unionByName(inserts)

    def drop(self, table: str) -> None:
        """Reference K6: DROP TABLE IF EXISTS (``loading.rb:272-274``)."""
        shutil.rmtree(self.path(table), ignore_errors=True)

    def register_view(self, table: str, view_name: str | None = None) -> None:
        self.table(table).createOrReplaceTempView(view_name or table)
