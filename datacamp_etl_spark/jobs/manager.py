"""ETL manager: session + metadata + scheduler (reference O4-O6, O9, O10).

Reference ``ETLManager`` (``lib/etl/etl_manager.rb``): owns the system
connection, bootstraps system tables, resolves and runs jobs, and
implements the scheduler:

- ``planned_schedules``: enabled AND (forced OR weekday-match OR
  'daily'), ordered by ``run_order`` (``etl_manager.rb:89-103``)
- ``forced_schedules``: enabled AND forced (``etl_manager.rb:105-110``)
- ``run_schedules``: sequential foreach (``etl_manager.rb:127-136``)

Merged-in legacy semantics (SURVEY §2.11 O5): the superseded
``job_schedule.rb:50-79`` carried the clear intent — skip a job that
already ran today; 'weekly' means >=7 days since last run — and
``etl_manager.rb:140``'s FIXME says forced jobs should clear
``force_run`` after running. All three are implemented here.
"""

from __future__ import annotations

import logging
import os
import sys
from datetime import date, datetime, timezone
from typing import Any, Type, TYPE_CHECKING

from datacamp_etl_spark.metadata.defaults import ETLDefaults
from datacamp_etl_spark.metadata.store import MetadataStore
from datacamp_etl_spark.sources.warehouse import Warehouse

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd
    from pyspark.sql import SparkSession

    from datacamp_etl_spark.jobs.job import Job

__all__ = ["ETLManager"]

_WEEKDAYS = (
    "monday", "tuesday", "wednesday", "thursday", "friday", "saturday", "sunday",
)


class ETLManager:
    """Owns SparkSession + metadata store + staging/dataset warehouses."""

    def __init__(
        self,
        spark: "SparkSession",
        base_path: str,
        *,
        etl_files_path: str | None = None,
        log_file: str | None = None,
        debug: bool = False,
    ):
        self.spark = spark
        self.base_path = base_path
        self.store = MetadataStore(os.path.join(base_path, "system"))
        self.staging = Warehouse(spark, base_path, "staging")
        self.dataset = Warehouse(spark, base_path, "dataset")
        self.etl_files_path = etl_files_path or os.path.join(base_path, "files")
        self.debug = debug
        self.job_registry: dict[str, Type["Job"]] = {}
        self.bundle_manager = None  # set by jobs.bundle.JobBundleManager
        self.log = self._make_logger(log_file, debug)

    # -- O10: logging (etl_manager.rb:71-80) ---------------------------
    @staticmethod
    def _make_logger(log_file: str | None, debug: bool) -> logging.Logger:
        logger = logging.getLogger("datacamp_etl_spark")
        if not logger.handlers:
            handler = (
                logging.FileHandler(log_file) if log_file else logging.StreamHandler(sys.stderr)
            )
            handler.setFormatter(
                logging.Formatter("%(asctime)s %(levelname)s %(message)s", "%Y-%m-%d %H:%M:%S")
            )
            logger.addHandler(handler)
        logger.setLevel(logging.DEBUG if debug else logging.INFO)
        return logger

    # -- O6: bootstrap -------------------------------------------------
    def create_etl_manager_structures(self, force: bool = False) -> None:
        self.store.create_structures(force=force)

    def check_etl_schema(self) -> bool:
        return self.store.check_schema()

    # -- C6 / O9 -------------------------------------------------------
    def defaults_for_domain(self, domain: str) -> ETLDefaults:
        return ETLDefaults(self.store, domain)

    def files_directory_for(self, domain: str) -> str:
        path = os.path.join(self.etl_files_path, domain)
        os.makedirs(path, exist_ok=True)
        return path

    # -- O4: job resolution + running ---------------------------------
    def register_job(self, cls: Type["Job"], name: str | None = None) -> None:
        self.job_registry[name or cls.job_name()] = cls

    def _resolve_job_class(self, name: str) -> Type["Job"]:
        if name in self.job_registry:
            return self.job_registry[name]
        if self.bundle_manager is not None:
            return self.bundle_manager.job_class(name)
        raise KeyError(f"unknown job: {name!r}")

    def run_named_job(
        self, name: str, argument: str | None = None, options: dict[str, Any] | None = None
    ) -> "Job":
        """Reference ``run_named_job``/``run_job``
        (``etl_manager.rb:138-175``)."""
        cls = self._resolve_job_class(name)
        job = cls(self, None)
        self.run_job(job, argument, options)
        return job

    def run_job(
        self, job: "Job", argument: str | None = None, options: dict[str, Any] | None = None
    ) -> None:
        opts = {"debug": self.debug}
        opts.update(options or {})
        job.launch_with_argument(argument, opts)

    # -- J4: monitoring view (install/etl_tables.mysql.sql:56-64) ------
    def monitoring_view(self):
        """``v_etl_enabled_job_status``: job status rows joined with
        enabled jobs, newest first, with run duration — the reference's
        only reporting join (J4)."""
        from pyspark.sql import functions as F

        status = self.store.to_spark(self.spark, "etl_job_status")
        jobs = self.store.to_spark(self.spark, "etl_jobs").where(
            F.col("is_enabled") == 1
        )
        return (
            status.alias("s")
            .join(jobs.alias("j"), F.col("s.job_id") == F.col("j.id"))
            .select(
                F.col("j.name").alias("name"),
                F.col("s.status"),
                F.col("s.phase"),
                F.col("s.message"),
                F.col("s.start_time"),
                F.col("s.end_time"),
                (
                    F.col("s.end_time").cast("timestamp").cast("double")
                    - F.col("s.start_time").cast("timestamp").cast("double")
                ).alias("duration_sec"),
            )
            .orderBy(F.desc("start_time"))
        )

    # -- O5: scheduling (etl_manager.rb:85-136) ------------------------
    @staticmethod
    def _today() -> date:
        return datetime.now(timezone.utc).date()

    def planned_schedules(self, today: date | None = None) -> "pd.DataFrame":
        """enabled AND (forced OR schedule==today's weekday OR 'daily'),
        ordered by run_order (``etl_manager.rb:89-103``), minus jobs that
        already ran today / weekly jobs run <7 days ago (legacy
        ``job_schedule.rb:50-79`` intent)."""
        today = today or self._today()
        weekday = _WEEKDAYS[today.weekday()]
        df = self.store.read("etl_schedules")
        if df.empty:
            return df
        enabled = df["is_enabled"] == 1
        forced = df["force_run"].fillna(0) == 1
        due = df["schedule"].isin([weekday, "daily", "weekly"])
        sel = df[enabled & (forced | due)].copy()

        def _not_already_run(row) -> bool:
            if row.get("force_run") == 1:
                return True
            last = row.get("last_run_date")
            if last is None or (hasattr(last, "__ne__") and str(last) in ("NaT", "None")):
                return True
            last_date = last.date() if hasattr(last, "date") else last
            if row["schedule"] == "weekly":
                return (today - last_date).days >= 7
            return last_date < today

        import pandas as pd  # local import; control-plane only

        if not sel.empty:
            mask = sel.apply(_not_already_run, axis=1)
            sel = sel[mask.astype(bool)]
        return sel.sort_values("run_order", na_position="last").reset_index(drop=True)

    def forced_schedules(self) -> "pd.DataFrame":
        df = self.store.read("etl_schedules")
        if df.empty:
            return df
        sel = df[(df["is_enabled"] == 1) & (df["force_run"].fillna(0) == 1)]
        return sel.sort_values("run_order", na_position="last").reset_index(drop=True)

    def run_scheduled_jobs(self, today: date | None = None) -> list["Job"]:
        """Reference ``run_scheduled_jobs`` -> ``run_schedules``
        (``etl_manager.rb:115-136``): strictly sequential, per-job
        failure isolation via the Job state machine."""
        schedules = self.planned_schedules(today)
        jobs: list[Job] = []
        for _, sched in schedules.iterrows():
            arg = sched.get("argument")
            if arg is not None and str(arg) in ("nan", "None", "NaT"):
                arg = None
            try:
                job = self.run_named_job(str(sched["job_name"]), arg)
                jobs.append(job)
            except KeyError as e:
                self.log.error("schedule %s: %s", sched.get("id"), e)
                continue
            now = datetime.now(timezone.utc).replace(tzinfo=None)
            updates: dict[str, Any] = {"last_run_date": now}
            if sched.get("force_run") == 1:
                # FIXME in reference etl_manager.rb:140 — reset force_run.
                updates["force_run"] = 0
            self.store.update("etl_schedules", int(sched["id"]), updates)
        return jobs
