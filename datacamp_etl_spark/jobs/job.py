"""Job lifecycle state machine (reference O3).

Reference ``ETL::Job`` (``lib/etl/job.rb``): a job transitions
``init -> running -> ok | failed``, persisting a status row at every
transition (``job.rb:51-76,91-128``); exceptions mark ``failed`` with
the message unless debug mode re-raises (``job.rb:110-119``);
``finalize`` always runs; elapsed time is logged (``job.rb:132-138``).
Subclasses implement ``run`` (``job.rb:141-143`` raises
NotImplementedError), optionally ``prepare``/``finalize``.

The reference reads the local variable ``debug`` instead of ``@debug``
at ``job.rb:110`` (latent bug) — the intent (instance debug flag
disables the rescue) is what's implemented.
"""

from __future__ import annotations

import re
import time
from datetime import datetime, timezone
from typing import Any, TYPE_CHECKING

if TYPE_CHECKING:  # pragma: no cover
    from datacamp_etl_spark.jobs.manager import ETLManager
    from datacamp_etl_spark.metadata.defaults import ETLDefaults

__all__ = ["Job", "JobFailure"]


class JobFailure(Exception):
    """Raised by ``Job.fail`` (reference ``job.rb:145-150``)."""


def _now() -> datetime:
    return datetime.now(timezone.utc).replace(tzinfo=None)


class Job:
    """Base class for all jobs; subclass and override ``run``."""

    #: Override in subclasses (reference ``info.yml`` job_type).
    job_type: str = "job"

    def __init__(self, manager: "ETLManager", bundle: Any = None):
        self.manager = manager
        self.bundle = bundle
        self.argument: str | None = None
        self.defaults_domain: str | None = None
        self._status: str | None = None
        self._phase: str | None = None
        self._message: str | None = None
        self._status_id: int | None = None
        self.start_time: datetime | None = None
        self.end_time: datetime | None = None
        self.debug: bool = False
        self.last_run_date: datetime | None = None
        self._defaults: "ETLDefaults | None" = None

    # -- naming (reference loading.rb:48-50, extraction.rb:23-30) -----
    @classmethod
    def job_name(cls) -> str:
        """Class ``FooLoading``/``FooExtraction``/``FooJob`` -> ``foo``
        (snake_cased, suffix stripped) — the reference's name-derivation
        convention."""
        name = cls.__name__
        for suffix in ("Loading", "Extraction", "ETLJob", "Job"):
            if name.endswith(suffix) and name != suffix:
                name = name[: -len(suffix)]
                break
        return re.sub(r"(?<!^)(?=[A-Z])", "_", name).lower()

    @property
    def name(self) -> str:
        return self.job_name()

    # -- status plumbing (reference job.rb:51-76) ----------------------
    def _persist_status(self) -> None:
        store = self.manager.store
        values = {
            "job_name": self.name,
            "status": self._status,
            "phase": self._phase,
            "message": self._message,
            "start_time": self.start_time,
            "end_time": self.end_time,
        }
        if self._status_id is None:
            self._status_id = store.insert("etl_job_status", values)
        else:
            store.update("etl_job_status", self._status_id, values)

    @property
    def status(self) -> str | None:
        return self._status

    @status.setter
    def status(self, value: str) -> None:
        self._status = value
        self._persist_status()

    @property
    def phase(self) -> str | None:
        return self._phase

    @phase.setter
    def phase(self, value: str) -> None:
        self._phase = value
        self.log(f"phase: {value}")
        self._persist_status()

    @property
    def message(self) -> str | None:
        return self._message

    @message.setter
    def message(self, value: str) -> None:
        self._message = value
        self._persist_status()

    # -- lifecycle (reference job.rb:78-139) ---------------------------
    def launch_with_argument(
        self, argument: str | None = None, options: dict[str, Any] | None = None
    ) -> None:
        options = options or {}
        self.debug = bool(options.get("debug", self.debug))
        self.argument = argument
        self.start_time = _now()
        started = time.monotonic()
        self.status = "init"

        if not self.defaults_domain:
            self.defaults_domain = self.name
        self.prepare()

        self.status = "running"
        try:
            self.run()
        except JobFailure as e:
            # Explicit self.fail() — status/message already set
            # (reference job.rb:145-150 sets and returns).
            if self._status != "failed":
                self._message = str(e)
                self.status = "failed"
            if self.debug:
                raise
        except Exception as e:  # noqa: BLE001 — reference catches all
            if self.debug:
                # Reference intent: debug mode re-raises (job.rb:110-119).
                raise
            self._message = f"{type(e).__name__}: {e}"
            self.status = "failed"
        else:
            self.status = "ok"
        finally:
            self.end_time = _now()
            self._persist_status()
            self.finalize()
            elapsed = round(time.monotonic() - started, 2)
            self.log(f"job '{self.name}' finished: {self._status} ({elapsed}s)")

    def fail(self, message: str) -> None:
        """Reference ``job.rb:145-150``: mark failed with message and
        abort the run."""
        self._message = message
        self.status = "failed"
        raise JobFailure(message)

    # -- subclass contract ---------------------------------------------
    def prepare(self) -> None:  # reference job.rb:42-44 (no-op)
        pass

    def run(self) -> None:  # reference job.rb:141-143
        raise NotImplementedError("job subclasses must implement run()")

    def finalize(self) -> None:  # reference job.rb:152-154 (no-op)
        pass

    # -- helpers (reference job.rb:156-171) ----------------------------
    @property
    def defaults(self) -> "ETLDefaults":
        if self._defaults is None or self._defaults.domain != self.defaults_domain:
            self._defaults = self.manager.defaults_for_domain(
                self.defaults_domain or self.name
            )
        return self._defaults

    def log(self, message: str) -> None:
        self.manager.log.info("[%s] %s", self.name, message)

    def files_directory(self) -> str:
        """Reference O9: per-job scratch dir ``etl_files_path/<domain>``
        (``etl_manager.rb:187-199``)."""
        return self.manager.files_directory_for(self.defaults_domain or self.name)

    def execute_sql(self, statement: str):
        """The reference declared this but left it unimplemented
        (``job.rb:168-171`` raises); here it works: run SQL on the
        session catalog."""
        return self.manager.spark.sql(statement)
