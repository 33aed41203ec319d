"""Job bundle discovery & loading (reference O1/O2).

Reference ``JobBundle`` (``lib/etl/job_bundle.rb``): a job is a
directory ``<name>.etl`` on a search path containing an optional
``info.yml`` (``full_name``, ``description``, ``job_type``,
``job_class``, ``executable`` — ``job_bundle.rb:88-109,123-143``) and
a code file ``<name>.rb`` (here ``<name>.py``). Behaviors preserved:

- search-path resolution, first hit wins (``path_for_job``,
  ``job_bundle.rb:34-40``)
- ``available_jobs``: union of ``*.etl`` dirs across the path,
  deduplicated (``job_bundle.rb:63-76``)
- default class name ``<Name.camelize>ETLJob`` when info.yml gives
  none (``job_bundle.rb:105-108``)
- loaded-bundle cache (``job_bundle.rb:42-61``)
- superclass validation: the resolved class must subclass ``Job``,
  else raise (``job_bundle.rb:145-165``; tested
  ``test/etl_manager_test.rb:45-50``)
"""

from __future__ import annotations

import importlib.util
import os
import sys
from typing import Any, Type

from datacamp_etl_spark.jobs.job import Job

try:
    import yaml  # type: ignore

    _HAVE_YAML = True
except ImportError:  # pragma: no cover
    _HAVE_YAML = False

__all__ = ["JobBundle", "JobBundleManager"]

BUNDLE_SUFFIX = ".etl"


def _camelize(name: str) -> str:
    return "".join(p.capitalize() for p in name.replace("-", "_").split("_"))


class JobBundle:
    """One ``<name>.etl`` directory."""

    def __init__(self, name: str, path: str):
        self.name = name
        self.path = path
        self.info: dict[str, Any] = {}
        self._module = None
        self._loaded = False

    # -- metadata (job_bundle.rb:88-109) --------------------------------
    @property
    def info_path(self) -> str:
        return os.path.join(self.path, "info.yml")

    @property
    def code_path(self) -> str:
        return os.path.join(self.path, f"{self.name}.py")

    @property
    def job_type(self) -> str:
        return str(self.info.get("job_type", self.info.get("type", "python")))

    @property
    def job_class_name(self) -> str:
        """Explicit ``job_class`` or the ``<Name>ETLJob`` convention
        (``job_bundle.rb:105-108``)."""
        explicit = self.info.get("job_class")
        if explicit:
            return str(explicit)
        return f"{_camelize(self.name)}ETLJob"

    # -- loading (job_bundle.rb:111-143) --------------------------------
    def load(self) -> None:
        if self._loaded:
            return
        if os.path.exists(self.info_path) and _HAVE_YAML:
            with open(self.info_path) as f:
                data = yaml.safe_load(f) or {}
            if isinstance(data, dict):
                self.info = data
        if not os.path.exists(self.code_path):
            raise FileNotFoundError(
                f"bundle {self.name!r}: missing code file {self.code_path}"
            )
        mod_name = f"datacamp_etl_bundles.{self.name}"
        spec = importlib.util.spec_from_file_location(mod_name, self.code_path)
        module = importlib.util.module_from_spec(spec)
        sys.modules[mod_name] = module
        spec.loader.exec_module(module)
        self._module = module
        self._loaded = True

    def job_class(self) -> Type[Job]:
        """Resolve + validate the job class (``job_bundle.rb:145-165``):
        wrong superclass raises, as in the reference's
        wrong_superclass.etl fixture."""
        self.load()
        cls = getattr(self._module, self.job_class_name, None)
        if cls is None:
            raise RuntimeError(
                f"bundle {self.name!r}: class {self.job_class_name!r} not found"
            )
        if not (isinstance(cls, type) and issubclass(cls, Job)):
            raise RuntimeError(
                f"bundle {self.name!r}: {self.job_class_name!r} is not a Job subclass"
            )
        return cls


class JobBundleManager:
    """Search-path discovery + cache (class-level state in the
    reference; instance-level here so tests stay isolated)."""

    def __init__(self, job_search_path: list[str] | None = None):
        self.job_search_path: list[str] = list(job_search_path or [])
        self._cache: dict[str, JobBundle] = {}

    def path_for_job(self, name: str) -> str | None:
        """First ``<dir>/<name>.etl`` on the search path
        (``job_bundle.rb:34-40``)."""
        for d in self.job_search_path:
            cand = os.path.join(d, name + BUNDLE_SUFFIX)
            if os.path.isdir(cand):
                return cand
        return None

    def available_jobs(self) -> list[str]:
        """All bundle names across the search path, sorted unique
        (``job_bundle.rb:63-76``)."""
        names: set[str] = set()
        for d in self.job_search_path:
            if not os.path.isdir(d):
                continue
            for entry in os.listdir(d):
                if entry.endswith(BUNDLE_SUFFIX) and os.path.isdir(
                    os.path.join(d, entry)
                ):
                    names.add(entry[: -len(BUNDLE_SUFFIX)])
        return sorted(names)

    def bundle_with_name(self, name: str) -> JobBundle:
        """Resolve + cache (``job_bundle.rb:42-61``)."""
        if name in self._cache:
            return self._cache[name]
        path = self.path_for_job(name)
        if path is None:
            raise KeyError(f"unknown job bundle: {name!r}")
        bundle = JobBundle(name, path)
        self._cache[name] = bundle
        return bundle

    def job_class(self, name: str) -> Type[Job]:
        return self.bundle_with_name(name).job_class()
