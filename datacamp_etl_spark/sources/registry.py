"""Connection repository registry (reference S1/S2).

Reference ``RepositoryManager`` (``lib/etl/repository_manager.rb``):
named connection specs merged from YAML files found on a search path
(``repository_manager.rb:42-55``), plus in-memory named live
connections (``repository_manager.rb:73-84``).

Spark-native: a "connection" resolves to reader options —
``{"format": "jdbc", "url": ..., "dbtable": ...}`` or
``{"format": "parquet", "path": ...}``. ``create_connection`` returns a
configured ``DataFrameReader``-driven loader.
"""

from __future__ import annotations

import os
from typing import Any, Callable, TYPE_CHECKING

try:
    import yaml  # type: ignore

    _HAVE_YAML = True
except ImportError:  # pragma: no cover
    _HAVE_YAML = False

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession

__all__ = ["RepositoryManager"]


def _load_yaml(path: str) -> dict[str, Any]:
    if _HAVE_YAML:
        with open(path) as f:
            data = yaml.safe_load(f) or {}
        return data if isinstance(data, dict) else {}
    raise RuntimeError("pyyaml not available; use add_repository() directly")


class RepositoryManager:
    """Named connection-spec registry with a YAML search path."""

    def __init__(self, search_path: list[str] | None = None):
        self.search_path: list[str] = list(search_path or [])
        self._repositories: dict[str, dict[str, Any]] = {}
        self._named_connections: dict[str, Any] = {}

    # -- registry (S2) -------------------------------------------------
    def add_repositories_from_file(self, path: str) -> None:
        """Merge one YAML file of ``{name: spec}`` entries
        (``repository_manager.rb:19-22``)."""
        for name, spec in _load_yaml(path).items():
            if isinstance(spec, dict):
                self._repositories[str(name)] = spec

    def add_search_path(self, path: str) -> None:
        self.search_path.append(path)

    def add_repository(self, name: str, spec: dict[str, Any]) -> None:
        self._repositories[name] = dict(spec)

    def scan_search_path(self) -> None:
        """Eagerly merge every YAML file on the search path (the
        reference's fallback scan, done up-front for listings)."""
        for d in self.search_path:
            if not os.path.isdir(d):
                continue
            for fname in sorted(os.listdir(d)):
                full = os.path.join(d, fname)
                if os.path.isfile(full):
                    try:
                        self.add_repositories_from_file(full)
                    except Exception:
                        continue

    def names(self) -> list[str]:
        self.scan_search_path()
        return sorted(self._repositories)

    def repository(self, name: str) -> dict[str, Any] | None:
        """Resolve a named spec; on miss, scan every file in each search
        dir and merge (the reference's fallback scan,
        ``repository_manager.rb:32-56``)."""
        if name in self._repositories:
            return self._repositories[name]
        for d in self.search_path:
            if not os.path.isdir(d):
                continue
            for fname in sorted(os.listdir(d)):
                full = os.path.join(d, fname)
                if not os.path.isfile(full):
                    continue
                try:
                    self.add_repositories_from_file(full)
                except Exception:
                    continue  # tolerate dirty files (test fixture has them)
        return self._repositories.get(name)

    # -- live connections (S1) ----------------------------------------
    def create_connection(
        self, spark: "SparkSession", repo_name: str, identifier: str | None = None
    ) -> Callable[[str], "DataFrame"]:
        """Reference ``create_connection`` (``repository_manager.rb:58-71``):
        open a named connection and return a table loader
        ``loader(table_name) -> DataFrame``.

        Spec formats:
        - ``{adapter: parquet|csv|json, path: <dir>}`` -> file tables
        - ``{adapter: jdbc, url: ..., **options}``     -> JDBC tables
        """
        spec = self.repository(repo_name)
        if spec is None:
            raise KeyError(f"unknown repository: {repo_name}")
        adapter = str(spec.get("adapter", "parquet")).lower()

        if adapter == "jdbc":
            url = spec.get("url") or _jdbc_url(spec)
            opts = {
                k: str(v)
                for k, v in spec.items()
                if k not in {"adapter", "url"} and v is not None
            }

            def jdbc_loader(table: str) -> "DataFrame":
                return (
                    spark.read.format("jdbc")
                    .option("url", url)
                    .option("dbtable", table)
                    .options(**opts)
                    .load()
                )

            loader = jdbc_loader
        elif adapter in {"parquet", "csv", "json"}:
            base = spec.get("path", ".")

            def file_loader(table: str) -> "DataFrame":
                path = os.path.join(base, table)
                if adapter == "parquet":
                    for cand in (path, path + ".parquet"):
                        if os.path.exists(cand):
                            return spark.read.parquet(cand)
                    return spark.read.parquet(path)
                if adapter == "csv":
                    return spark.read.csv(path, header=True, inferSchema=True)
                return spark.read.json(path)

            loader = file_loader
        else:
            raise ValueError(f"unsupported adapter: {adapter!r}")

        self._named_connections[identifier or repo_name] = loader
        return loader

    def named_connection(self, name: str) -> Any:
        """``repository_manager.rb:81-83``."""
        return self._named_connections.get(name)

    def remove_named_connection(self, name: str) -> None:
        self._named_connections.pop(name, None)


def _jdbc_url(spec: dict[str, Any]) -> str:
    adapter = spec.get("jdbc_driver", "mysql")
    host = spec.get("host", "localhost")
    database = spec.get("database", "")
    return f"jdbc:{adapter}://{host}/{database}"
