"""Domain-scoped key-value defaults (reference C1-C6).

Reference ``ETLDefaults`` (``lib/etl/etl_defaults.rb:23-91``) over the
``etl_defaults`` table (``install/etl_tables.mysql.sql:48-54``),
wrapped per-domain by ``ETLManager#defaults_for_domain``
(``etl_manager.rb:181-184``).

Observable semantics reproduced exactly (SURVEY §7 risk 2, spec'd by
``test/basic_test.rb:11-33``):

- all values stored as strings (C4)
- ``get`` miss -> ``None`` (C1)
- ``value(key, default)`` is **read-through-write**: on miss it writes
  the default and returns it; later calls with a different default
  still return the stored value until ``delete`` (C2,
  ``etl_defaults.rb:43-52``)
- ``bool_value``: ``1``/``"true"``/``"yes"`` (case-insensitive) ->
  True, else False (C3, ``etl_defaults.rb:54-65``)
"""

from __future__ import annotations

from typing import Any

from datacamp_etl_spark.metadata.store import MetadataStore

__all__ = ["ETLDefaults"]

_TRUE_STRINGS = {"1", "true", "yes"}


class ETLDefaults:
    """Per-domain view over the ``etl_defaults`` KV table."""

    def __init__(self, store: MetadataStore, domain: str):
        self.store = store
        self.domain = domain

    def _find(self, key: str) -> tuple[int | None, str | None]:
        df = self.store.read("etl_defaults")
        hit = df[(df["domain"] == self.domain) & (df["default_key"] == str(key))]
        if hit.empty:
            return None, None
        row = hit.iloc[0]
        return int(row["id"]), row["default_value"]

    def get(self, key: str) -> str | None:
        """C1: value or None (``etl_defaults.rb:31-41``)."""
        _, v = self._find(key)
        return v

    __getitem__ = get

    def __setitem__(self, key: str, value: Any) -> None:
        """C4: stringify + upsert (``etl_defaults.rb:69-82``)."""
        row_id, _ = self._find(key)
        if row_id is None:
            self.store.insert(
                "etl_defaults",
                {
                    "domain": self.domain,
                    "default_key": str(key),
                    "default_value": str(value),
                },
            )
        else:
            self.store.update("etl_defaults", row_id, {"default_value": str(value)})

    def value(self, key: str, default: Any = None) -> str | None:
        """C2: get-or-initialize with write-back (``etl_defaults.rb:43-52``)."""
        _, v = self._find(key)
        if v is not None:
            return v
        if default is not None:
            self[key] = default
            return str(default)
        return None

    def bool_value(self, key: str) -> bool:
        """C3: tolerant boolean coercion (``etl_defaults.rb:54-65``)."""
        v = self.get(key)
        return v is not None and v.strip().lower() in _TRUE_STRINGS

    def delete(self, key: str) -> None:
        """C5 (``etl_defaults.rb:84-89``)."""
        self.store.delete_where(
            "etl_defaults", domain=self.domain, default_key=str(key)
        )
