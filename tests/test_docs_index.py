"""docs/OPERATORS.md must not rot: every `module:symbol` imports and
every `q:<name>` resolves in the query registry."""

from __future__ import annotations

import importlib
import os
import re

DOC = os.path.join(os.path.dirname(os.path.dirname(__file__)), "docs", "OPERATORS.md")


def _doc_text() -> str:
    with open(DOC, encoding="utf-8") as f:
        return f.read()


def test_every_symbol_imports():
    text = _doc_text()
    symbols = sorted(set(re.findall(r"`(datacamp_etl_spark[\w.]*):(\w+)`", text)))
    assert len(symbols) >= 70, f"suspiciously few symbols in doc: {len(symbols)}"
    missing = []
    for mod_name, attr in symbols:
        try:
            mod = importlib.import_module(mod_name)
        except ImportError as e:  # pragma: no cover - doc rot
            missing.append(f"{mod_name}: {e}")
            continue
        if not hasattr(mod, attr):
            missing.append(f"{mod_name}:{attr}")
    assert not missing, f"doc references unknown symbols: {missing}"


def test_every_query_name_is_registered():
    from datacamp_etl_spark.queries import QUERIES

    text = _doc_text()
    names = sorted(set(re.findall(r"`q:([\w]+)`", text)))
    assert len(names) >= 100, f"suspiciously few query refs in doc: {len(names)}"
    unknown = [n for n in names if n not in QUERIES]
    assert not unknown, f"doc references unregistered queries: {unknown}"


def test_doc_covers_most_of_the_registry():
    # every registry entry a user could run should be findable in the
    # index; allow a small slack for aliases but fail on real gaps
    from datacamp_etl_spark.queries import QUERIES

    text = _doc_text()
    names = set(re.findall(r"`q:([\w]+)`", text))
    not_documented = sorted(set(QUERIES) - names)
    assert len(not_documented) <= 5, (
        f"registry entries missing from docs/OPERATORS.md: {not_documented}"
    )
