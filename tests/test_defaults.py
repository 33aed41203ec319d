"""ETLDefaults KV semantics — the reference's basic_test matrix
(test/basic_test.rb:11-33; SURVEY §2.12)."""

from __future__ import annotations

from datacamp_etl_spark.metadata.defaults import ETLDefaults
from datacamp_etl_spark.metadata.store import MetadataStore


def _defaults(tmp_path) -> ETLDefaults:
    store = MetadataStore(str(tmp_path / "system"))
    store.create_structures(force=True)
    return ETLDefaults(store, "test")


def test_get_miss_returns_none(tmp_path):
    d = _defaults(tmp_path)
    assert d["nothing"] is None


def test_value_write_back(tmp_path):
    d = _defaults(tmp_path)
    # value(k, 10) writes and returns "10"; value(k, 20) still "10"
    assert d.value("count", 10) == "10"
    assert d.value("count", 20) == "10"
    assert d["count"] == "10"
    # delete resets
    d.delete("count")
    assert d.value("count", 20) == "20"


def test_values_stringified(tmp_path):
    d = _defaults(tmp_path)
    d["n"] = 5
    assert d["n"] == "5"


def test_bool_coercion(tmp_path):
    d = _defaults(tmp_path)
    for truthy in (1, "true", "yes", "TRUE", "Yes"):
        d["flag"] = truthy
        assert d.bool_value("flag") is True
    for falsy in (0, "no", "false", "anything"):
        d["flag"] = falsy
        assert d.bool_value("flag") is False
    assert d.bool_value("missing") is False


def test_domains_isolated(tmp_path):
    store = MetadataStore(str(tmp_path / "system"))
    store.create_structures(force=True)
    a = ETLDefaults(store, "a")
    b = ETLDefaults(store, "b")
    a["k"] = "va"
    assert b["k"] is None
    b["k"] = "vb"
    assert a["k"] == "va"
    assert b["k"] == "vb"
