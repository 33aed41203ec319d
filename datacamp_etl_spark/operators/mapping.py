"""Typed-literal mapping DSL (reference operator P1).

The reference's only user-facing expression language is
``Loading#sql_value`` (reference ``lib/etl/loading.rb:101-132``), which
turns a mapping value into a SQL fragment:

- ``nil``                      -> ``NULL``
- ``String``/``Symbol``        -> column reference, optionally
                                  ``table.``-qualified
                                  (``loading.rb:114-117``)
- ``{:type => :string}``       -> quoted string literal
- ``{:type => :number}``       -> raw numeric literal
- ``{:type => :sql}``          -> raw SQL expression
- ``{:type => :date}``         -> ``STR_TO_DATE(v, '%d.%m.%Y')``
                                  (``loading.rb:125-127``)

Here the same five kinds map onto native PySpark ``Column`` expressions
so Catalyst sees real expressions (constant folding, pushdown) instead
of opaque strings. A mapping is ``{target_field: value}`` exactly like
the reference's ``{target => source}`` hashes
(``jobs/dummy.loading/dummy_loading.rb``-style usage).
"""

from __future__ import annotations

from typing import Any, Mapping as TMapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "string_value",
    "number_value",
    "sql_value",
    "date_value",
    "col_value",
    "value_to_column",
    "mapping_to_columns",
    "apply_mapping",
    "REFERENCE_DATE_FORMAT",
]

# MySQL '%d.%m.%Y' == day.month.4-digit-year; Spark pattern accepts
# single- or double-digit day/month (parity risk #4 in SURVEY §7).
REFERENCE_DATE_FORMAT = "d.M.y"


def string_value(v: Any) -> dict[str, Any]:
    """A string *literal* (reference ``{:type => :string}``)."""
    return {"type": "string", "value": v}


def number_value(v: Any) -> dict[str, Any]:
    """A numeric literal (reference ``{:type => :number}``)."""
    return {"type": "number", "value": v}


def sql_value(v: str) -> dict[str, Any]:
    """A raw SQL expression (reference ``{:type => :sql}``)."""
    return {"type": "sql", "value": v}


def date_value(v: str, fmt: str = REFERENCE_DATE_FORMAT) -> dict[str, Any]:
    """Parse column ``v`` as a date with the reference's ``d.m.Y`` format
    (reference ``loading.rb:125-127``)."""
    return {"type": "date", "value": v, "format": fmt}


def col_value(name: str) -> str:
    """A column reference — plain strings already mean this; helper for
    symmetry."""
    return name


def value_to_column(value: Any) -> Column:
    """Translate one mapping value into a PySpark ``Column``.

    Mirrors ``Loading#sql_value`` (``loading.rb:101-132``): ``None`` ->
    NULL; ``str`` -> column reference (a ``"table.col"`` string keeps its
    qualifier, matching ``loading.rb:114-117``); typed dicts as above.
    """
    if value is None:
        return F.lit(None)
    if isinstance(value, Column):
        return value
    if isinstance(value, str):
        return F.col(value)
    if isinstance(value, dict):
        kind = value.get("type")
        v = value.get("value")
        if kind == "string":
            return F.lit(str(v))
        if kind == "number":
            return F.lit(v)
        if kind == "sql":
            return F.expr(str(v))
        if kind == "date":
            fmt = value.get("format", REFERENCE_DATE_FORMAT)
            return F.to_date(F.col(str(v)), fmt)
        raise ValueError(f"unknown mapping value type: {kind!r}")
    # Bare numbers/booleans are accepted as literals for ergonomics.
    if isinstance(value, (int, float, bool)):
        return F.lit(value)
    raise TypeError(f"unsupported mapping value: {value!r}")


def mapping_to_columns(mapping: TMapping[str, Any]) -> list[Column]:
    """``{field: value}`` -> ``[Column.alias(field), ...]`` preserving
    mapping order (the reference emits fields in hash order,
    ``loading.rb:84-87``)."""
    return [value_to_column(v).alias(k) for k, v in mapping.items()]


def apply_mapping(df: DataFrame, mapping: TMapping[str, Any]) -> DataFrame:
    """Project ``df`` through a mapping (the SELECT list of the
    reference's generated ``INSERT INTO ... SELECT`` —
    ``create_dataset_append_sql``, ``loading.rb:75-99``)."""
    return df.select(*mapping_to_columns(mapping))
