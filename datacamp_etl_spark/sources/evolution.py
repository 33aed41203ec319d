"""Schema evolution for parquet ingest [EXT].

Long-lived ingest paths accumulate schema drift: producers add
columns, widen ints, reorder fields. The reference handles drift with
warehouse DDL (``loading.rb`` staging-table recreation); an immutable-
parquet engine instead CONFORMS each file generation to a target
schema at read time:

- missing columns materialize as typed nulls,
- safe widenings cast (byte<=short<=int<=long, float<=double,
  integer->decimal/double), and
- anything lossy (narrowing, string->numeric) raises instead of
  silently corrupting — drift is a contract violation to surface, not
  to paper over.

Scale shape: conformance is a per-file projection planned at read
time (no rewrite of historical data); the cast/null-fill expressions
run inside the scan's codegen stage. At 100 TB, rewriting history to
the new schema is the operation you structurally cannot afford — this
is the operator that makes it unnecessary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["conform_to_schema", "read_evolved"]

_WIDEN_RANK = {"byte": 0, "short": 1, "integer": 2, "long": 3}
_FLOAT_RANK = {"float": 0, "double": 1}


def _can_widen(src: T.DataType, dst: T.DataType) -> bool:
    if src == dst:
        return True
    s, d = src.typeName(), dst.typeName()
    if s in _WIDEN_RANK and d in _WIDEN_RANK:
        return _WIDEN_RANK[s] <= _WIDEN_RANK[d]
    if s in _FLOAT_RANK and d in _FLOAT_RANK:
        return _FLOAT_RANK[s] <= _FLOAT_RANK[d]
    # integer -> float/double/decimal is value-preserving enough for
    # analytics (documented); the reverse is not.
    if s in _WIDEN_RANK and (d in _FLOAT_RANK or d == "decimal"):
        return True
    return False


def conform_to_schema(df: DataFrame, target: T.StructType) -> DataFrame:
    """Project ``df`` onto ``target``: fill absent fields with typed
    nulls, apply safe widening casts, keep target field order. Raises
    ``ValueError`` on lossy drift or unknown extra semantics are NOT
    applied — extra source columns are dropped (they belong to a newer
    target)."""
    have = {f.name: f for f in df.schema.fields}
    cols = []
    for field in target.fields:
        src = have.get(field.name)
        if src is None:
            cols.append(F.lit(None).cast(field.dataType).alias(field.name))
        elif _can_widen(src.dataType, field.dataType):
            cols.append(F.col(field.name).cast(field.dataType))
        else:
            raise ValueError(
                f"lossy schema drift on {field.name!r}: "
                f"{src.dataType.simpleString()} !-> "
                f"{field.dataType.simpleString()}"
            )
    return df.select(*cols)


def read_evolved(
    spark: SparkSession, paths: list[str], target: T.StructType | str
) -> DataFrame:
    """Read several parquet generations and conform every one to
    ``target`` (a StructType or DDL string), unioning by position
    AFTER conformance so field order/width differences between
    generations cannot mis-bind."""
    if isinstance(target, str):
        target = T.StructType.fromDDL(target)
    out: DataFrame | None = None
    for p in paths:
        part = conform_to_schema(spark.read.parquet(p), target)
        out = part if out is None else out.unionByName(part)
    if out is None:
        raise ValueError("read_evolved: no paths given")
    return out
