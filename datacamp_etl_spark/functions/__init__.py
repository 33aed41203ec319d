"""Shared column-expression helpers (all JVM-side, codegen-friendly)."""

from __future__ import annotations

from typing import Iterable

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "null_safe_concat",
    "md5_digest",
    "stable_str",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
]


def stable_str(c: Column | str, *, decimals: int = 2) -> Column:
    """Cast a column to a cross-engine-stable string.

    Doubles stringify differently across engines (Java ``1.0E7`` vs
    ``10000000.0``), so fractional numerics go through
    ``DECIMAL(18,<decimals>)`` first. Used by digest operators whose
    output must hash-match a SQL oracle.
    """
    col = F.col(c) if isinstance(c, str) else c
    return F.when(
        col.cast("string").rlike(r"^-?\d+\.\d+(E-?\d+)?$"),
        col.cast(f"decimal(18,{decimals})").cast("string"),
    ).otherwise(col.cast("string"))


def null_safe_concat(cols: Iterable[Column | str]) -> Column:
    """``CONCAT(COALESCE(f1,''), COALESCE(f2,''), ...)`` — the
    reference's NULL-safe row serialization (``loading.rb:258``).
    Plain concat (no separator) to match reference semantics exactly
    (SURVEY §7 risk 3: CONCAT vs concat_ws)."""
    parts = [
        F.coalesce((F.col(c) if isinstance(c, str) else c).cast("string"), F.lit(""))
        for c in cols
    ]
    return F.concat(*parts)


def md5_digest(cols: Iterable[Column | str]) -> Column:
    """Reference P4: ``MD5(CONCAT(COALESCE(f,'') ...))``
    (``create_record_md5_table``, ``loading.rb:254-270``)."""
    return F.md5(null_safe_concat(cols))


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Dot product of two ``array<float/double>`` columns, JVM-side via
    ``zip_with`` + ``aggregate`` (no Python UDF)."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(ca, cb, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    ca = F.col(a) if isinstance(a, str) else a
    sq = F.aggregate(
        ca, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    )
    return F.sqrt(sq)


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity of two vector columns; NULL on zero-norm."""
    num = dot_product(a, b)
    den = l2_norm(a) * l2_norm(b)
    return F.when(den != 0, num / den)
