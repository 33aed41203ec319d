"""Skew-aware join [EXT] — explicit salting for hot keys.

AQE's skew-join handling (``spark.sql.adaptive.skewJoin``) splits
oversized partitions at runtime and is the first line of defense. But
it only helps sort-merge joins of two shuffled sides; a *broadcast-
ineligible* join where one key holds 1% of 100 TB still funnels that
key's rows through few tasks between AQE split points. Explicit
salting spreads ONE hot build row into ``salt`` copies and scatters
the probe side uniformly — worst-case task input shrinks by the salt
factor, deterministically, on any Spark version or join strategy.

Semantics are identical to ``left.join(right, on=keys, how=...)`` for
equi-joins (each probe row meets exactly one copy of its matching
build rows, selected by its salt).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join"]


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    *,
    how: str = "inner",
    salt: int = 8,
) -> DataFrame:
    """Equi-join ``left`` (large, possibly skewed) with ``right``
    (replicable side) on ``on``, spreading each join key over
    ``salt`` sub-keys.

    ``left`` rows get a deterministic salt from their whole row hash;
    ``right`` rows are exploded ``salt`` times. Output columns match
    the plain join (salt column dropped). ``right`` grows by the salt
    factor — keep it the smaller side.
    """
    on = list(on)
    lsalt = (
        F.abs(F.xxhash64(*[F.col(c) for c in left.columns])) % salt
    ).cast("int")
    l_salted = left.withColumn("__salt", lsalt)
    r_salted = right.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<int>")),
    )
    out = l_salted.join(r_salted, on=on + ["__salt"], how=how)
    return out.drop("__salt")
