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
the LEFT-PRESERVING join types (each probe row meets exactly one copy
of its matching build rows, selected by its salt). Right-preserving
joins (right/full outer) are rejected: the exploded right side would
emit every unmatched right row ``salt`` times.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join"]

# Join types where only the left side's match multiplicity matters —
# the salt-exploded right side never surfaces unmatched rows.
_LEFT_PRESERVING = {
    "inner",
    "cross",
    "left",
    "left_outer",
    "leftouter",
    "left_semi",
    "leftsemi",
    "semi",
    "left_anti",
    "leftanti",
    "anti",
}


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

    Only left-preserving ``how`` values are allowed (inner/left/
    semi/anti): right/full outer would duplicate unmatched right rows
    ``salt`` times.
    """
    if how.lower().replace("_", "") not in {
        h.replace("_", "") for h in _LEFT_PRESERVING
    }:
        raise ValueError(
            f"salted_join supports left-preserving joins only, got how={how!r}"
        )
    on = list(on)
    # pmod, not abs(...)%salt: abs(Long.MIN_VALUE) overflows negative
    # in Java two's complement, which would yield a negative salt.
    lsalt = F.pmod(
        F.xxhash64(*[F.col(c) for c in left.columns]), F.lit(salt)
    ).cast("int")
    l_salted = left.withColumn("__salt", lsalt)
    r_salted = right.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(salt - 1)).cast("array<int>")),
    )
    out = l_salted.join(r_salted, on=on + ["__salt"], how=how)
    return out.drop("__salt")
