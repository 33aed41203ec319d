"""Loading operator family (reference K1-K4, P2, F1, F2).

The reference's ``Loading`` job class generates SQL strings executed by
MySQL (``lib/etl/loading.rb``). Here each operation is a pure
DataFrame -> DataFrame transform (Catalyst optimizes the whole plan);
persistence is handled separately by :mod:`datacamp_etl_spark.sources.warehouse`.

Semantics reproduced:

- staging **system columns** ``id, date_created, etl_loaded_date``
  excluded from identity mappings (``job_manager.rb:46``,
  ``loading.rb:52-62``)
- mapped append stamps ``record_status='loaded'`` and honors an optional
  WHERE condition (``loading.rb:75-99,134-158``)
- update-join: ``UPDATE ds, sta SET ds.f = expr(sta) WHERE ds.key =
  sta.key [AND cond]`` with ``@TABLE`` alias substitution
  (``loading.rb:160-196``) -> equi-join + column overwrite + union of
  unmatched rows (Spark storage is immutable; join+rewrite is exact for
  the reference's key-equijoin SET shape)
- finalize: promote ``record_status 'loaded'->'new'`` stamping lifecycle
  columns (``loading.rb:203-221``)
- loaded-flag watermark: ``etl_loaded_date = NOW()`` on processed
  staging rows (``loading.rb:198-201``)
- incremental predicate: ``date_created > <last_run>`` watermark
  (``loading.rb:142-145``)

Scale notes (100 TB posture): every transform is declarative so
predicate pushdown / column pruning reach the parquet scan; the
update-join shuffles only on the equi-join key and is AQE-eligible
(broadcast when the staging side is small); no driver-side row
materialization anywhere.
"""

from __future__ import annotations

from typing import Any, Iterable, Mapping as TMapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datacamp_etl_spark.operators.mapping import mapping_to_columns, value_to_column

__all__ = [
    "STAGING_SYSTEM_COLUMNS",
    "LIFECYCLE_COLUMNS",
    "identity_mapping",
    "mapped_append",
    "update_with_map",
    "finalize_dataset",
    "set_loaded_flag",
    "incremental_filter",
]

#: Reference ``job_manager.rb:46`` / ``job.rb:164-166``.
STAGING_SYSTEM_COLUMNS = ("id", "date_created", "etl_loaded_date")

#: Dataset lifecycle columns stamped by finalize (``loading.rb:203-221``).
LIFECYCLE_COLUMNS = (
    "record_status",
    "created_at",
    "created_by",
    "quality_status",
    "batch_id",
    "validity_date",
    "is_hidden",
)

#: The reference's staging alias used in ``@TABLE`` substitution
#: (``loading.rb:187``).
STAGING_ALIAS = "sta"
DATASET_ALIAS = "ds"


def identity_mapping(
    df: DataFrame, exclude: Iterable[str] = STAGING_SYSTEM_COLUMNS
) -> dict[str, str]:
    """Reference P2: ``{col -> col}`` over the table's columns minus the
    staging system columns (``Loading#create_identity_mapping``,
    ``loading.rb:52-62``; introspection via ``information_schema`` at
    ``loading.rb:64-73`` becomes ``df.columns``)."""
    excluded = set(exclude)
    return {c: c for c in df.columns if c not in excluded}


def _condition_column(condition: str | Column | None) -> Column | None:
    if condition is None:
        return None
    if isinstance(condition, Column):
        return condition
    # Reference F1: the condition is raw SQL; `@TABLE` refers to the
    # staging table alias (`loading.rb:187`).
    return F.expr(condition.replace("@TABLE", STAGING_ALIAS))


def mapped_append(
    staging: DataFrame,
    mapping: TMapping[str, Any],
    *,
    condition: str | Column | None = None,
    record_status: str = "loaded",
) -> DataFrame:
    """Reference K1: project staging through the mapping, stamp
    ``record_status='loaded'``, optionally filter
    (``append_table_with_map`` + ``create_dataset_append_sql``,
    ``loading.rb:75-158``). Returns the rows to append to the dataset
    table."""
    df = staging.alias(STAGING_ALIAS)
    cond = _condition_column(condition)
    if cond is not None:
        df = df.where(cond)
    cols = mapping_to_columns(mapping)
    cols.append(F.lit(record_status).alias("record_status"))
    return df.select(*cols)


def update_with_map(
    dataset: DataFrame,
    staging: DataFrame,
    mapping: TMapping[str, Any],
    key: str | list[str],
    *,
    condition: str | Column | None = None,
) -> DataFrame:
    """Reference K2/J3: keyed update-join
    (``update_table_with_map``, ``loading.rb:160-196``).

    ``UPDATE ds, sta SET ds.f = expr(sta) ... WHERE ds.key = sta.key
    [AND cond]`` re-expressed for immutable storage: matched dataset
    rows get the mapped columns overwritten from staging; unmatched
    rows pass through untouched; the result is the full rewritten
    dataset.

    Mapping values are evaluated against the *staging* side (the
    reference qualifies sources with the staging alias,
    ``loading.rb:165-169``); the optional condition may reference
    ``@TABLE`` which resolves to the staging alias (``loading.rb:187``).

    Scale: a single equi-join shuffle on ``key`` (broadcast if staging
    is small — AQE decides); only mapped columns are rewritten.
    """
    keys = [key] if isinstance(key, str) else list(key)
    for k in keys:
        if k in mapping:
            raise ValueError(f"update mapping must not overwrite join key {k!r}")

    ds = dataset.alias(DATASET_ALIAS)
    # Pre-compute mapped expressions on the staging side so the join
    # carries only (key, mapped values) — minimal shuffle width.
    sta_cols = [F.col(k) for k in keys]
    sta_cols += [
        value_to_column(v).alias(f"__upd_{field}") for field, v in mapping.items()
    ]
    sta = staging.alias(STAGING_ALIAS)
    cond = _condition_column(condition)
    if cond is not None:
        sta = sta.where(cond)
    # One update row per key (the reference's UPDATE..JOIN applies a
    # single row's values per key; duplicates in staging would be
    # nondeterministic there too — we make it deterministic).
    sta = sta.select(*sta_cols).dropDuplicates(keys)

    join_on = [ds[k] == sta[k] for k in keys]
    joined = ds.join(sta, on=join_on, how="left")
    out_cols: list[Column] = []
    for c in dataset.columns:
        if c in mapping:
            upd = F.col(f"__upd_{c}")
            matched = sta[keys[0]].isNotNull()
            out_cols.append(F.when(matched, upd).otherwise(ds[c]).alias(c))
        else:
            out_cols.append(ds[c].alias(c))
    return joined.select(*out_cols)


def finalize_dataset(
    dataset: DataFrame,
    batch_id: int,
    *,
    created_by: str = "system_loading",
    quality_status: str = "ok",
    is_hidden: bool = True,
) -> DataFrame:
    """Reference K4: promote ``record_status='loaded'`` rows to ``'new'``
    stamping ``created_at=NOW(), created_by='system_loading',
    quality_status='ok', batch_id, validity_date=NULL, is_hidden``
    (``finalize_dataset_loading``, ``loading.rb:203-221``).

    Only 'loaded' rows are touched; everything else passes through.
    """
    loaded = F.col("record_status") == F.lit("loaded")

    def stamp(c: Column) -> Column:
        return F.when(loaded, c)

    df = dataset
    existing = set(df.columns)
    stamps: dict[str, Column] = {
        "created_at": F.current_timestamp(),
        "created_by": F.lit(created_by),
        "quality_status": F.lit(quality_status),
        "batch_id": F.lit(batch_id),
        "validity_date": F.lit(None).cast("date"),
        "is_hidden": F.lit(is_hidden),
    }
    for name, value in stamps.items():
        prev = F.col(name) if name in existing else F.lit(None)
        df = df.withColumn(name, F.when(loaded, value).otherwise(prev))
    return df.withColumn(
        "record_status", F.when(loaded, F.lit("new")).otherwise(F.col("record_status"))
    )


def set_loaded_flag(staging: DataFrame) -> DataFrame:
    """Reference K3: stamp ``etl_loaded_date = NOW()`` on staging rows
    after a successful load (``set_loaded_flag``, ``loading.rb:198-201``).

    At scale prefer the metadata high-watermark
    (:mod:`datacamp_etl_spark.streaming.incremental`); this compat mode
    reproduces the in-table flag.
    """
    return staging.withColumn("etl_loaded_date", F.current_timestamp())


def incremental_filter(
    staging: DataFrame,
    last_run: Any,
    *,
    watermark_column: str = "date_created",
) -> DataFrame:
    """Reference F2: the designed incremental-load predicate
    ``date_created > <last_run>`` (``loading.rb:142-145``,
    ``job_manager.rb:112``) as a first-class operator.

    ``last_run`` may be a datetime/date/ISO string. With a
    date-partitioned staging layout this prunes partitions at the scan.
    """
    return staging.where(F.col(watermark_column) > F.lit(last_run))
