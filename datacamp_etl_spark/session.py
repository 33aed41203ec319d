"""SparkSession factory with scale-appropriate defaults.

Local testing runs ``local[$SPARK_GRAFT_CPUS]`` (single JVM); the
configuration is chosen so the same code is correct on a large cluster:
AQE enabled (runtime join-strategy + skew handling), shuffle partitions
sized explicitly, UTC session timezone (oracle parity with DuckDB),
Arrow enabled for the Pandas-UDF slow path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "stop_spark"]


def _cpus() -> int:
    """$SPARK_GRAFT_CPUS as an int, or 0 when unset/invalid — 0 is
    the sentinel for "use local[*] / os.cpu_count()". (A previous
    revision clamped the unset case to 1, silently running every
    un-harnessed invocation single-threaded on local[1] with
    shuffle.partitions=1 — the sf1 probe measured 341 s for a query
    that takes ~11 s on the machine's actual cores.)"""
    try:
        v = int(os.environ.get("SPARK_GRAFT_CPUS", "0"))
        return v if v > 0 else 0
    except ValueError:
        return 0


def get_spark(
    app_name: str = "datacamp_etl_spark",
    *,
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or return) the engine's SparkSession.

    Defaults are tuned for local mode but remain sensible on a cluster:
    on a real deployment ``master`` comes from spark-submit and
    ``shuffle_partitions`` should be ~2-3x total executor cores (or left
    to AQE coalescing from a high initial value).
    """
    n = _cpus()
    if master is None:
        master = f"local[{n}]" if n else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = n if n else (os.cpu_count() or 8)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "snappy")
        # Read timestamp[ns] parquet (events table) without overflow errors.
        .config("spark.sql.legacy.parquet.nanosAsLong", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "32g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def stop_spark() -> None:
    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
