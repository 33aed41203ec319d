#!/usr/bin/env python3
"""Interleaved A/B measurement of one query under a config delta.

Spawns NOTHING: this is the single-measurement leaf. It builds a
fresh session (optionally with a config overlay), runs the named
query cold then warm (bench methodology: caches released between
passes, warm number is the steady-state compute), prints one JSON
line, exits. Interleave A/B by invoking this alternately from a
shell loop — the only protocol that survives this box's ambient
contention windows (OPTIMIZATION_r13.md).

Usage: python scripts/ab_probe.py <query> <sf_dir> <variant>
  variant: "base" (committed session factory as-is) or a
  comma-separated k=v conf overlay, e.g.
  "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning=true"
Env: SPARK_GRAFT_CPUS as usual.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datacamp_etl_spark.queries import QUERIES  # noqa: E402
from datacamp_etl_spark.session import get_spark  # noqa: E402
from datacamp_etl_spark.operators.spread import release_engine_caches  # noqa: E402


def main() -> None:
    name, sf_dir, variant = sys.argv[1], sys.argv[2], sys.argv[3]
    conf = {}
    if variant != "base":
        for kv in variant.split(","):
            k, v = kv.split("=", 1)
            conf[k] = v
    spark = get_spark(f"ab-{name}", extra_conf=conf)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    out = {"q": name, "variant": variant, "cpus": os.environ.get("SPARK_GRAFT_CPUS")}
    for series in ("cold", "warm"):
        start = time.perf_counter()
        QUERIES[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
        out[series] = round(time.perf_counter() - start, 3)
        release_engine_caches()
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
