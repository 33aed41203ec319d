#!/usr/bin/env python3
"""Per-query incremental bench probe for scale-up diagnosis.

Unlike bench.py (one JSON line at the end), this prints a JSONL row
per query AS IT COMPLETES, so a pathological query at a new scale
factor is identifiable by the last line emitted before the stall.
Single cold pass; caches released after every query so one query's
materialized intermediates can't flatter the next.

Usage: python scripts/bench_probe.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from datacamp_etl_spark.queries import QUERIES  # noqa: E402
from datacamp_etl_spark.session import get_spark  # noqa: E402
from datacamp_etl_spark.operators.spread import release_engine_caches  # noqa: E402


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args else "/root/repo/.localdata/sf1"
    names = args[1:] or HEADLINE
    spark = get_spark("datacamp-etl-spark-bench-probe")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for name in names:
        fn = QUERIES.get(name)
        if fn is None:
            continue
        start = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        dt = round(time.perf_counter() - start, 3)
        print(json.dumps({"q": name, "sec": dt}), flush=True)
        release_engine_caches()
    spark.stop()


if __name__ == "__main__":
    main()
