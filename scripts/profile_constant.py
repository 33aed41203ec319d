#!/usr/bin/env python3
"""Decompose the grown per-query bench constant (VERDICT r12 #1a).

The r12 capture showed every sub-second query at 1.4-2.3x its r8
baseline while every >=1 s query sat 0.97-1.32x — an additive
~0.3-0.7 s per-query constant, not plan drift. Two hypotheses:

H1 (JIT depth): the r8 paired baseline's warm pass ran after ~96x2
   prior query executions with NO per-query cache release, so its
   numbers ride deep C2-compiled codegen; the post-r11 methodology
   (release_engine_caches after every query, 1-query standalone
   sessions) measures shallow-JIT executions. Signature: per-query
   wall CONVERGES toward the r8 number as the same query repeats in
   one session.

H2 (fixed per-invocation work): something in the query path (parquet
   footer schema inference in t(), plan analysis over a grown
   catalog, the release call bleeding async cleanup into the next
   timer) costs a constant per invocation. Signature: per-query wall
   stays FLAT across repetitions.

This probe runs each named query REPS times in one fresh session
(same conf as bench.py), printing every iteration, in two modes:
  release   — release_engine_caches() between iterations (current
              bench methodology)
  accumulate — no release (the r8-era methodology)
plus a plan-construction-only series (fn(spark, sf_dir) without
executing) to split Python/analysis cost from execution.

Usage:
  python scripts/profile_constant.py [--sf /root/testdata/sf0.1]
      [--reps 8] [name ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_NAMES = [
    "q14_promo_effect",
    "q19_disjunctive_pred",
    "incremental_load",
    "md5_digest",
    "q1_pricing_summary",  # >=1 s control: sits ~1x adjusted
]


def main() -> int:
    argv = sys.argv[1:]

    def opt(name, default):
        return argv[argv.index(name) + 1] if name in argv else default

    sf_dir = opt("--sf", "/root/testdata/sf0.1")
    reps = int(opt("--reps", "8"))
    names = [a for a in argv if not a.startswith("--")
             and a not in (opt("--sf", None), opt("--reps", None))]
    names = names or DEFAULT_NAMES

    from datacamp_etl_spark.queries import QUERIES
    from datacamp_etl_spark.session import get_spark
    from datacamp_etl_spark.operators.spread import release_engine_caches

    spark = get_spark("profile-constant")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM spin-up

    def execute(df):
        df.write.mode("overwrite").format("noop").save()

    for name in names:
        fn = QUERIES[name]
        rec: dict = {"name": name, "sf": sf_dir}

        # plan-construction only (Python expression building + driver
        # analysis; no job) — the per-invocation floor
        series = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn(spark, sf_dir)
            series.append(round(time.perf_counter() - t0, 3))
        rec["construct_only"] = series

        # current methodology: release between iterations
        series = []
        for _ in range(reps):
            release_engine_caches()
            t0 = time.perf_counter()
            execute(fn(spark, sf_dir))
            series.append(round(time.perf_counter() - t0, 3))
        rec["release_mode"] = series

        # r8-era methodology: accumulate (no release between)
        release_engine_caches()
        series = []
        for _ in range(reps):
            t0 = time.perf_counter()
            execute(fn(spark, sf_dir))
            series.append(round(time.perf_counter() - t0, 3))
        rec["accumulate_mode"] = series
        release_engine_caches()

        print(json.dumps(rec), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
