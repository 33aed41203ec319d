#!/usr/bin/env python3
"""Measure the CAPPED heavy dedup chain at scale (VERDICT r12 #6).

The sf10 scale-decade probe (round 12) ran the minhash -> bands ->
pairs -> clusters chain UNCAPPED (51.9M candidate pairs, superlinear
wall adjudicated as answer growth). The adversarial-case defense
rests on the documented guards — ``lsh_candidate_pairs``'s
mega-bucket cap and the quality-survivor bound — but those had never
been probe-measured at the second decade. This script runs the chain
twice in one session (shared warm JVM, same-run sentinel):

  uncapped — max_bucket_size=None (the r12 probe arm, re-measured)
  capped   — max_bucket_size=CAP (default 100: the organic fixture's
             power-law clusters reach ~416 docs, so a 100-cap
             actually bites, unlike the 10k production default)

and reports wall seconds + output rows per stage for both arms. The
expected shape: the capped arm's pair mass (and everything
downstream) collapses toward the bucket-cap bound while the
signature stage is identical — i.e. the guard converts quadratic
answer growth into a tunable budget, which is the 100 TB contract.

Usage:
  python scripts/probe_capped_chain.py [--sf .localdata/sf10]
      [--cap 100]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    argv = sys.argv[1:]

    def opt(name, default):
        return argv[argv.index(name) + 1] if name in argv else default

    sf_dir = opt("--sf", os.path.join(REPO, ".localdata", "sf10"))
    cap = int(opt("--cap", "100"))

    from pyspark.sql import functions as F

    from datacamp_etl_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signature,
    )
    from datacamp_etl_spark.operators.graph import dedup_clusters
    from datacamp_etl_spark.operators.spread import release_engine_caches
    from datacamp_etl_spark.queries import t
    from datacamp_etl_spark.session import get_spark

    spark = get_spark("probe-capped-chain")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def timed(label, fn):
        t0 = time.perf_counter()
        out = fn()
        wall = round(time.perf_counter() - t0, 2)
        print(json.dumps({"stage": label, "wall_s": wall, "out": out}),
              flush=True)
        return wall

    # same-run sentinel: the box factor for this session
    docs = t(spark, sf_dir, "documents")
    timed("sentinel_docs_count", lambda: docs.count())

    _ = minhash_signature  # signature stage runs inside the pair lineage
    results = {}
    for arm, bucket_cap in (("uncapped", None), ("capped", cap)):
        release_engine_caches()
        t0 = time.perf_counter()
        pairs = lsh_candidate_pairs(docs, max_bucket_size=bucket_cap)
        n_pairs = pairs.count()
        t_pairs = round(time.perf_counter() - t0, 2)

        t1 = time.perf_counter()
        clusters = dedup_clusters(docs, pairs)
        n_assign = clusters.where("NOT keep").count()
        t_clusters = round(time.perf_counter() - t1, 2)
        results[arm] = {
            "bucket_cap": bucket_cap,
            "pairs": n_pairs,
            "pairs_wall_s": t_pairs,
            "dup_docs": n_assign,
            "clusters_wall_s": t_clusters,
            "total_wall_s": round(t_pairs + t_clusters, 2),
        }
        print(json.dumps({"arm": arm, **results[arm]}), flush=True)

    u, c = results["uncapped"], results["capped"]
    print(json.dumps({
        "summary": True,
        "sf": sf_dir,
        "cap": cap,
        "pair_reduction": round(u["pairs"] / max(1, c["pairs"]), 2),
        "wall_reduction": round(
            u["total_wall_s"] / max(0.01, c["total_wall_s"]), 2
        ),
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
