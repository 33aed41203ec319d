#!/usr/bin/env python3
"""Output/candidate cardinality evidence for the sf1 scale-up run.

The sf1 fixture (scripts/make_scaledata.py) replicates every document
10x as NEAR-duplicates, so the TRUE pair output of the dedup family
grows ~quadratically in the duplication factor BY CONSTRUCTION — a
dedup workload at 10x corpus with 10x near-dup density. A wall-time
ratio alone can't distinguish "operator went superlinear" from
"output went superlinear"; this script records the denominators:
per-query OUTPUT row counts at sf0.1 and sf1, so COVERAGE.md can
report seconds-per-output-row alongside seconds.

Prints one JSONL row per (query, sf): {"q", "sf", "rows", "sec"}.

Usage: python scripts/scale_evidence.py [query ...]
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

DEFAULT = [
    "ngram_jaccard_pairs",
    "containment_pairs",
    "simhash_near_pairs",
    "lsh_candidate_pairs",
    "near_dup_verified",
    "dedup_clusters",
    "span_dedup",
]

SFS = {
    "0.1": "/root/testdata/sf0.1",
    "1": "/root/repo/.localdata/sf1",
}


def main() -> None:
    names = sys.argv[1:] or DEFAULT
    spark = get_spark("scale-evidence")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for sf, sf_dir in SFS.items():
        if not os.path.isdir(sf_dir):
            continue
        for name in names:
            start = time.perf_counter()
            rows = QUERIES[name](spark, sf_dir).count()
            dt = round(time.perf_counter() - start, 2)
            print(json.dumps({"q": name, "sf": sf, "rows": rows, "sec": dt}), flush=True)
            release_engine_caches()
    spark.stop()


if __name__ == "__main__":
    main()
