#!/usr/bin/env python
"""Instrumented replica of the bench in-sequence window — the tool for
VERDICT r11 task #2 (root-cause the residual in-sequence inflation:
vocab_growth_curve 10.8 s in-seq vs 3.8 s standalone in the SAME r11
capture, after the per-query cache release).

Runs a HEADLINE window with the exact bench methodology and records,
per query, the between-query deltas of everything that could
accumulate or overlap:

- block-manager local-dir bytes + file count (shuffle/spill files);
- JVM GC time and count (all collectors);
- storage memory used;
- the ContextCleaner backlog proxy: files deleted DURING the next
  query (dir shrink while a timer runs = async cleanup overlap).

Modes (env SEQ_MODE):
- asis      — bench.py's methodology verbatim: timer, then
              release_engine_caches() (non-blocking unpersists +
              System.gc nudge), next timer immediately.
- quiesce   — same, but after the release WAIT for the block-manager
              dir to stop shrinking (ContextCleaner drain, max 10 s)
              before starting the next timer.
- jitdrain  — same as asis, but after the release WAIT (outside the
              next timer, max 10 s) for the JIT C2 compile queue to
              drain: polls CompilationMXBean total compile time until
              it stops moving. Isolates compile-thread CPU steal.
- twopass   — asis methodology, but the whole window runs TWICE in
              one session; pass 2 is fully JIT/IO-warm, so a pass-1
              excursion that vanishes in pass 2 is warm-up, and one
              that persists is real accumulation.
Then each mode re-measures the LAST query standalone (bench's
standalone methodology) for the in-seq / standalone ratio.

Usage:
  SEQ_MODE=asis python scripts/profile_sequence.py [sf_dir] [q ...]
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_WINDOW = [
    "mapped_append",  # sentinel: absorbs JIT warm-up
    "triangle_counts",
    "clustering_coefficient",
    "common_neighbor_pairs",
    "fs_linkage_scores",
    "seasonal_decompose_daily",
    "phrase_search_positional",
    "readability_scores",
    "lagged_cross_correlation",
    "attribution_position_based",
    "kwic_concordance",
    "ngram_novelty_scores",
    "vocab_growth_curve",
]


def _local_dirs(spark):
    env = spark.sparkContext._jvm.org.apache.spark.SparkEnv.get()
    dirs = env.blockManager().diskBlockManager().localDirs()
    return [dirs[i].getAbsolutePath() for i in range(len(dirs))]


def _dir_stats(paths):
    nbytes = nfiles = 0
    for p in paths:
        for root, _dirs, files in os.walk(p):
            for f in files:
                try:
                    nbytes += os.path.getsize(os.path.join(root, f))
                    nfiles += 1
                except OSError:
                    pass
    return nbytes, nfiles


def _gc_stats(spark):
    beans = (
        spark.sparkContext._jvm.java.lang.management.ManagementFactory
        .getGarbageCollectorMXBeans()
    )
    t = c = 0
    for i in range(beans.size()):
        b = beans.get(i)
        t += b.getCollectionTime()
        c += b.getCollectionCount()
    return t, c


def _storage_used(spark):
    env = spark.sparkContext._jvm.org.apache.spark.SparkEnv.get()
    return env.memoryManager().storageMemoryUsed()


def _jit_stats(spark):
    """(total JIT compile ms, loaded class count, code-cache used MB,
    metaspace used MB)."""
    mf = spark.sparkContext._jvm.java.lang.management.ManagementFactory
    comp = mf.getCompilationMXBean().getTotalCompilationTime()
    classes = mf.getClassLoadingMXBean().getLoadedClassCount()
    code = meta = 0
    pools = mf.getMemoryPoolMXBeans()
    for i in range(pools.size()):
        p = pools.get(i)
        n = p.getName()
        used = p.getUsage().getUsed()
        if "CodeHeap" in n or "Code Cache" in n:
            code += used
        elif n == "Metaspace":
            meta += used
    return comp, classes, round(code / 1e6, 1), round(meta / 1e6, 1)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    window = sys.argv[2:] or DEFAULT_WINDOW
    if os.environ.get("SEQ_WINDOW") == "headline":
        import bench

        window = list(bench.HEADLINE)
    mode = os.environ.get("SEQ_MODE", "asis")

    from datacamp_etl_spark.operators.spread import release_engine_caches
    from datacamp_etl_spark.queries import QUERIES
    from datacamp_etl_spark.session import get_spark

    spark = get_spark("seq-profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    dirs = _local_dirs(spark)

    def execute(name):
        QUERIES[name](spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()

    def quiesce(max_wait=10.0):
        """Wait for the ContextCleaner's async deletions to drain:
        poll the block-manager dirs until two consecutive reads agree."""
        deadline = time.time() + max_wait
        prev = _dir_stats(dirs)
        while time.time() < deadline:
            time.sleep(0.25)
            cur = _dir_stats(dirs)
            if cur == prev:
                return
            prev = cur

    passes = 2 if mode == "twopass" else 1
    rows = []
    for pnum in range(passes):
        for name in window:
            if name not in QUERIES:
                continue
            b0, f0 = _dir_stats(dirs)
            g0, c0 = _gc_stats(spark)
            s0 = _storage_used(spark)
            j0, k0, cc0, ms0 = _jit_stats(spark)
            t0 = time.perf_counter()
            execute(name)
            dt = time.perf_counter() - t0
            b1, f1 = _dir_stats(dirs)
            g1, c1 = _gc_stats(spark)
            s1 = _storage_used(spark)
            j1, k1, cc1, ms1 = _jit_stats(spark)
            release_engine_caches()
            if mode == "quiesce":
                quiesce()
            elif mode == "jitdrain":
                # wait (outside the next timer) for the C2 queue to
                # drain: poll total compile time until it stops moving
                deadline = time.time() + 10.0
                mf = (
                    spark.sparkContext._jvm.java.lang.management
                    .ManagementFactory
                )
                prev = mf.getCompilationMXBean().getTotalCompilationTime()
                while time.time() < deadline:
                    time.sleep(0.25)
                    cur = (
                        mf.getCompilationMXBean().getTotalCompilationTime()
                    )
                    if cur - prev < 40:
                        break
                    prev = cur
            rows.append(
                {
                    "pass": pnum,
                    "name": name,
                    "sec": round(dt, 3),
                    "dir_mb_post": round(b1 / 1e6, 1),
                    "files_post": f1,
                    "gc_ms": g1 - g0,
                    "gc_n": c1 - c0,
                    "storage_mb_post": round(s1 / 1e6, 1),
                    "jit_ms": j1 - j0,
                    "classes": k1,
                    "classes_d": k1 - k0,
                    "codecache_mb": cc1,
                    "metaspace_mb": ms1,
                }
            )
            print(json.dumps(rows[-1]), flush=True)

    # standalone re-measure of the last query (bench methodology)
    last = window[-1]
    release_engine_caches()
    j0, _, _, _ = _jit_stats(spark)
    t0 = time.perf_counter()
    execute(last)
    iso = time.perf_counter() - t0
    j1, _, _, _ = _jit_stats(spark)
    release_engine_caches()
    in_seq = rows[-1]["sec"]
    print(
        json.dumps(
            {
                "summary": True,
                "mode": mode,
                "last": last,
                "in_seq": in_seq,
                "standalone": round(iso, 3),
                "standalone_jit_ms": j1 - j0,
                "ratio": round(in_seq / iso, 2),
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
