#!/usr/bin/env python3
"""Stage-level profile of ONE registry query at a given sf dir.

Runs the query with the Spark UI enabled, then dumps the completed
stages (time-ordered, heaviest first) from the UI REST API — the
local[32] substitute for a cluster's Spark History Server when a
query's wall time needs attributing to a specific exchange/kernel.

Usage: python scripts/profile_query.py <query> [sf_dir] [top_n]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datacamp_etl_spark.queries import QUERIES  # noqa: E402
from datacamp_etl_spark.session import get_spark  # noqa: E402


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.localdata/sf1"
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 15
    spark = get_spark(
        f"profile-{name}", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    start = time.perf_counter()
    QUERIES[name](spark, sf_dir).write.mode("overwrite").format("noop").save()
    wall = round(time.perf_counter() - start, 2)

    ui = spark.sparkContext.uiWebUrl
    app = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))[0]["id"]
    stages = json.load(
        urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages?status=complete"
        )
    )
    rows = []
    for s in stages:
        rows.append(
            {
                "stage": s["stageId"],
                "sec": round(s.get("executorRunTime", 0) / 1000.0, 1),
                "cpu_sec": round(s.get("executorCpuTime", 0) / 1e9, 1),
                "tasks": s.get("numCompleteTasks"),
                "in_rows": s.get("inputRecords", 0) or s.get("shuffleReadRecords", 0),
                "out_rows": s.get("outputRecords", 0) or s.get("shuffleWriteRecords", 0),
                "name": s.get("name", "")[:90],
            }
        )
    rows.sort(key=lambda r: -r["sec"])
    print(json.dumps({"query": name, "wall_sec": wall, "sf_dir": sf_dir}))
    for r in rows[:top_n]:
        print(json.dumps(r))
    spark.stop()


if __name__ == "__main__":
    main()
