"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced through the noop sink — unlike ``count()``, which lets
Catalyst prune projection-only plans down to a row count, noop materializes
every output column, so timings reflect real work.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from stock_market_data_pipeline_spark.queries import QUERIES
from stock_market_data_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Every registered batch query is benched — a regression in an unbenched
# query cannot hide. Deliberate exclusions go here WITH a reason and are
# emitted in the output JSON.
EXCLUDED: dict[str, str] = {}
HEADLINE = sorted(QUERIES)


def main() -> None:
    spark = get_spark(
        app_name="smdp-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    spark.sparkContext.setLogLevel("ERROR")
    # Warm the JVM/codegen paths once so per-query timings measure the
    # queries, not first-job startup.
    QUERIES["windowed_analytics"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        if name in EXCLUDED:
            continue
        t0 = time.perf_counter()
        QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "excluded": sorted(EXCLUDED),
                "sf": float(sf),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
