"""Job entrypoint: run registry queries from the command line.

Reference parity for its spark-submit job scripts
(`/root/reference/src/spark/jobs/spark_batch_processor.py` and the Airflow
task wrappers around them — each job is "read lake → transform → write
lake"): every registry query is runnable as a job with one command, no
Python required on the caller's side::

    python -m stock_market_data_pipeline_spark.run --query daily_vwap \\
        --sf-dir /root/testdata/sf0.01 --out /tmp/out

One JSON line per query goes to stdout (name, rows, seconds, output path)
so schedulers capture machine-readable results from logs, like `bench.py`.
``--query all`` sweeps the registry; ``--out`` omitted writes to the noop
sink (measure-only). Failures are per-query (recorded, exit code 1 at the
end) — one broken query doesn't kill a multi-query job run.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv: list[str] | None = None) -> int:
    from stock_market_data_pipeline_spark.queries import QUERIES
    from stock_market_data_pipeline_spark.session import get_spark

    p = argparse.ArgumentParser(
        prog="stock_market_data_pipeline_spark.run",
        description="Run registry queries as batch jobs.",
    )
    p.add_argument(
        "--query",
        action="append",
        required=True,
        help="registry query name (repeatable), or 'all'",
    )
    p.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
        help="lake directory with the parquet tables",
    )
    p.add_argument("--out", default=None, help="output directory (default: noop sink)")
    p.add_argument("--format", default="parquet", choices=["parquet", "csv"])
    p.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "8")))
    p.add_argument("--explain", action="store_true", help="print the formatted plan")
    args = p.parse_args(argv)

    names = sorted(QUERIES) if "all" in args.query else args.query
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        p.error(f"unknown queries: {unknown}; available: {sorted(QUERIES)[:5]}...")

    spark = get_spark(
        app_name="smdp-run",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")
    failed = False
    for name in names:
        t0 = time.perf_counter()
        try:
            df = QUERIES[name](spark, args.sf_dir)
            if args.explain:
                print(df._jdf.queryExecution().explainString("formatted"))
            # Row count rides the write via observe(): one execution of the
            # plan per job, and the count is of what was actually written —
            # a trailing df.count() would re-run the whole query.
            from pyspark.sql import Observation
            from pyspark.sql import functions as F

            obs = Observation(f"rows_{name}")
            df = df.observe(obs, F.count(F.lit(1)).alias("rows"))
            if args.out:
                dest = os.path.join(args.out, name)
                w = df.write.mode("overwrite")
                if args.format == "csv":
                    w = w.option("header", "true")
                w.format(args.format).save(dest)
            else:
                dest = None
                df.write.format("noop").mode("overwrite").save()
            rows = obs.get["rows"]
            print(
                json.dumps(
                    {
                        "query": name,
                        "rows": rows,
                        "sec": round(time.perf_counter() - t0, 3),
                        "out": dest,
                    }
                )
            )
        except Exception as exc:  # noqa: BLE001 — per-query failure contract
            failed = True
            print(
                json.dumps(
                    {"query": name, "error": f"{type(exc).__name__}: {exc}"[:300]}
                )
            )
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
