"""r20 item 3 (guide §1: measure first): where does the ~1.5-3.6 s
fixed cost of one availableNow lifecycle actually go?

Times N repeated lifecycles of three stream shapes on tiny synthetic
tempdir data and prints, per shape, the wall time plus the breakdown
Spark itself reports in StreamingQueryProgress.durationMs (addBatch,
latestOffset, queryPlanning, walCommit, commitOffsets, getBatch):

  a. file source -> memory sink, stateless projection
  b. file source -> foreachBatch(noop), dropDuplicates state
  c. manifest_stream (Python datasource) -> parquet sink

Run alone (no concurrent Spark):  python scripts/profile_stream_r20.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.session import get_spark

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N = int(os.environ.get("N_LIFECYCLES", "5"))


def drain(q, timeout=120):
    if not q.awaitTermination(timeout):
        q.stop()
        raise TimeoutError("stream did not drain")
    return q


def progress_breakdown(q) -> dict:
    out: dict[str, int] = {}
    n_batches = 0
    for p in q.recentProgress:
        n_batches += 1
        for k, v in (p.get("durationMs") or {}).items():
            out[k] = out.get(k, 0) + int(v)
    out["n_batches"] = n_batches
    return out


def main() -> None:
    spark = get_spark(
        app_name="profile-stream-r20",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="smdp_profstream_")
    results: dict = {}
    try:
        # shared tiny input dir for the file-source shapes
        src = f"{tmp}/in"
        spark.range(1000).select(
            F.col("id"), (F.col("id") % 7).alias("k")
        ).coalesce(2).write.parquet(src)

        # ---- a. stateless file source -> memory sink
        laps, bds = [], []
        for i in range(N):
            t0 = time.perf_counter()
            q = (
                spark.readStream.schema("id long, k long").parquet(src)
                .select("id", "k")
                .writeStream.format("memory")
                .queryName(f"prof_a_{i}")
                .option("checkpointLocation", f"{tmp}/ckpt_a_{i}")
                .trigger(availableNow=True)
                .start()
            )
            drain(q)
            laps.append(round(time.perf_counter() - t0, 3))
            bds.append(progress_breakdown(q))
        results["a_file_memory_stateless"] = {"laps": laps, "bd": bds[-1]}

        # ---- b. file source + dropDuplicates state -> foreachBatch
        laps, bds = [], []
        for i in range(N):
            t0 = time.perf_counter()
            q = (
                spark.readStream.schema("id long, k long").parquet(src)
                .dropDuplicates(["id"])
                .writeStream.foreachBatch(lambda df, bid: df.count())
                .option("checkpointLocation", f"{tmp}/ckpt_b_{i}")
                .trigger(availableNow=True)
                .start()
            )
            drain(q)
            laps.append(round(time.perf_counter() - t0, 3))
            bds.append(progress_breakdown(q))
        results["b_file_state_foreachbatch"] = {"laps": laps, "bd": bds[-1]}

        # ---- c. manifest_stream python datasource -> parquet sink
        from stock_market_data_pipeline_spark.sinks.manifest_lake import (
            publish_files,
        )
        from stock_market_data_pipeline_spark.streaming.manifest_source import (
            ManifestStreamDataSource,
        )

        spark.dataSource.register(ManifestStreamDataSource)
        root = f"{tmp}/table"
        publish_files(
            spark,
            spark.range(1000).select(F.col("id"), (F.col("id") % 7).alias("k")),
            root,
        )
        laps, bds = [], []
        for i in range(N):
            t0 = time.perf_counter()
            q = (
                spark.readStream.format("manifest_stream")
                .option("path", root)
                .load()
                .writeStream.format("parquet")
                .option("path", f"{tmp}/sink_c_{i}")
                .option("checkpointLocation", f"{tmp}/ckpt_c_{i}")
                .trigger(availableNow=True)
                .start()
            )
            drain(q)
            laps.append(round(time.perf_counter() - t0, 3))
            bds.append(progress_breakdown(q))
        results["c_manifest_stream_parquet"] = {"laps": laps, "bd": bds[-1]}

        # ---- c2. same lifecycle REUSING one checkpoint (replay no-op)
        laps = []
        for i in range(N):
            t0 = time.perf_counter()
            q = (
                spark.readStream.format("manifest_stream")
                .option("path", root)
                .load()
                .writeStream.format("parquet")
                .option("path", f"{tmp}/sink_c2")
                .option("checkpointLocation", f"{tmp}/ckpt_c2")
                .trigger(availableNow=True)
                .start()
            )
            drain(q)
            laps.append(round(time.perf_counter() - t0, 3))
        results["c2_manifest_stream_replay"] = {"laps": laps}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        spark.stop()
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
