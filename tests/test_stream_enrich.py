"""Round-8 streaming additions: versioned-dimension enrichment picks up
mid-stream dimension publishes at batch boundaries, and the progress-stats
rollup surfaces watermark-dropped rows.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.sinks.lake import publish_version
from stock_market_data_pipeline_spark.streaming.pipeline import (
    stream_dim_enrich,
    streaming_progress_stats,
)

FACT_SCHEMA = "k long, x long"


def _run_enrich(spark, src, dim_root, out, ckpt):
    stream = spark.readStream.schema(FACT_SCHEMA).parquet(src)
    q = stream_dim_enrich(
        stream,
        dim_root,
        keys=["k"],
        output_path=out,
        checkpoint_path=ckpt,
        trigger={"availableNow": True},
    )
    q.awaitTermination(120)


def test_stream_dim_enrich_tracks_published_versions(spark, tmp_path):
    """Batch 0 joins dimension v1; after a mid-stream publish_version,
    batch 1 joins v2 — and a fact key absent from the dimension passes
    through with NULL (left join)."""
    dim_root = str(tmp_path / "dim")
    src = str(tmp_path / "facts")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    publish_version(
        spark,
        spark.createDataFrame([(1, "old1"), (2, "old2")], "k long, d string"),
        dim_root,
        keep_versions=3,
    )
    spark.createDataFrame([(1, 10), (9, 90)], FACT_SCHEMA).coalesce(
        1
    ).write.mode("append").parquet(src)
    _run_enrich(spark, src, dim_root, out, ckpt)

    publish_version(
        spark,
        spark.createDataFrame([(1, "NEW1"), (2, "NEW2")], "k long, d string"),
        dim_root,
        keep_versions=3,
    )
    time.sleep(1.1)  # distinct mtime so the new file is a new offset
    spark.createDataFrame([(2, 20)], FACT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _run_enrich(spark, src, dim_root, out, ckpt)

    rows = {
        (r["batch_id"], r["k"]): r["d"]
        for r in spark.read.parquet(out).collect()
    }
    assert rows[(0, 1)] == "old1"      # batch 0 saw v1
    assert rows[(0, 9)] is None        # missing dim key -> NULL passthrough
    assert rows[(1, 2)] == "NEW2"      # batch 1 saw the new version


def test_streaming_progress_stats_counts_watermark_drops(spark, tmp_path):
    """A row older than the committed watermark is dropped by the windowed
    aggregation; streaming_progress_stats must surface the drop."""
    src = str(tmp_path / "ev")
    ckpt = str(tmp_path / "ck")

    def _write(rows):
        spark.createDataFrame(rows, "ts string, k string").select(
            F.col("ts").cast("timestamp").alias("ts"), "k"
        ).coalesce(1).write.mode("append").parquet(src)

    # Three mtime-gapped files -> three ordered micro-batches. The late
    # filter uses the watermark as of batch PLANNING, which lags the
    # committed value by one batch — so the drop is only observable from
    # the third batch on (verified empirically; the two-batch version
    # admits the late row into state).
    _write([("2026-01-01 00:03:20", "a"), ("2026-01-01 00:05:00", "a")])
    time.sleep(1.1)  # mtime gap -> maxFilesPerTrigger=1 orders batches
    _write([("2026-01-01 00:04:00", "a")])  # advances nothing, burns a batch
    time.sleep(1.1)
    _write([("2026-01-01 00:00:50", "a")])  # far older than watermark

    stream = (
        spark.readStream.schema("ts timestamp, k string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    agg = (
        stream.withWatermark("ts", "10 seconds")
        .groupBy(F.window("ts", "30 seconds"), "k")
        .count()
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("memory")
        .queryName("wm_drop_probe")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    stats = streaming_progress_stats(q)
    assert stats, "no progress events recorded"
    assert sum(s["input_rows"] for s in stats) == 4
    assert sum(s["dropped_by_watermark"] for s in stats) >= 1
    assert any(s["watermark"] for s in stats)
