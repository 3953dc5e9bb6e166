"""Streaming MERGE-upsert sink: reprocessing must be idempotent and the
final table must equal the batch MERGE result."""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.plans.analytics import windowed_analytics
from stock_market_data_pipeline_spark.sources.ticks import ticks_from_events
from stock_market_data_pipeline_spark.streaming.pipeline import (
    stream_merge_upsert_sink,
)


def test_stream_merge_upsert_idempotent(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    table = str(tmp_path / "table")
    ckpt = str(tmp_path / "ckpt")
    t = ticks_from_events(spark, sf_dir).select(
        "symbol", "price", "volume", "timestamp"
    )
    t.repartition(2).write.mode("overwrite").parquet(src)

    def run():
        stream = (
            spark.readStream.schema(
                "symbol string, price double, volume long, timestamp timestamp"
            )
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        # per-batch windowed analytics merged on (symbol, window_start);
        # batches overlap in windows → the upsert must collapse them. The
        # analytics runs INSIDE foreachBatch (an aggregated stream-stream
        # join is illegal as a streaming plan — the reference's own bug).
        q = stream_merge_upsert_sink(
            stream,
            table,
            ckpt,
            keys=["symbol", "window_start"],
            order_col="updated_at",
            trigger={"availableNow": True},
            batch_transform=lambda df: windowed_analytics(df).withColumn(
                "updated_at", F.col("window_start")
            ),
        )
        q.awaitTermination(180)

    run()
    merged = spark.read.parquet(table)
    # keyed table: exactly one row per (symbol, window_start)
    dups = (
        merged.groupBy("symbol", "window_start").count().filter(F.col("count") > 1)
    )
    assert dups.count() == 0
    n1 = merged.count()
    # second run with same checkpoint: no new data → table unchanged
    run()
    assert spark.read.parquet(table).count() == n1
