"""Custom stateful operator test: running VWAP state must accumulate across
micro-batches and converge to the batch-computed VWAP."""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.sources.ticks import ticks_from_events
from stock_market_data_pipeline_spark.streaming.stateful import stream_running_vwap


def test_running_vwap_across_microbatches(spark, sf_dir, tmp_path):
    src = str(tmp_path / "src")
    t = ticks_from_events(spark, sf_dir).select(
        "symbol", "price", "volume", "timestamp"
    )
    # two files → with maxFilesPerTrigger=1, two micro-batches
    t.repartition(2).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(
            "symbol string, price double, volume long, timestamp timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = stream_running_vwap(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("vwap_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("vwap_stream")
    # multiple batches → more than one update row per symbol
    assert got.count() > got.select("symbol").distinct().count()
    # the last update per symbol must equal the batch VWAP over all data
    from pyspark.sql.window import Window

    w = Window.partitionBy("symbol").orderBy(F.col("cum_volume").desc())
    final = (
        got.withColumn("rn", F.row_number().over(w)).filter("rn = 1").drop("rn")
    )
    expected = t.groupBy("symbol").agg(
        F.round(
            (F.sum(F.col("price") * F.col("volume")) / F.sum("volume")), 6
        ).alias("vwap_batch"),
        F.sum("volume").alias("vol_batch"),
    )
    joined = final.join(expected, "symbol")
    mismatch = joined.filter(
        (F.abs(F.col("vwap") - F.col("vwap_batch")) > 1e-6)
        | (F.col("cum_volume") != F.col("vol_batch"))
    )
    assert mismatch.count() == 0


def test_silence_monitor_times_out_quiet_keys(spark, tmp_path):
    """Symbol B stops sending; once A's later events push the watermark past
    B's last_seen + gap, B's state times out and emits a terminal 'stale'."""
    import datetime

    from stock_market_data_pipeline_spark.streaming.stateful import (
        stream_silence_monitor,
    )

    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)

    def rows(*specs):
        return [
            (s, 1.0, 1, t0 + datetime.timedelta(minutes=m)) for s, m in specs
        ]

    src = str(tmp_path / "silence_src")
    schema = "symbol string, price double, volume long, timestamp timestamp"
    # batch 1: both symbols alive
    spark.createDataFrame(rows(("A", 0), ("B", 0)), schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(src)
    # batch 2: only A, 30 min later — watermark sweeps past B's 10-min gap
    spark.createDataFrame(rows(("A", 30)), schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        stream_silence_monitor(stream, gap_seconds=600)
        .writeStream.format("memory")
        .queryName("silence")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = [
        (r["symbol"], r["status"], r["last_seen"])
        for r in spark.table("silence").collect()
    ]
    assert ("B", "stale", t0) in out, out
    assert ("A", "stale", t0) not in out
    # A stayed active through both batches
    assert sum(1 for s, st, _ in out if s == "A" and st == "active") >= 1
