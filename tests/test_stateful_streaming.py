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


def test_heavy_hitters_guarantee_and_bounds(spark, tmp_path):
    """Misra-Gries invariants across micro-batches: every item with true
    frequency > n/(k+1) appears in the final summary; per-item bounds
    est <= true <= max hold; state stays O(k)."""
    import time

    from stock_market_data_pipeline_spark.streaming.stateful import (
        stream_heavy_hitters,
    )

    # skewed stream: item h0 dominates, then a zipf-ish tail over 50 items
    def batch_rows(seed, n):
        rows = []
        for i in range(n):
            r = (i * 2654435761 + seed) % 100
            if r < 40:
                item = "h0"
            elif r < 55:
                item = "h1"
            else:
                item = f"t{r % 50}"
            rows.append(("g", item))
        return rows

    src = str(tmp_path / "hh_src")
    spark.createDataFrame(batch_rows(1, 600), "group string, item string") \
        .coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    spark.createDataFrame(batch_rows(2, 600), "group string, item string") \
        .coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("group string, item string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    k = 8
    out = stream_heavy_hitters(stream, k=k)
    q = (
        out.writeStream.format("memory")
        .queryName("hh_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("hh_stream")
    final_n = got.agg(F.max("n_seen")).first()[0]
    assert final_n == 1200  # both batches folded in
    final = {r["item"]: r for r in got.filter(F.col("n_seen") == final_n).collect()}
    assert len(final) <= k  # state bounded

    exact = {
        r["item"]: r["cnt"]
        for r in spark.createDataFrame(
            batch_rows(1, 600) + batch_rows(2, 600), "group string, item string"
        ).groupBy("item").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    # guarantee: true freq > n/(k+1) -> present
    for item, cnt in exact.items():
        if cnt > final_n / (k + 1):
            assert item in final, (item, cnt)
    # bounds: est <= true <= max
    for item, row in final.items():
        assert row["est_count"] <= exact[item] <= row["max_count"], item
    # the dominant item is ranked by estimate
    assert max(final.values(), key=lambda r: r["est_count"])["item"] == "h0"
