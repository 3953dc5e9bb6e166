"""Streaming tests: incremental execution must reproduce batch results
(the engine's core design claim — shared transform library), plus native
watermarked streaming aggregation and the synthetic rate source plan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.plans.analytics import windowed_analytics
from stock_market_data_pipeline_spark.schemas import CLEAN_TICK_SCHEMA
from stock_market_data_pipeline_spark.sources.ticks import ticks_from_events
from stock_market_data_pipeline_spark.streaming.pipeline import (
    stream_sliding_metrics,
    stream_stream_interval_join,
    stream_windowed_analytics,
)
from stock_market_data_pipeline_spark.streaming.sources import file_stream, rate_ticks


def _tick_files(spark, sf_dir, tmp_path, n_files=3):
    src = str(tmp_path / "stream_src")
    t = ticks_from_events(spark, sf_dir).select(
        "symbol", "price", "volume", "timestamp"
    )
    t.repartition(n_files).write.mode("overwrite").parquet(src)
    return src, t


def test_foreachbatch_pipeline_matches_batch(spark, sf_dir, tmp_path):
    src, ticks = _tick_files(spark, sf_dir, tmp_path, n_files=1)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stream = spark.readStream.schema(
        "symbol string, price double, volume long, timestamp timestamp"
    ).parquet(src)
    q = stream_windowed_analytics(
        stream, out, ckpt, trigger={"availableNow": True}
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out).drop("batch_id", "symbol")
    expected = windowed_analytics(ticks).drop("symbol")
    # single micro-batch (one file) → incremental result == batch result
    assert got.count() == expected.count()
    assert got.exceptAll(expected).count() == 0


def test_streaming_restart_is_idempotent(spark, sf_dir, tmp_path):
    """Restarting from the checkpoint with no new data must not duplicate."""
    src, _ = _tick_files(spark, sf_dir, tmp_path, n_files=1)
    out = str(tmp_path / "out2")
    ckpt = str(tmp_path / "ckpt2")
    stream = spark.readStream.schema(
        "symbol string, price double, volume long, timestamp timestamp"
    ).parquet(src)
    q = stream_windowed_analytics(stream, out, ckpt, trigger={"availableNow": True})
    q.awaitTermination(120)
    n1 = spark.read.parquet(out).count()
    q2 = stream_windowed_analytics(stream, out, ckpt, trigger={"availableNow": True})
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == n1


def test_streaming_crash_after_write_recovers_exactly_once(spark, sf_dir, tmp_path):
    """Kill the stream in the WORST window — after a micro-batch's sink write
    but before its checkpoint commit — then restart from the checkpoint and
    require exactly-once table contents.

    4 source files × maxFilesPerTrigger=1 → 4 micro-batches. The injected
    crash fires after batch 1's parquet write; on restart the checkpoint
    replays batch 1 (foreachBatch is at-least-once), and the idempotent
    per-batch dynamic-overwrite write must collapse the replay instead of
    appending a duplicate. Final output must equal the batch plan applied to
    each micro-batch's file set — no missing batch, no doubled batch."""
    schema = "symbol string, price double, volume long, timestamp timestamp"
    src, _ = _tick_files(spark, sf_dir, tmp_path, n_files=4)
    out = str(tmp_path / "out_crash")
    ckpt = str(tmp_path / "ckpt_crash")

    crashed = []

    def boom(batch_id):
        if batch_id == 1 and not crashed:
            crashed.append(batch_id)
            raise RuntimeError("injected crash: post-write, pre-commit")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_windowed_analytics(
        stream, out, ckpt, trigger={"availableNow": True}, post_write_hook=boom
    )
    try:
        q.awaitTermination(180)
    except Exception:
        pass
    assert crashed == [1]
    # batch 1's output is on disk although its commit never happened — the
    # duplication hazard is real, not hypothetical
    n_after_crash = spark.read.parquet(out).filter("batch_id = 1").count()
    assert n_after_crash > 0

    replayed = []
    stream2 = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q2 = stream_windowed_analytics(
        stream2,
        out,
        ckpt,
        trigger={"availableNow": True},
        batch_hook=lambda _df, bid: replayed.append(bid),
    )
    q2.awaitTermination(180)
    assert 1 in replayed  # the uncommitted batch really was reprocessed

    got = spark.read.parquet(out)
    # exactly-once: each micro-batch appears exactly once, and its content is
    # the batch plan over that batch's file (same shared transform)
    assert sorted(
        r["batch_id"] for r in got.select("batch_id").distinct().collect()
    ) == [0, 1, 2, 3]
    import glob

    expected_total = 0
    per_file_results = []
    for f in sorted(glob.glob(f"{src}/part-*.parquet")):
        r = windowed_analytics(spark.read.parquet(f))
        per_file_results.append(r)
        expected_total += r.count()
    assert got.count() == expected_total
    expected_union = per_file_results[0]
    for r in per_file_results[1:]:
        expected_union = expected_union.unionByName(r)
    diff = got.drop("batch_id", "symbol").exceptAll(expected_union.drop("symbol"))
    assert diff.count() == 0


def test_native_streaming_agg_with_watermark(spark, sf_dir, tmp_path):
    src, ticks = _tick_files(spark, sf_dir, tmp_path, n_files=1)
    stream = spark.readStream.schema(
        "symbol string, price double, volume long, timestamp timestamp"
    ).parquet(src)
    agg = stream_sliding_metrics(stream)
    q = (
        agg.writeStream.format("memory")
        .queryName("native_agg")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("native_agg")
    # append mode emits only watermark-finalized windows; with a single batch
    # the final watermark is max(ts) - 5min, so late windows are withheld —
    # everything emitted must be a subset of the batch aggregation.
    batch = (
        ticks.groupBy("symbol", F.window("timestamp", "15 minutes", "5 minutes"))
        .agg(F.avg("price").alias("ma"))
        .select("symbol", F.col("window.start").alias("window_start"))
    )
    assert got.count() <= batch.count()
    extra = got.select("symbol", "window_start").exceptAll(batch)
    assert extra.count() == 0


def test_rate_ticks_produces_valid_ticks(spark):
    """Run the synthetic tick stream for a few seconds; generated ticks must
    respect the generator envelope (positive prices around seed, volume in
    [1000, 100000], all 8 symbols eventually)."""
    import time

    df = rate_ticks(spark, rows_per_second=200)
    q = (
        df.writeStream.format("memory")
        .queryName("rate_ticks_live")
        .outputMode("append")
        .start()
    )
    try:
        deadline = time.time() + 30
        while time.time() < deadline:
            if spark.table("rate_ticks_live").count() >= 100:
                break
            time.sleep(0.5)
        got = spark.table("rate_ticks_live")
        n = got.count()
        assert n >= 100
        bad = got.filter(
            (F.col("price") <= 0)
            | (F.col("volume") < 1000)
            | (F.col("volume") > 100000)
        )
        assert bad.count() == 0
        assert got.select("symbol").distinct().count() == 8
    finally:
        q.stop()


def test_rate_ticks_plan_shape(spark):
    df = rate_ticks(spark)
    assert df.isStreaming
    assert [f.name for f in df.schema.fields] == [
        "symbol",
        "price",
        "change",
        "change_percent",
        "volume",
        "timestamp",
    ]


def test_stream_stream_interval_join(spark, sf_dir, tmp_path):
    """Raw×raw stream-stream join with watermarks + interval condition must
    start (the aggregated variant the reference wrote is rejected) and match
    the equivalent batch interval join."""
    src = str(tmp_path / "ssj_src")
    t = ticks_from_events(spark, sf_dir).select(
        "symbol", "price", "volume", "timestamp"
    )
    t.coalesce(1).write.mode("overwrite").parquet(src)
    schema = "symbol string, price double, volume long, timestamp timestamp"
    left = spark.readStream.schema(schema).parquet(src)
    right = (
        spark.readStream.schema(schema)
        .parquet(src)
        .selectExpr(
            "symbol", "price as quote_price", "timestamp as quote_ts"
        )
    )
    joined = stream_stream_interval_join(left, right)
    q = (
        joined.writeStream.format("memory")
        .queryName("ssj")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = spark.table("ssj").count()
    rbatch = t.selectExpr("symbol", "price as quote_price", "timestamp as quote_ts")
    expected = (
        t.join(rbatch, "symbol")
        .filter(
            (F.col("quote_ts") <= F.col("timestamp"))
            & (F.col("quote_ts") >= F.col("timestamp") - F.expr("INTERVAL 15 minutes"))
        )
        .count()
    )
    # single availableNow batch: watermark starts at epoch → no rows dropped
    assert got == expected and got > 0


def test_stream_static_dimension_join(spark, sf_dir, tmp_path):
    """Stream-static join (extension beyond the reference): enrich streaming
    ticks with a static symbol dimension; Catalyst broadcasts the static side
    into every micro-batch."""
    src, ticks = _tick_files(spark, sf_dir, tmp_path, n_files=1)
    dim = spark.createDataFrame(
        [(s, f"sector_{i % 3}") for i, s in enumerate(["click", "view", "purchase", "signup", "error"])],
        ["symbol", "sector"],
    )
    stream = spark.readStream.schema(
        "symbol string, price double, volume long, timestamp timestamp"
    ).parquet(src)
    enriched = stream.join(F.broadcast(dim), "symbol")
    q = (
        enriched.writeStream.format("memory")
        .queryName("enriched_ticks")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("enriched_ticks")
    assert got.count() == ticks.count()  # every symbol has a dimension row
    assert got.filter(F.col("sector").isNull()).count() == 0


def test_file_stream_csv_schema(spark, tmp_path):
    df = file_stream(spark, str(tmp_path), CLEAN_TICK_SCHEMA, fmt="csv")
    # file sources force nullable=True; compare names and types
    assert df.isStreaming
    assert [(f.name, f.dataType) for f in df.schema.fields] == [
        (f.name, f.dataType) for f in CLEAN_TICK_SCHEMA.fields
    ]


def test_stream_dedup_within_watermark(spark, sf_dir, tmp_path):
    """Duplicated deliveries (same symbol+timestamp) across micro-batches
    collapse to one row per key; state is watermark-bounded."""
    from stock_market_data_pipeline_spark.streaming.pipeline import stream_dedup_keyed

    src = str(tmp_path / "dup_src")
    ticks = ticks_from_events(spark, sf_dir).select(
        "symbol", "price", "volume", "timestamp"
    ).limit(500)
    # Write the same rows twice into separate files — a redelivery scenario.
    ticks.coalesce(1).write.mode("overwrite").parquet(src)
    ticks.coalesce(1).write.mode("append").parquet(src)
    assert spark.read.parquet(src).count() == 1000

    stream = spark.readStream.schema(
        "symbol string, price double, volume long, timestamp timestamp"
    ).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        stream_dedup_keyed(stream)
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("dedup_stream")
    assert got.count() == ticks.dropDuplicates(["symbol", "timestamp"]).count()
    assert got.groupBy("symbol", "timestamp").count().filter("count > 1").count() == 0


def test_kafka_envelope_contract_without_broker(spark):
    """S4's transform half on simulated wire rows: the exact kafka-source
    output schema (key/value binary, topic/partition/offset/timestamp) with
    the reference producer's JSON payloads — plus a poison-pill row that
    must parse to nulls (flagged, not fatal) and lineage columns for
    exactly-once replay dedup."""
    import datetime
    import json

    from stock_market_data_pipeline_spark.streaming.sources import (
        parse_kafka_envelope,
    )

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def wire(key, payload, partition, offset):
        val = payload if isinstance(payload, (bytes, bytearray)) else json.dumps(
            payload
        ).encode()
        return (bytearray(key.encode()), bytearray(val), "stock_ticks", partition, offset, t0)

    rows = [
        wire("AAPL", {"symbol": "AAPL", "price": 150.25, "change": 1.5,
                      "change_percent": "1.01%", "volume": "55000",
                      "timestamp": "2024-01-01T12:00:00.000001"}, 0, 7),
        wire("MSFT", {"symbol": "MSFT", "price": 380.0, "change": None,
                      "change_percent": "-0.20%", "volume": "9000",
                      "timestamp": "2024-01-01T12:00:00.000002"}, 1, 3),
        wire("JUNK", b"\x00not json at all", 0, 8),
    ]
    raw = spark.createDataFrame(
        rows,
        "key binary, value binary, topic string, partition int, "
        "offset long, timestamp timestamp",
    )
    got = {r["offset"]: r for r in parse_kafka_envelope(raw).collect()}
    a = got[7]
    assert a["symbol"] == "AAPL" and a["price"] == 150.25
    assert a["key_symbol"] == "AAPL" and a["topic"] == "stock_ticks"
    assert a["partition"] == 0 and a["_value_ok"]
    m = got[3]
    assert m["symbol"] == "MSFT" and m["change"] is None and m["_value_ok"]
    junk = got[8]
    assert not junk["_value_ok"] and junk["symbol"] is None  # poison pill survives as nulls
    assert junk["key_symbol"] == "JUNK"  # lineage still identifies the source
    # the full clean path accepts the parsed rows
    from stock_market_data_pipeline_spark.operators.clean import cast_ticks, drop_invalid

    clean = drop_invalid(
        cast_ticks(
            parse_kafka_envelope(raw, keep_lineage=False).drop("_value_ok")
        )
    )
    assert clean.count() == 2  # poison pill dropped by the null gate


def test_stream_session_stats_matches_batch(spark, sf_dir, tmp_path):
    """Streaming sessionization (native session_window + watermark) must
    agree with the batch lag/cumsum formulation (VERDICT r3 #7).

    Two pins: (1) the session_window grouping applied to the SAME data as a
    batch plan reproduces operators.events.session_stats exactly (gap
    boundary semantics — exclusive window end == the batch ``gap >= 30min``
    new-session rule); (2) the streaming run over multiple micro-batches
    (maxFilesPerTrigger=1 forces state merging across batches) emits only
    watermark-finalized sessions, every one of which appears in the batch
    answer."""
    from stock_market_data_pipeline_spark.operators.events import session_stats
    from stock_market_data_pipeline_spark.streaming.pipeline import (
        stream_session_stats,
    )

    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "ts", "value")
    )
    def norm(df):
        # cast session bounds to one flavor (LTZ): the streaming operator
        # normalizes NTZ→LTZ for the watermark, the batch one preserves NTZ
        return df.select(
            "user_id",
            F.col("session_start").cast("timestamp").alias("session_start"),
            F.col("session_end").cast("timestamp").alias("session_end"),
            "duration_sec",
            "n_events",
            F.round("value_sum", 6).alias("value_sum"),
        )

    batch_expected = norm(
        session_stats(ev, key="user_id", ts="ts", value="value")
        .drop("session_id")
    )

    # (1) same operator, batch execution path: exact equality
    batch_via_session_window = norm(stream_session_stats(ev))
    assert batch_via_session_window.exceptAll(batch_expected).count() == 0
    assert batch_expected.exceptAll(batch_via_session_window).count() == 0

    # (2) true streaming execution, three micro-batches arriving in
    # event-time order (the file source processes files oldest-mtime-first;
    # time-range files written sequentially get increasing mtimes). In-order
    # arrival means the watermark never drops data, so every emitted session
    # must match the batch answer and every session finalized by the last
    # watermark must be emitted — state merges correctly across batches.
    import time as _time
    from datetime import timedelta

    from pyspark.sql.window import Window as W

    src = str(tmp_path / "ev_stream_src")
    evn = ev.withColumn("part", F.ntile(3).over(W.orderBy("ts")))
    for i in (1, 2, 3):
        evn.filter(F.col("part") == i).drop("part").repartition(1).write.mode(
            "append"
        ).parquet(src)
        _time.sleep(1.1)  # distinct mtimes → deterministic batch order
    stream = (
        spark.readStream.schema("user_id long, ts timestamp_ntz, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream_session_stats(stream)
        .writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = norm(spark.table("sess_stream"))
    assert got.count() > 0
    # soundness: nothing emitted that the batch answer doesn't have
    assert got.exceptAll(batch_expected).count() == 0
    # completeness: every session finalized by the last watermark
    # (end + gap < max_ts - watermark_delay, 1 min slack) was emitted
    hi = ev.agg(F.max(F.col("ts").cast("timestamp"))).first()[0]
    must_emit = batch_expected.filter(
        F.col("session_end") < F.lit(hi - timedelta(minutes=61))
    )
    assert must_emit.count() > 0
    assert must_emit.exceptAll(got).count() == 0
