"""Coverage for operators without oracle queries: quality counts, CSV lake
roundtrip, orchestration utils, external source adapter, as-of join, synthetic
ticks, kafka builders."""

from __future__ import annotations

import threading
import time

from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.operators.clean import quality_counts
from stock_market_data_pipeline_spark.operators.joins import as_of_join
from stock_market_data_pipeline_spark.operators.orchestration import (
    describe_lake,
    wait_for_path,
)
from stock_market_data_pipeline_spark.schemas import CLEAN_TICK_SCHEMA
from stock_market_data_pipeline_spark.sinks.lake import write_partitioned
from stock_market_data_pipeline_spark.sources.batch import read_csv_lake
from stock_market_data_pipeline_spark.sources.external import (
    fetch_ohlcv_history,
    kafka_sink_writer,
)
from stock_market_data_pipeline_spark.sources.ticks import (
    synthetic_ticks,
    ticks_from_events,
)


def test_quality_counts_single_pass(spark, sf_dir):
    t = ticks_from_events(spark, sf_dir)
    qc = quality_counts(t, price_col="price", ts_col="timestamp")
    assert qc["total"] == t.count()
    assert qc["nonpositive_price"] == t.filter(F.col("price") <= 0).count()
    assert qc["future_ts"] == 0  # lake is historical


def test_csv_lake_roundtrip(spark, sf_dir, tmp_path):
    t = ticks_from_events(spark, sf_dir).select(
        "symbol", "price", F.lit(None).cast("double").alias("change"),
        F.lit(None).cast("double").alias("change_percent"), "volume", "timestamp",
    )
    out = str(tmp_path / "csv_lake")
    write_partitioned(t, out, ["symbol"], fmt="csv")
    # data files hold the non-partition columns; `symbol` returns as the
    # Hive partition column discovered from the directory names
    from pyspark.sql.types import StructType

    file_schema = StructType([f for f in CLEAN_TICK_SCHEMA.fields if f.name != "symbol"])
    back = read_csv_lake(spark, out, file_schema)
    assert back.count() == t.count()
    assert set(back.columns) == set(CLEAN_TICK_SCHEMA.fieldNames())
    assert back.groupBy("symbol").count().count() == 5


def test_wait_for_path_and_describe(spark, sf_dir, tmp_path):
    target = tmp_path / "lake" / "symbol=A"
    assert wait_for_path(str(tmp_path / "lake"), timeout_s=0.2, poll_s=0.05) is False

    def create():
        time.sleep(0.2)
        target.mkdir(parents=True)
        (target / "part-0.parquet").write_bytes(b"")
        ticks_from_events(spark, sf_dir).limit(5).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(target))

    th = threading.Thread(target=create)
    th.start()
    ok = wait_for_path(str(tmp_path / "lake"), min_files=1, timeout_s=10, poll_s=0.1)
    th.join()
    assert ok
    summary = describe_lake(spark, str(tmp_path / "lake"))
    assert summary["n_rows"] == 5 and summary["n_files"] >= 1
    assert any("symbol=" in p for p in summary["partitions"])


def test_fetch_ohlcv_history_contract(spark):
    df = fetch_ohlcv_history(spark, ["AAPL", "MSFT"], batch_id="20240101000000")
    assert df.count() == 60
    assert df.schema["volume"].dataType.typeName() == "long"
    invariant = df.filter(
        (F.col("low") > F.col("open")) | (F.col("low") > F.col("close"))
        | (F.col("high") < F.col("open")) | (F.col("high") < F.col("close"))
    )
    assert invariant.count() == 0
    assert df.select("batch_id").distinct().first()[0] == "20240101000000"


def test_kafka_sink_writer_builds(spark):
    df = spark.createDataFrame([("AAPL", 1.0)], ["symbol", "price"])
    writer = kafka_sink_writer(df, "broker:9092", "ticks")
    # no broker in container: assert construction, not delivery
    assert writer is not None


def test_as_of_join_basic(spark):
    trades = spark.createDataFrame(
        [("A", 10, 100.0), ("A", 20, 101.0), ("B", 15, 50.0)],
        ["sym", "t", "px"],
    ).select("sym", F.timestamp_seconds("t").alias("t"), "px")
    quotes = spark.createDataFrame(
        [("A", 9, 99.5), ("A", 18, 100.5), ("B", 100, 49.0)],
        ["sym", "qt", "bid"],
    ).select("sym", F.timestamp_seconds("qt").alias("qt"), "bid")
    out = as_of_join(trades, quotes, key="sym", left_ts="t", right_ts="qt")
    got = {(r.sym, r.t.second if hasattr(r.t, "second") else r.t, r.bid) for r in out.collect()}
    bids = {(r.sym, r.px): r.bid for r in out.collect()}
    assert bids[("A", 100.0)] == 99.5   # latest quote at/before t=10
    assert bids[("A", 101.0)] == 100.5  # t=20 sees quote at 18
    assert bids[("B", 50.0)] is None    # no quote before t=15


def test_salted_two_phase_aggregation(spark, sf_dir):
    """Skew mitigation: salted partial aggregation → unsalted final must
    equal the direct single-phase aggregation (the hot-key recipe)."""
    from stock_market_data_pipeline_spark.operators.windows import salt_column

    t = ticks_from_events(spark, sf_dir)
    direct = t.groupBy("symbol").agg(
        F.sum("volume").alias("vol"), F.count(F.lit(1)).alias("n")
    )
    salted = (
        t.withColumn("_salt", salt_column(F.col("event_id"), 8))
        .groupBy("symbol", "_salt")
        .agg(F.sum("volume").alias("pvol"), F.count(F.lit(1)).alias("pn"))
        .groupBy("symbol")
        .agg(F.sum("pvol").alias("vol"), F.sum("pn").alias("n"))
    )
    assert sorted(map(tuple, direct.collect())) == sorted(map(tuple, salted.collect()))


def test_synthetic_ticks_deterministic(spark):
    a = synthetic_ticks(spark, n_ticks_per_symbol=50).collect()
    b = synthetic_ticks(spark, n_ticks_per_symbol=50).collect()
    def ordered(rows):
        return [tuple(r) for r in sorted(rows, key=lambda r: (r.symbol, r.timestamp))]

    assert ordered(a) == ordered(b)
    assert len(a) == 8 * 50
    prices = [r.price for r in a]
    assert all(p > 0 for p in prices)


def test_vectorized_topk_query_size_guard(spark):
    """cosine_topk_vectorized collects the query set into each task closure;
    an oversize query set must fail loudly, not OOM executors silently."""
    import pytest

    from stock_market_data_pipeline_spark.operators.similarity import (
        cosine_topk_vectorized,
    )

    corpus = spark.range(10).select(
        F.col("id").alias("vec_id"),
        F.array(F.rand(seed=1), F.rand(seed=2)).alias("embedding"),
    )
    big_q = spark.range(50).select(
        F.col("id").alias("vec_id"),
        F.array(F.rand(seed=3), F.rand(seed=4)).alias("embedding"),
    )
    with pytest.raises(ValueError, match="query set"):
        cosine_topk_vectorized(corpus, big_q, k=3, _max_queries=10)


def test_approx_stats_error_bounds(spark):
    """approx_stats now IS its own error-envelope check (the r5 oracle-gap
    fix): the query emits exact aggregates plus 0/1 flags asserting each
    sketch estimate landed inside its documented envelope, and the oracle
    pins the flags at literal 1.

    Runs at sf0.01 and sf0.1 — sketch error is scale-dependent, and the
    sf0.01 gate alone can pass by luck on bounds the 10x data would break.
    """
    import duckdb

    from stock_market_data_pipeline_spark.plans.relational import approx_stats

    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        got = {r["l_returnflag"]: r for r in approx_stats(spark, sf_dir).collect()}
        con = duckdb.connect()
        exact = con.execute(
            f"""
            SELECT l_returnflag,
                   count(DISTINCT l_partkey)  AS parts,
                   count(DISTINCT l_orderkey) AS orders,
                   count(*) AS n
            FROM read_parquet('{sf_dir}/lineitem.parquet')
            GROUP BY l_returnflag
            """
        ).fetchall()
        con.close()
        assert len(exact) == len(got)
        for flag, parts, orders, n in exact:
            row = got[flag]
            assert row["exact_parts"] == parts, (sf_dir, flag, row)
            assert row["exact_orders"] == orders, (sf_dir, flag, row)
            assert row["line_count"] == n
            for c in (
                "parts_est_in_envelope",
                "orders_est_in_envelope",
                "median_est_in_envelope",
            ):
                assert row[c] == 1, (sf_dir, flag, c, row)


def test_cli_runner_writes_and_reports(spark, sf_dir, tmp_path, capsys):
    """The job entrypoint runs queries by name, writes the requested format,
    emits one JSON line per query, and isolates per-query failures."""
    import json as _json

    from stock_market_data_pipeline_spark.run import main

    out = str(tmp_path / "jobs")
    rc = main(
        ["--query", "daily_vwap", "--query", "order_priority_counts",
         "--sf-dir", sf_dir, "--out", out, "--cpus", "4"]
    )
    lines = [
        _json.loads(ln)
        for ln in capsys.readouterr().out.strip().splitlines()
        if ln.startswith("{")
    ]
    assert rc == 0
    by_name = {r["query"]: r for r in lines}
    assert by_name["daily_vwap"]["rows"] > 0
    written = spark.read.parquet(by_name["daily_vwap"]["out"])
    assert written.count() == by_name["daily_vwap"]["rows"]

    # unknown query → argparse error (SystemExit), not a stack trace
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        main(["--query", "no_such_query", "--sf-dir", sf_dir])


def test_semantic_dedup_kernels_agree(spark, sf_dir):
    """The Arrow (matmul/Gram) and expr (codegen fold) kernels of
    semantic_dedup must produce identical assignments and removals on the
    lake — the vectorized scale path may not drift from the oracle-shaped
    DataFrame form."""
    from stock_market_data_pipeline_spark.operators.similarity import (
        semantic_dedup,
    )
    from stock_market_data_pipeline_spark.sources.batch import read_table

    emb = read_table(spark, sf_dir, "embeddings")
    arrow = semantic_dedup(emb, n_cells=32, tau=0.35, kernel="arrow")
    expr = semantic_dedup(emb, n_cells=32, tau=0.35, kernel="expr")
    assert arrow.exceptAll(expr).count() == 0
    assert expr.exceptAll(arrow).count() == 0
    assert arrow.filter("removed = 1").count() > 0  # non-trivial at sf0.01
