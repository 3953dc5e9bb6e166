"""Lake sink tests: partitioned writes, partition-pruned reads, MERGE upsert."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.sinks.lake import (
    merge_upsert,
    with_date_partitions,
    write_partitioned,
)
from stock_market_data_pipeline_spark.sources.batch import read_parquet_lake
from stock_market_data_pipeline_spark.sources.ticks import ticks_from_events


def test_partitioned_write_roundtrip(spark, sf_dir, tmp_path):
    t = ticks_from_events(spark, sf_dir)
    out = str(tmp_path / "lake")
    write_partitioned(t, out, ["symbol"])
    back = read_parquet_lake(spark, out)
    assert back.count() == t.count()
    # Hive layout: one dir per symbol
    dirs = {d for d in os.listdir(out) if d.startswith("symbol=")}
    assert len(dirs) == t.select("symbol").distinct().count()


def test_partition_pruning_in_plan(spark, sf_dir, tmp_path):
    t = with_date_partitions(ticks_from_events(spark, sf_dir))
    out = str(tmp_path / "dated")
    write_partitioned(t, out, ["year", "month", "day"])
    pruned = read_parquet_lake(spark, out, where=F.col("day") == 3)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "day" in plan
    expected = t.filter(F.col("day") == 3).count()
    assert pruned.count() == expected


def test_merge_upsert_last_writer_wins(spark, tmp_path):
    path = str(tmp_path / "merged")
    b1 = spark.createDataFrame(
        [("AAPL", "2024-01-01", 100.0, 1), ("MSFT", "2024-01-01", 200.0, 1)],
        ["symbol", "date", "close", "version"],
    )
    merge_upsert(spark, b1, path, keys=["symbol", "date"], order_col="version")
    b2 = spark.createDataFrame(
        [("AAPL", "2024-01-01", 111.0, 2), ("NVDA", "2024-01-01", 800.0, 2)],
        ["symbol", "date", "close", "version"],
    )
    merge_upsert(spark, b2, path, keys=["symbol", "date"], order_col="version")
    got = {
        (r.symbol, r.close) for r in spark.read.parquet(path).collect()
    }
    assert got == {("AAPL", 111.0), ("MSFT", 200.0), ("NVDA", 800.0)}
    # stale incoming (lower version) must NOT overwrite
    b3 = spark.createDataFrame(
        [("AAPL", "2024-01-01", 90.0, 0)], ["symbol", "date", "close", "version"]
    )
    merge_upsert(spark, b3, path, keys=["symbol", "date"], order_col="version")
    aapl = spark.read.parquet(path).filter(F.col("symbol") == "AAPL").first()
    assert aapl.close == 111.0
