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


def test_merge_upsert_scheme_qualified_uri(spark, tmp_path):
    # The flat merge routes ALL filesystem traffic through Hadoop's
    # FileSystem API — an explicit file:// URI (which os.path/shutil would
    # mangle) must behave identically to a bare local path. This is the
    # portability contract: the same code path serves hdfs:// and s3a://.
    path = f"file://{tmp_path}/merged_uri"
    b1 = spark.createDataFrame(
        [("AAPL", "2024-01-01", 100.0, 1)],
        ["symbol", "date", "close", "version"],
    )
    merge_upsert(spark, b1, path, keys=["symbol", "date"], order_col="version")
    b2 = spark.createDataFrame(
        [("AAPL", "2024-01-01", 111.0, 2), ("NVDA", "2024-01-01", 800.0, 2)],
        ["symbol", "date", "close", "version"],
    )
    merge_upsert(spark, b2, path, keys=["symbol", "date"], order_col="version")
    got = {(r.symbol, r.close) for r in spark.read.parquet(path).collect()}
    assert got == {("AAPL", 111.0), ("NVDA", 800.0)}
    # no leftover staging/old dirs after the swap
    import os

    leftovers = [
        n
        for n in os.listdir(tmp_path)
        if n.startswith("merged_uri__")
    ]
    assert leftovers == []


def test_merge_upsert_bucketed_scheme_qualified_uri(spark, tmp_path):
    from stock_market_data_pipeline_spark.sinks.lake import merge_upsert_bucketed

    path = f"file://{tmp_path}/bucketed_uri"
    b1 = spark.createDataFrame(
        [(1, "a", 1), (2, "b", 1)], ["k", "v", "version"]
    )
    merge_upsert_bucketed(spark, b1, path, keys=["k"], order_col="version", n_buckets=4)
    b2 = spark.createDataFrame([(1, "a2", 2)], ["k", "v", "version"])
    merge_upsert_bucketed(spark, b2, path, keys=["k"], order_col="version", n_buckets=4)
    got = {(r.k, r.v) for r in spark.read.parquet(path).collect()}
    assert got == {(1, "a2"), (2, "b")}


def _files_with_mtime(root):
    import os

    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(dirpath, f)
                out[os.path.relpath(p, root)] = os.path.getmtime(p)
    return out


def test_bucketed_merge_rewrites_strict_subset(spark, tmp_path):
    from pyspark.sql import functions as F

    from stock_market_data_pipeline_spark.sinks.lake import (
        BUCKET_COL,
        merge_upsert,
        merge_upsert_bucketed,
    )

    path = str(tmp_path / "bucketed")
    base = spark.range(1000).select(
        F.col("id").alias("k"),
        (F.col("id") * 1.0).alias("v"),
        F.lit(0).alias("version"),
    )
    touched0 = merge_upsert_bucketed(
        spark, base, path, keys=["k"], order_col="version", n_buckets=16
    )
    assert len(touched0) == 16  # 1000 keys cover all buckets
    before = _files_with_mtime(path)

    # a 3-key micro-batch: strict subset of buckets rewritten
    import time

    time.sleep(1.1)  # mtime resolution guard
    small = spark.createDataFrame(
        [(7, -7.0, 1), (8, -8.0, 1), (9, -9.0, 1)], "k long, v double, version int"
    )
    touched = merge_upsert_bucketed(
        spark, small, path, keys=["k"], order_col="version", n_buckets=16
    )
    assert 1 <= len(touched) <= 3 < 16
    after = _files_with_mtime(path)

    changed = {
        f for f in before if f in after and after[f] != before[f]
    } | (set(before) ^ set(after))
    touched_dirs = {f"{BUCKET_COL}={b}" for b in touched}
    for f in changed:
        assert f.split("/")[0] in touched_dirs, f"untouched file rewritten: {f}"
    untouched_before = {f for f in before if f.split("/")[0] not in touched_dirs}
    assert untouched_before  # the subset really is strict
    for f in untouched_before:
        assert after[f] == before[f]

    # semantics: equal to the flat merge_upsert on the same batches
    flat = str(tmp_path / "flat")
    merge_upsert(spark, base, flat, keys=["k"], order_col="version")
    merge_upsert(spark, small, flat, keys=["k"], order_col="version")
    flat_rows = {
        (r.k): (r.v, r.version) for r in spark.read.parquet(flat).collect()
    }
    bucketed_rows = {
        (r.k): (r.v, r.version)
        for r in spark.read.parquet(path).drop(BUCKET_COL).collect()
    }
    assert bucketed_rows == flat_rows
    assert bucketed_rows[7] == (-7.0, 1) and bucketed_rows[100] == (100.0, 0)


def test_bucketed_merge_spec_mismatch_raises(spark, tmp_path):
    import pytest
    from pyspark.sql import functions as F

    from stock_market_data_pipeline_spark.sinks.lake import merge_upsert_bucketed

    path = str(tmp_path / "spec")
    df = spark.range(10).select(
        F.col("id").alias("k"), F.lit(1.0).alias("v"), F.lit(0).alias("version")
    )
    merge_upsert_bucketed(spark, df, path, keys=["k"], order_col="version", n_buckets=8)
    with pytest.raises(ValueError, match="bucketed with"):
        merge_upsert_bucketed(
            spark, df, path, keys=["k"], order_col="version", n_buckets=4
        )


def test_bucketed_merge_idempotent(spark, tmp_path):
    from pyspark.sql import functions as F

    from stock_market_data_pipeline_spark.sinks.lake import merge_upsert_bucketed

    path = str(tmp_path / "idem")
    df = spark.range(50).select(
        F.col("id").alias("k"), F.lit(1.0).alias("v"), F.lit(3).alias("version")
    )
    for _ in range(2):
        merge_upsert_bucketed(
            spark, df, path, keys=["k"], order_col="version", n_buckets=8
        )
    got = spark.read.parquet(path)
    assert got.count() == 50
    assert got.filter(F.col("version") != 3).count() == 0


def test_compact_small_files_preserves_data(spark, sf_dir, tmp_path):
    """Many small files in → few right-sized files out, rows identical,
    stats honest; partitioned roots are refused."""
    from stock_market_data_pipeline_spark.sinks.lake import compact_small_files

    src = str(tmp_path / "smalls")
    t = ticks_from_events(spark, sf_dir).select(
        "symbol", "price", "volume", "timestamp", "event_id"
    )
    t.repartition(40).write.mode("overwrite").parquet(src)
    before = t.orderBy("event_id").collect()
    n_files_before = len(
        [f for f in os.listdir(src) if f.endswith(".parquet")]
    )
    assert n_files_before >= 40
    stats = compact_small_files(spark, src, target_file_bytes=10 * 1024 * 1024)
    after_files = [f for f in os.listdir(src) if f.endswith(".parquet")]
    assert stats["files_before"] == n_files_before
    assert stats["files_after"] == len(after_files)
    assert len(after_files) < n_files_before
    after = spark.read.parquet(src).orderBy("event_id").collect()
    assert after == before

    # refuses partitioned roots
    import pytest as _pytest

    part = str(tmp_path / "parted")
    t.limit(100).write.partitionBy("symbol").mode("overwrite").parquet(part)
    with _pytest.raises(ValueError, match="partition subdirectories"):
        compact_small_files(spark, part)


def test_read_jsonl_docs_quarantines_poison_lines(spark, tmp_path):
    """PERMISSIVE JSONL scan: valid docs parse typed, malformed lines land in
    the quarantine frame with the raw line preserved — nothing is dropped."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from stock_market_data_pipeline_spark.sources.batch import read_jsonl_docs

    p = tmp_path / "corpus.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "alpha beta"}\n'
        '{"doc_id": 2, "text": "gamma"}\n'
        "{truncated json no close\n"
        '{"doc_id": "not_a_number", "text": 3}\n'
        "   \n"
        '{"doc_id": 4, "text": "delta"}\n'
    )
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("text", StringType())]
    )
    clean, quarantined = read_jsonl_docs(spark, str(p), schema)
    good = {r["doc_id"] for r in clean.collect()}
    assert {1, 2, 4} <= good
    bad = [r["raw_line"] for r in quarantined.collect()]
    assert any("truncated" in b for b in bad)
    # blank/whitespace lines (NULL parsed struct) are quarantined, never
    # surfaced as all-null "clean" documents
    assert any(b.strip() == "" for b in bad)
    assert all(r["doc_id"] is not None for r in clean.collect())
    # conservation: every input line is in exactly one frame
    assert clean.count() + quarantined.count() == 6
