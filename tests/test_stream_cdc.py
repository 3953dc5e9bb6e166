"""Streaming CDC materialization (stream_apply_changelog): micro-batch
folds into the versioned table equal the one-shot batch apply, deletes
tombstone across batches, replay after a lost checkpoint is idempotent,
and readers only ever resolve complete versions.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.operators.cdc import apply_changelog
from stock_market_data_pipeline_spark.sinks.lake import read_versioned
from stock_market_data_pipeline_spark.streaming.pipeline import (
    stream_apply_changelog,
)

SCHEMA = "k long, seq long, op string, v double"


def _chg(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


B0 = [
    (1, 10, "upsert", 1.0),
    (2, 11, "upsert", 2.0),
    (3, 12, "upsert", 3.0),
]
B1 = [
    (1, 20, "upsert", 10.0),   # update key 1
    (2, 21, "delete", None),   # tombstone key 2
    (4, 22, "upsert", 4.0),    # new key
    (4, 23, "upsert", 4.5),    # in-batch update, greater seq wins
]


def _run(spark, src, root, ckpt):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = stream_apply_changelog(
        stream, root, keys=["k"], seq_col="seq",
        checkpoint_path=ckpt, trigger={"availableNow": True},
    )
    q.awaitTermination(120)


def _state(spark, root):
    return {
        r["k"]: (r["seq"], r["v"])
        for r in read_versioned(spark, root).collect()
    }


def test_stream_fold_matches_batch_apply(spark, tmp_path):
    src, root, ckpt = (str(tmp_path / d) for d in ("src", "table", "ckpt"))
    _chg(spark, B0).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)  # mtime order -> two micro-batches
    _chg(spark, B1).coalesce(1).write.mode("append").parquet(src)
    _run(spark, src, root, ckpt)

    got = _state(spark, root)
    want = {
        r["k"]: (r["seq"], r["v"])
        for r in apply_changelog(
            _chg(spark, B0 + B1), keys=["k"], seq_col="seq"
        ).collect()
    }
    assert got == want == {1: (20, 10.0), 3: (12, 3.0), 4: (23, 4.5)}


def test_replay_after_lost_checkpoint_is_idempotent(spark, tmp_path):
    src, root, ckpt = (str(tmp_path / d) for d in ("src", "table", "ckpt"))
    _chg(spark, B0).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    _chg(spark, B1).coalesce(1).write.mode("append").parquet(src)
    _run(spark, src, root, ckpt)
    first = _state(spark, root)

    # checkpoint wiped -> the whole log replays onto the existing table
    _run(spark, src, root, str(tmp_path / "ckpt2"))
    assert _state(spark, root) == first
    # tombstoned key stays absent through the replay
    assert 2 not in _state(spark, root)


def test_reader_never_sees_partial_state(spark, tmp_path):
    src, root, ckpt = (str(tmp_path / d) for d in ("src", "table", "ckpt"))
    _chg(spark, B0).coalesce(1).write.mode("append").parquet(src)
    _run(spark, src, root, ckpt)
    # after batch 0 the table is a complete committed version
    assert _state(spark, root) == {1: (10, 1.0), 2: (11, 2.0), 3: (12, 3.0)}
    time.sleep(1.1)
    _chg(spark, B1).coalesce(1).write.mode("append").parquet(src)
    _run(spark, src, root, str(tmp_path / "ckpt_b"))
    df = read_versioned(spark, root)
    # one row per surviving key, never a mix of versions
    assert df.groupBy("k").count().filter(F.col("count") > 1).count() == 0
    assert _state(spark, root) == {1: (20, 10.0), 3: (12, 3.0), 4: (23, 4.5)}
