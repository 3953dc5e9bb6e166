"""Round-8 regression tests — pins for the five round-7 ADVICE findings.

Each test encodes the exact failure mode the advisor described, so a
regression reproduces the original symptom rather than a vague assertion.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


def test_line_dedup_oracle_keeps_null_text_docs(spark):
    """ADVICE r7 #1: the DuckDB oracle dropped NULL-text documents
    (string_split(NULL) yields no rows) while the operator keeps them —
    parity held only because the fixtures had no NULL text. Run BOTH
    engines over a corpus WITH a NULL-text doc and compare."""
    from stock_market_data_pipeline_spark.operators.dedup import line_dedup
    from stock_market_data_pipeline_spark.oracles import ORACLES

    rows = [
        (1, "common foot line unique alpha text"),
        (2, "common foot line unique beta words"),
        (3, "common foot line unique gamma stuff"),
        (4, None),
        (5, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "text",
        # same 3-words-per-line chunking the registry query applies
        F.regexp_replace(F.col("text"), r"((?:\S+\s+){2}\S+)\s+", "$1\n"),
    )
    got = {
        r["doc_id"]: (r["text_clean"], r["n_lines"], r["n_removed"])
        for r in line_dedup(docs, min_docs=3).collect()
    }

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM (VALUES "
        "(1, 'common foot line unique alpha text'),"
        "(2, 'common foot line unique beta words'),"
        "(3, 'common foot line unique gamma stuff'),"
        "(4, NULL),"
        "(5, '')) AS t(doc_id, text)"
    )
    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(ORACLES["line_dedup"]).fetchall()
    }
    con.close()
    assert set(got) == {1, 2, 3, 4, 5}
    assert got == want
    assert got[4] == ("", 0, 0)  # NULL text keeps its row in BOTH engines
    # the shared 3-word prefix line is boilerplate in all three docs
    assert got[1][2] == 1 and "common foot line" not in got[1][0]


def test_compact_tombstones_null_op_rows_kept(spark, tmp_path):
    """ADVICE r7 #2: a row whose op is NULL failed both filter(cond) and
    filter(~cond) and vanished from the rewrite of any touched bucket."""
    from stock_market_data_pipeline_spark.sinks.lake import (
        BUCKET_COL,
        compact_cdc_tombstones,
    )

    rows = [
        (1, 10, "upsert", 0),
        (2, 11, "delete", 0),  # tombstone -> bucket 0 is rewritten
        (3, 12, None, 0),      # NULL op in the SAME bucket -> must survive
        (4, 13, "upsert", 1),  # untouched bucket
    ]
    df = spark.createDataFrame(
        rows, f"k long, seq long, op string, {BUCKET_COL} int"
    )
    root = str(tmp_path / "cdc")
    df.write.partitionBy(BUCKET_COL).parquet(root)
    touched = compact_cdc_tombstones(spark, root)
    assert touched == [0]
    left = {r["k"] for r in spark.read.parquet(root).collect()}
    assert left == {1, 3, 4}  # 2 dropped; the NULL-op row 3 KEPT


def test_uri_sensor_without_session_raises(monkeypatch, tmp_path):
    """ADVICE r7 #3: a scheme'd path with no SparkSession silently fell
    back to os.walk (sees nothing on s3a://) and burned the full sensor
    timeout; it must fail loudly instead. Scheme-less local paths keep
    working without a session."""
    from stock_market_data_pipeline_spark.operators import orchestration

    monkeypatch.setattr(
        orchestration.SparkSession, "getActiveSession", lambda: None
    )
    with pytest.raises(RuntimeError, match="scheme"):
        orchestration._data_files("s3a://bucket/drop", spark=None)
    # local path still walks the local disk with no session at all
    p = tmp_path / "drop"
    p.mkdir()
    (p / "part-0000.csv").write_text("x\n1\n")
    assert len(orchestration._data_files(str(p), spark=None)) == 1


def test_ohlcv_partial_intra_batch_tie_deterministic(spark):
    """ADVICE r7 #4: min_by(price, ts) broke ties arbitrarily WITHIN one
    increment; the struct tie rule (lowest open among tied-earliest,
    highest close among tied-latest) must hold at the base aggregation,
    not just across partials."""
    from stock_market_data_pipeline_spark.operators.ohlcv import ohlcv_partial

    rows = [
        ("A", "2026-01-05 09:30:00", 11.0, 10),
        ("A", "2026-01-05 09:30:00", 9.0, 10),   # tied-earliest, lower
        ("A", "2026-01-05 16:00:00", 20.0, 10),
        ("A", "2026-01-05 16:00:00", 30.0, 10),  # tied-latest, higher
    ]
    df = spark.createDataFrame(
        rows, "symbol string, timestamp string, price double, volume long"
    ).withColumn("timestamp", F.col("timestamp").cast("timestamp"))
    # repartition so tied rows meet in different orders across runs; the
    # struct key makes the outcome independent of encounter order
    row = ohlcv_partial(df.repartition(4)).first()
    assert row["daily_open"] == 9.0
    assert row["daily_close"] == 30.0
    assert row["daily_high"] == 30.0 and row["daily_low"] == 9.0


def test_stat_key_kinds_and_ordering():
    """ADVICE r7 #5 helper contract: numerics and ISO dates/timestamps are
    comparable within their kind; Decimals, plain strings and bools are
    excluded; date-vs-timestamp never cross-compares."""
    import datetime as dt
    from decimal import Decimal

    from stock_market_data_pipeline_spark.sinks.lake import _stat_key

    assert _stat_key(3) == ("num", 3.0)
    assert _stat_key(True) is None
    assert _stat_key(Decimal("9")) is None  # '9' > '10' lexicographically
    assert _stat_key("widget") is None
    kd = _stat_key("2020-01-02")
    assert kd == ("date", "2020-01-02") == _stat_key(dt.date(2020, 1, 2))
    assert kd[0] != _stat_key("2020-01-02 00:00:00")[0]  # no cross-kind
    # fraction padding keeps lexicographic == chronological
    t0 = _stat_key("2020-01-02 00:00:00")
    t5 = _stat_key("2020-01-02 00:00:00.5")
    t_dt = _stat_key(dt.datetime(2020, 1, 2, 0, 0, 0, 500000))
    assert t0[1] < t5[1] and t5 == t_dt


def test_pruned_read_engages_on_date_stats(spark, sf_dir, tmp_path):
    """ADVICE r7 #5: date/timestamp stats (serialized via str()) silently
    never pruned — the full scan was paid with no warning. Publish a
    date-clustered version and assert files are ACTUALLY skipped while the
    result still equals the full filtered read."""
    import datetime as dt

    from stock_market_data_pipeline_spark.sinks.lake import (
        publish_version,
        read_versioned,
        read_versioned_pruned,
    )
    from stock_market_data_pipeline_spark.sources.batch import read_table

    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    # range-cluster into 8 files by ship-date so per-file ranges are tight
    root = str(tmp_path / "vt_date")
    publish_version(
        spark,
        li.repartitionByRange(8, "l_shipdate"),
        root,
        stats_cols=["l_shipdate"],
    )
    # the lake column is timestamp_ntz, so stats are timestamp-kind; bounds
    # must be datetimes (a date bound deliberately does NOT cross-compare)
    lo = dt.datetime(1994, 1, 1)
    hi = dt.datetime(1994, 6, 30, 23, 59, 59)
    pruned = read_versioned_pruned(spark, root, "l_shipdate", lo=lo, hi=hi)
    full = read_versioned(spark, root)
    assert len(pruned.inputFiles()) < len(full.inputFiles())
    want = full.filter(
        (F.col("l_shipdate") >= F.lit(lo)) & (F.col("l_shipdate") <= F.lit(hi))
    )
    assert pruned.exceptAll(want).count() == 0
    assert want.exceptAll(pruned).count() == 0
