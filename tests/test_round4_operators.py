"""Behavioral invariants for the round-4 operators — properties the oracle
hash can't express: planted-contamination detection, SCD2 interval algebra,
probability-mass closure, attribution conservation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.operators.decontam import (
    ngram_decontaminate,
    ngram_shingles,
)
from stock_market_data_pipeline_spark.operators.events import (
    event_transition_matrix,
    last_touch_attribution,
    scd2_history,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_id", "user_id", "ts", "event_type", "value"
    )


def test_planted_contamination_is_detected(spark, sf_dir):
    """Append a verbatim 8-gram from an eval doc to one train doc: exactly
    that doc must flip to contaminated=true relative to the unplanted run,
    and its collision count must increase by at least one."""
    docs = _docs(spark, sf_dir)
    train = docs.filter(F.col("doc_id") % 20 != 0)
    eval_set = docs.filter(F.col("doc_id") % 20 == 0)
    eval_first8 = (
        F.concat_ws(" ", F.slice(F.split(F.col("text"), " "), 1, 8))
    )
    planted_gram = (
        eval_set.orderBy("doc_id").select(eval_first8.alias("g")).first()["g"]
    )
    assert len(planted_gram.split(" ")) == 8
    victim = train.orderBy("doc_id").first()["doc_id"]
    train_planted = train.withColumn(
        "text",
        F.when(
            F.col("doc_id") == victim,
            F.concat_ws(" ", F.col("text"), F.lit(planted_gram)),
        ).otherwise(F.col("text")),
    )
    base = {
        r["doc_id"]: r
        for r in ngram_decontaminate(train, eval_set).collect()
    }
    planted = {
        r["doc_id"]: r
        for r in ngram_decontaminate(train_planted, eval_set).collect()
    }
    assert planted[victim]["contaminated"] is True
    assert planted[victim]["n_collisions"] >= base[victim]["n_collisions"] + 1
    # nobody else's verdict changed
    for d in base:
        if d != victim:
            assert planted[d]["n_collisions"] == base[d]["n_collisions"]


def test_shingle_count_matches_token_count(spark, sf_dir):
    """Each doc yields exactly max(0, n_tokens - n + 1) shingles (pre-dedup)."""
    docs = _docs(spark, sf_dir)
    n = 8
    got = (
        ngram_shingles(docs, n=n)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shingles"))
    )
    expected = docs.select(
        "doc_id",
        F.greatest(
            F.size(F.split(F.col("text"), " ")) - F.lit(n - 1), F.lit(0)
        ).alias("expected"),
    )
    joined = got.join(expected, "doc_id")
    assert joined.filter(F.col("n_shingles") != F.col("expected")).count() == 0


def test_scd2_intervals_tile_per_key(spark, sf_dir):
    """Per key: intervals are disjoint, contiguous (each effective_to equals
    the next effective_from), exactly one open current row, and the number
    of intervals equals the number of attr changes in the raw stream."""
    ev = _events(spark, sf_dir)
    hist = scd2_history(ev)
    # one current row per key
    cur = hist.filter(F.col("is_current")).groupBy("user_id").count()
    assert cur.filter(F.col("count") != 1).count() == 0
    # contiguity: lead(effective_from) == effective_to for closed rows
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("effective_from")
    chk = hist.withColumn("nxt", F.lead("effective_from").over(w))
    bad = chk.filter(
        (F.col("effective_to").isNotNull())
        & (F.col("effective_to") != F.col("nxt"))
    )
    assert bad.count() == 0
    # interval count == change count from first principles
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.withColumn("prev", F.lag("event_type").over(w2))
        .filter(F.col("prev").isNull() | (F.col("prev") != F.col("event_type")))
        .count()
    )
    assert hist.count() == changes


def test_transition_probabilities_sum_to_one(spark, sf_dir):
    m = event_transition_matrix(_events(spark, sf_dir))
    sums = m.groupBy("from_type").agg(F.sum("p_transition").alias("s"))
    assert sums.filter(F.abs(F.col("s") - 1.0) > 1e-4).count() == 0
    # transition mass == total events minus one first-event per user
    ev = _events(spark, sf_dir)
    total = m.agg(F.sum("n_transitions")).first()[0]
    assert total == ev.count() - ev.select("user_id").distinct().count()


def test_attribution_conserves_conversions(spark, sf_dir):
    """Every purchase is attributed exactly once; the source labels are
    drawn from the non-conversion event types plus 'direct'."""
    ev = _events(spark, sf_dir)
    out = last_touch_attribution(ev).collect()
    n_purchases = ev.filter(F.col("event_type") == "purchase").count()
    assert sum(r["n_conversions"] for r in out) == n_purchases
    allowed = {
        r["event_type"]
        for r in ev.select("event_type").distinct().collect()
        if r["event_type"] != "purchase"
    } | {"direct"}
    assert {r["attributed_source"] for r in out} <= allowed


def test_contamination_gate_matches_batch_and_streams(spark, sf_dir, tmp_path):
    """The stateless mapInPandas gate must agree with the batch broadcast-join
    decontaminate on every doc, and run as-is inside a structured stream."""
    from stock_market_data_pipeline_spark.operators.decontam import (
        collect_eval_shingles,
        contamination_gate,
    )

    docs = _docs(spark, sf_dir)
    train = docs.filter(F.col("doc_id") % 20 != 0)
    eval_set = docs.filter(F.col("doc_id") % 20 == 0)
    ev = collect_eval_shingles(eval_set)
    assert len(ev) > 0

    batch_ref = {
        r["doc_id"]: (r["n_shingles"], r["n_collisions"], r["contaminated"])
        for r in ngram_decontaminate(train, eval_set).collect()
    }
    gate = {
        r["doc_id"]: (r["n_shingles"], r["n_collisions"], r["contaminated"])
        for r in contamination_gate(train, ev).collect()
    }
    assert gate == batch_ref

    # streaming execution: same operator, file stream, availableNow
    src = str(tmp_path / "docs_stream")
    train.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (
        contamination_gate(stream, ev)
        .writeStream.format("memory")
        .queryName("contam_gate")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streamed = {
        r["doc_id"]: (r["n_shingles"], r["n_collisions"], r["contaminated"])
        for r in spark.table("contam_gate").collect()
    }
    assert streamed == batch_ref


def test_collect_eval_shingles_refuses_corpus_sized(spark, sf_dir):
    import pytest as _pytest

    from stock_market_data_pipeline_spark.operators.decontam import (
        collect_eval_shingles,
    )

    docs = _docs(spark, sf_dir)
    with _pytest.raises(ValueError, match="corpus-sized"):
        collect_eval_shingles(docs, max_shingles=10)


def test_winsorize_bounds_and_flags(spark, sf_dir):
    """All winsorized values lie inside the group's [p01, p99]; flags mark
    exactly the rows whose raw value fell outside; unclipped rows pass
    through (up to the deterministic rounding bias)."""
    from stock_market_data_pipeline_spark.operators.normalize import winsorize
    from stock_market_data_pipeline_spark.sources.ticks import ticks_from_events

    t = ticks_from_events(spark, sf_dir).select("symbol", "event_id", "price")
    out = winsorize(t)
    bounds = t.groupBy("symbol").agg(
        F.percentile("price", F.lit(0.01)).alias("lo"),
        F.percentile("price", F.lit(0.99)).alias("hi"),
    )
    j = out.join(bounds, "symbol")
    eps = 1e-6 + 1e-9
    assert (
        j.filter(
            (F.col("price_winsorized") < F.col("lo") - eps)
            | (F.col("price_winsorized") > F.col("hi") + eps)
        ).count()
        == 0
    )
    assert (
        j.filter(
            F.col("was_clipped")
            != ((F.col("price") < F.col("lo")) | (F.col("price") > F.col("hi")))
        ).count()
        == 0
    )
    unclipped_drift = j.filter(
        ~F.col("was_clipped")
        & (F.abs(F.col("price_winsorized") - F.col("price")) > eps)
    )
    assert unclipped_drift.count() == 0


def test_alpha_sample_upweights_small_sources(spark, sf_dir):
    """Deterministic (two runs identical); every group's realized rate is at
    most its cap; smaller sources keep a HIGHER fraction than larger ones
    (the point of alpha<1 temperature mixing)."""
    from stock_market_data_pipeline_spark.operators.sampling import (
        alpha_temperature_sample,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "source"
    )
    s1 = alpha_temperature_sample(docs)
    s2 = alpha_temperature_sample(docs)
    r1 = {r["doc_id"] for r in s1.collect()}
    assert r1 == {r["doc_id"] for r in s2.collect()}

    n_by_src = {r["source"]: r["n"] for r in
                docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    kept_by_src = {r["source"]: r["n"] for r in
                   s1.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    rates = {s: kept_by_src.get(s, 0) / n for s, n in n_by_src.items()}
    # α=0.5: keep-rate ∝ n^-0.5 → the smallest source's rate must beat the
    # largest source's (binomial noise is far smaller than the rate gap when
    # the size gap is meaningful; guard against near-equal sizes)
    smallest = min(n_by_src, key=n_by_src.get)
    largest = max(n_by_src, key=n_by_src.get)
    if n_by_src[largest] >= 2 * n_by_src[smallest]:
        assert rates[smallest] > rates[largest]


def test_division_guards_on_poison_data(spark):
    """The sf0.1 lake taught us: zero prices exist. Every financial ratio
    operator must survive zero prices, zero-volume days, flat (zero-variance)
    markets, and empty funnel stages — degrading to NULL, never throwing
    (ANSI mode turns 0/0 into a job-killing exception at 100 TB)."""
    import datetime

    from stock_market_data_pipeline_spark.operators.events import funnel
    from stock_market_data_pipeline_spark.operators.ohlcv import (
        daily_vwap,
        risk_metrics,
    )
    from stock_market_data_pipeline_spark.operators.rolling import market_beta

    base = datetime.datetime(2024, 1, 1)
    rows = []
    # symbol A: includes a zero price print and a zero-volume day 2
    for d in range(3):
        for i in range(4):
            price = 0.0 if (d == 0 and i == 0) else 100.0 + d + i
            vol = 0 if d == 2 else 10
            rows.append(
                ("A", price, vol, base + datetime.timedelta(days=d, minutes=i))
            )
    # symbol B: perfectly flat prices → zero-variance returns
    for d in range(3):
        for i in range(4):
            rows.append(
                ("B", 50.0, 10, base + datetime.timedelta(days=d, minutes=i))
            )
    ticks = spark.createDataFrame(
        rows, "symbol string, price double, volume long, timestamp timestamp"
    )

    rm = {r["symbol"]: r for r in risk_metrics(ticks).collect()}
    assert rm["A"]["parkinson_vol"] is not None  # zero print excluded, not fatal
    assert rm["B"]["max_drawdown"] == 0.0

    vw = {(r["symbol"], str(r["date"])): r for r in daily_vwap(ticks).collect()}
    assert vw[("A", "2024-01-03")]["vwap"] is None  # zero-volume day → NULL
    assert vw[("A", "2024-01-02")]["vwap"] is not None

    # single flat symbol → market return variance 0 → beta NULL, no throw
    beta_flat = market_beta(ticks.filter(F.col("symbol") == "B")).collect()
    assert beta_flat[0]["beta"] is None

    # funnel whose first stage never occurs → pct NULL, no throw
    ev = spark.createDataFrame(
        [(1, base, "click"), (1, base + datetime.timedelta(minutes=1), "purchase")],
        "user_id long, ts timestamp, event_type string",
    )
    out = funnel(ev, stages=["signup", "click", "purchase"]).collect()
    assert all(r["users_reached"] == 0 or r["pct_of_top"] is None for r in out)
    assert {r["pct_of_top"] for r in out} == {None}
