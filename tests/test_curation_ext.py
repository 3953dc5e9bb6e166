"""Behavioral tests for the round-2 curation extensions: connected-component
clustering, deterministic stratified sampling, embedding near-dup pairs, and
time-series gap-fill."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.operators.gapfill import gapfill_forward_fill
from stock_market_data_pipeline_spark.operators.neardup import connected_components
from stock_market_data_pipeline_spark.operators.sampling import (
    hash_stratified_sample,
)
from stock_market_data_pipeline_spark.operators.similarity import (
    cosine_topk,
    embedding_neardup_pairs,
)
from stock_market_data_pipeline_spark.sources.batch import read_table


def test_connected_components_transitive_chain(spark):
    # Chain 1-2-3 plus pair 10-11: transitivity must put 3 in cluster 1
    # even though (1,3) is not an edge — the failure mode pairwise-only
    # dedup has. Multi-hop also exercises >1 propagation iteration.
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a long, doc_b long"
    )
    got = {
        r["node"]: r["cluster_id"] for r in connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_connected_components_long_chain_converges(spark):
    # 0-1-2-...-9: diameter 9 forces ~9 propagation rounds — the fixpoint
    # loop (not a bounded-unroll) is what's under test.
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(9)], "doc_a long, doc_b long"
    )
    got = {r["node"]: r["cluster_id"] for r in connected_components(pairs).collect()}
    assert got == {i: 0 for i in range(10)}


def test_connected_components_reliable_checkpoint(spark):
    # reliable=True routes lineage truncation through df.checkpoint()
    # (reliable storage) instead of localCheckpoint (executor blocks).
    # Same fixpoint, same answer; a checkpoint dir is auto-provisioned
    # when the session has none configured.
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "doc_a long, doc_b long"
    )
    got = {
        r["node"]: r["cluster_id"]
        for r in connected_components(pairs, reliable=True).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}
    assert not spark.sparkContext._jsc.sc().getCheckpointDir().isEmpty()


def test_stratified_sample_deterministic_and_nested(spark, sf_dir):
    docs = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id")
        .withColumn("stratum", F.lit("all"))
    )
    half = hash_stratified_sample(docs, "stratum", {"all": 0.5}, id_col="doc_id")
    again = hash_stratified_sample(docs, "stratum", {"all": 0.5}, id_col="doc_id")
    quarter = hash_stratified_sample(docs, "stratum", {"all": 0.25}, id_col="doc_id")

    half_ids = {r["doc_id"] for r in half.collect()}
    assert half_ids == {r["doc_id"] for r in again.collect()}  # deterministic
    quarter_ids = {r["doc_id"] for r in quarter.collect()}
    assert quarter_ids <= half_ids  # hash-threshold samples are nested
    n = docs.count()
    assert 0.35 * n <= len(half_ids) <= 0.65 * n  # binomial, not degenerate
    # unlisted strata keep default_rate=0.0
    none = hash_stratified_sample(docs, "stratum", {"other": 1.0}, id_col="doc_id")
    assert none.count() == 0


def test_embedding_neardup_pairs_subset_of_bruteforce(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    pairs = embedding_neardup_pairs(emb, threshold=0.3).collect()
    assert pairs, "threshold 0.3 must select candidates on the test lake"
    assert all(r["vec_a"] < r["vec_b"] for r in pairs)
    assert all(r["cosine"] >= 0.3 for r in pairs)
    # Every LSH pair must also be a brute-force pair at the same threshold
    # (recall<1 allowed, precision must be exact: LSH only prunes).
    k_all = emb.count()
    brute = cosine_topk(emb, emb, k=k_all).filter(F.col("cosine") >= 0.3)
    brute_pairs = {
        (min(r["query_id"], r["neighbor_id"]), max(r["query_id"], r["neighbor_id"]))
        for r in brute.collect()
    }
    assert {(r["vec_a"], r["vec_b"]) for r in pairs} <= brute_pairs


def test_gapfill_forward_fill_semantics(spark):
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 30)

    def at(minutes, price, volume):
        return ("A", t0 + datetime.timedelta(minutes=minutes), price, volume)

    # Buckets (15m): 0 has two ticks, 1-2 empty, 3 has one tick.
    ticks = spark.createDataFrame(
        [at(0, 10.0, 5), at(10, 11.0, 7), at(47, 12.0, 9)],
        "symbol string, timestamp timestamp, price double, volume long",
    )
    rows = sorted(
        gapfill_forward_fill(ticks, step_minutes=15).collect(),
        key=lambda r: r["bucket"],
    )
    assert len(rows) == 4  # dense grid, first..last observed bucket
    assert [r["is_gap"] for r in rows] == [0, 1, 1, 0]
    # close: last price in bucket, carried across the two empty buckets
    assert [r["close"] for r in rows] == [11.0, 11.0, 11.0, 12.0]
    # volume is a flow: summed in-bucket, zero (not carried) in gaps
    assert [r["bucket_volume"] for r in rows] == [12, 0, 0, 9]


def test_pii_redaction_crafted_inputs(spark):
    from stock_market_data_pipeline_spark.operators.textstats import (
        with_pii_redacted,
    )

    docs = spark.createDataFrame(
        [
            (1, "contact bob.smith+x@example.co.uk for details"),
            (2, "ssn 123-45-6789 and phone +1 (415) 555-0199 on file"),
            (3, "no pii here at all"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in with_pii_redacted(docs).collect()}
    assert got[1]["n_email"] == 1 and "<EMAIL>" in got[1]["text_redacted"]
    assert "bob" not in got[1]["text_redacted"]
    # SSN must be tagged as SSN, not swallowed by the phone pattern
    assert got[2]["n_ssn"] == 1 and "<SSN>" in got[2]["text_redacted"]
    assert got[2]["n_phone"] >= 1 and "<PHONE>" in got[2]["text_redacted"]
    assert "6789" not in got[2]["text_redacted"]
    assert "0199" not in got[2]["text_redacted"]
    assert got[3]["text_redacted"] == "no pii here at all"
    assert got[3]["n_email"] == got[3]["n_phone"] == got[3]["n_ssn"] == 0


def test_chunking_windows_and_tail(spark):
    from stock_market_data_pipeline_spark.operators.textstats import with_chunks

    text = " ".join(f"w{i}" for i in range(20))  # 20 words
    docs = spark.createDataFrame([(1, text), (2, "short doc")],
                                 "doc_id long, text string")
    rows = sorted(
        with_chunks(docs, chunk_size=16, stride=8).collect(),
        key=lambda r: (r["doc_id"], r["chunk_start"]),
    )
    d1 = [r for r in rows if r["doc_id"] == 1]
    assert [r["chunk_start"] for r in d1] == [1, 9, 17]
    assert d1[0]["chunk_tokens"] == 16 and d1[0]["chunk_text"].startswith("w0 w1 ")
    assert d1[1]["chunk_tokens"] == 12  # 20 - 8
    assert d1[2]["chunk_tokens"] == 4  # tail window is short, kept
    assert d1[2]["chunk_text"] == "w16 w17 w18 w19"
    d2 = [r for r in rows if r["doc_id"] == 2]
    assert len(d2) == 1 and d2[0]["chunk_tokens"] == 2


def test_repetition_signals_degenerate_doc(spark):
    from stock_market_data_pipeline_spark.operators.textstats import (
        with_repetition_signals,
    )

    docs = spark.createDataFrame(
        [(1, "spam spam spam spam"), (2, "all words fully distinct here"), (3, "one")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in with_repetition_signals(docs).collect()}
    assert got[1]["top_word_ratio"] == 1.0 and got[1]["distinct_word_ratio"] == 0.25
    assert got[1]["top_bigram_ratio"] == 1.0
    assert got[2]["distinct_word_ratio"] == 1.0 and got[2]["top_word_ratio"] == 0.2
    assert got[3]["top_bigram_ratio"] is None  # single word: no bigrams
    assert got[3]["mean_word_len"] == 3.0


def test_band_join_residual_filter(spark):
    from stock_market_data_pipeline_spark.operators.joins import band_join

    left = spark.createDataFrame(
        [("A", 5.0, 1), ("A", 15.0, 2), ("B", 5.0, 3)],
        "sym string, v double, row_id long",
    )
    bands = spark.createDataFrame(
        [("A", 0.0, 10.0, "low"), ("A", 10.0, 20.0, "high"), ("B", 50.0, 60.0, "only")],
        "sym string, lo double, hi double, band string",
    )
    got = {
        (r["row_id"], r["band"])
        for r in band_join(left, bands, ["sym"], "v", "lo", "hi").collect()
    }
    # equi key restricts to same sym; residual restricts to containing band;
    # B's value is outside its only band -> dropped entirely (inner join)
    assert got == {(1, "low"), (2, "high")}


def test_tfidf_ubiquitous_term_scores_zero(spark):
    from stock_market_data_pipeline_spark.operators.tfidf import tfidf_top_terms

    docs = spark.createDataFrame(
        [(1, "alpha common common"), (2, "beta common"), (3, "gamma common")],
        "doc_id long, text string",
    )
    rows = tfidf_top_terms(docs, top_k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for d, rs in by_doc.items():
        rs.sort(key=lambda r: r["rank"])
        # the unique term always outranks the everywhere-term (idf = ln(1) = 0)
        assert rs[0]["term"] in {"alpha", "beta", "gamma"}
        assert rs[0]["tfidf"] > 0
        common = [r for r in rs if r["term"] == "common"]
        assert all(r["tfidf"] == 0.0 for r in common)


def test_quota_sample_exact_counts_and_stability(spark, sf_dir):
    from stock_market_data_pipeline_spark.operators.sampling import hash_quota_sample

    docs = (
        read_table(spark, sf_dir, "documents")
        .select("doc_id")
        .withColumn("stratum", (F.col("doc_id") % 2 == 0).cast("string"))
    )
    got = hash_quota_sample(docs, "stratum", {"true": 20, "false": 10}).collect()
    by = {}
    for r in got:
        by.setdefault(r["stratum"], set()).add(r["doc_id"])
    assert len(by["true"]) == 20 and len(by["false"]) == 10
    # growth stability: sampling a SUBSET of the corpus keeps every selected
    # row that is still present (bottom-k property)
    sub = docs.filter(F.col("doc_id") < 250)
    sub_sel = {
        r["doc_id"]
        for r in hash_quota_sample(sub, "stratum", {"true": 20, "false": 10}).collect()
    }
    full_sel_in_sub = {d for s in by.values() for d in s if d < 250}
    assert full_sel_in_sub <= sub_sel


def test_quantize_int8_roundtrip_bounds(spark):
    from stock_market_data_pipeline_spark.operators.quantize import (
        quantize_embeddings_int8,
    )

    df = spark.createDataFrame(
        [(1, [1.0, -0.5, 0.25, 0.0]), (2, [0.0, 0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    got = {r["vec_id"]: r for r in quantize_embeddings_int8(df).collect()}
    r1 = got[1]
    # scale = 1/127; -0.5/scale = -63.5 — an exact half, which the +1e-9
    # bias resolves UP to -63 identically on both engines (the determinism
    # contract: biased rounding, not IEEE half-even or HALF_UP)
    assert r1["q"] == [127, -63, 32, 0]
    assert all(-127 <= v <= 127 for v in r1["q"])
    assert r1["scale"] == round(1.0 / 127.0 + 1e-9, 6)
    # reconstruction error bounded by scale/2 per dim
    assert r1["mean_abs_err"] <= (1.0 / 127.0) / 2 + 1e-9
    # zero vector: zero scale, all-zero q, zero error
    r2 = got[2]
    assert r2["scale"] == 0.0 and r2["q"] == [0, 0, 0, 0] and r2["mean_abs_err"] == 0.0


def test_frame_sampling_covers_content_exactly(spark):
    from stock_market_data_pipeline_spark.operators.multimodal import (
        resize_images,
        sample_frames,
    )

    assets = spark.createDataFrame(
        [(1, bytearray(b"0123456789AB")), (2, bytearray(b""))],
        "asset_id long, content binary",
    )
    rows = sorted(
        sample_frames(assets, n_frames=4).collect(),
        key=lambda r: (r["asset_id"], r["frame_idx"]),
    )
    a1 = [r for r in rows if r["asset_id"] == 1]
    # evenly spaced, contiguous, lossless coverage: concat == content
    assert [bytes(r["frame_bytes"]) for r in a1] == [b"012", b"345", b"678", b"9AB"]
    assert all(r["frame_ok"] for r in a1)
    a2 = [r for r in rows if r["asset_id"] == 2]
    assert len(a2) == 4 and all(
        not r["frame_ok"] and bytes(r["frame_bytes"]) == b"" for r in a2
    )
    # Neither asset is a BMP: the real decoder refuses both (no fake path),
    # and the row degrades instead of killing the batch.
    rz = {r["asset_id"]: r for r in resize_images(assets).collect()}
    assert not rz[1]["resize_ok"] and rz[1]["resized_bytes"] is None
    assert not rz[2]["resize_ok"]


def test_technical_indicators_semantics(spark):
    import datetime

    from stock_market_data_pipeline_spark.operators.rolling import (
        with_technical_indicators,
    )

    t0 = datetime.datetime(2024, 1, 1)
    # strictly rising prices: RSI must be 100 once warmed up (losses = 0)
    rows = [
        ("A", i, t0 + datetime.timedelta(minutes=i), 100.0 + i) for i in range(30)
    ]
    df = spark.createDataFrame(
        rows, "symbol string, event_id long, timestamp timestamp, price double"
    )
    got = sorted(
        with_technical_indicators(df, tiebreak="event_id").collect(),
        key=lambda r: r["event_id"],
    )
    assert all(r["rsi"] is None for r in got[:14])  # warm-up window
    assert all(r["rsi"] == 100.0 for r in got[14:])
    last = got[-1]
    # Bollinger: mid = mean of last 20 rising prices; band is symmetric
    assert abs(last["boll_mid"] - (sum(100.0 + i for i in range(10, 30)) / 20)) < 1e-9
    assert abs((last["boll_up"] - last["boll_mid"]) - (last["boll_mid"] - last["boll_dn"])) < 1e-9
    assert last["boll_up"] > last["boll_mid"] > last["boll_dn"]


def test_macd_constant_series_is_zero(spark):
    import datetime

    from stock_market_data_pipeline_spark.operators.rolling import with_macd

    t0 = datetime.datetime(2024, 1, 1)
    # constant price: every EMA equals the price, MACD exactly 0
    rows = [("A", i, t0 + datetime.timedelta(minutes=i), 50.0) for i in range(60)]
    df = spark.createDataFrame(
        rows, "symbol string, event_id long, timestamp timestamp, price double"
    )
    got = with_macd(df, tiebreak="event_id").collect()
    assert all(abs(r["ema_fast"] - 50.0) < 1e-9 for r in got)
    assert all(abs(r["macd"]) < 1e-9 for r in got)
    # rising series: fast EMA tracks recent (higher) prices above slow EMA
    rows2 = [("B", i, t0 + datetime.timedelta(minutes=i), 50.0 + i) for i in range(60)]
    df2 = spark.createDataFrame(
        rows2, "symbol string, event_id long, timestamp timestamp, price double"
    )
    last = sorted(
        with_macd(df2, tiebreak="event_id").collect(), key=lambda r: r["event_id"]
    )[-1]
    assert last["ema_fast"] > last["ema_slow"] and last["macd"] > 0


def test_gapfill_tiebreak_on_duplicate_timestamps(spark):
    import datetime

    t0 = datetime.datetime(2024, 1, 1)
    # two ticks with the SAME timestamp: the higher event_id must win close
    ticks = spark.createDataFrame(
        [("A", t0, 1, 10.0, 1), ("A", t0, 2, 12.0, 1)],
        "symbol string, timestamp timestamp, event_id long, price double, volume long",
    )
    rows = gapfill_forward_fill(ticks, step_minutes=15, tiebreak="event_id").collect()
    assert len(rows) == 1 and rows[0]["close"] == 12.0


def test_ann_probe_knobs_raise_recall(spark, sf_dir):
    """Multi-probe LSH and nprobe>1 IVF must strictly beat their single-probe
    forms on recall@5 vs the exact baseline (the knobs exist to trade scan
    fraction for recall; the synthetic near-orthogonal embeddings are the
    hardest regime, so floors are modest but the ORDERING must hold)."""
    from stock_market_data_pipeline_spark.operators.similarity import (
        ivf_cosine_topk,
        lsh_cosine_topk,
    )

    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") % 50 == 0)
    exact = {
        (r["query_id"], r["neighbor_id"]) for r in cosine_topk(emb, q).collect()
    }

    def recall(df):
        hits = {(r["query_id"], r["neighbor_id"]) for r in df.collect()}
        return len(hits & exact) / len(exact)

    lsh1 = recall(lsh_cosine_topk(emb, q))
    lshm = recall(lsh_cosine_topk(emb, q, multiprobe=True))
    ivf1 = recall(ivf_cosine_topk(emb, q))
    ivf4 = recall(ivf_cosine_topk(emb, q, nprobe=4))
    assert lshm > lsh1
    assert ivf4 > ivf1
    assert ivf4 >= 0.25  # measured 0.36-0.48 across SFs; generous floor
