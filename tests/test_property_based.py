"""Property-based tests (hypothesis) for the order-sensitive operators whose
bugs hide in adversarial inputs the fixed lake never produces: packing over
arbitrary token distributions, sessionization over arbitrary gap patterns.

The reference has no tests at all (SURVEY §5); the oracle suite checks fixed
data — these check the algebraic laws on generated data. Examples are kept
small (Spark round-trip per example) and the generator seeds are derandomized
for CI stability.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from stock_market_data_pipeline_spark.operators.events import sessionize
from stock_market_data_pipeline_spark.operators.packing import pack_sequences

_SETTINGS = dict(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

BUDGET = 16


@given(
    word_counts=st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=40)
)
@settings(**_SETTINGS)
def test_packing_laws_hold_for_any_token_distribution(spark, word_counts):
    """For ANY doc-length distribution (including empty docs and docs longer
    than the whole budget): offsets tile the shard stream exactly, seq_id is
    the budget quotient, and straddle flags match the geometry."""
    rows = [(i, " ".join(["w"] * n)) for i, n in enumerate(word_counts)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_sequences(docs, budget=BUDGET, n_shards=3).collect()
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    for docs_in_shard in by_shard.values():
        docs_in_shard.sort(key=lambda r: r.doc_id)
        offset = 0
        for r in docs_in_shard:
            assert r.start_offset == offset
            assert r.seq_id == offset // BUDGET
            last = offset + r.n_tokens - 1
            want_straddle = 1 if r.n_tokens > 0 and last // BUDGET > r.seq_id else 0
            assert r.spans_boundary == want_straddle, r
            offset += r.n_tokens
    assert sum(r.n_tokens for r in out) == sum(word_counts)


@given(
    gaps_min=st.lists(
        st.integers(min_value=0, max_value=120), min_size=1, max_size=30
    )
)
@settings(**_SETTINGS)
def test_sessionize_gap_law_for_any_gap_pattern(spark, gaps_min):
    """For ANY sequence of inter-event gaps: consecutive events in the same
    session are <= gap_minutes apart (the boundary is inclusive, matching
    native session_window); consecutive sessions are separated by
    > gap_minutes; session ids are 1..k dense in time order."""
    GAP = 30
    t = datetime(2024, 1, 1)
    times = [t]
    for g in gaps_min:
        t = t + timedelta(minutes=g)
        times.append(t)
    rows = [(1, ts, float(i)) for i, ts in enumerate(times)]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = sorted(
        sessionize(ev, gap_minutes=GAP).collect(), key=lambda r: r.ts
    )
    prev = None
    seen_sessions = []
    for r in got:
        if prev is not None:
            gap = (r.ts - prev.ts).total_seconds() / 60
            if r.session_id == prev.session_id:
                assert gap <= GAP, (gap, r)
            else:
                assert gap > GAP, (gap, r)
                assert r.session_id == prev.session_id + 1
        if not seen_sessions or seen_sessions[-1] != r.session_id:
            seen_sessions.append(r.session_id)
        prev = r
    assert seen_sessions == list(range(1, len(seen_sessions) + 1))
