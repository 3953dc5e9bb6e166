"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced through the noop sink — unlike ``count()``, which lets
Catalyst prune projection-only plans down to a row count, noop materializes
every output column, so timings reflect real work.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from stock_market_data_pipeline_spark.queries import QUERIES
from stock_market_data_pipeline_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# Headline set: one per operator family (window aggs, rolling, OHLCV,
# relational joins/aggs, near-dup, ANN, text, multimodal).
HEADLINE = [
    "windowed_analytics",
    "multi_window_tumbling",
    "multi_window_signals",
    "trading_signals",
    "rolling_frames",
    "daily_ohlcv",
    "dedup_keep_last",
    "pricing_summary",
    "top_revenue_orders",
    "region_revenue",
    "order_priority_counts",
    "revenue_forecast",
    "rollup_revenue",
    "customer_order_ranks",
    "session_windows",
    "linestatus_pivot",
    "dedup_exact",
    "text_quality",
    "lang_id",
    "minhash_lsh_pairs",
    "simhash_neardup_pairs",
    "cosine_topk",
    "cosine_topk_vectorized",
    "lsh_cosine_topk",
    "ivf_cosine_topk",
    "ewma",
    "corpus_curation",
    "multimodal_image_features",
    "neardup_clusters",
    "embedding_neardup_pairs",
    "stratified_sample",
    "gapfill_15m",
    "repetition_signals",
    "doc_chunks",
    "tfidf_top_terms",
    "price_band_join",
    "quota_sample",
    "quantize_embeddings",
    "multimodal_frame_sample",
    "technical_indicators",
    "macd",
    "ivf_cosine_topk_nprobe4",
    "lsh_cosine_topk_multiprobe",
    "corpus_curation_transitive",
]


def main() -> None:
    spark = get_spark(
        app_name="smdp-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    spark.sparkContext.setLogLevel("ERROR")
    # Warm the JVM/codegen paths once so per-query timings measure the
    # queries, not first-job startup.
    QUERIES["windowed_analytics"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.perf_counter()
        QUERIES[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
