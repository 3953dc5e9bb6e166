"""Capture .explain('formatted') for the r20-touched queries.

r20 touches the manifest/commit MACHINERY (latest-version pointer,
pooled staging renames, decimal footer stats) and the streaming
lifecycle, not any query's dataframe construction — so every returned
plan must be byte-identical modulo expression IDs. These files pin
that: the optimizations are metadata-IO/job-count changes evidenced in
OPTIMIZATION_r20.md, and result equality is pinned by the oracle gate.

Usage: python scripts/explain_r20.py <suffix> [<query> ...]

For queries that end in an eager localCheckpoint (the QA rows), the
formatted plan of the RETURNED frame is a checkpoint scan; the
machinery this round optimized (commit staging, stats sidecars,
parity asserts) runs as separate jobs — those claims are evidenced by
the job/phase timings in OPTIMIZATION_r20.md and the code. The files
here additionally pin that the returned plans (and thus results) did
not change shape where they are real plans.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOUCHED = [
    "windowed_analytics",
    "stream_cdf_parity",
    "stream_cdf_merge_parity",
    "stream_cdf_replace_parity",
    "stream_cdf_restore_parity",
    "cdc_replicate_equality",
    "table_changes_parity",
    "stream_incremental_dedup",
    "composed_prune_fingerprint",
    "bloom_point_lookup",
    "dv_update_equality",
    "dv_delete_equality",
    "cdf_read_equality",
    "manifest_key_delete",
    "manifest_stream_read_equality",
    "pruned_scan_revenue",
]

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:] or TOUCHED
    from stock_market_data_pipeline_spark.queries import QUERIES
    from stock_market_data_pipeline_spark.session import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    outdir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r20",
    )
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        try:
            df = QUERIES[name](spark, SF_DIR)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001 — record, keep going
            text = f"ERROR building plan: {type(exc).__name__}: {exc}\n"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(text)
        print(f"{name}_{suffix}: {len(text)} bytes")
    spark.stop()


if __name__ == "__main__":
    main()
