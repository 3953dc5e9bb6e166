"""r19 optimization profiler: run ONE query isolated (fresh session,
bench config) and report wall time + cumulative time per hot internal
function (monkeypatched timers), so optimization targets the measured
phase, not a guess. Usage:

    python scripts/profile_r19.py <query> [<query> ...]

Writes nothing to the repo; prints a per-function table.
"""

from __future__ import annotations

import functools
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

CUM: dict[str, float] = defaultdict(float)
CNT: dict[str, int] = defaultdict(int)
DEPTH = {"d": 0}


def _wrap(mod, name):
    fn = getattr(mod, name, None)
    if fn is None or not callable(fn):
        return
    label = f"{mod.__name__.rsplit('.', 1)[-1]}.{name}"

    @functools.wraps(fn)
    def timed(*a, **kw):
        DEPTH["d"] += 1
        top = DEPTH["d"] == 1
        t0 = time.perf_counter()
        try:
            return fn(*a, **kw)
        finally:
            dt = time.perf_counter() - t0
            DEPTH["d"] -= 1
            # only top-level spans accumulate, so nested hot calls
            # don't double-count (commit inside merge etc. still
            # shows because merge wraps are separate labels)
            CUM[label] += dt
            CNT[label] += 1
            if top:
                CUM["__toplevel__"] += dt

    setattr(mod, name, timed)


def main() -> None:
    from stock_market_data_pipeline_spark import queries as Q
    from stock_market_data_pipeline_spark.session import get_spark
    from stock_market_data_pipeline_spark.sinks import manifest_lake as ML
    from stock_market_data_pipeline_spark.sinks import lake as LK
    from stock_market_data_pipeline_spark.streaming import (
        cdc_replicate as CR,
    )

    hot_ml = [
        "_stage_files", "_stage_bucketed", "_write_stats_sidecar",
        "_commit", "_load_stats", "_load_table_files", "read_manifest",
        "merge_upsert_manifest", "delete_keys_manifest", "publish_files",
        "update_where_dv", "delete_where_dv", "delete_keys_dv",
        "read_manifest_changes", "read_manifest_table_changes",
        "_resolve_manifest", "_list_manifests", "_write_cdf_sidecar",
        "_change_rows", "_dv_changed_files", "_sidecar_skip_decisions",
        "enable_change_feed", "replace_where_manifest", "append_files",
        "manifest_history", "_commit_dv_state", "_dv_candidate_base",
        "rollback_manifest", "compact_manifest", "clone_manifest",
        "publish_files_wap", "_promote_manifest", "_enforce_constraints",
        "_apply_generated", "_evolved_schema_json",
    ]
    for n in hot_ml:
        _wrap(ML, n)
    _wrap(CR, "replicate_changefeed")
    _wrap(CR, "apply_changefeed_batch")
    _wrap(LK, "hold_commit_scope")

    spark = get_spark(
        app_name="smdp-profile-r19",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    spark.sparkContext.setLogLevel("ERROR")
    # same warm-up as bench.py
    Q.QUERIES["windowed_analytics"](spark, SF_DIR).write.format(
        "noop"
    ).mode("overwrite").save()

    for qname in sys.argv[1:]:
        # run 1 warms codegen/paths; run 2 is the comparable number
        # (the bench sweeps a warm JVM, so cold-run walls overstate)
        t0 = time.perf_counter()
        Q.QUERIES[qname](spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        wall_cold = time.perf_counter() - t0
        CUM.clear()
        CNT.clear()
        t0 = time.perf_counter()
        Q.QUERIES[qname](spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        wall = time.perf_counter() - t0
        print(f"\n=== {qname}: wall {wall:.2f}s (cold {wall_cold:.2f}s) ===")
        for k in sorted(CUM, key=lambda k: -CUM[k]):
            if k == "__toplevel__":
                continue
            print(f"  {CUM[k]:7.2f}s  x{CNT[k]:<4d} {k}")
        acc = CUM.get("__toplevel__", 0.0)
        print(f"  accounted (top-level spans): {acc:.2f}s / {wall:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
