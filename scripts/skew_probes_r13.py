"""Round-13 scale probes (SKEW_BENCH.json):

1. ``r13_manifest_maintenance_scale`` — r12 verdict item 6: the r12 probe
   covered publish/append/rollback on the sharded manifest; this one runs
   the MAINTENANCE trio at depth on segmented 10^4- vs 10^5-entry tables
   that each carry the same 50 real undersized data files:

   * ``compact_manifest`` must cost O(small files + loose/segment
     planning), ~flat in table size (untouched segments carried by
     reference);
   * ``vacuum_manifest`` (with 100 fresh orphans, grace 0) lists the
     metadata/data dirs — cost grows with segment count, bounded by the
     dir listing, not the entry count;
   * ``consolidate_stats_sidecars`` is the DOCUMENTED all-entry rewrite
     (stats repointing touches every entry, no segment reusable) — its
     growth is recorded honestly (worst-case ~linear; measured ~flat
     because the single small sidecar read dominates).

2. ``r13_commit_lock_hold`` — r12 verdict item 5's bench note: per-commit
   lease hold time with a LeaseCommitLock installed, at 10^4 vs 10^5
   entries. The hold wraps only the exists-check + version-JSON/marker
   create; with the two-level manifest the version JSON stays O(loose +
   segment refs), so hold time must stay ~flat in table size — the lock
   serializes milliseconds per commit even on an 800k-file table.

Metadata-only entries (no data files) except the 50 real small files the
compaction actually reads, same technique as the r12 probes.
"""

from __future__ import annotations

import contextlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import stock_market_data_pipeline_spark.sinks.manifest_lake as ml
from stock_market_data_pipeline_spark.session import get_spark
from stock_market_data_pipeline_spark.sinks.lake import (
    LeaseCommitLock,
    _HadoopFS,
    set_commit_lock,
)


def _fake_entries(n, start=0, big=True):
    return [
        {
            "name": f"f{i:08d}.parquet",
            "bytes": (256 if big else 1) * 1024 * 1024,
        }
        for i in range(start, start + n)
    ]


def _seed_table(spark, root, n_fake):
    """Real 50-small-file table + n_fake right-sized metadata entries."""
    df = spark.range(5_000).selectExpr("id AS k", "id * 2 AS v")
    ml.publish_files(spark, df.repartition(50), root, stats_cols=["k"])
    fs = _HadoopFS(spark, root)
    _, meta = ml._resolve_manifest(fs, root, None)
    real = ml._manifest_entries(fs, root, meta)
    ml._commit(
        spark,
        root,
        real + _fake_entries(n_fake),
        "parquet",
        expected_prev=1,
        schema_json=meta.get("schema"),
        stats_cols=["k"],
    )
    return fs


def probe_maintenance_scale(spark, out, tmp):
    res = {}
    for n in (10_000, 100_000):
        root = f"{tmp}/maint_{n}"
        fs = _seed_table(spark, root, n)

        t0 = time.perf_counter()
        c = ml.compact_manifest(spark, root)
        compact_s = time.perf_counter() - t0
        assert c["compacted"] == 50, c

        # 100 fresh orphans in the data dir, then vacuum with grace 0
        for i in range(100):
            fs.write_text(f"{ml._data_dir(root)}/orphan{i:04d}.parquet", "x")
        t0 = time.perf_counter()
        v = ml.vacuum_manifest(spark, root, keep_versions=1, grace_seconds=0.0)
        vacuum_s = time.perf_counter() - t0
        assert v["files_deleted"] >= 100, v

        t0 = time.perf_counter()
        s = ml.consolidate_stats_sidecars(spark, root, max_sidecars=0)
        consolidate_s = time.perf_counter() - t0

        _, meta = ml._resolve_manifest(fs, root, None)
        res[f"{n}_entries"] = {
            "compact_s": round(compact_s, 3),
            "vacuum_s": round(vacuum_s, 3),
            "consolidate_s": round(consolidate_s, 3),
            "consolidate_version": s["version"],
            "segments": len(meta.get("segments") or []),
        }
    for op in ("compact", "vacuum", "consolidate"):
        res[f"{op}_ratio_10x"] = round(
            res["100000_entries"][f"{op}_s"] / res["10000_entries"][f"{op}_s"],
            2,
        )
    res["note"] = (
        "compact/vacuum stay ~flat (cost = touched files + dir listing + "
        "segment planning); consolidate is the documented all-entry stats "
        "repoint — worst-case ~linear in entries, measured ~flat: the one "
        "small sidecar read dominates"
    )
    out["r13_manifest_maintenance_scale"] = res


class _TimingLease(LeaseCommitLock):
    def __init__(self):
        super().__init__(ttl_s=300)
        self.holds: list[float] = []

    def hold(self, key: str):
        @contextlib.contextmanager
        def _cm():
            t0 = time.perf_counter()
            token = self._acquire(key)
            try:
                yield
            finally:
                self._release(key, token)
                self.holds.append(time.perf_counter() - t0)

        return _cm()


def probe_lock_hold(spark, out, tmp):
    res = {}
    for n in (10_000, 100_000):
        root = f"{tmp}/lock_{n}"
        lock = _TimingLease()
        prev = set_commit_lock(lock)
        try:
            _seed_table(spark, root, n)
            fs = _HadoopFS(spark, root)
            _, meta = ml._resolve_manifest(fs, root, None)
            ml._commit(
                spark,
                root,
                ml._manifest_entries(fs, root, meta)
                + _fake_entries(10, start=n),
                "parquet",
                expected_prev=2,
                schema_json=meta.get("schema"),
                reuse_segments=list(meta.get("segments") or []),
            )
        finally:
            set_commit_lock(prev)
        holds_ms = sorted(round(h * 1000, 2) for h in lock.holds)
        res[f"{n}_entries"] = {
            "n_holds": len(holds_ms),
            "max_hold_ms": holds_ms[-1],
            "median_hold_ms": holds_ms[len(holds_ms) // 2],
        }
    res["max_hold_ratio_10x"] = round(
        res["100000_entries"]["max_hold_ms"]
        / max(res["10000_entries"]["max_hold_ms"], 0.01),
        2,
    )
    res["note"] = (
        "lease held only across exists-check + version-JSON/marker "
        "create; two-level manifest keeps the JSON O(loose + segment "
        "refs) so per-commit serialization stays ms-flat in table size"
    )
    out["r13_commit_lock_hold"] = res


def main():
    import shutil
    import tempfile

    spark = get_spark(
        app_name="skew-probes-r13",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        shuffle_partitions=32,
    )
    spark.sparkContext.setLogLevel("ERROR")
    tmp = tempfile.mkdtemp(prefix="r13probe_")
    out = {}
    try:
        probe_maintenance_scale(spark, out, tmp)
        probe_lock_hold(spark, out, tmp)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print(json.dumps(out, indent=1))

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "SKEW_BENCH.json",
    )
    with open(path) as fh:
        bench = json.load(fh)
    bench.update(out)
    with open(path, "w") as fh:
        json.dump(bench, fh, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
