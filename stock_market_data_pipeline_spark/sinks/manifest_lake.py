"""Manifest-file-list table format — Iceberg/Delta's core trick in
miniature: a version is a JSON *list of immutable data files*, not a
directory, so successive versions SHARE unchanged files and every
maintenance operation costs O(changed files), never O(table).

The directory-per-version layout (``lake.py:publish_version``) rewrites
the whole dataset on every publish — fine for full-replace semantics, but
at 100 TB retention deletes, compaction, and small upserts each touch a
sliver of the table and must not pay a full rewrite. Here:

* ``retention_delete`` — files entirely inside the retention window are
  CARRIED into the new manifest by reference (zero IO), files entirely
  outside are DROPPED from it (zero IO); only straddling files are
  rewritten. The per-file min/max stats decide membership, so the IO is
  proportional to the boundary, exactly like Iceberg's delete-by-filter.
* ``compact_manifest`` — bin-packs only the small files; files already at
  target size are carried by reference.
* ``vacuum_manifest`` — deletes data files no retained manifest
  references (the GC that reference-sharing makes necessary).

Commit protocol (same two-step as ``publish_version``): write the
manifest JSON, then create its ``._COMMITTED`` marker — the single atomic
commit point. A crash anywhere earlier leaves orphan data files that the
next ``vacuum_manifest`` collects; readers only ever resolve complete
committed manifests. Single-writer, like every sink in this package —
concurrent writers need a transactional log service, which is the one
piece of Iceberg/Delta deliberately out of scope.

Layout::

    root/data/<uuid>-<part>.parquet   immutable data files (shared)
    root/mf/v00000001.json            {"fmt", "files": [{name, bytes, stats}]}
    root/mf/v00000001._COMMITTED      commit marker
"""

from __future__ import annotations

import json as _json
import re
import uuid
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.sinks.lake import _HadoopFS, _stat_key

_MF_RE = re.compile(r"^v(\d{8})\.json$")
_COMMIT_SUFFIX = "._COMMITTED"


def _mf_dir(root: str) -> str:
    return f"{root.rstrip('/')}/mf"


def _data_dir(root: str) -> str:
    return f"{root.rstrip('/')}/data"


def _mf_name(v: int) -> str:
    return f"v{v:08d}.json"


def _list_manifests(fs: _HadoopFS, root: str) -> tuple[list[int], list[int]]:
    """(committed, known) manifest version numbers, ascending."""
    mdir = _mf_dir(root)
    if not fs.is_dir(mdir):
        return [], []
    names = set(fs.child_names(mdir))
    known = sorted(
        int(m.group(1)) for n in names if (m := _MF_RE.match(n))
    )
    committed = [
        v for v in known if f"{_mf_name(v)}{_COMMIT_SUFFIX}" in names
    ]
    return committed, known


def _resolve_manifest(
    fs: _HadoopFS, root: str, version: int | None = None
) -> tuple[int, dict]:
    committed, _ = _list_manifests(fs, root)
    if not committed:
        raise FileNotFoundError(f"no committed manifest under {root}")
    if version is None:
        version = committed[-1]
    elif version not in committed:
        raise FileNotFoundError(
            f"manifest v{version} not committed under {root} "
            f"(have {committed})"
        )
    meta = _json.loads(
        fs.read_text(f"{_mf_dir(root)}/{_mf_name(version)}")
    )
    return version, meta


def _stage_files(
    spark: SparkSession,
    df: DataFrame,
    root: str,
    fmt: str,
    stats_cols: list[str] | None,
) -> list[dict[str, Any]]:
    """Write ``df`` to a staging dir, move each part file into the shared
    data dir under a fresh uuid prefix, and return manifest entries
    (name, bytes, per-file min/max stats). Stats come from ONE
    distributed aggregate over ``input_file_name()`` — no driver footer
    walk, object-store-safe."""
    fs = _HadoopFS(spark, root)
    stage = f"{_data_dir(root)}/stage-{uuid.uuid4().hex}"
    df.write.mode("overwrite").format(fmt).save(stage)
    stats_by_file: dict[str, dict] = {}
    nulls_by_file: dict[str, dict] = {}
    if stats_cols:
        aggs = []
        for c in stats_cols:
            aggs.append(F.min(c).alias(f"__min_{c}"))
            aggs.append(F.max(c).alias(f"__max_{c}"))
            # NULLs are invisible to min/max; retention needs to know a
            # file is null-free before dropping it by range alone
            aggs.append(
                F.sum(F.col(c).isNull().cast("int")).alias(f"__nulls_{c}")
            )
        rows = (
            spark.read.format(fmt).load(stage)
            .groupBy(F.input_file_name().alias("__f"))
            .agg(*aggs)
            .collect()
        )
        for r in rows:
            base = r["__f"].rsplit("/", 1)[-1]
            stats_by_file[base] = {
                c: [r[f"__min_{c}"], r[f"__max_{c}"]] for c in stats_cols
            }
            nulls_by_file[base] = {
                c: int(r[f"__nulls_{c}"] or 0) for c in stats_cols
            }
    prefix = uuid.uuid4().hex[:12]
    entries: list[dict[str, Any]] = []
    for p, sz in fs.list_data_files(stage):
        base = p.rsplit("/", 1)[-1]
        new_name = f"{prefix}-{base}"
        fs.rename(f"{stage}/{base}", f"{_data_dir(root)}/{new_name}")
        entries.append(
            {
                "name": new_name,
                "bytes": sz,
                "stats": stats_by_file.get(base, {}),
                "nulls": nulls_by_file.get(base, {}),
            }
        )
    fs.delete(stage)
    return entries


def _table_stats_cols(meta: dict) -> set[str]:
    """The union of columns any file entry carries min/max stats for —
    what a maintenance rewrite must preserve so pruning keeps working."""
    return {c for e in meta.get("files", []) for c in (e.get("stats") or {})}


def _commit(
    spark: SparkSession,
    root: str,
    entries: list[dict[str, Any]],
    fmt: str,
    txns: dict[str, int] | None = None,
    schema_json: str | None = None,
) -> int:
    fs = _HadoopFS(spark, root)
    _, known = _list_manifests(fs, root)
    nxt = (known[-1] + 1) if known else 1
    mpath = f"{_mf_dir(root)}/{_mf_name(nxt)}"
    fs.write_text(
        mpath,
        _json.dumps(
            {
                "fmt": fmt,
                "files": entries,
                "txns": txns or {},
                # recorded so an all-rows-deleted manifest still READS as
                # an empty typed table instead of being unreadable
                "schema": schema_json,
            },
            default=str,
        ),
    )
    fs.write_text(f"{mpath}{_COMMIT_SUFFIX}", _mf_name(nxt))
    return nxt


def publish_files(
    spark: SparkSession,
    df: DataFrame,
    root: str,
    fmt: str = "parquet",
    stats_cols: list[str] | None = None,
) -> int:
    """Publish ``df`` as the next manifest version (full-replace
    semantics: the new manifest lists only the new files; prior versions
    keep referencing theirs until vacuumed). The txn watermarks of the
    replaced version are carried forward so idempotent appends stay
    replay-safe across a replace. Returns the version number.
    """
    fs = _HadoopFS(spark, root)
    committed, _ = _list_manifests(fs, root)
    txns: dict[str, int] = {}
    if committed:
        _, meta = _resolve_manifest(fs, root, None)
        txns = dict(meta.get("txns") or {})
    entries = _stage_files(spark, df, root, fmt, stats_cols)
    return _commit(
        spark, root, entries, fmt, txns=txns, schema_json=df.schema.json()
    )


def read_manifest(
    spark: SparkSession,
    root: str,
    version: int | None = None,
) -> DataFrame:
    """Read a committed manifest version — loads exactly the listed files
    (time travel by reference; a file shared by many versions is read the
    same way from each). A manifest listing NO files (e.g. a retention
    sweep that expired every row) reads as an EMPTY table with the
    recorded schema — an empty table is a normal state, not an error
    (round-8 review)."""
    from pyspark.sql.types import StructType

    fs = _HadoopFS(spark, root)
    _, meta = _resolve_manifest(fs, root, version)
    paths = [f"{_data_dir(root)}/{e['name']}" for e in meta["files"]]
    if not paths:
        schema_json = meta.get("schema")
        if not schema_json:
            raise FileNotFoundError(
                f"manifest under {root} lists no files and records no "
                "schema (pre-round-8 manifest?)"
            )
        schema = StructType.fromJson(_json.loads(schema_json))
        return spark.createDataFrame([], schema)
    return spark.read.format(meta.get("fmt", "parquet")).load(paths)


def manifest_files(
    spark: SparkSession, root: str, version: int | None = None
) -> list[dict[str, Any]]:
    """The raw file entries of a committed manifest (for audits/tests)."""
    fs = _HadoopFS(spark, root)
    _, meta = _resolve_manifest(fs, root, version)
    return meta["files"]


def retention_delete(
    spark: SparkSession,
    root: str,
    col: str,
    cutoff,
    fmt: str = "parquet",
    stats_cols: list[str] | None = None,
) -> dict[str, int]:
    """Delete every row with ``col < cutoff`` as a NEW manifest version,
    touching only the files the boundary crosses:

    * per-file stats ``min >= cutoff``  → carried by reference (zero IO);
    * ``max < cutoff``                  → dropped from the manifest (zero IO);
    * straddling / missing stats       → rewritten filtered.

    This is the GDPR/retention sweep a 100 TB table runs nightly: with a
    time-clustered layout the rewrite set is one boundary file per
    partition, and everything else is a manifest edit. Comparisons go
    through the same kind-matched ``_stat_key`` as the pruned reader, so
    timestamp/date stats participate and incomparable stats fall back to
    a (safe) rewrite.

    NULL ``col`` rows are NEVER expired (their age is unknowable): the
    rewrite filter keeps them, and a file qualifies for the zero-IO drop
    only when its recorded null count for ``col`` is zero — a file whose
    range is entirely expired but that holds NULL rows is rewritten down
    to just those rows instead.

    Rewritten files keep the table's FULL recorded stats column set (plus
    ``col``), the manifest's format, its txn watermarks, and its schema —
    a maintenance pass must never degrade later pruning, flip the storage
    format, or reopen a committed streaming txn (round-8 review). Returns
    ``{"carried", "dropped", "rewritten"}``.
    """
    fs = _HadoopFS(spark, root)
    _, meta = _resolve_manifest(fs, root, None)
    fmt = meta.get("fmt", fmt)
    kcut = _stat_key(cutoff)
    carried, to_rewrite = [], []
    dropped = 0
    for e in meta["files"]:
        st = e.get("stats", {}).get(col)
        nulls = e.get("nulls", {}).get(col)
        kmn = _stat_key(st[0]) if st else None
        kmx = _stat_key(st[1]) if st else None
        if (
            kcut is not None
            and kmn is not None
            and kmn[0] == kcut[0]
            and kmn[1] >= kcut[1]
        ):
            carried.append(e)  # NULL rows (if any) are kept with the file
        elif (
            kcut is not None
            and kmx is not None
            and kmx[0] == kcut[0]
            and kmx[1] < kcut[1]
            and nulls == 0
        ):
            dropped += 1
        else:
            to_rewrite.append(e)
    new_entries = list(carried)
    if to_rewrite:
        paths = [f"{_data_dir(root)}/{e['name']}" for e in to_rewrite]
        filtered = (
            spark.read.format(fmt)
            .load(paths)
            .filter(
                F.coalesce(F.col(col) >= F.lit(cutoff), F.lit(True))
            )
        )
        if stats_cols is None:
            stats_cols = sorted(_table_stats_cols(meta) | {col})
        new_entries.extend(
            _stage_files(spark, filtered, root, fmt, stats_cols)
        )
    _commit(
        spark,
        root,
        new_entries,
        fmt,
        txns=dict(meta.get("txns") or {}),
        schema_json=meta.get("schema"),
    )
    return {
        "carried": len(carried),
        "dropped": dropped,
        "rewritten": len(to_rewrite),
    }


def compact_manifest(
    spark: SparkSession,
    root: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    fmt: str = "parquet",
) -> dict[str, int]:
    """Bin-pack ONLY the undersized files (< half the target) into
    target-sized files; right-sized files are carried by reference. The
    streaming/micro-batch accretion problem solved at O(small files) cost
    — the Iceberg ``rewrite_data_files`` shape. Packed files are re-staged
    with the table's recorded stats column set, in the manifest's format,
    carrying txn watermarks and schema (round-8 review — the maintenance
    pass must not degrade pruning, flip the format, or reopen a committed
    streaming txn). Returns ``{"carried", "compacted", "files_written"}``.
    """
    import math

    fs = _HadoopFS(spark, root)
    _, meta = _resolve_manifest(fs, root, None)
    fmt = meta.get("fmt", fmt)
    small = [e for e in meta["files"] if e["bytes"] < target_file_bytes // 2]
    carried = [e for e in meta["files"] if e["bytes"] >= target_file_bytes // 2]
    if len(small) <= 1:
        return {"carried": len(meta["files"]), "compacted": 0, "files_written": 0}
    total = sum(e["bytes"] for e in small)
    n_out = max(1, math.ceil(total / target_file_bytes))
    paths = [f"{_data_dir(root)}/{e['name']}" for e in small]
    packed = spark.read.format(fmt).load(paths).repartition(n_out)
    stats_cols = sorted(_table_stats_cols(meta)) or None
    new_entries = carried + _stage_files(spark, packed, root, fmt, stats_cols)
    _commit(
        spark,
        root,
        new_entries,
        fmt,
        txns=dict(meta.get("txns") or {}),
        schema_json=meta.get("schema"),
    )
    return {
        "carried": len(carried),
        "compacted": len(small),
        "files_written": len(new_entries) - len(carried),
    }


def vacuum_manifest(
    spark: SparkSession,
    root: str,
    keep_versions: int = 2,
) -> dict[str, int]:
    """Garbage-collect: drop committed manifests beyond the last
    ``keep_versions``, uncommitted manifest orphans, and every data file
    no retained manifest references (including crashed-publish strays).
    Deletion order is manifests first, then files — a crash mid-vacuum
    leaves only unreferenced files, which the next vacuum collects; it
    can never break a retained version. Returns
    ``{"manifests_deleted", "files_deleted"}``."""
    fs = _HadoopFS(spark, root)
    committed, known = _list_manifests(fs, root)
    if not committed:
        return {"manifests_deleted": 0, "files_deleted": 0}
    retained = committed[-keep_versions:]
    mdel = 0
    for v in known:
        if v in retained:
            continue
        mpath = f"{_mf_dir(root)}/{_mf_name(v)}"
        fs.delete(f"{mpath}{_COMMIT_SUFFIX}")
        fs.delete(mpath)
        mdel += 1
    referenced: set[str] = set()
    for v in retained:
        _, meta = _resolve_manifest(fs, root, v)
        referenced |= {e["name"] for e in meta["files"]}
    fdel = 0
    ddir = _data_dir(root)
    if fs.is_dir(ddir):
        for name in fs.child_names(ddir):
            if name in referenced:
                continue
            fs.delete(f"{ddir}/{name}")
            fdel += 1
    return {"manifests_deleted": mdel, "files_deleted": fdel}


def append_files(
    spark: SparkSession,
    df: DataFrame,
    root: str,
    fmt: str = "parquet",
    stats_cols: list[str] | None = None,
    txn_id: tuple[str, int] | None = None,
) -> int:
    """APPEND ``df`` as the next manifest version: new manifest = previous
    file list + the newly staged files (previous files shared by
    reference, zero IO) — the natural ingestion commit for micro-batch
    streams, with ``compact_manifest`` as the maintenance pass.

    ``txn_id = (app_id, n)`` makes the append IDEMPOTENT per application
    (Delta's txn/appId protocol in miniature): each manifest carries the
    highest ``n`` committed per ``app_id``, and an append whose ``n`` is
    not greater is a NO-OP — checked BEFORE any staging IO. An
    at-least-once caller (foreachBatch replaying after a crash between
    the manifest commit and the checkpoint commit) therefore yields
    exactly-once table contents. Returns the (possibly pre-existing)
    current version number.
    """
    fs = _HadoopFS(spark, root)
    committed, _ = _list_manifests(fs, root)
    prev_entries: list[dict[str, Any]] = []
    txns: dict[str, int] = {}
    if committed:
        _, meta = _resolve_manifest(fs, root, None)
        prev_entries = meta["files"]
        txns = dict(meta.get("txns") or {})
        fmt = meta.get("fmt", fmt)
    if txn_id is not None:
        app, n = txn_id
        if txns.get(app) is not None and int(txns[app]) >= n:
            return committed[-1]  # already committed: replay no-op
        txns[app] = n
    new_entries = _stage_files(spark, df, root, fmt, stats_cols)
    return _commit(
        spark,
        root,
        prev_entries + new_entries,
        fmt,
        txns=txns,
        schema_json=df.schema.json(),
    )


_BUCKET = "__mf_bucket"


def _bucket_expr(keys: list[str], n_buckets: int):
    from stock_market_data_pipeline_spark.operators.sampling import (
        sample_hash32,
    )

    key = F.concat_ws("\x1f", *[F.col(k).cast("string") for k in keys])
    return sample_hash32(key, seed="mfb") % n_buckets


def _stage_bucketed(
    spark: SparkSession,
    df: DataFrame,
    root: str,
    fmt: str,
    keys: list[str],
    n_buckets: int,
    stats_cols: list[str] | None = None,
) -> list[dict[str, Any]]:
    """Stage ``df`` with one sub-directory per key bucket (Hive
    partitionBy on the derived bucket id), then move each file into the
    shared data dir carrying its bucket tag in the manifest entry — the
    file↔bucket mapping a keyed MERGE needs to rewrite only touched
    buckets. ``stats_cols`` records the same per-file min/max/null stats
    as ``_stage_files`` so a merged table keeps pruning and zero-IO
    retention working (round-8 review)."""
    fs = _HadoopFS(spark, root)
    stage = f"{_data_dir(root)}/stage-{uuid.uuid4().hex}"
    (
        df.withColumn(_BUCKET, _bucket_expr(keys, n_buckets))
        .repartition(F.col(_BUCKET))
        .write.mode("overwrite")
        .partitionBy(_BUCKET)
        .format(fmt)
        .save(stage)
    )
    stats_by_file: dict[str, dict] = {}
    nulls_by_file: dict[str, dict] = {}
    if stats_cols:
        aggs = []
        for c in stats_cols:
            aggs.append(F.min(c).alias(f"__min_{c}"))
            aggs.append(F.max(c).alias(f"__max_{c}"))
            aggs.append(
                F.sum(F.col(c).isNull().cast("int")).alias(f"__nulls_{c}")
            )
        rows = (
            spark.read.format(fmt).load(stage)
            .groupBy(F.input_file_name().alias("__f"))
            .agg(*aggs)
            .collect()
        )
        for r in rows:
            base = r["__f"].rsplit("/", 1)[-1]
            stats_by_file[base] = {
                c: [r[f"__min_{c}"], r[f"__max_{c}"]] for c in stats_cols
            }
            nulls_by_file[base] = {
                c: int(r[f"__nulls_{c}"] or 0) for c in stats_cols
            }
    prefix = uuid.uuid4().hex[:12]
    entries: list[dict[str, Any]] = []
    for p, sz in fs.list_data_files(stage):
        rel = p.split("stage-", 1)[-1].split("/", 1)[-1]
        bucket = int(rel.split(f"{_BUCKET}=", 1)[1].split("/", 1)[0])
        base = rel.rsplit("/", 1)[-1]
        new_name = f"{prefix}-b{bucket:05d}-{base}"
        fs.rename(
            f"{stage}/{_BUCKET}={bucket}/{base}",
            f"{_data_dir(root)}/{new_name}",
        )
        entries.append(
            {
                "name": new_name,
                "bytes": sz,
                "bucket": bucket,
                "stats": stats_by_file.get(base, {}),
                "nulls": nulls_by_file.get(base, {}),
            }
        )
    fs.delete(stage)
    return entries


def merge_upsert_manifest(
    spark: SparkSession,
    incoming: DataFrame,
    root: str,
    keys: list[str],
    order_col: str,
    n_buckets: int = 64,
    fmt: str = "parquet",
    txn_id: tuple[str, int] | None = None,
) -> dict[str, int]:
    """Keyed MERGE (last-writer-wins per key by ``order_col``) on the
    manifest format at O(touched buckets): files are tagged with a
    portable-hash key bucket; a batch touching k buckets reads and
    rewrites ONLY those buckets' files, and every other file is carried
    into the new manifest by reference — the upsert analogue of
    ``retention_delete``'s boundary discipline, and the piece that makes
    the format a full CRUD table (append ✓ replace ✓ retention ✓
    compaction ✓ upsert ✓).

    The first merge into an empty/unbucketed table rewrites it bucketed
    (entries without a bucket tag — e.g. from ``publish_files`` — count
    as touched once, then stay bucketed). ``txn_id`` gives the same
    replay idempotence as ``append_files``. ``n_buckets`` must stay
    constant per table (bucket membership is hash-derived); at 100 TB
    size it so a bucket's files fit an executor comfortably — the merge
    reads whole buckets.

    Returns ``{"touched_buckets", "carried_files", "rewritten_files"}``.
    """
    from stock_market_data_pipeline_spark.operators.dedup import (
        dedup_keep_last,
    )

    fs = _HadoopFS(spark, root)
    committed, _ = _list_manifests(fs, root)
    prev_entries: list[dict[str, Any]] = []
    txns: dict[str, int] = {}
    if committed:
        _, meta = _resolve_manifest(fs, root, None)
        prev_entries = meta["files"]
        txns = dict(meta.get("txns") or {})
        fmt = meta.get("fmt", fmt)
    if txn_id is not None:
        app, n = txn_id
        if txns.get(app) is not None and int(txns[app]) >= n:
            return {
                "touched_buckets": 0,
                "carried_files": len(prev_entries),
                "rewritten_files": 0,
            }
        txns[app] = n
    inc = incoming.withColumn(_BUCKET, _bucket_expr(keys, n_buckets))
    touched = {
        r[0] for r in inc.select(_BUCKET).distinct().collect()
    }
    carried, old_touched = [], []
    for e in prev_entries:  # single pass, not O(n^2) list membership
        if e.get("bucket") is not None and e["bucket"] not in touched:
            carried.append(e)
        else:
            old_touched.append(e)
    parts = [inc.drop(_BUCKET)]
    if old_touched:
        paths = [f"{_data_dir(root)}/{e['name']}" for e in old_touched]
        parts.append(spark.read.format(fmt).load(paths))
    merged = parts[0]
    for p in parts[1:]:
        merged = merged.unionByName(p, allowMissingColumns=True)
    winners = dedup_keep_last(merged, keys=keys, order=[order_col])
    stats_cols = (
        sorted(_table_stats_cols(meta)) if committed else []
    ) or None
    new_entries = _stage_bucketed(
        spark, winners, root, fmt, keys, n_buckets, stats_cols=stats_cols
    )
    _commit(
        spark,
        root,
        carried + new_entries,
        fmt,
        txns=txns,
        schema_json=winners.schema.json(),
    )
    return {
        "touched_buckets": len(touched),
        "carried_files": len(carried),
        "rewritten_files": len(new_entries),
    }


def read_manifest_pruned(
    spark: SparkSession,
    root: str,
    col: str,
    lo=None,
    hi=None,
    version: int | None = None,
) -> DataFrame:
    """File-skipping manifest read: consult the per-file min/max stats
    recorded at publish/append time and load ONLY the files whose
    ``col`` range overlaps [lo, hi], then re-apply the exact predicate —
    identical rows to ``read_manifest().filter(...)`` by construction,
    without opening the skipped files. Same kind-matched ``_stat_key``
    comparison rules as ``lake.py:read_versioned_pruned``; files with
    missing/non-orderable stats are conservatively read. NULL ``col``
    rows never satisfy a range predicate, so the exact filter's NULL
    drop matches the prune.
    """
    fs = _HadoopFS(spark, root)
    _, meta = _resolve_manifest(fs, root, version)
    fmt = meta.get("fmt", "parquet")
    c = F.col(col)
    cond = F.lit(True)
    if lo is not None:
        cond = cond & (c >= F.lit(lo))
    if hi is not None:
        cond = cond & (c <= F.lit(hi))
    klo = _stat_key(lo) if lo is not None else None
    khi = _stat_key(hi) if hi is not None else None
    keep = []
    for e in meta["files"]:
        st = e.get("stats", {}).get(col)
        kmn = _stat_key(st[0]) if st else None
        kmx = _stat_key(st[1]) if st else None
        if kmn is None or kmx is None:
            keep.append(e["name"])  # unknown stats -> must read
            continue
        if klo is not None and kmx[0] == klo[0] and kmx[1] < klo[1]:
            continue
        if khi is not None and kmn[0] == khi[0] and kmn[1] > khi[1]:
            continue
        keep.append(e["name"])
    if not keep:
        return read_manifest(spark, root, version=version).filter(
            F.lit(False)
        )
    df = spark.read.format(fmt).load(
        [f"{_data_dir(root)}/{n}" for n in keep]
    )
    return df.filter(cond)
