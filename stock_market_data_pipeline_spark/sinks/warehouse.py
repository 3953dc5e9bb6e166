"""Warehouse egress: stage + MERGE SQL generation and execution (K6, the
warehouse side of the reference's loaders).

Reference parity: ``load_to_snowflake.py:186-231`` and
``load_stream_to_snowflake.py:240-305`` — create the target table if absent
(typed DDL + PRIMARY KEY), create a staging table shaped like the target,
batch-INSERT the frame into the stage, then one
``MERGE INTO target USING stage ON pk`` that updates every non-key column
when matched and inserts when not. This module re-expresses that as

* :func:`build_merge_plan` — pure SQL generation from a Spark schema, so the
  statements are unit-testable with no warehouse in reach;
* :func:`merge_to_warehouse` — executes the plan through any DB-API-style
  cursor factory (Snowflake connector, DuckDB, SQLite, JDBC bridge…).

Dialects: warehouses that speak ``MERGE`` (Snowflake) get the reference's
exact statement shape; engines that don't (DuckDB 1.0, SQLite — the
in-container stand-ins) get the transactional equivalent
``DELETE matching keys; INSERT whole stage`` which implements the same
last-writer-wins upsert given the stage holds one row per key (enforced
here by keep-last dedup, mirroring the reference's
``drop_duplicates(keep='last')`` at ``load_to_snowflake.py:154``).

Scale posture: the staging load — the only O(rows) step — either streams
through the driver in ``executemany`` batches (``stage_via="driver"``, the
reference's own shape, fine for aggregate egress of 10³–10⁶ rows) or runs on
the executors with one connection per partition (``stage_via="executors"``,
``foreachPartition``), which parallelizes ingest like Spark's JDBC writer.
Executor staging uses a *permanent* stage table (temp tables are
per-connection and would be invisible to the driver's MERGE) and drops it
after the merge. The MERGE itself is one set-based statement warehouse-side
— never a per-row loop.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Iterator, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from stock_market_data_pipeline_spark.operators.dedup import dedup_keep_last


@dataclass(frozen=True)
class Dialect:
    """The knobs warehouses actually differ on for this flow."""

    name: str
    placeholder: str  # DB-API paramstyle token: "%s" (snowflake) or "?"
    supports_merge: bool
    supports_create_or_replace: bool = True
    supports_stage_like: bool = True  # CREATE TABLE ... LIKE target
    # File-based bulk ingestion template ({stage}/{cols}/{path} placeholders)
    # — the only staging pattern that survives at real volume: executors
    # write parquet in parallel, the warehouse ingests files set-based, no
    # row ever rides a Python loop or a single connection. None = dialect
    # cannot ingest files (SQLite).
    copy_from_parquet: str | None = None


SNOWFLAKE = Dialect(
    "snowflake",
    "%s",
    supports_merge=True,
    # Public COPY INTO syntax: parquet files land on a stage (external or
    # internal); MATCH_BY_COLUMN_NAME maps parquet columns to stage-table
    # columns by name, the same by-name contract the DuckDB template uses.
    copy_from_parquet=(
        "COPY INTO {stage} FROM '{path}' "
        "FILE_FORMAT = (TYPE = PARQUET) "
        "MATCH_BY_COLUMN_NAME = CASE_INSENSITIVE"
    ),
)
DUCKDB = Dialect(
    "duckdb",
    "?",
    supports_merge=False,
    supports_stage_like=False,
    copy_from_parquet=(
        "INSERT INTO {stage} ({cols}) "
        "SELECT {cols} FROM read_parquet('{path}/*.parquet')"
    ),
)
SQLITE = Dialect(
    "sqlite",
    "?",
    supports_merge=False,
    supports_create_or_replace=False,
    supports_stage_like=False,
)


_SQL_TYPES: dict[type, str] = {
    T.StringType: "VARCHAR",
    T.DoubleType: "DOUBLE",
    T.FloatType: "REAL",
    T.LongType: "BIGINT",
    T.IntegerType: "INTEGER",
    T.ShortType: "SMALLINT",
    T.ByteType: "TINYINT",
    T.BooleanType: "BOOLEAN",
    T.DateType: "DATE",
    T.TimestampType: "TIMESTAMP",
    T.BinaryType: "BLOB",
}


def sql_type(dt: T.DataType) -> str:
    """ANSI-ish column type for a Spark type (warehouse DDL)."""
    if isinstance(dt, T.DecimalType):
        return f"DECIMAL({dt.precision},{dt.scale})"
    for spark_t, name in _SQL_TYPES.items():
        if isinstance(dt, spark_t):
            return name
    raise TypeError(f"no warehouse mapping for Spark type {dt.simpleString()}")


@dataclass(frozen=True)
class MergePlan:
    """Every statement of one stage-and-merge load, in execution order."""

    table: str
    stage_table: str
    columns: tuple[str, ...]
    primary_key: tuple[str, ...]
    create_table: str
    create_stage: tuple[str, ...]
    insert: str  # parameterized; executemany() with row tuples
    merge: tuple[str, ...]  # post-staging statements (incl. stage cleanup)
    copy: tuple[str, ...] = ()  # file-based staging (COPY/read_parquet)


def build_merge_plan(
    table: str,
    schema: T.StructType,
    primary_key: Sequence[str],
    dialect: Dialect = SNOWFLAKE,
    stage_table: str | None = None,
    temp_stage: bool = True,
    copy_path: str | None = None,
) -> MergePlan:
    """Generate the reference's stage+MERGE statements from a Spark schema.

    Pure string generation — no connection — so tests can assert the exact
    SQL and any caller can route it through their own transport.
    """
    cols = tuple(f.name for f in schema.fields)
    pk = tuple(primary_key)
    missing = [k for k in pk if k not in cols]
    if missing:
        raise ValueError(f"primary key columns {missing} not in schema {cols}")
    non_key = [c for c in cols if c not in pk]
    if not non_key:
        raise ValueError("MERGE needs at least one non-key column to update")
    stage = stage_table or f"{table}_STAGE"

    col_defs = ",\n  ".join(f"{f.name} {sql_type(f.dataType)}" for f in schema.fields)
    create_table = (
        f"CREATE TABLE IF NOT EXISTS {table} (\n  {col_defs},\n"
        f"  PRIMARY KEY ({', '.join(pk)})\n)"
    )

    temp_kw = "TEMPORARY " if temp_stage else ""
    if dialect.supports_create_or_replace:
        if dialect.supports_stage_like:
            create_stage: tuple[str, ...] = (
                f"CREATE OR REPLACE {temp_kw}TABLE {stage} LIKE {table}",
            )
        else:
            create_stage = (
                f"CREATE OR REPLACE {temp_kw}TABLE {stage} AS "
                f"SELECT * FROM {table} LIMIT 0",
            )
    else:
        create_stage = (
            f"DROP TABLE IF EXISTS {stage}",
            f"CREATE {temp_kw}TABLE {stage} AS SELECT * FROM {table} LIMIT 0",
        )

    placeholders = ", ".join([dialect.placeholder] * len(cols))
    insert = (
        f"INSERT INTO {stage} ({', '.join(cols)}) VALUES ({placeholders})"
    )

    on = " AND ".join(f"target.{k} = source.{k}" for k in pk)
    # The MERGE source is SELECT DISTINCT over the stage, not the raw stage:
    # executor staging runs under Spark's at-least-once task semantics, so a
    # retried/speculative partition re-inserts its rows VERBATIM (the input
    # frame is already one-row-per-key). DISTINCT collapses those exact
    # duplicates, keeping the ≤1-source-row-per-key invariant the MERGE (and
    # the delete+insert fallback) depends on.
    distinct_src = f"(SELECT DISTINCT {', '.join(cols)} FROM {stage})"
    if dialect.supports_merge:
        updates = ",\n    ".join(f"target.{c} = source.{c}" for c in non_key)
        src_cols = ", ".join(f"source.{c}" for c in cols)
        merge: tuple[str, ...] = (
            f"MERGE INTO {table} AS target\n"
            f"USING {distinct_src} AS source\n"
            f"ON {on}\n"
            f"WHEN MATCHED THEN\n  UPDATE SET\n    {updates}\n"
            f"WHEN NOT MATCHED THEN\n"
            f"  INSERT ({', '.join(cols)})\n  VALUES ({src_cols})",
        )
    else:
        # Transactional MERGE equivalent for engines without it: with ≤1 stage
        # row per key, delete-then-insert is exactly WHEN MATCHED UPDATE +
        # WHEN NOT MATCHED INSERT. EXISTS keeps it portable (DuckDB + SQLite).
        key_match = " AND ".join(f"s.{k} = {table}.{k}" for k in pk)
        merge = (
            f"DELETE FROM {table} WHERE EXISTS "
            f"(SELECT 1 FROM {stage} s WHERE {key_match})",
            f"INSERT INTO {table} ({', '.join(cols)}) "
            f"SELECT DISTINCT {', '.join(cols)} FROM {stage}",
        )
    if not temp_stage:
        merge = merge + (f"DROP TABLE IF EXISTS {stage}",)

    copy: tuple[str, ...] = ()
    if copy_path is not None:
        if dialect.copy_from_parquet is None:
            raise ValueError(
                f"dialect {dialect.name!r} has no file-ingestion statement; "
                f"use stage_via='driver'/'executors' instead"
            )
        copy = (
            dialect.copy_from_parquet.format(
                stage=stage, cols=", ".join(cols), path=copy_path
            ),
        )

    return MergePlan(
        table=table,
        stage_table=stage,
        columns=cols,
        primary_key=pk,
        create_table=create_table,
        create_stage=create_stage,
        insert=insert,
        merge=merge,
        copy=copy,
    )


def _row_batches(rows: Iterator, size: int) -> Iterator[list[tuple]]:
    batch: list[tuple] = []
    for r in rows:
        batch.append(tuple(r))
        if len(batch) >= size:
            yield batch
            batch = []
    if batch:
        yield batch


def merge_to_warehouse(
    df: DataFrame,
    cursor_factory: Callable[[], object],
    table: str,
    primary_key: Sequence[str],
    order_col: str | None = None,
    dialect: Dialect = SNOWFLAKE,
    batch_size: int = 10_000,
    stage_via: str = "executors",
    copy_path: str | None = None,
) -> MergePlan:
    """Upsert ``df`` into a warehouse table with MERGE semantics.

    ``cursor_factory`` returns a DB-API-style object with ``execute`` /
    ``executemany`` (and optionally ``connection.commit``); it must be
    picklable when ``stage_via="executors"``.

    ``order_col`` resolves within-batch key collisions keep-last, mirroring
    the reference's ``drop_duplicates(subset=pk, keep='last')``; without it,
    duplicate keys in ``df`` raise — a MERGE against a multi-row-per-key
    stage is nondeterministic (Snowflake errors on it at runtime), and
    failing in the plan beats failing in the warehouse.

    Staging modes, fastest first:

    - ``"copy"`` — the bulk path: executors write ``df`` as parquet to
      ``copy_path`` (required; a lake/stage URI the warehouse can read),
      then ONE set-based file-ingestion statement
      (Snowflake ``COPY INTO … TYPE = PARQUET``, DuckDB ``read_parquet``)
      loads the stage table. No row ever crosses the driver or a DB-API
      connection — the only pattern that survives at real volume.
    - ``"executors"`` (default) — one DB-API connection per partition
      (``foreachPartition``), parallel ``executemany`` batches; for
      warehouses without file ingestion from where the data lives.
    - ``"driver"`` — the reference's own shape
      (``load_to_snowflake.py:210-231``): all rows stream through the
      driver connection. Kept for parity and for non-picklable factories;
      BASELINE.md calls it "the slowest plausible path" — never the
      default.
    """
    if stage_via not in ("driver", "executors", "copy"):
        raise ValueError(
            f"stage_via must be driver|executors|copy, got {stage_via!r}"
        )
    if stage_via == "copy" and copy_path is None:
        raise ValueError("stage_via='copy' requires copy_path")
    pk = list(primary_key)
    if order_col is not None:
        df = dedup_keep_last(df, keys=pk, order=[order_col])
    else:
        dup = df.groupBy(*pk).count().filter("count > 1").limit(1).count()
        if dup:
            raise ValueError(
                f"duplicate primary keys in incoming frame and no order_col "
                f"to resolve them (pk={pk})"
            )

    plan = build_merge_plan(
        table,
        df.schema,
        pk,
        dialect=dialect,
        # The copy/DDL statements all run on the driver connection, so a
        # TEMPORARY stage is visible to them; only executor staging inserts
        # through OTHER connections and needs a permanent stage table.
        temp_stage=(stage_via != "executors"),
        copy_path=copy_path if stage_via == "copy" else None,
    )

    cur = cursor_factory()
    cur.execute(plan.create_table)
    for stmt in plan.create_stage:
        cur.execute(stmt)
    _commit(cur)

    df = df.select(*plan.columns)  # lock column order to the INSERT statement
    if stage_via == "copy":
        # Executor-parallel parquet write, then one set-based ingestion
        # statement warehouse-side — zero rows through Python or the driver.
        df.write.mode("overwrite").parquet(copy_path)
        for stmt in plan.copy:
            cur.execute(stmt)
        _commit(cur)
    elif stage_via == "driver":
        # Reference shape: stream batches through the loader connection. The
        # toLocalIterator pulls one partition at a time — O(partition) driver
        # memory, not O(table).
        for batch in _row_batches(df.toLocalIterator(), batch_size):
            cur.executemany(plan.insert, batch)
        _commit(cur)
    else:
        # Executor staging ships the factory to the workers — fail HERE with
        # an actionable message instead of a PicklingError deep inside a
        # Spark task (the default changed from 'driver' in round 6; driver-
        # local closures are the expected migration casualty).
        import pickle

        try:
            pickle.dumps(cursor_factory)
        except Exception as e:
            raise ValueError(
                "stage_via='executors' (the default) requires a picklable "
                "cursor_factory — each partition opens its own connection "
                "on a worker. Pass a factory object (e.g. "
                "SqliteCursorFactory) or use stage_via='driver' for a "
                f"driver-local connection. Pickle error: {e}"
            ) from None
        insert_sql, size = plan.insert, batch_size

        def load_partition(rows):
            c = cursor_factory()
            for batch in _row_batches(rows, size):
                c.executemany(insert_sql, batch)
            _commit(c)

        df.foreachPartition(load_partition)
        # Guard against a factory whose connections don't share storage with
        # the driver's (e.g. per-process in-memory DBs): the rows would land
        # in executor-local limbo and the MERGE would 'succeed' on an empty
        # stage — silent data loss. An empty stage for a non-empty frame is
        # always that misconfiguration.
        staged = cur.execute(f"SELECT count(*) FROM {plan.stage_table}")
        n_staged = _scalar(staged, cur)
        if n_staged == 0 and df.limit(1).count() > 0:
            raise RuntimeError(
                "executor staging wrote rows, but the driver connection "
                f"sees an EMPTY stage table {plan.stage_table!r} — the "
                "cursor_factory's connections do not share storage with "
                "the driver's (per-process in-memory database?). Use a "
                "file/network-backed warehouse or stage_via='driver'."
            )

    for stmt in plan.merge:
        cur.execute(stmt)
    _commit(cur)
    return plan


def _scalar(execute_result, cur):
    """First column of the first row from a DB-API execute, tolerating
    cursors whose execute() returns None (sqlite3 returns the cursor,
    DuckDB connections return a relation, adapters may return nothing)."""
    source = execute_result if execute_result is not None else cur
    fetch = getattr(source, "fetchone", None)
    if not callable(fetch):  # pragma: no cover - exotic adapters
        return None
    row = fetch()
    return None if row is None else row[0]


def _commit(cur) -> None:
    conn = getattr(cur, "connection", None)
    commit = getattr(conn, "commit", None) or getattr(cur, "commit", None)
    if callable(commit):
        commit()


class SqliteCursorFactory:
    """Picklable cursor factory for a file-backed SQLite warehouse — the
    in-container stand-in for the executor staging path (a real deployment
    passes its own factory: snowflake.connector, a JDBC bridge, …). Each call
    opens a fresh connection, so every Spark partition gets its own; SQLite
    serializes concurrent writers via the busy timeout."""

    def __init__(self, path: str, timeout_s: float = 30.0):
        self.path = path
        self.timeout_s = timeout_s

    def __call__(self):
        import sqlite3

        return sqlite3.connect(self.path, timeout=self.timeout_s).cursor()
