"""External-API batch source (SURVEY S5) + Kafka egress builder (K4).

* S5 — the reference fetches 1y of daily OHLCV per symbol from yfinance on
  the driver (``batch_data_producer.py:62-94``) and normalizes column names.
  The engine keeps the same adapter shape: a pluggable ``fetcher`` callable
  (symbol -> list of bar dicts) whose results land in a typed DataFrame with
  lineage columns (batch_id, batch_date). yfinance isn't in this container,
  so the default fetcher is a deterministic synthetic generator — swap in a
  real one (yfinance, REST, etc.) without touching the Spark side.
  Driver-side fetch is fine at this cardinality (10 symbols × 250 bars); a
  large symbol universe would distribute via ``mapInPandas`` over a symbol
  DataFrame, same contract.

* K4 — the reference produces JSON ticks to Kafka via confluent-kafka with a
  delivery callback loop (``stream_data_producer.py:123-131``);
  :func:`kafka_sink_writer` builds the equivalent ``df.write.format("kafka")``
  with key=symbol, value=JSON — executor-parallel, no driver loop. (No broker
  in this container; construction is tested, delivery is not.)
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable
from datetime import date, datetime, timedelta

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stock_market_data_pipeline_spark.schemas import OHLCV_SCHEMA

Fetcher = Callable[[str], list[dict]]


def _synthetic_fetcher(symbol: str, n_days: int = 30) -> list[dict]:
    """Deterministic fake daily bars (md5-seeded walk) — the no-network
    default; real deployments inject a yfinance/REST fetcher."""
    base = 50.0 + int(hashlib.md5(symbol.encode()).hexdigest()[:4], 16) % 500
    out = []
    d = date(2024, 1, 1)
    for i in range(n_days):
        u = int(hashlib.md5(f"{symbol}:{i}".encode()).hexdigest()[:8], 16) / 16**8
        o = round(base * (1 + 0.02 * (u - 0.5)), 2)
        c = round(o * (1 + 0.01 * (u - 0.5)), 2)
        out.append(
            {
                "date": (d + timedelta(days=i)).isoformat(),
                "symbol": symbol,
                "open": o,
                "high": round(max(o, c) * 1.005, 2),
                "low": round(min(o, c) * 0.995, 2),
                "close": c,
                "volume": 1_000_000 + int(u * 9_000_000),
            }
        )
    return out


def fetch_ohlcv_history(
    spark: SparkSession,
    symbols: list[str],
    fetcher: Fetcher | None = None,
    batch_id: str | None = None,
) -> DataFrame:
    """S5: external OHLCV fetch → typed DataFrame with lineage columns."""
    fetcher = fetcher or _synthetic_fetcher
    bid = batch_id or datetime.now().strftime("%Y%m%d%H%M%S")
    today = date.today().isoformat()
    rows = []
    for s in symbols:
        for bar in fetcher(s):
            rows.append(
                (
                    bar["date"],
                    bar["symbol"],
                    float(bar["open"]),
                    float(bar["high"]),
                    float(bar["low"]),
                    float(bar["close"]),
                    int(bar["volume"]),
                    bid,
                    today,
                )
            )
    return spark.createDataFrame(rows, OHLCV_SCHEMA)


def kafka_sink_writer(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    key_col: str = "symbol",
):
    """K4: build a Kafka batch writer — key = ``key_col``, value = JSON of
    all columns. Call ``.save()`` on the result where a broker exists."""
    payload = df.select(
        F.col(key_col).cast("string").alias("key"),
        F.to_json(F.struct(*df.columns)).alias("value"),
    )
    return (
        payload.write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
    )
