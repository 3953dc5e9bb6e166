"""DuckDB oracle SQL, one entry per name in ``queries.QUERIES``.

The oracle replicates Spark's semantics in ANSI-ish SQL DuckDB runs over the
same parquet tables (pre-registered views). Key equivalences used:

* Spark ``window(ts, w, s)`` sliding-window assignment: every row belongs to
  exactly w/s windows with ``start = time_bucket(s, ts) - k*s`` for
  k ∈ [0, w/s) (windows are epoch-aligned, w divisible by s here).
* Spark ``stddev`` ≡ ``stddev_samp`` (sample; single-row group → NULL).
* Spark ``min_by/max_by`` ≡ DuckDB ``arg_min/arg_max`` (timestamps are unique
  per key in the test lake, so ties cannot occur).
* Double aggregates are rounded to 6 dp on BOTH sides (utils.round_doubles).
* DuckDB ``sum(BIGINT)`` returns HUGEINT → cast back to BIGINT to match
  Spark's long.
"""

from __future__ import annotations

# Canonical tick view over `events` (mirrors sources.ticks.ticks_from_events).
TICKS_CTE = """
ticks AS (
  SELECT event_type AS symbol,
         value      AS price,
         CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) AS volume,
         ts         AS "timestamp",
         event_id,
         user_id
  FROM events
)
"""

# Sliding-window expansions (Spark window() semantics, see module docstring).
_SLIDE_15M = """
m15 AS (
  SELECT t.symbol,
         time_bucket(INTERVAL 5 MINUTE, t."timestamp") - k.k * INTERVAL 5 MINUTE AS window_start,
         round(avg(t.price), 6)         AS ma_15m,
         round(stddev_samp(t.price), 6) AS volatility_15m,
         CAST(sum(t.volume) AS BIGINT)  AS volume_sum_15m
  FROM ticks t CROSS JOIN generate_series(0, 2) k(k)
  GROUP BY 1, 2
)
"""

_SLIDE_1H = """
m1h AS (
  SELECT t.symbol,
         time_bucket(INTERVAL 10 MINUTE, t."timestamp") - k.k * INTERVAL 10 MINUTE AS window_start,
         round(avg(t.price), 6)         AS ma_1h,
         round(stddev_samp(t.price), 6) AS volatility_1h,
         CAST(sum(t.volume) AS BIGINT)  AS volume_sum_1h
  FROM ticks t CROSS JOIN generate_series(0, 5) k(k)
  GROUP BY 1, 2
)
"""

_JOINED = f"""
WITH {TICKS_CTE}, {_SLIDE_15M}, {_SLIDE_1H}
SELECT m15.symbol,
       m15.window_start,
       m15.window_start + INTERVAL 15 MINUTE AS window_15m_end,
       m1h.window_start + INTERVAL 60 MINUTE AS window_1h_end,
       m15.ma_15m, m1h.ma_1h,
       m15.volatility_15m, m1h.volatility_1h,
       m15.volume_sum_15m, m1h.volume_sum_1h
FROM m15 JOIN m1h ON m15.symbol = m1h.symbol AND m15.window_start = m1h.window_start
"""

_TUMBLE_BLOCK = """
  SELECT symbol,
         time_bucket(INTERVAL {mins} MINUTE, "timestamp") AS window_start,
         time_bucket(INTERVAL {mins} MINUTE, "timestamp") + INTERVAL {mins} MINUTE AS window_end,
         min("timestamp")                 AS first_ts,
         max("timestamp")                 AS last_ts,
         arg_min(price, "timestamp")      AS open_price,
         arg_max(price, "timestamp")      AS close_price,
         round(avg(price), 6)             AS avg_price,
         min(price)                       AS min_price,
         max(price)                       AS max_price,
         round(stddev_samp(price), 6)     AS volatility,
         CAST(sum(volume) AS BIGINT)      AS total_volume,
         count(*)                         AS tick_count,
         '{wtype}'                        AS window_type
  FROM ticks
  GROUP BY 1, 2
"""

ORACLES: dict[str, str] = {
    "clean_cast_filter": """
SELECT event_type AS symbol,
       value      AS price,
       CAST(NULL AS DOUBLE) AS change,
       value      AS change_percent,
       CAST(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) AS volume,
       ts         AS "timestamp"
FROM events
WHERE event_type IS NOT NULL AND value IS NOT NULL AND ts IS NOT NULL AND value > 0
""",
    "sliding_window_15m": f"""
WITH {TICKS_CTE}, {_SLIDE_15M}
SELECT symbol, window_start, window_start + INTERVAL 15 MINUTE AS window_end,
       ma_15m, volatility_15m, volume_sum_15m
FROM m15
""",
    "sliding_window_1h": f"""
WITH {TICKS_CTE}, {_SLIDE_1H}
SELECT symbol, window_start, window_start + INTERVAL 60 MINUTE AS window_end,
       ma_1h, volatility_1h, volume_sum_1h
FROM m1h
""",
    "windowed_analytics": _JOINED,
    "multi_window_tumbling": f"""
WITH {TICKS_CTE}
{_TUMBLE_BLOCK.format(mins=5, wtype='5min')}
UNION ALL
{_TUMBLE_BLOCK.format(mins=15, wtype='15min')}
UNION ALL
{_TUMBLE_BLOCK.format(mins=60, wtype='1hour')}
""",
    "trading_signals": f"""
WITH {TICKS_CTE}, {_SLIDE_15M}, {_SLIDE_1H}, joined AS (
  SELECT m15.symbol, m15.window_start,
         m15.window_start + INTERVAL 15 MINUTE AS window_15m_end,
         m1h.window_start + INTERVAL 60 MINUTE AS window_1h_end,
         m15.ma_15m, m1h.ma_1h,
         m15.volatility_15m, m1h.volatility_1h,
         m15.volume_sum_15m, m1h.volume_sum_1h
  FROM m15 JOIN m1h ON m15.symbol = m1h.symbol AND m15.window_start = m1h.window_start
)
SELECT *,
       CASE WHEN ma_15m > ma_1h THEN 'bullish'
            WHEN ma_15m < ma_1h THEN 'bearish'
            ELSE 'neutral' END AS price_trend,
       CASE WHEN volatility_15m > 2.0 THEN 'high'
            WHEN volatility_15m > 1.0 THEN 'medium'
            ELSE 'low' END AS volatility_level,
       CASE WHEN volume_sum_15m > volume_sum_1h * 0.3 THEN 'high_activity'
            ELSE 'normal_activity' END AS volume_trend
FROM joined
""",
}
