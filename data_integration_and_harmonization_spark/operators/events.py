"""Temporal aggregations over the events table (engine extension —
the reference is strictly batch-relational with no time semantics;
SURVEY §2.8). Batch forms here; the same logic runs incrementally in
:mod:`..streaming.pipeline` via readStream + watermark.

``F.window`` / ``F.session_window`` are Spark-native (tumbling and
session assignment happen JVM-side before a standard partial agg);
event-time bucketing keys the shuffle, so scale-out is by (window,
key) — the canonical streaming-agg layout.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events scan. The test parquet stores ts as TIMESTAMP(NANOS);
    depending on the runtime that arrives as long nanos or
    TIMESTAMP_NTZ — one shared normalizer (streaming.ensure_event_time)
    owns the dtype dispatch so batch and stream cannot drift. Batch
    keeps NTZ (naive) semantics — that is what the oracles compare;
    the streaming entry points re-normalize to TIMESTAMP for
    watermarks."""
    from data_integration_and_harmonization_spark.streaming.pipeline import ensure_event_time

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return ensure_event_time(
        spark.read.parquet(f"{sf_dir}/events.parquet"), allow_ntz=True
    )


def tumbling_agg(events: DataFrame, width: str = "1 hour") -> DataFrame:
    """Tumbling-window counts/sums per event_type."""
    return (
        events.groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


def sliding_agg(events: DataFrame, width: str = "1 hour", slide: str = "30 minutes") -> DataFrame:
    """Sliding-window counts: each event lands in width/slide windows."""
    return (
        events.groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def session_agg(events: DataFrame, gap: str = "10 minutes") -> DataFrame:
    """Session windows per user: events within ``gap`` of each other
    merge into one session."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
        )
    )


def json_props_agg(events: DataFrame) -> DataFrame:
    """Semi-structured path: parse the JSON ``props`` column and
    aggregate an extracted field — ``get_json_object`` stays JVM-side."""
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        events.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(k).alias("sum_k"),
            F.round(F.avg(k), 6).alias("avg_k"),
        )
    )


# ------------------------------------------------------- query registry

def events_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ev = load_events

    def q_windows(spark, sf):
        # tumbling + sliding window aggs in one tagged result (merged
        # from r1's events_tumbling / events_sliding — the driver's
        # correctness pass records at most 50 queries)
        ev = _ev(spark, sf)
        t = tumbling_agg(ev).select(
            F.lit("tumbling").alias("kind"), "window_start", "event_type", "n_events", "sum_value"
        )
        s = sliding_agg(ev).select(
            F.lit("sliding").alias("kind"),
            "window_start",
            F.lit(None).cast("string").alias("event_type"),
            "n_events",
            F.lit(None).cast("double").alias("sum_value"),
        )
        return t.unionByName(s)

    def q_sessions_props(spark, sf):
        # session windows + JSON-props agg in one tagged result (merged
        # r2 — same 50-query-cap motivation as q_windows above; both
        # halves stay individually oracle-checked through the union)
        ev = _ev(spark, sf)
        s = session_agg(ev).select(
            F.lit("session").alias("kind"),
            "user_id",
            F.lit(None).cast("string").alias("event_type"),
            F.col("session_start").alias("t0"),
            "n_events",
            F.lit(None).cast("long").alias("sum_k"),
            F.lit(None).cast("double").alias("avg_k"),
        )
        p = json_props_agg(ev).select(
            F.lit("props").alias("kind"),
            F.lit(None).cast("long").alias("user_id"),
            "event_type",
            F.lit(None).cast("timestamp").alias("t0"),
            "n_events",
            "sum_k",
            "avg_k",
        )
        return s.unionByName(p)

    return {
        "events_windows": q_windows,
        "events_sessions_props": q_sessions_props,
    }


def events_oracles() -> dict[str, str]:
    return {
        # tumbling rows + sliding rows (each event belongs to 2
        # one-hour windows on a 30-min grid: the one starting at its
        # 30-min bucket and the previous one)
        "events_windows": """
SELECT 'tumbling' AS kind, time_bucket(INTERVAL '1 hour', ts) AS window_start, event_type,
       count(*)::BIGINT AS n_events, round(sum(value), 6) AS sum_value
FROM events GROUP BY 2, 3
UNION ALL
SELECT 'sliding' AS kind, w AS window_start, CAST(NULL AS VARCHAR) AS event_type,
       count(*)::BIGINT AS n_events, CAST(NULL AS DOUBLE) AS sum_value
FROM (
  SELECT time_bucket(INTERVAL '30 minutes', ts) AS w FROM events
  UNION ALL
  SELECT time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes' FROM events
)
GROUP BY 2
""",
        # session half: gaps-and-islands with a 10-minute gap;
        # props half: JSON-path extraction agg
        "events_sessions_props": """
WITH d AS (
  SELECT user_id, ts,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL '10 minutes'
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), g AS (
  SELECT user_id, ts,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
  FROM d
)
SELECT 'session' AS kind, user_id, CAST(NULL AS VARCHAR) AS event_type,
       min(ts) AS t0, count(*)::BIGINT AS n_events,
       CAST(NULL AS BIGINT) AS sum_k, CAST(NULL AS DOUBLE) AS avg_k
FROM g GROUP BY user_id, sid
UNION ALL
SELECT 'props' AS kind, CAST(NULL AS BIGINT) AS user_id, event_type,
       CAST(NULL AS TIMESTAMP) AS t0, count(*)::BIGINT AS n_events,
       sum(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS sum_k,
       round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 6) AS avg_k
FROM events GROUP BY 3
""",
    }
