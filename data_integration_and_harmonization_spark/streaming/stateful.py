"""Custom stateful streaming operators.

Two levels, matching Structured Streaming's own layering:

- declarative state: streaming dedup via
  ``dropDuplicatesWithinWatermark`` — exact-dedup over an unbounded
  stream with bounded state (ids older than the watermark are evicted).
- arbitrary state: ``applyInPandasWithState`` — per-key user-defined
  state updated one Arrow batch at a time. The example operator keeps
  per-user running (count, sum, mean) across micro-batches: the state
  survives between batches, which no stateless agg can express with
  update-as-you-go output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def dedup_stream(events: DataFrame, id_cols: list[str], watermark_col: str, delay: str = "1 hour") -> DataFrame:
    """Streaming exact dedup: one output row per distinct ``id_cols``
    within the watermark horizon; state is bounded by eviction."""
    from data_integration_and_harmonization_spark.streaming.pipeline import ensure_event_time

    return (
        ensure_event_time(events, watermark_col)
        .withWatermark(watermark_col, delay)
        .dropDuplicatesWithinWatermark(id_cols)
    )


USER_STATS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("mean_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [T.StructField("n", T.LongType()), T.StructField("s", T.DoubleType())]
)


def _update_user_stats(key, pdfs, state: GroupState):
    """Per-user running stats; state = (count, sum) carried across
    micro-batches. Emits the updated row once per batch per key."""
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    import pandas as pd

    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_value": [s],
            "mean_value": [s / n if n else None],
        }
    )


def user_running_stats(events: DataFrame) -> DataFrame:
    """Arbitrary-stateful per-user aggregation over a stream: Arrow
    batches in, explicit state carried between micro-batches."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_user_stats,
            outputStructType=USER_STATS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
