"""Distributed row-index synthesis.

The reference's order-sensitive ops (linear interpolation ``ref:30``,
ffill ``ref:31``) are defined over pandas' implicit positional row
order. Spark has no row order, so the engine makes the order explicit:
a contiguous 0..n-1 position column computed WITHOUT a single-task
global window.

Pattern (standard distributed scan-fix):
  1. ``repartitionByRange`` on the ordering key -> partitions hold
     contiguous, sorted key ranges (partition i < partition i+1).
  2. per-partition ``row_number`` (narrow window inside a partition).
  3. one tiny job collects per-partition counts; cumulative offsets are
     broadcast-joined back.

Cost: one extra lightweight count job; no stage is single-task, so the
pattern holds at 1000 executors / 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PID = "__dih_pid"
POS = "__dih_pos"


def _range_partitioned(df: DataFrame, order_cols: list[str], num_partitions: int | None) -> DataFrame:
    n = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    cols = [F.col(c) for c in order_cols]
    return df.repartitionByRange(n, *cols).withColumn(PID, F.spark_partition_id())


def with_global_index(
    df: DataFrame,
    order_cols: list[str],
    index_col: str = POS,
    num_partitions: int | None = None,
) -> DataFrame:
    """Add a contiguous 0-based position column ordered by ``order_cols``.

    ``order_cols`` must be a (composite) unique key for the result to be
    deterministic — ties may land on either side of a range-partition
    boundary.
    """
    part = _range_partitioned(df, order_cols, num_partitions)
    w = Window.partitionBy(PID).orderBy(*[F.col(c) for c in order_cols])
    part = part.withColumn("__dih_rn", F.row_number().over(w))

    # repartitionByRange samples fresh range boundaries on EVERY job, so
    # the count job below and the consumer's later actions would see
    # different partitionings. Persist pins one physical partitioning
    # (same reason Spark's own RDD.zipWithIndex materializes first).
    part = part.persist()

    # Tiny job: one row per partition; offsets computed driver-side.
    counts = {
        r[PID]: r["cnt"]
        for r in part.groupBy(PID).agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    spark = df.sparkSession
    offset_df = spark.createDataFrame(
        [(int(pid), int(off)) for pid, off in offsets.items()], f"{PID} int, __dih_off long"
    )
    out = (
        part.join(F.broadcast(offset_df), PID)
        .withColumn(index_col, (F.col("__dih_rn") - 1 + F.col("__dih_off")).cast("long"))
        .drop("__dih_rn", "__dih_off", PID)
    )
    return out
