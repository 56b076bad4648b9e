"""Profiling aggregations (reference C6 ``describe(include='all')``
ref:33, and A6 correlation matrix ref:153-157).

All single-pass or two-pass whole-table aggregations — map-side
combinable, no per-column jobs, no driver loops over data.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_integration_and_harmonization_spark.operators.clean import numeric_cols, string_cols


def describe_numeric(
    df: DataFrame, cols: Sequence[str] | None = None, exact_quantiles: bool = True
) -> DataFrame:
    """Numeric side of ref:33 ``describe``: one row per column with
    ``count, mean, std, min, 25%, 50%, 75%, max``.

    pandas uses sample std (ddof=1) and linearly-interpolated
    quantiles; Spark's ``stddev`` and exact ``percentile`` match both.
    ``exact_quantiles=False`` switches to ``percentile_approx`` — the
    right default at 100 TB, where exact percentile's full sort per
    column is the bottleneck; exact is kept for oracle parity.

    Output: (column, count, mean, std, min, p25, p50, p75, max).
    """
    cols = list(cols if cols is not None else numeric_cols(df))
    pct = F.percentile if exact_quantiles else F.percentile_approx
    aggs = []
    for c in cols:
        col = F.col(c).cast("double")
        aggs.append(
            F.struct(
                F.count(col).alias("count"),
                F.avg(col).alias("mean"),
                F.stddev(col).alias("std"),
                F.min(col).alias("min"),
                pct(col, F.lit(0.25)).alias("p25"),
                pct(col, F.lit(0.5)).alias("p50"),
                pct(col, F.lit(0.75)).alias("p75"),
                F.max(col).alias("max"),
            ).alias(c)
        )
    row = df.agg(*aggs)
    # Unpivot the single stats row to long format: one output row per column.
    stacked = row.select(
        F.explode(
            F.array(*[F.struct(F.lit(c).alias("column"), F.col(c).alias("s")) for c in cols])
        ).alias("e")
    )
    return stacked.select(
        F.col("e.column").alias("column"),
        F.col("e.s.count").alias("count"),
        F.col("e.s.mean").alias("mean"),
        F.col("e.s.std").alias("std"),
        F.col("e.s.min").alias("min"),
        F.col("e.s.p25").alias("p25"),
        F.col("e.s.p50").alias("p50"),
        F.col("e.s.p75").alias("p75"),
        F.col("e.s.max").alias("max"),
    )


def describe_object(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Object side of ref:33 ``describe``: per string column
    ``count, unique, top, freq``.

    ``top`` tie-break: pandas' is arbitrary (hash order); the engine
    pins lexicographically-smallest-among-most-frequent so results are
    deterministic and oracle-checkable (documented divergence).

    One grouped count per column, unioned into a single plan; each
    ``groupBy(c)`` is a standard partial-agg shuffle on that column.
    """
    cols = list(cols if cols is not None else string_cols(df))
    if not cols:
        return df.sparkSession.createDataFrame(
            [], "column string, count long, unique long, top string, freq long"
        )
    per_col = []
    for c in cols:
        counts = (
            df.where(F.col(c).isNotNull())
            .groupBy(F.col(c).alias("value"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        per_col.append(
            counts.agg(
                F.lit(c).alias("column"),
                F.sum("n").alias("count"),
                F.count(F.lit(1)).alias("unique"),
                # min over (-n, value): highest count, then smallest value
                F.min_by("value", F.struct((-F.col("n")).alias("nn"), F.col("value"))).alias("top"),
                F.max("n").alias("freq"),
            )
        )
    return reduce(DataFrame.unionByName, per_col)


def corr_matrix(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """A6 (ref:153-157): Pearson correlation of every numeric column
    pair, pairwise-complete null handling, as ONE aggregation pass.

    Spark's ``corr`` aggregate skips null pairs — exactly pandas'
    pairwise-complete semantics. (``ml.stat.Correlation`` on an
    assembled vector does listwise deletion and would NOT match.)

    The reference computes this via ``data.corr()`` as an O(cols^2)
    pandas pass; here all C(n,2) cells are computed in a single
    map-side-combinable agg over one scan.

    Output long format: (col_x, col_y, corr) for x <= y.
    """
    cols = list(cols if cols is not None else numeric_cols(df))
    aggs = []
    names = []
    for i, ci in enumerate(cols):
        for cj in cols[i:]:
            names.append((ci, cj))
            aggs.append(F.corr(F.col(ci).cast("double"), F.col(cj).cast("double")).alias(f"__c_{len(names)}"))
    row = df.agg(*aggs)
    pairs = row.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(ci).alias("col_x"),
                        F.lit(cj).alias("col_y"),
                        F.col(f"__c_{k + 1}").alias("corr"),
                    )
                    for k, (ci, cj) in enumerate(names)
                ]
            )
        ).alias("e")
    )
    return pairs.select("e.col_x", "e.col_y", "e.corr")
