"""Skew diagnostics and mitigation: hot-key reports and salted joins.

AQE's skew-join splitting (enabled in the engine session) handles most
skew at runtime; explicit salting remains the tool when one join key
dominates so heavily that even split partitions bottleneck, or when
AQE is unavailable (streaming joins).

Pattern: the big side scatters each hot key across ``salt`` synthetic
sub-keys; the small side replicates ``salt`` times. The join fans the
hot key over ``salt`` tasks; correctness is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT = "__dih_salt"


def key_skew_report(df: DataFrame, key_cols: list[str], top_n: int = 5) -> DataFrame:
    """Hot-key diagnostic — the report you run BEFORE choosing a
    mitigation (salt fan-out, AQE skew thresholds, broadcast).

    Output: the ``top_n`` heaviest keys, one row each, with
    ``(key, n_rows, share, x_mean, n_groups)`` — ``share`` is the key's
    fraction of all rows, ``x_mean`` its size relative to the mean
    group (the top row's ``x_mean`` IS the skew factor), ``n_groups``
    the total distinct-key count (constant across rows).

    Scale shape: ONE map-side-combined grouped count over the keys (the
    only corpus-sized work), a 1-row global summary broadcast back, and
    a bounded top-n merge — nothing is collected, and the report cost
    is that of a single ``groupBy(...).count()``.
    """
    key = F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
    counts = df.groupBy(key.alias("key")).agg(F.count(F.lit(1)).alias("n_rows"))
    tot = counts.agg(
        F.sum("n_rows").cast("double").alias("n_total"),
        F.count(F.lit(1)).alias("n_groups"),
        F.avg("n_rows").alias("avg_rows"),
    )
    return (
        counts.orderBy(F.desc("n_rows"), "key")
        .limit(top_n)
        .crossJoin(F.broadcast(tot))
        .select(
            "key",
            "n_rows",
            F.round(F.col("n_rows") / F.col("n_total"), 6).alias("share"),
            F.round(F.col("n_rows") / F.col("avg_rows"), 6).alias("x_mean"),
            "n_groups",
        )
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated.

    The salt is derived from a hash of the big side's full row (stable,
    no RNG state), so the same row always lands on the same sub-key —
    results are deterministic and exactly equal to the unsalted join.
    """
    big_s = big.withColumn(
        SALT, F.pmod(F.hash(*[F.col(c) for c in big.columns]), F.lit(salt))
    )
    small_s = small.withColumn(
        SALT, F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = big_s.join(small_s, [*on, SALT], how)
    return out.drop(SALT)
