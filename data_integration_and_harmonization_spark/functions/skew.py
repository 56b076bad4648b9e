"""Skew mitigation: salted joins.

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
