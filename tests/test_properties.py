"""Property-based tests (SURVEY §5.4): harmonize schema-union order
insensitivity, z-score normalization invariants, interpolation
non-null preservation. Small example counts — each example spins Spark
jobs."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from data_integration_and_harmonization_spark.operators import clean as C
from data_integration_and_harmonization_spark.operators import features as FE
from data_integration_and_harmonization_spark.operators import harmonize as H

SET = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

vals = st.lists(
    st.one_of(st.none(), st.floats(-1e6, 1e6, allow_nan=False)), min_size=2, max_size=12
)


@given(vals)
@SET
def test_interpolate_preserves_valid_values(spark, xs):
    df = spark.createDataFrame([(i, v) for i, v in enumerate(xs)], "pos long, v double")
    out = {r["pos"]: r["v"] for r in C.interpolate_linear(df, "pos", ["v"], num_partitions=3).collect()}
    for i, v in enumerate(xs):
        if v is not None:
            assert out[i] is not None and abs(out[i] - v) < 1e-9
    # clamp property: every output lies within [min, max] of the valid inputs
    valid = [v for v in xs if v is not None]
    if valid:
        lo, hi = min(valid), max(valid)
        for v in out.values():
            assert v is None or (lo - 1e-9 <= v <= hi + 1e-9)


@given(st.lists(st.floats(-1e4, 1e4, allow_nan=False), min_size=3, max_size=20))
@SET
def test_zscore_normalizes(spark, xs):
    df = spark.createDataFrame([(float(x),) for x in xs], "v double")
    out = [r["v"] for r in FE.zscore(df, ["v"]).collect()]
    mean = sum(out) / len(out)
    assert abs(mean) < 1e-6
    if len(set(xs)) > 1:
        pstd = math.sqrt(sum((x - mean) ** 2 for x in out) / len(out))
        assert abs(pstd - 1.0) < 1e-6


@given(
    st.lists(
        st.sampled_from(["a", "b", "c d", "E f"]), min_size=1, max_size=4, unique=True
    )
)
@SET
def test_harmonize_schema_order_insensitive(spark, names):
    a = spark.createDataFrame([tuple(range(len(names)))], names)
    b = spark.createDataFrame([tuple(range(len(names)))], list(reversed(names)))
    u1 = H.harmonize([a, b])
    u2 = H.harmonize([b, a])
    assert set(u1.columns) == set(u2.columns)
    assert u1.count() == u2.count() == 2
