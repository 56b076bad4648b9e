"""P1/U1 semantics (ref:20-23), pinned against verified pandas behavior."""

from __future__ import annotations

from pyspark.sql import types as T

from data_integration_and_harmonization_spark.operators import harmonize as H


def test_normalize_columns_dedupes(spark):
    df = spark.createDataFrame([(1, 2, 3)], ["A b", "a B", "c"])
    out = H.normalize_columns(df)
    assert out.columns == ["a_b", "a_b__2", "c"]


def test_union_by_name_fills_missing_with_null(spark):
    a = spark.createDataFrame([(1, "x")], ["k", "s"])
    b = spark.createDataFrame([(2.5,)], ["K"])
    out = H.harmonize([a, b])
    rows = sorted(out.collect(), key=lambda r: r["k"])
    # k: int + double -> double (pandas upcast)
    assert dict(out.dtypes)["k"] == "double"
    assert rows[0]["k"] == 1.0 and rows[0]["s"] == "x"
    assert rows[1]["k"] == 2.5 and rows[1]["s"] is None


def test_type_promotion_conflict_falls_back_to_string(spark):
    a = spark.createDataFrame([(1,)], ["v"])
    b = spark.createDataFrame([("x",)], ["v"])
    out = H.harmonize([a, b])
    assert dict(out.dtypes)["v"] == "string"
    assert {r["v"] for r in out.collect()} == {"1", "x"}


def test_ingest_index_is_load_order(spark):
    a = spark.createDataFrame([(i,) for i in range(5)], ["v"])
    b = spark.createDataFrame([(10 + i,) for i in range(5)], ["v"])
    out = H.harmonize([a, b], add_ingest_index=True)
    rows = sorted(out.collect(), key=lambda r: r[H.INGEST_INDEX])
    idx = [r[H.INGEST_INDEX] for r in rows]
    assert idx == list(range(10))
    # source 0's rows all precede source 1's
    assert [r[H.INGEST_SOURCE] for r in rows] == [0] * 5 + [1] * 5


def test_harmonize_order_insensitive_schema(spark):
    a = spark.createDataFrame([(1, "x")], ["k", "s"])
    b = spark.createDataFrame([("y", 2)], ["s", "k"])
    out = H.harmonize([a, b])
    assert set(out.columns) == {"k", "s"}
    assert isinstance(out.schema["k"].dataType, T.LongType)


def test_type_promotion_decimal_pairs():
    """Decimal+Decimal of differing precision/scale merges to double
    (pandas concat upcasts to float64) — not the string fallback; and
    decimal+int / decimal+float also land on double."""
    from pyspark.sql import types as T

    assert H._promote(T.DecimalType(12, 2), T.DecimalType(18, 4)) == T.DoubleType()
    assert H._promote(T.DecimalType(12, 2), T.LongType()) == T.DoubleType()
    assert H._promote(T.DoubleType(), T.DecimalType(10, 0)) == T.DoubleType()
    # same decimal on both sides stays itself
    assert H._promote(T.DecimalType(12, 2), T.DecimalType(12, 2)) == T.DecimalType(12, 2)


def test_schema_match_evidence(spark):
    from data_integration_and_harmonization_spark.operators.harmonize import (
        levenshtein,
        name_similarity,
        schema_match,
    )

    a = spark.createDataFrame(
        [(1, "x", 1.5), (2, "y", 2.5), (3, "z", 3.5)],
        "c_key long, c_tag string, c_bal double",
    )
    b = spark.createDataFrame(
        [(2, "y"), (3, "q"), (4, "r")], "s_key long, s_tag string"
    )
    out = {(r["col_a"], r["col_b"]): r for r in schema_match(a, b).collect()}
    # numeric x numeric and string x string pairs only
    assert set(out) == {
        ("c_key", "s_key"), ("c_bal", "s_key"), ("c_tag", "s_tag")
    }
    k = out[("c_key", "s_key")]
    # values {1,2,3} vs {2,3,4}: |∩|=2, |∪|=4
    assert (k["n_a"], k["n_b"], k["n_common"]) == (3, 3, 2)
    assert k["jaccard"] == 0.5
    assert k["name_sim"] == 1.0  # prefix-stripped names both 'key'
    assert k["score"] == round(0.6 * 0.5 + 0.4 * 1.0, 6)
    # float column: no canonical rendering -> null overlap evidence,
    # score falls back to name similarity alone
    bal = out[("c_bal", "s_key")]
    assert bal["n_a"] is None and bal["jaccard"] is None
    assert bal["score"] == round(0.4 * name_similarity("c_bal", "s_key"), 6)
    t = out[("c_tag", "s_tag")]
    assert (t["n_common"], t["jaccard"]) == (1, round(1 / 5, 6))
    # helper sanity
    assert levenshtein("kitten", "sitting") == 3
    assert name_similarity("Nation Key", "s_nation_key") == 1.0
