"""EP1/EP2 pipeline composition end-to-end."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_integration_and_harmonization_spark.plans import run_harmonization_pipeline


def test_pipeline_parity_mode(spark, sf_dir):
    res = run_harmonization_pipeline(
        spark,
        paths=[f"{sf_dir}/customer.parquet", f"{sf_dir}/supplier.parquet"],
    )
    try:
        # coerce mode: every surviving column is numeric (strings
        # cascaded out), scaled to ~0 mean
        assert res.cleaned.count() == 160
        num_cols = [c for c in res.preprocessed.columns if not c.startswith("_")]
        means = res.preprocessed.agg(
            *[F.avg(c).alias(c) for c in num_cols]
        ).first()
        for c in num_cols:
            assert abs(means[c]) < 1e-6, c
        assert res.summary_numeric.count() > 0
        # no string columns -> empty object summary
        assert res.summary_object.count() == 0
        assert res.label_encoders == {}
    finally:
        res.unpersist()


def test_pipeline_strict_mode(spark, sf_dir):
    res = run_harmonization_pipeline(
        spark,
        paths=[f"{sf_dir}/customer.parquet", f"{sf_dir}/supplier.parquet"],
        coerce=False,
    )
    try:
        # strict mode: string columns survive and are label-encoded
        assert set(res.label_encoders) >= {"c_name", "c_mktsegment", "s_name"}
        enc_types = dict(res.preprocessed.dtypes)
        assert enc_types["c_mktsegment"] == "bigint"
    finally:
        res.unpersist()


def test_integration_funnel_stages_and_survivorship(spark):
    from pyspark.sql import functions as F

    from data_integration_and_harmonization_spark.plans.pipeline import (
        integration_funnel,
        locale_money_str,
    )

    # keys 0..11: A = even {0,2,4,6,8,10}, B = %3 {0,3,6,9},
    # overlap {0,6} where A (authoritative) must win -> golden sum =
    # sum(bal over A keys) + sum(bal+1000 over B-only keys {3,9})
    rows = [(i, f"Customer#{i}", i % 3, float(100 * i) + 0.5 + (-200.0 if i == 4 else 0.0), "SEG")
            for i in range(12)]
    cust = spark.createDataFrame(
        rows, "c_custkey long, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string"
    )
    got = {r["stage"]: (r["n_rows"], r["checksum"])
           for r in integration_funnel(cust).collect()}
    assert got["src_a"] == (6, None)
    assert got["src_b"] == (4, None)
    assert got["harmonized"] == (10, None)
    assert got["parsed_ok"] == (10, None)   # every messy string parses
    a_keys = [0, 2, 4, 6, 8, 10]
    b_only = [3, 9]
    want = sum(100 * i + 0.5 + (-200.0 if i == 4 else 0.0) for i in a_keys) + sum(
        100 * i + 0.5 + 1000.0 for i in b_only
    )
    n, checksum = got["golden"]
    assert n == 8 and checksum == round(want, 2)
    # survivorship provenance: only the B-only keys {3, 9} took their
    # balance from the secondary source
    assert got["golden_from_b"] == (2, None)

    # the messy render is sign-aware; EU groups like format_number,
    # the plain form is ungrouped (byte-identical to the oracle's
    # ip::VARCHAR render — r9 advice)
    s = cust.select(
        locale_money_str(F.lit(-1234.56), eu=True).alias("eu"),
        locale_money_str(F.lit(9999.99)).alias("us"),
    ).first()
    assert s["eu"] == "-1.234,56" and s["us"] == "9999.99"
