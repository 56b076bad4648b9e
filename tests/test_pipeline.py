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
