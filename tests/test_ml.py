"""M1-M10: model zoo, metrics ranges, tuning path, model sink."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.ml.tuning import ParamGridBuilder
from pyspark.sql import functions as F

from data_integration_and_harmonization_spark.operators import ml as ML


def _labeled(spark, sf_dir, classification):
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .where(F.col("l_orderkey") % 5 == 0)
        .select("l_quantity", "l_discount", "l_tax", "l_extendedprice", "l_returnflag")
    )
    if classification:
        return li.select(
            "l_quantity",
            "l_discount",
            "l_tax",
            (F.col("l_returnflag") == "A").cast("int").alias("target"),
        )
    return li.select("l_quantity", "l_discount", "l_tax", "l_extendedprice")


def test_missing_target_raises(spark, sf_dir):
    df = _labeled(spark, sf_dir, True)
    with pytest.raises(ValueError, match="not found"):
        ML.train_models(df, "nope", True)


def test_classification_metrics_ranges(spark, sf_dir):
    res = ML.train_models(_labeled(spark, sf_dir, True), "target", True)
    assert set(res) == {"Decision Tree", "Random Forest", "XGBoost"}
    for metrics in res.values():
        assert set(metrics) == {"Accuracy", "Precision", "Recall", "F1 Score"}
        for v in metrics.values():
            assert 0.0 <= v <= 1.0


def test_regression_metrics_shape(spark, sf_dir):
    res = ML.train_models(
        _labeled(spark, sf_dir, False), "l_extendedprice", False
    )
    for metrics in res.values():
        assert set(metrics) == {"MAE", "MSE", "R2 Score"}
        assert metrics["MAE"] >= 0 and metrics["MSE"] >= 0
        assert metrics["R2 Score"] <= 1.0


def test_determinism_under_seed(spark, sf_dir):
    df = _labeled(spark, sf_dir, False)
    a = ML.train_models(df, "l_extendedprice", False, seed=42)
    b = ML.train_models(df, "l_extendedprice", False, seed=42)
    assert a["Decision Tree"]["MSE"] == b["Decision Tree"]["MSE"]


def test_tuning_path_with_small_grid(spark, sf_dir):
    """M7: CrossValidator wiring, pruned grid for test speed (the
    ref:72-81 grid is the default at pipeline level)."""
    from pyspark.ml.regression import RandomForestRegressor

    probe = RandomForestRegressor()
    grid = (
        ParamGridBuilder()
        .addGrid(probe.numTrees, [5, 10])
        .build()
    )
    res = ML.train_models(
        _labeled(spark, sf_dir, False),
        "l_extendedprice",
        False,
        hyperparameter_tuning=True,
        param_grids={"Random Forest": grid},
    )
    # RF tuned, DT fit untuned (no grid) — all three still evaluated
    assert set(res) == {"Decision Tree", "Random Forest", "XGBoost"}


def test_ref_grid_mapping():
    """The default grids mirror ref:72-81 (n_estimators/max_depth,
    learning_rate/n_estimators)."""
    from pyspark.ml.regression import GBTRegressor, RandomForestRegressor

    rf_grid = ML._param_grid("Random Forest", RandomForestRegressor())
    assert len(rf_grid) == 9  # 3 numTrees x 3 maxDepth
    gbt_grid = ML._param_grid("XGBoost", GBTRegressor())
    assert len(gbt_grid) == 6  # 2 stepSize x 3 maxIter
    assert ML._param_grid("Decision Tree", None) is None


def test_model_sink_roundtrip(spark, sf_dir):
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.regression import DecisionTreeRegressor

    df = _labeled(spark, sf_dir, False).withColumnRenamed("l_extendedprice", "label")
    pipe = Pipeline(
        stages=[
            VectorAssembler(
                inputCols=["l_quantity", "l_discount", "l_tax"], outputCol="features"
            ),
            DecisionTreeRegressor(seed=1),
        ]
    )
    fitted = pipe.fit(df)
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/model"
        ML.save_model(fitted, path)
        loaded = ML.load_model(path)
        a = fitted.transform(df).agg(F.sum("prediction")).first()[0]
        b = loaded.transform(df).agg(F.sum("prediction")).first()[0]
        assert abs(a - b) < 1e-9
