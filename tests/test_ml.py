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


def test_tuning_grid_unwraps_onevsrest():
    """Multiclass GBT is OneVsRest-wrapped BEFORE grid resolution; the
    grid must come from the inner classifier or tuning silently
    degrades to an untuned fit (r1 VERDICT bug)."""
    from pyspark.ml.classification import GBTClassifier, OneVsRest

    ovr = OneVsRest(classifier=GBTClassifier())
    grid = ML.tuning_grid("XGBoost", ovr)
    assert grid is not None and len(grid) == 6  # 2 stepSize x 3 maxIter
    # and the unwrapped form agrees
    assert len(ML.tuning_grid("XGBoost", GBTClassifier())) == 6


def test_exact_split_counts_and_determinism(spark, sf_dir):
    """M1 parity variant (ref:62): exactly floor(n/5) held out, same
    rows on every run (rank over a unique composite key)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_extendedprice"
    )
    key = ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "l_extendedprice"]
    n = li.count()
    s1 = ML.exact_split(li, key, k=5)
    n_test = s1.where("is_test").count()
    assert n_test == (n + 4) // 5  # positions 0, 5, 10, ... => ceil(n/5)
    held1 = sorted(r["l_orderkey"] * 10 + r["l_linenumber"] for r in s1.where("is_test").collect())
    held2 = sorted(
        r["l_orderkey"] * 10 + r["l_linenumber"]
        for r in ML.exact_split(li, key, k=5).where("is_test").collect()
    )
    assert held1 == held2


def test_resolve_grid_rekeys_foreign_params():
    """pyspark silently drops extra params whose parent uid isn't the
    fitted estimator's — grids from a probe instance never applied
    (verified empirically). _resolve_grid re-keys by name / accepts
    {name: values} dicts so user grids actually tune."""
    from pyspark.ml.classification import GBTClassifier, OneVsRest
    from pyspark.ml.regression import RandomForestRegressor

    zoo = RandomForestRegressor(seed=1)
    probe = RandomForestRegressor()
    foreign = ParamGridBuilder().addGrid(probe.numTrees, [3, 7]).build()
    fixed = ML._resolve_grid(foreign, zoo)
    assert all(param.parent == zoo.uid for pm in fixed for param in pm)
    assert sorted(v for pm in fixed for v in pm.values()) == [3, 7]

    abstract = ML._resolve_grid({"numTrees": [3, 7]}, zoo)
    assert all(param.parent == zoo.uid for pm in abstract for param in pm)

    # OneVsRest wrapping: grid lands on the inner classifier
    ovr = OneVsRest(classifier=GBTClassifier())
    g = ML._resolve_grid({"maxIter": [5]}, ovr)
    assert list(g[0])[0].parent == ovr.getClassifier().uid


def test_quality_classifier_learns_weak_labels(spark):
    # two clearly-separable populations: long clean prose vs short
    # junk — the heuristic teacher labels them apart and the hashed
    # TF-IDF LR must recover that signal on the deterministic holdout
    good = "the quick brown fox jumps over the lazy dog near the river bank " * 4
    bad = "@@## zz"
    docs = spark.createDataFrame(
        [(i, good + f" marker{i}") for i in range(60)]
        + [(i + 60, bad + f" junk{i}") for i in range(60)],
        "doc_id long, text string",
    )
    from data_integration_and_harmonization_spark.operators.ml import (
        quality_classifier,
    )

    m = quality_classifier(docs)
    assert m["BeatsMajority"] == 1.0
    assert m["HoldoutAccuracy"] > 0.8
    assert 0.0 <= m["AreaUnderROC"] <= 1.0
    # deterministic split + fit: a second run reproduces the metrics
    assert quality_classifier(docs) == m


def test_group_split_leakage_guarantee(spark, sf_dir):
    """group_split: every row of a group lands in ONE fold (the
    leakage guarantee), folds are deterministic across runs, and the
    assignment is reasonably balanced on real keys."""
    from pyspark.sql import functions as F

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    g = ML.group_split(li, ["l_orderkey"], k=5)
    span = (
        g.groupBy("l_orderkey")
        .agg(F.countDistinct("fold").alias("nf"))
        .where(F.col("nf") > 1)
        .count()
    )
    assert span == 0
    sizes = {r["fold"]: r["n"] for r in g.groupBy("fold").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(sizes) == {0, 1, 2, 3, 4}
    n = li.count()
    # hash balance: each fold within 3x of the uniform share on real keys
    assert all(n / 15 < v < 3 * n / 5 for v in sizes.values()), sizes
    # deterministic: same assignment on a second run
    a = {r["l_orderkey"]: r["fold"] for r in g.select("l_orderkey", "fold").distinct().collect()}
    g2 = ML.group_split(li, ["l_orderkey"], k=5)
    b = {r["l_orderkey"]: r["fold"] for r in g2.select("l_orderkey", "fold").distinct().collect()}
    assert a == b
    # different seed reassigns some groups
    g3 = ML.group_split(li, ["l_orderkey"], k=5, seed=7)
    c = {r["l_orderkey"]: r["fold"] for r in g3.select("l_orderkey", "fold").distinct().collect()}
    assert a != c
