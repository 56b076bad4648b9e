"""The optional distributed-XGBoost wiring (M4): when the public
``xgboost.spark`` package is importable the model zoo must pick it up,
with the ref:72-81 grid mapped onto its param names; when absent, the
GBT fallback stands. The real package isn't in this environment, so a
fake module pins the dispatch path."""

from __future__ import annotations

import sys
import types

import pytest

from data_integration_and_harmonization_spark.operators import ml as ML


def _fake_param(name):
    # a REAL pyspark Param (ParamGridBuilder type-checks), parented to
    # the dummy Params holder like pyspark's own class-level params
    from pyspark.ml.param import Param, Params

    return Param(Params._dummy(), name, f"fake {name}")


class _FakeSparkXGB:
    def __init__(self, random_state=0):
        self.random_state = random_state
        # xgboost.spark exposes sklearn-style names, not Spark ML ones
        self.learning_rate = _fake_param("learning_rate")
        self.n_estimators = _fake_param("n_estimators")

    def setLabelCol(self, c):
        self.label_col = c
        return self


@pytest.fixture()
def fake_xgboost(monkeypatch):
    spark_mod = types.ModuleType("xgboost.spark")
    spark_mod.SparkXGBClassifier = _FakeSparkXGB
    spark_mod.SparkXGBRegressor = _FakeSparkXGB
    xgb_mod = types.ModuleType("xgboost")
    xgb_mod.spark = spark_mod
    monkeypatch.setitem(sys.modules, "xgboost", xgb_mod)
    monkeypatch.setitem(sys.modules, "xgboost.spark", spark_mod)


def test_zoo_without_xgboost_falls_back_to_gbt(spark):
    # spark fixture required: Spark ML estimators need a live context
    zoo = ML._model_zoo(is_classification=True, seed=7)
    assert type(zoo["XGBoost"]).__name__ == "GBTClassifier"
    zoo = ML._model_zoo(is_classification=False, seed=7)
    assert type(zoo["XGBoost"]).__name__ == "GBTRegressor"


def test_zoo_prefers_spark_xgboost_when_importable(fake_xgboost):
    for is_cls in (True, False):
        zoo = ML._model_zoo(is_classification=is_cls, seed=7)
        assert isinstance(zoo["XGBoost"], _FakeSparkXGB)
        assert zoo["XGBoost"].random_state == 7


def test_xgb_grid_maps_sklearn_param_names(fake_xgboost):
    model = ML._model_zoo(is_classification=True, seed=7)["XGBoost"]
    grid = ML.tuning_grid("XGBoost", model)
    # ref:72-81: learning_rate in {0.01, 0.1} x n_estimators in
    # {50, 100, 200} -> 6 param maps over the instance's own params
    assert len(grid) == 6
    names = {p.name for pm in grid for p in pm}
    assert names == {"learning_rate", "n_estimators"}
