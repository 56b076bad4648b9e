"""Pipeline composition (the reference's entry-point flows, SURVEY §3)."""

from data_integration_and_harmonization_spark.plans.pipeline import (
    HarmonizationResult,
    run_harmonization_pipeline,
)

__all__ = ["HarmonizationResult", "run_harmonization_pipeline"]
