"""End-to-end pipeline composition — the engine's public flow
mirroring the reference's EP1/EP2 (ref:160-233 / ref:20-52):

    ingest -> harmonize -> clean -> profile -> preprocess -> [train]

Where the reference eagerly materializes a pandas frame per arrow
(re-running EVERYTHING on every Streamlit interaction, ref:160-233),
the engine builds ONE lazy plan per stage chain and persists exactly
two checkpoints — the harmonized table and the cleaned table — the
two results every downstream consumer (profiling, EDA, ML) fans out
from. That replaces the reference's worst-case full recompute with
compute-once/reuse-many.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.storagelevel import StorageLevel

from data_integration_and_harmonization_spark.operators import clean as C
from data_integration_and_harmonization_spark.operators import features as FE
from data_integration_and_harmonization_spark.operators import harmonize as H
from data_integration_and_harmonization_spark.operators import profile as P
from data_integration_and_harmonization_spark.sources import readers as R


@dataclass
class HarmonizationResult:
    """Outputs of the harmonization flow (the reference returns
    (processed_data, summary_statistics, label_encoders) across
    ref:195-198; this is the engine's typed equivalent)."""

    harmonized: DataFrame
    cleaned: DataFrame
    preprocessed: DataFrame
    summary_numeric: DataFrame
    summary_object: DataFrame
    label_encoders: dict[str, DataFrame] = field(default_factory=dict)

    def unpersist(self) -> None:
        for df in (self.harmonized, self.cleaned):
            df.unpersist()


def run_harmonization_pipeline(
    spark: SparkSession,
    paths: Sequence[str] | None = None,
    dfs: Sequence[DataFrame] | None = None,
    coerce: bool = True,
    scale: bool = True,
    encode: bool = True,
) -> HarmonizationResult:
    """EP1/EP2 as one composition.

    ``coerce=True`` is reference-parity mode (C1's lossy numeric
    coercion, which silently drops pure-categorical columns via the
    C1+C5 cascade); ``coerce=False`` is strict mode — strings survive
    and get label-encoded instead.
    """
    if dfs is None:
        if not paths:
            raise ValueError("need paths or dfs")
        dfs = R.read_sources(spark, paths)

    harmonized = H.harmonize(dfs, add_ingest_index=True).persist(
        StorageLevel.MEMORY_AND_DISK
    )

    cleaned = C.process_data(
        harmonized.drop(H.INGEST_SOURCE), order_col=H.INGEST_INDEX, coerce=coerce
    ).persist(StorageLevel.MEMORY_AND_DISK)

    profile_input = cleaned.drop(H.INGEST_INDEX)
    summary_numeric = P.describe_numeric(profile_input)
    summary_object = P.describe_object(profile_input)

    pre = cleaned
    encoders: dict[str, DataFrame] = {}
    if scale:
        pre = FE.zscore_transform(
            pre, FE.zscore_fit(pre, [c for c in C.numeric_cols(pre) if c != H.INGEST_INDEX])
        )
    if encode:
        pre, encoders = FE.label_encode(pre)

    return HarmonizationResult(
        harmonized=harmonized,
        cleaned=cleaned,
        preprocessed=pre,
        summary_numeric=summary_numeric,
        summary_object=summary_object,
        label_encoders=encoders,
    )
