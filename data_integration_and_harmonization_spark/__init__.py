"""data_integration_and_harmonization_spark — a PySpark-native data
integration / harmonization / EDA / ML analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference repo ``Rishisrv147025/Data_integration_and_harmonization``
(a single-file pandas + sklearn + Streamlit app): multi-source
ingestion, schema harmonization (rename + outer union-by-name),
null-repair (interpolate/ffill), lossy numeric coercion, summary
statistics, EDA aggregations (histograms, box stats, 2-D densities,
correlation matrices), feature scaling/encoding, and a tree-model
zoo with CV tuning — plus the large-scale training-data-pipeline
extensions (dedup, similarity search, text analysis, multimodal
columns, streaming) the reference lacks.

Everything is lazy ``DataFrame -> DataFrame``; Catalyst does the
physical planning. No RDDs, no driver-side row loops in hot paths.
"""

from data_integration_and_harmonization_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
