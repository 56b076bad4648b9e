"""Bucketed table sinks — the co-located-join layout.

Writing both sides of a recurring join bucketed by the join key into
the same bucket count lets every subsequent join run with NO exchange
of either side: each task reads matching bucket files directly. At
100 TB this turns the nightly fact-dim join from a full shuffle into
a local merge.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 16,
    path: str | None = None,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist as a bucketed (optionally sorted) table. Sorting within
    buckets additionally removes the Sort from sort-merge joins."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(table_name)


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)
