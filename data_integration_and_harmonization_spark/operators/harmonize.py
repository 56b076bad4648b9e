"""Schema harmonization (reference P1 + U1: ref:20-23).

The reference's core integration operator:

    for df in dfs: df.columns = [c.lower().replace(' ', '_') ...]   # ref:22
    return pd.concat(dfs, ignore_index=True)                        # ref:23

i.e. per-source column-name normalization, then an outer union aligned
BY NAME — columns absent from a source become null, conflicting dtypes
are upcast (pandas does this silently; Spark unions need exact types,
so we compute the least-common Spark type per column name first and
cast every source to it).

Divergences from pandas, by design (documented in SURVEY §1):
- duplicate post-normalization names inside one source: pandas keeps
  duplicate labels; Spark forbids them — we deterministically suffix
  ``__2``, ``__3``, ...
- row order: ``ignore_index=True`` implies load-order; we synthesize an
  explicit ``(source_seq, row-position)`` ingest index on request so
  order-sensitive downstream ops (interpolate/ffill) have a real
  ordering column instead of an implicit one.

Scale notes: union is a zero-shuffle narrow op in Spark; the only cost
added here is the per-column cast projection. ``unionByName`` with
``allowMissingColumns=True`` keeps the plan a single Catalyst Union
node over N scans — pushdown/pruning still reach each parquet source.
"""

from __future__ import annotations

from collections.abc import Sequence
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_integration_and_harmonization_spark.functions.indexing import with_global_index

INGEST_SOURCE = "_source_seq"
INGEST_INDEX = "_ingest_idx"

_NUMERIC_WIDTH = {
    T.ByteType: 1,
    T.ShortType: 2,
    T.IntegerType: 3,
    T.LongType: 4,
    T.FloatType: 5,
    T.DoubleType: 6,
}


def normalize_name(name: str) -> str:
    """ref:22 — lower-case, spaces to underscores."""
    return name.lower().replace(" ", "_")


def normalize_columns(df: DataFrame) -> DataFrame:
    """P1: normalize every column name; de-dupe collisions with
    ``__k`` suffixes (pandas tolerates duplicate labels, Spark cannot)."""
    seen: dict[str, int] = {}
    out = []
    for c in df.columns:
        n = normalize_name(c)
        seen[n] = seen.get(n, 0) + 1
        out.append(n if seen[n] == 1 else f"{n}__{seen[n]}")
    return df.toDF(*out)


def _promote(a: T.DataType, b: T.DataType) -> T.DataType:
    """Least-common type, pandas-flavored: numeric widen within the
    numeric lattice, timestamps/dates merge to timestamp, any other
    conflict falls back to string (pandas' object upcast)."""
    if a == b:
        return a
    wa, wb = _NUMERIC_WIDTH.get(type(a)), _NUMERIC_WIDTH.get(type(b))
    if wa is not None and wb is not None:
        # int+int widens to the larger int; any int+float -> double
        if max(wa, wb) >= 5 and min(wa, wb) <= 4:
            return T.DoubleType()
        return a if wa >= wb else b
    if isinstance(a, T.DecimalType) and isinstance(b, T.DecimalType):
        # two decimals with different precision/scale: pandas concat
        # upcasts to float64, so merge to double (not string)
        return T.DoubleType()
    if isinstance(a, T.DecimalType) and wb is not None or isinstance(b, T.DecimalType) and wa is not None:
        return T.DoubleType()
    dt_types = (T.DateType, T.TimestampType)
    if isinstance(a, dt_types) and isinstance(b, dt_types):
        return T.TimestampType()
    return T.StringType()


def unified_schema(dfs: Sequence[DataFrame]) -> dict[str, T.DataType]:
    """Outer schema union by (normalized) name with type promotion.
    Column order = first-seen order across sources, like pandas concat."""
    types: dict[str, T.DataType] = {}
    for df in dfs:
        for f in df.schema.fields:
            types[f.name] = _promote(types[f.name], f.dataType) if f.name in types else f.dataType
    return types


def harmonize(
    dfs: Sequence[DataFrame],
    add_ingest_index: bool = False,
    index_partitions: int | None = None,
) -> DataFrame:
    """U1: normalize names per source, cast to the least-common schema,
    outer-union by name. With ``add_ingest_index=True`` the result also
    carries ``_ingest_idx`` — a contiguous 0..n-1 position ordered by
    (source sequence, row position within source) replicating pandas'
    ``ignore_index=True`` row order for the order-sensitive cleaners.
    """
    if not dfs:
        raise ValueError("harmonize() needs at least one source")
    normed = [normalize_columns(df) for df in dfs]
    target = unified_schema(normed)

    casted = []
    for seq, df in enumerate(normed):
        cols = [
            (F.col(name).cast(dtype) if name in df.columns else F.lit(None).cast(dtype)).alias(name)
            for name, dtype in target.items()
        ]
        if add_ingest_index:
            # Per-source row position: monotonically_increasing_id is
            # non-contiguous but strictly increasing in (partition, row)
            # order, which for a parquet/csv scan is file order.
            cols = [*cols, F.lit(seq).alias(INGEST_SOURCE), F.monotonically_increasing_id().alias("_row_in_source")]
        casted.append(df.select(*cols))

    out = reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), casted)
    if add_ingest_index:
        out = with_global_index(
            out,
            [INGEST_SOURCE, "_row_in_source"],
            index_col=INGEST_INDEX,
            num_partitions=index_partitions,
        ).drop("_row_in_source")
    return out
