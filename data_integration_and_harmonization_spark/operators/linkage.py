"""Entity resolution / record linkage (engine extension; SURVEY §7
north-star ops — the reference harmonizes by column-name union only,
ref:20-23; linking ROWS that denote the same real-world entity is the
other half of data integration, so the engine ships it as a
first-class operator family).

The classic three-stage shape, each stage a plain DataFrame op:

1. **Blocking** — a self-equi-join on user-chosen block keys
   (country, segment, zip-prefix, phonetic code, ...). This is what
   makes linkage tractable at scale: the quadratic pair generation is
   confined to one block, never the corpus. The join is a shuffle
   equi-join on the block key — nothing corpus-sized is broadcast,
   and AQE's skew-join splitting handles an oversized block. Block
   granularity is the recall/cost dial the caller owns (same contract
   as LSH banding in :mod:`.dedup`).
2. **Pairwise scoring** — Levenshtein edit distance on the name/title
   column, JVM-side (``F.levenshtein`` with the early-exit threshold
   form: cost O(max_edit · len) per pair instead of O(len²)).
3. **Transitive closure** — matched pairs are edges; entities are
   connected components, resolved by the size-adaptive
   :func:`~.dedup.duplicate_clusters` (driver union-find for small
   edge sets, distributed min-label propagation above the threshold).
   The entity id is the component's minimum record id, so labels are
   deterministic at any parallelism.

Singleton records (no match partner) never appear in the pair graph;
:func:`assign_entity_ids` completes the picture by left-joining the
clusters back and defaulting every unmatched record to its own id —
the full-corpus "golden record key" a downstream merge needs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_integration_and_harmonization_spark.operators.dedup import duplicate_clusters

__all__ = [
    "phonetic_key",
    "blocking_stats",
    "candidate_links",
    "resolve_entities",
    "assign_entity_ids",
    "merge_entities",
]


def blocking_stats(df: DataFrame, block_cols: Sequence[str]) -> DataFrame:
    """Size the blocking scheme BEFORE paying for the pairwise pass —
    the operational dial-check every linkage run at scale starts with.
    One aggregate over the block-size distribution; no pairs are
    generated.

    One row: ``n_records`` (input rows), ``n_comparable`` (rows with
    no null block key — the only rows the equi-join can pair),
    ``n_blocks``, ``candidate_pairs`` (sum nb*(nb-1)/2 — exactly what
    :func:`candidate_links` will score), ``all_pairs`` (unblocked
    n*(n-1)/2), ``reduction_ratio`` (1 - candidate/all — the fraction
    of the quadratic cost blocking eliminates), ``max_block_size``
    (the skew hotspot: one huge block is where the plan's wall-clock
    goes).
    """
    if not block_cols:
        raise ValueError("block_cols must be non-empty")
    # ONE scan: group the full input (null keys form groups too), tag
    # each group comparable iff no block key is null — exactly the
    # rows the equi-join can pair
    comparable = F.lit(True)
    for c in block_cols:
        comparable = comparable & F.max(F.col(c).isNotNull())
    sizes = df.groupBy(*block_cols).agg(
        F.count(F.lit(1)).alias("nb"),
        # within a group every row has the SAME key values, so any
        # row's nullness is the group's nullness
        comparable.alias("cmp"),
    )
    # pair counts in decimal(38,0): nb*(nb-1)/2 wraps int64 once a
    # block passes ~3e9 rows — the degenerate-key hotspot this
    # diagnostic exists to expose must not report garbage there
    nbd = F.col("nb").cast("decimal(38,0)")
    pair_d = (nbd * (nbd - F.lit(1)) / F.lit(2)).cast("decimal(38,0)")
    cmp_nb = F.when(F.col("cmp"), F.col("nb")).otherwise(F.lit(0))
    row = sizes.agg(
        F.sum("nb").cast("decimal(38,0)").alias("n_records"),
        F.sum(cmp_nb).cast("decimal(38,0)").alias("n_comparable"),
        F.sum(F.when(F.col("cmp"), 1).otherwise(0)).alias("n_blocks"),
        F.sum(F.when(F.col("cmp"), pair_d).otherwise(F.lit(0).cast("decimal(38,0)")))
        .cast("decimal(38,0)")
        .alias("candidate_pairs"),
        F.max(F.when(F.col("cmp"), F.col("nb"))).alias("max_block_size"),
    )
    nr = F.coalesce(F.col("n_records"), F.lit(0).cast("decimal(38,0)"))
    all_pairs = (nr * (nr - F.lit(1)) / F.lit(2)).cast("decimal(38,0)")
    cand = F.coalesce(F.col("candidate_pairs"), F.lit(0).cast("decimal(38,0)"))
    return row.select(
        nr.alias("n_records"),
        F.coalesce("n_comparable", F.lit(0).cast("decimal(38,0)")).alias("n_comparable"),
        F.coalesce("n_blocks", F.lit(0)).alias("n_blocks"),
        cand.alias("candidate_pairs"),
        all_pairs.alias("all_pairs"),
        F.round(
            F.when(
                all_pairs > 0,
                F.lit(1.0) - (cand / all_pairs).cast("double"),
            ).otherwise(F.lit(1.0)),
            6,
        ).alias("reduction_ratio"),
        F.coalesce("max_block_size", F.lit(0)).alias("max_block_size"),
    )


def phonetic_key(name_col: str | Column) -> Column:
    """Soundex blocking key: records whose names SOUND alike land in
    one block even when spelled differently ("Jon Smith" / "John
    Smyth"), the standard recall-booster edit-distance blocking
    misses. Derive it as a column and pass it as a block key:

        df = df.withColumn("ph", phonetic_key("name"))
        candidate_links(df, "id", "name", ["country", "ph"], ...)

    Pure JVM (``F.soundex``), null-safe (null name -> null key, which
    equi-join semantics then exclude from every block).
    """
    col = F.col(name_col) if isinstance(name_col, str) else name_col
    return F.soundex(F.upper(F.trim(col)))


def _name_expr(name_col: str, canonicalize: bool) -> Column:
    if canonicalize:
        # lower + collapse non-alnum runs: make "Acme Corp." link to
        # "acme corp" at edit distance 0 before typo tolerance kicks in
        from data_integration_and_harmonization_spark.operators.text import normalized

        return normalized(name_col)
    return F.col(name_col)


def candidate_links(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_cols: Sequence[str],
    max_edit: int = 2,
    canonicalize: bool = False,
) -> DataFrame:
    """Blocked pairwise record matching: records sharing every
    ``block_cols`` value are compared by Levenshtein distance on
    ``name_col``; pairs within ``max_edit`` become link edges.

    Output: (id_a, id_b, edit_distance), id_a < id_b. Null block keys
    match nothing (SQL equi-join semantics) — a record with an unknown
    block value generates no pairs rather than pairing with every
    other unknown.
    """
    if not block_cols:
        raise ValueError(
            "block_cols must be non-empty: unblocked linkage is an "
            "all-pairs cartesian product — at corpus scale that is "
            "never the right plan (pick a coarse key, or use the "
            "LSH/SimHash families in operators.dedup for text blobs)"
        )
    nm = _name_expr(name_col, canonicalize)
    left = df.select(
        F.col(id_col).alias("id_a"), nm.alias("__nm_a"), *block_cols
    )
    right = df.select(
        F.col(id_col).alias("id_b"), nm.alias("__nm_b"), *block_cols
    )
    # threshold form early-exits the DP once the running distance
    # exceeds max_edit and returns -1 — strictly cheaper than
    # computing the full distance then filtering
    ed = F.levenshtein(F.col("__nm_a"), F.col("__nm_b"), max_edit)
    return (
        left.join(right, list(block_cols))
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", ed.alias("edit_distance"))
        .where(F.col("edit_distance") >= 0)
    )


def resolve_entities(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_cols: Sequence[str],
    max_edit: int = 2,
    canonicalize: bool = False,
) -> DataFrame:
    """Link records and resolve the match graph to entities:
    connected components over :func:`candidate_links` edges.

    Output: (id, cluster_id) for every record that matched at least
    one other record; cluster_id = the component's minimum id. Records
    with no match partner are absent (see :func:`assign_entity_ids`).
    """
    links = candidate_links(df, id_col, name_col, block_cols, max_edit, canonicalize)
    return duplicate_clusters(links)


def assign_entity_ids(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_cols: Sequence[str],
    max_edit: int = 2,
    canonicalize: bool = False,
    entity_col: str = "entity_id",
) -> DataFrame:
    """The full-corpus resolution: every record gets an ``entity_col``
    — its component's minimum id if it matched anything, its own id
    otherwise. Downstream "merge duplicates / pick golden record"
    steps group by this column.

    The join back is on the record id (shuffle equi-join; the cluster
    side holds only matched records, which is small whenever matches
    are — AQE broadcasts it when it can prove that).
    """
    clusters = resolve_entities(df, id_col, name_col, block_cols, max_edit, canonicalize)
    lab = clusters.select(
        F.col("id").alias(id_col), F.col("cluster_id").alias(entity_col)
    )
    return df.join(lab, id_col, "left").withColumn(
        entity_col, F.coalesce(F.col(entity_col), F.col(id_col))
    )


_SURVIVORSHIP = {
    "min": F.min,
    "max": F.max,
    "sum": F.sum,
    "avg": F.avg,
}


def merge_entities(
    df: DataFrame,
    id_col: str,
    entity_col: str = "entity_id",
    rules: dict[str, str] | None = None,
) -> DataFrame:
    """Survivorship: collapse each entity to ONE golden record.

    Input is :func:`assign_entity_ids` output (every record labeled).
    Per attribute the survivor value follows ``rules`` —
    ``{'col': 'min'|'max'|'sum'|'avg'|'first_non_null'}`` — and
    attributes without a rule default to ``first_non_null``: the value
    from the lowest-id record that has one (``min_by`` over the record
    id, rows with a null attribute skipped), so the merge is
    deterministic at any parallelism, unlike ``first(ignorenulls)``
    whose winner depends on partition order. ``n_records`` counts the
    merged group.

    One hash-aggregate on the entity id — the same shuffle shape as
    any groupBy; no windows, no self-joins.
    """
    rules = rules or {}
    unknown = {
        c: r
        for c, r in rules.items()
        if r not in _SURVIVORSHIP and r != "first_non_null"
    }
    if unknown:
        raise ValueError(
            f"unknown survivorship rules {unknown}; pick from "
            f"{sorted(_SURVIVORSHIP) + ['first_non_null']}"
        )
    missing = [c for c in rules if c not in df.columns]
    if missing:
        raise ValueError(f"survivorship rules for absent columns: {missing}")

    def survive(c: str):
        rule = rules.get(c, "first_non_null")
        if rule == "first_non_null":
            # value from the lowest-id record where c is non-null:
            # min_by skips rows whose ordering expression is null
            return F.min_by(
                F.col(c), F.when(F.col(c).isNotNull(), F.col(id_col))
            ).alias(c)
        return _SURVIVORSHIP[rule](c).alias(c)

    attrs = [c for c in df.columns if c not in (id_col, entity_col)]
    return df.groupBy(entity_col).agg(
        F.count(F.lit(1)).alias("n_records"), *[survive(c) for c in attrs]
    )
