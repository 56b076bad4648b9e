"""Deduplication for training-data pipelines (engine extension;
SURVEY §7 north-star ops — no reference counterpart).

Five levels, cheapest first; each is the standard scale architecture:

- exact:        hash-groupBy on the raw text (one shuffle on a short
                digest, never on the document body)
- fingerprint:  groupBy on md5(normalized text) — catches
                whitespace/punct/case variants
- minhash_lsh:  shingle -> minhash signature -> band buckets ->
                candidate pairs join within buckets. All column
                expressions (murmur3 ``F.hash`` with per-permutation
                seeds); the pair join only ever touches bucket-mates,
                which is what makes near-dup feasible at 100 TB.
- simhash:      64-bit weighted-bit signature; near-dups = signatures
                at small Hamming distance within buckets
- ngram_jaccard: exact Jaccard over word-shingle sets for candidate
                pairs (the verifier of the approximate stages)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from data_integration_and_harmonization_spark.operators.text import normalized, tokens

# minhash: h_i(x) = (a_i * murmur3(x) + b_i) mod p  — classic affine
# permutation family over a Mersenne prime.
_P = 2147483647


def word_shingles(col: Column | str, gram: int = 3) -> Column:
    """Distinct word ``gram``-shingles of the document."""
    t = tokens(col)
    n = F.size(t) - (gram - 1)
    idx = F.when(n >= 1, F.sequence(F.lit(1), n)).otherwise(F.array().cast("array<int>"))
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", *[F.element_at(t, i + j) for j in range(gram)]))
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    gram: int = 3,
) -> DataFrame:
    """MinHash signatures as ONE exploded-aggregate pass: explode the
    shingle set to rows, murmur3 each shingle exactly once, then
    compute all ``num_hashes`` permutation minima as plain codegen'd
    aggregates with map-side partial combine.

    (The tempting pure-column form — ``num_hashes`` nested
    ``array_min(transform(...))`` expressions — re-evaluates the whole
    tokenize->shingle->hash subtree per permutation because Catalyst
    collapses projections and doesn't CSE across lambda trees, and
    higher-order functions run interpreted. The exploded form is
    ~num_hashes× cheaper and is the shape that scales: shingle rows
    partial-aggregate locally, only (id, 32 longs) ever shuffles.)

    Output: (id, sig array<long>); docs with < ``gram`` tokens get an
    all-null-free empty signature via left join (sig = null).
    """
    # Fan out before the per-doc shingle/hash work: a single-file scan
    # is one partition and would serialize the whole pass.
    n = df.sparkSession.sparkContext.defaultParallelism
    src = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t")).repartition(n, "id")
    ex = src.select(
        "id", F.explode(word_shingles("t", gram)).alias("s")
    ).select("id", F.abs(F.hash("s").cast("long")).alias("h"))
    aggs = [
        F.min((F.col("h") * (2 * i + 1) + (7 * i + 3)) % _P).alias(f"m{i}")
        for i in range(num_hashes)
    ]
    sig = ex.groupBy("id").agg(*aggs)
    return sig.select("id", F.array(*[f"m{i}" for i in range(num_hashes)]).alias("sig"))


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    gram: int = 3,
) -> DataFrame:
    """Near-dup candidate pairs via banded LSH: split the signature
    into ``bands`` rows of ``num_hashes/bands``; docs sharing any
    band hash are candidates. The self-join is per-(band, bucket) —
    tiny groups — so the quadratic blowup is local to real near-dup
    clusters, not the corpus.

    Output: (id_a, id_b, n_shared_bands), id_a < id_b.
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, num_hashes, gram)
    banded = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.hash(*[F.col("sig")[b * rows_per_band + r] for r in range(rows_per_band)]).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.bucket") == F.col("r.bucket"))
            & (F.col("l.id") < F.col("r.id")),
        )
        .groupBy(F.col("l.id").alias("id_a"), F.col("r.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


def simhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash per document: each distinct token votes its
    murmur3 bit pattern; signature bit b is 1 iff the vote sum is
    positive.

    Same exploded-aggregate shape as :func:`minhash_signatures` — one
    token-row pass, 64 codegen'd conditional-sum aggregates, map-side
    combinable; only (id, 64 small ints) shuffles.

    Output: (id, sig long).
    """
    n = df.sparkSession.sparkContext.defaultParallelism
    src = df.select(F.col(id_col).alias("id"), F.col(text_col).alias("txt")).repartition(n, "id")
    ex = src.select(
        "id",
        F.explode(F.array_distinct(tokens("txt"))).alias("t"),
    ).select(
        "id",
        (F.hash("t", F.lit(41)).cast("long") * F.lit(2654435761).cast("long")).alias("h"),
    )
    votes = [
        F.sum(
            F.when(F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(64)
    ]
    agg = ex.groupBy("id").agg(*votes)
    sig = None
    for b in range(64):
        # shiftleft, not 2**b: 2**63 overflows a signed long literal
        bit = F.shiftleft(
            F.when(F.col(f"v{b}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")),
            b,
        )
        sig = bit if sig is None else sig.bitwiseOR(bit)
    return agg.select("id", sig.alias("sig"))


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup: one group per distinct text; keep the minimum id.
    Groups on md5(text) so the shuffle key is 16 bytes, not the body.
    Output: (text_fp, n_copies, keep_id)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_fp"))
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min(id_col).alias("keep_id"))
    )


def fingerprint_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Normalized-fingerprint dedup: groups case/whitespace/punct
    variants. Output: (fp, n_copies, keep_id)."""
    return (
        df.groupBy(F.md5(normalized(text_col)).alias("fp"))
        .agg(F.count(F.lit(1)).alias("n_copies"), F.min(id_col).alias("keep_id"))
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    gram: int = 3,
    threshold: float = 0.0,
    length_bucket: int = 100,
) -> DataFrame:
    """Exact word-shingle Jaccard for candidate pairs.

    Candidates = same (lang if present, n_chars/length_bucket) — a
    cheap blocking key that keeps the pair join near-linear; the
    MinHash path above is the unblocked scale route.

    Output: (id_a, id_b, jaccard) for pairs above ``threshold``.
    """
    block = [F.floor(F.length(F.col(text_col)) / length_bucket).alias("blk")]
    if "lang" in df.columns:
        block.append(F.col("lang"))
    s = df.select(
        F.col(id_col).alias("id"), *block, word_shingles(text_col, gram).alias("sh")
    )
    # Spread the probe side: a single-file scan is one partition, and
    # the pair comparison is the expensive part — force fan-out so the
    # per-pair work parallelizes (explicit n => AQE won't coalesce it).
    n = s.sparkSession.sparkContext.defaultParallelism
    s = s.repartition(n, F.col("blk"), *( [F.col("lang")] if "lang" in df.columns else [] ), F.col("id"))
    left, right = s.alias("l"), s.alias("r")
    on = (F.col("l.blk") == F.col("r.blk")) & (F.col("l.id") < F.col("r.id"))
    if "lang" in df.columns:
        on = on & (F.col("l.lang") == F.col("r.lang"))
    inter = F.size(F.array_intersect(F.col("l.sh"), F.col("r.sh")))
    union = F.size(F.array_union(F.col("l.sh"), F.col("r.sh")))
    jac = F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
    return (
        left.join(F.broadcast(right), on)
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.round(jac, 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def lsh_verified_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
    gram: int = 3,
) -> DataFrame:
    """The 100 TB near-dup pipeline: MinHash-LSH proposes candidate
    pairs (near-linear), exact shingle Jaccard verifies ONLY those
    pairs. Cost scales with the number of real near-dup pairs, not
    with corpus size squared.

    Output: (id_a, id_b, jaccard) for verified pairs >= threshold.
    """
    cands = minhash_lsh_candidates(df, text_col, id_col, num_hashes, bands, gram)
    n = df.sparkSession.sparkContext.defaultParallelism
    sh = (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))
        .repartition(n, "id")
        .select("id", word_shingles("t", gram).alias("sh"))
    )
    j = (
        cands.join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
    )
    inter = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.array_union(F.col("sh_a"), F.col("sh_b")))
    jac = F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
    return j.select("id_a", "id_b", F.round(jac, 6).alias("jaccard")).where(
        F.col("jaccard") >= threshold
    )


def embedding_near_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.95,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-dup: candidate pairs share a sign-bit LSH
    bucket (random-hyperplane family restricted to axis planes, so the
    oracle can mirror it); exact cosine filters. Per-bucket self-join —
    quadratic only within buckets, i.e. near-linear overall.

    Output: (id_a, id_b, cosine_sim) with cosine >= threshold.
    """
    from data_integration_and_harmonization_spark.operators.similarity import (
        cosine,
        signbit_bucket,
    )

    s = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        signbit_bucket(F.col(vec_col), n_bits).alias("bucket"),
    )
    n = emb.sparkSession.sparkContext.defaultParallelism
    s = s.repartition(n, "bucket", "id")
    left, right = s.alias("l"), s.alias("r")
    pairs = left.join(
        F.broadcast(right),
        (F.col("l.bucket") == F.col("r.bucket")) & (F.col("l.id") < F.col("r.id")),
    ).select(
        F.col("l.id").alias("id_a"),
        F.col("r.id").alias("id_b"),
        F.round(cosine(F.col("l.v"), F.col("r.v")), 6).alias("cosine_sim"),
    )
    return pairs.where(F.col("cosine_sim") >= threshold)


# ------------------------------------------------------- query registry

def dedup_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def q_exact(spark, sf):
        return exact_dedup(spark.read.parquet(f"{sf}/documents.parquet"))

    def q_fp(spark, sf):
        return fingerprint_dedup(spark.read.parquet(f"{sf}/documents.parquet"))

    def q_jaccard(spark, sf):
        # Oracle-checked on a deterministic 20% subset (the all-pairs
        # form is the semantics demo; the scale path is
        # dedup_lsh_verified below).
        docs = spark.read.parquet(f"{sf}/documents.parquet").where(
            F.col("doc_id") % 5 == 0
        )
        return (
            ngram_jaccard_pairs(docs, threshold=0.0)
            .orderBy(F.desc("jaccard"), "id_a", "id_b")
            .limit(200)
        )

    def q_lsh_verified(spark, sf):
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        # rows-only: murmur3-based candidates aren't oracle-expressible.
        pairs = lsh_verified_pairs(docs, threshold=0.5)
        return pairs.agg(
            F.count(F.lit(1)).alias("n_verified_pairs"),
            F.round(F.coalesce(F.max("jaccard"), F.lit(0.0)), 6).alias("max_jaccard"),
        )

    def q_minhash(spark, sf):
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        # rows-only (murmur3 isn't reproducible in the oracle): summary
        # stats of the banded-LSH candidate graph, always non-empty.
        cands = minhash_lsh_candidates(docs)
        return cands.agg(
            F.count(F.lit(1)).alias("n_candidate_pairs"),
            F.coalesce(F.max("n_shared_bands"), F.lit(0)).alias("max_shared_bands"),
        )

    def q_simhash(spark, sf):
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        # rows-only: signature population stats (deterministic given
        # murmur3, but not expressible in DuckDB).
        sh = simhash_signatures(docs)
        return sh.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("sig").alias("n_distinct_sigs"),
        )

    return {
        "dedup_exact": q_exact,
        "dedup_fingerprint": q_fp,
        "dedup_ngram_jaccard": q_jaccard,
        "dedup_minhash_lsh": q_minhash,
        "dedup_simhash": q_simhash,
        "dedup_lsh_verified": q_lsh_verified,
        "dedup_embedding_cosine": lambda s, sf: embedding_near_dup_pairs(
            s.read.parquet(f"{sf}/embeddings.parquet"),
            # synthetic embeddings top out near cosine 0.43 — a low
            # threshold keeps the oracle-checked output non-trivial
            threshold=0.3,
        ),
    }


def dedup_oracles() -> dict[str, str]:
    from data_integration_and_harmonization_spark.operators.text import TOKEN_RE

    shingles = (
        f"list_distinct(list_transform("
        f"range(1, greatest(len(regexp_extract_all(lower(text), '{TOKEN_RE}')) - 2, 0) + 1), "
        f"i -> regexp_extract_all(lower(text), '{TOKEN_RE}')[i] || ' ' || "
        f"regexp_extract_all(lower(text), '{TOKEN_RE}')[i+1] || ' ' || "
        f"regexp_extract_all(lower(text), '{TOKEN_RE}')[i+2]))"
    )
    return {
        "dedup_exact": """
SELECT md5(text) AS text_fp, count(*)::BIGINT AS n_copies, min(doc_id) AS keep_id
FROM documents GROUP BY 1
""",
        "dedup_fingerprint": """
SELECT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp,
       count(*)::BIGINT AS n_copies, min(doc_id) AS keep_id
FROM documents GROUP BY 1
""",
        "dedup_ngram_jaccard": f"""
WITH s AS (
  SELECT doc_id AS id, lang, floor(length(text) / 100)::BIGINT AS blk,
         {shingles} AS sh
  FROM documents
  WHERE doc_id % 5 = 0
)
SELECT l.id AS id_a, r.id AS id_b,
  round(CASE WHEN len(list_distinct(l.sh || r.sh)) > 0
        THEN CAST(len(list_intersect(l.sh, r.sh)) AS DOUBLE) / len(list_distinct(l.sh || r.sh))
        ELSE 0.0 END, 6) AS jaccard
FROM s l JOIN s r ON l.blk = r.blk AND l.lang = r.lang AND l.id < r.id
ORDER BY jaccard DESC, id_a, id_b
LIMIT 200
""",
        "dedup_embedding_cosine": """
WITH s AS (
  SELECT vec_id AS id, embedding AS v,
    list_sum(list_transform(range(1, 9),
      i -> CASE WHEN CAST(embedding[i] AS DOUBLE) >= 0 THEN (1 << (i - 1)) ELSE 0 END)) AS bucket
  FROM embeddings
)
SELECT id_a, id_b, cosine_sim FROM (
  SELECT l.id AS id_a, r.id AS id_b,
    round(
      list_sum(list_transform(range(1, len(l.v) + 1),
        i -> CAST(l.v[i] AS DOUBLE) * CAST(r.v[i] AS DOUBLE)))
      / (sqrt(list_sum(list_transform(l.v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
         * sqrt(list_sum(list_transform(r.v, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))),
    6) AS cosine_sim
  FROM s l JOIN s r ON l.bucket = r.bucket AND l.id < r.id
)
WHERE cosine_sim >= 0.3
""",
    }
