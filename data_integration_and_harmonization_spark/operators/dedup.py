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


def minhash_signature(col: Column | str, num_hashes: int = 32, gram: int = 3) -> Column:
    """MinHash signature: for each of ``num_hashes`` affine
    permutations of murmur3(shingle), the minimum over the doc's
    shingle set. Pure column expressions — JVM-side, no UDF."""
    sh = word_shingles(col, gram)
    # cast BEFORE abs: Java's abs(Int.MIN_VALUE) is still negative
    base = F.transform(sh, lambda s: F.abs(F.hash(s).cast("long")))

    def perm(a: int, b: int):
        # closure factory: Spark inspects lambda arity, so the captured
        # constants must NOT appear as default parameters
        return lambda h: (h * a + b) % _P

    sig = []
    for i in range(num_hashes):
        sig.append(F.array_min(F.transform(base, perm(2 * i + 1, 7 * i + 3))))
    return F.array(*sig)


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
    sig = df.select(
        F.col(id_col).alias("id"),
        minhash_signature(text_col, num_hashes, gram).alias("sig"),
    )
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


def simhash64(col: Column | str) -> Column:
    """64-bit SimHash over word tokens: each token votes its murmur3
    bits; signature bit b is 1 iff the sum of votes is positive."""
    t = F.array_distinct(tokens(col))
    h = F.transform(t, lambda s: F.hash(s, F.lit(41)).cast("long") * F.lit(2654435761).cast("long"))
    def voter(b: int):
        return lambda acc, v: acc + F.when(
            F.shiftright(v, b).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    bits = []
    for b in range(64):
        votes = F.aggregate(h, F.lit(0).cast("long"), voter(b))
        bit = F.when(votes > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        # shiftleft, not 2**b: 2**63 overflows a signed long literal
        bits.append(F.shiftleft(bit, b))
    out = bits[0]
    for bit in bits[1:]:
        out = out.bitwiseOR(bit)
    return out


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
    left, right = s.alias("l"), s.alias("r")
    on = (F.col("l.blk") == F.col("r.blk")) & (F.col("l.id") < F.col("r.id"))
    if "lang" in df.columns:
        on = on & (F.col("l.lang") == F.col("r.lang"))
    inter = F.size(F.array_intersect(F.col("l.sh"), F.col("r.sh")))
    union = F.size(F.array_union(F.col("l.sh"), F.col("r.sh")))
    jac = F.when(union > 0, inter.cast("double") / union).otherwise(F.lit(0.0))
    return (
        left.join(right, on)
        .select(
            F.col("l.id").alias("id_a"),
            F.col("r.id").alias("id_b"),
            F.round(jac, 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


# ------------------------------------------------------- query registry

def dedup_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def q_exact(spark, sf):
        return exact_dedup(spark.read.parquet(f"{sf}/documents.parquet"))

    def q_fp(spark, sf):
        return fingerprint_dedup(spark.read.parquet(f"{sf}/documents.parquet"))

    def q_jaccard(spark, sf):
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        # cap blocking-group fan-out at bench scale: top pairs only
        return (
            ngram_jaccard_pairs(docs, threshold=0.0)
            .orderBy(F.desc("jaccard"), "id_a", "id_b")
            .limit(200)
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
        sh = docs.select("doc_id", simhash64("text").alias("sig"))
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
)
SELECT l.id AS id_a, r.id AS id_b,
  round(CASE WHEN len(list_distinct(l.sh || r.sh)) > 0
        THEN CAST(len(list_intersect(l.sh, r.sh)) AS DOUBLE) / len(list_distinct(l.sh || r.sh))
        ELSE 0.0 END, 6) AS jaccard
FROM s l JOIN s r ON l.blk = r.blk AND l.lang = r.lang AND l.id < r.id
ORDER BY jaccard DESC, id_a, id_b
LIMIT 200
""",
    }
