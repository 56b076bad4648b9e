"""Similarity search over embedding columns (engine extension;
SURVEY §7 north-star ops — no reference counterpart).

Two paths, matching the standard ANN architecture:

- brute-force cosine top-k: broadcast the (small) query set against
  the full corpus — exact, O(n_queries * n_corpus), the baseline and
  the recall oracle. Dot products are JVM-side ``zip_with`` +
  ``aggregate`` column expressions (no UDF, no Python).
- LSH-bucketed top-k: sign-bit bucketing (axis-aligned hyperplanes
  over the first ``n_bits`` dimensions); candidates share the query's
  bucket, so the join is bucket-equi — at 100 TB the corpus shuffles
  once on a byte-sized key and each query probes one bucket. An IVF
  variant would swap the bucketer for learned centroids; the plumbing
  is identical.

All arithmetic in double, summed left-to-right, so results are
bit-reproducible against the DuckDB oracle.
"""

from __future__ import annotations

import math

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Sequential-order dot product of two array<numeric> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _lit_vec(vals) -> Column:
    """array<double> literal built as ONE SQL string (r13): spelling a
    center as d separate F.lit() py4j calls dominated the DRIVER time
    of every quantizer-construction path (~1 ms per call x k*d*m
    literals); one expr() per center parses JVM-side. repr() is the
    shortest round-trip float form and Double.parseDouble returns the
    exact same IEEE value, so expressions are value-identical. A
    non-finite entry (nan/inf center from degenerate input) would
    render as unparseable SQL ('nanD'), so those fall back to the
    per-element F.lit path, which spells NaN/Infinity validly."""
    fv = [float(v) for v in vals]
    if not all(math.isfinite(v) for v in fv):
        return F.array(*[F.lit(v) for v in fv])
    return F.expr("array(" + ",".join(repr(v) + "D" for v in fv) + ")")


def squared_distance(a: Column, b: Column) -> Column:
    """Sequential-order squared euclidean distance of two
    array<numeric> columns — the one expression used for BOTH corpus
    cell assignment and query probe selection in IVF, so the two stay
    bit-identical (and oracle-reproducible) by construction."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k per query over the corpus.

    The query side is broadcast (queries are the small side by
    construction); ranking is a per-query window, parallel across
    queries. Ties break by candidate id for determinism.

    Output: (query_id, rank, neighbor_id, cosine_sim).
    """
    # per-vector norms staged per side (r14, guide §1.2): cosine per
    # (query, candidate) pair re-ran both interpreted O(d) norm
    # aggregates once per pair; staged, the per-pair work is the dot
    # product. dot/(q_nrm*c_nrm) keeps cosine's exact operand order,
    # so every similarity is bit-identical.
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        norm(F.col(vec_col)).alias("q_nrm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        norm(F.col(vec_col)).alias("c_nrm"),
    )
    scored = c.crossJoin(F.broadcast(q)).where(F.col("query_id") != F.col("neighbor_id"))
    scored = scored.select(
        "query_id",
        "neighbor_id",
        (dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_nrm") * F.col("c_nrm"))).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("sim", 6).alias("cosine_sim"))
    )


def signbit_bucket(vec: Column, n_bits: int = 8) -> Column:
    """LSH bucket id from the sign bits of the first ``n_bits`` dims."""
    out = F.lit(0).cast("long")
    for i in range(n_bits):
        bit = F.when(F.element_at(vec, i + 1).cast("double") >= 0, F.lit(1)).otherwise(F.lit(0))
        out = out + F.shiftleft(bit.cast("long"), i)
    return out


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_bits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's sign-bit
    bucket. Same output shape as :func:`brute_force_topk`; recall
    depends on bucket granularity (use :func:`ann_recall` to measure).
    """
    # staged per-side norms — see brute_force_topk (r14)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        signbit_bucket(F.col(vec_col), n_bits).alias("bucket"),
        norm(F.col(vec_col)).alias("q_nrm"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        signbit_bucket(F.col(vec_col), n_bits).alias("bucket"),
        norm(F.col(vec_col)).alias("c_nrm"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_nrm") * F.col("c_nrm"))).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("sim", 6).alias("cosine_sim"))
    )


def ann_recall(exact: DataFrame, approx: DataFrame) -> DataFrame:
    """Recall@k of the approximate result against the exact one —
    the self-contained quality gauge for the ANN path."""
    e = exact.select("query_id", "neighbor_id")
    a = approx.select("query_id", "neighbor_id")
    hits = e.join(a, ["query_id", "neighbor_id"]).groupBy("query_id").agg(F.count(F.lit(1)).alias("hits"))
    totals = e.groupBy("query_id").agg(F.count(F.lit(1)).alias("total"))
    return (
        totals.join(hits, "query_id", "left")
        .select(
            "query_id",
            F.round(
                F.coalesce(F.col("hits"), F.lit(0)).cast("double") / F.col("total"), 6
            ).alias("recall"),
        )
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    centroids: str = "kmeans",
) -> DataFrame:
    """IVF (inverted-file) ANN: a coarse quantizer partitions the
    corpus into ``n_clusters`` cells; each query scans only its
    ``n_probe`` nearest cells. The classic trade: one cheap centroid
    pass + candidate scan of ~n_probe/n_clusters of the corpus.

    ``centroids``:

    - ``'kmeans'`` (default, the quality path): KMeans (ml,
      distributed) fits centroids; cell assignment is a model
      transform.
    - ``'seed'``: centroids are the first ``n_clusters`` corpus
      vectors by id — zero training cost, fully deterministic, and
      reproducible by any external engine (the oracle twin). Cell
      assignment is a pure argmin-projection (no model, no shuffle).

    Both paths: the query->cell fan-out is a broadcast of
    (query, cell) pairs joined against the cell-partitioned corpus.
    Same output shape as :func:`brute_force_topk`.
    """
    spark = corpus.sparkSession
    if centroids == "seed":
        centers = _seed_centers(corpus, n_clusters, id_col, vec_col)
        # shared struct-argmin (same (min d2, then min idx) tie-break
        # the oracle replays)
        assigned = corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("c_vec"),
            _nearest_index(F.col(vec_col), centers).alias("cell"),
        )
    elif centroids == "kmeans":
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        to_vec = array_to_vector(F.col(vec_col).cast("array<double>"))
        corpus_v = corpus.select(
            F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"), to_vec.alias("features")
        )
        km = KMeans(
            k=n_clusters, seed=seed, maxIter=8, featuresCol="features", predictionCol="cell"
        )
        model = km.fit(corpus_v)
        assigned = model.transform(corpus_v).select("neighbor_id", "c_vec", "cell")
        centers = [[float(x) for x in c] for c in model.clusterCenters()]
    else:
        raise ValueError(f"centroids must be 'kmeans' or 'seed', got {centroids!r}")
    centers_df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(centers)],
        "cell int, center array<double>",
    )
    # per query: distance to every centroid (n_clusters is small), keep
    # the n_probe nearest cells
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        # staged per-side norms — see brute_force_topk (r14)
        norm(F.col(vec_col)).alias("q_nrm"),
    )
    qc = q.crossJoin(F.broadcast(centers_df)).select(
        "query_id",
        "q_vec",
        "q_nrm",
        "cell",
        squared_distance(F.col("q_vec"), F.col("center")).alias("d2"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.col("d2"), F.col("cell"))
    probes = qc.withColumn("pr", F.row_number().over(wq)).where(F.col("pr") <= n_probe)

    scored = (
        assigned.withColumn("c_nrm", norm(F.col("c_vec")))
        .join(F.broadcast(probes.select("query_id", "q_vec", "q_nrm", "cell")), "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot(F.col("q_vec"), F.col("c_vec")) / (F.col("q_nrm") * F.col("c_nrm"))).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.col("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("sim", 6).alias("cosine_sim"))
    )


# ------------------------------------------------------- product quantization

def train_pq_codebooks(
    corpus: DataFrame,
    m: int = 8,
    k: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample: int = 2048,
    iters: int = 10,
    seed: int = 42,
) -> list[list[list[float]]]:
    """Train product-quantization codebooks: split the vector into
    ``m`` contiguous subspaces and k-means each subspace independently
    (Lloyd on a deterministic driver sample — PQ codebooks are tiny
    models, m*k*(d/m) floats; the classic IVF-PQ recipe trains them on
    a sample and applies them corpus-wide).

    The sample is the first ``sample`` vectors by id — deterministic
    at any parallelism, so codebooks (and everything downstream) are
    reproducible run to run. Returns nested lists (m, k, d/m), plain
    Python so the result broadcasts as expression literals.
    """
    import numpy as np

    rows = (
        corpus.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
        .orderBy("i")
        .limit(sample)
        .collect()
    )
    if not rows:
        raise ValueError("empty corpus: nothing to train codebooks on")
    X = np.asarray([[float(x) for x in r["v"]] for r in rows], dtype=np.float64)
    d = X.shape[1]
    if d % m:
        raise ValueError(f"vector dim {d} not divisible by m={m} subspaces")
    ds = d // m
    rng = np.random.default_rng(seed)
    books: list[list[list[float]]] = []
    for i in range(m):
        sub = X[:, i * ds : (i + 1) * ds]
        kk = min(k, len(sub))
        centers = sub[rng.choice(len(sub), kk, replace=False)].copy()
        for _ in range(iters):
            d2 = ((sub[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
            assign = d2.argmin(1)
            for j in range(kk):
                pts = sub[assign == j]
                if len(pts):
                    centers[j] = pts.mean(0)
        books.append([[float(x) for x in c] for c in centers])
    return books


def seed_pq_codebooks(
    corpus: DataFrame,
    m: int = 4,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Deterministic zero-training PQ codebooks: subspace ``i``'s
    centroids are the i-th subvectors of the first ``k`` corpus
    vectors by id — the PQ analogue of :func:`_seed_centers`. Lower
    quantization quality than Lloyd-trained :func:`train_pq_codebooks`
    (which stays the production default), but fully reproducible by an
    external engine from the corpus alone: the driver's DuckDB oracle
    replays the encode -> ADC -> re-rank pipeline bit-for-bit against
    these codebooks."""
    rows = _seed_centers(corpus, k, id_col, vec_col)
    if not rows:
        raise ValueError("empty corpus: nothing to seed codebooks from")
    d = len(rows[0])
    if d % m:
        raise ValueError(f"vector dim {d} not divisible by m={m} subspaces")
    ds = d // m
    return [[r[i * ds : (i + 1) * ds] for r in rows] for i in range(m)]


def _subvec(vec: Column, i: int, ds: int) -> Column:
    # slice is 1-indexed
    return F.slice(vec, i * ds + 1, ds)


def pq_distortion(
    corpus: DataFrame,
    *codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
) -> list[float]:
    """Mean quantization distortion of each codebook over the corpus:
    avg over vectors of sum over subspaces of the squared distance to
    the chosen (nearest) centroid — exactly the objective Lloyd
    minimizes, and the standard index-quality gauge for comparing PQ
    codebooks (recall@k additionally depends on the query set, so it
    can prefer query-aligned seeds on near-uniform corpora). All
    codebooks are measured in ONE JVM-side aggregate pass (one corpus
    scan however many books are compared); centers inline as literals
    (tiny). Returns one mean per codebook, in argument order."""

    def _err(books: list[list[list[float]]]) -> Column:
        ds = len(books[0][0])
        err: Column | None = None
        for i, centers in enumerate(books):
            sub = _subvec(F.col(vec_col), i, ds)
            d2s = F.array_min(
                F.array(
                    *[
                        squared_distance(sub, _lit_vec(c))
                        for c in centers
                    ]
                )
            )
            err = d2s if err is None else err + d2s
        return err

    row = corpus.agg(
        *[F.avg(_err(b)).alias(f"d{i}") for i, b in enumerate(codebooks)]
    ).collect()[0]
    return [float(row[f"d{i}"]) for i in range(len(codebooks))]


def _nearest_index(vec: Column, centers: list[list[float]]) -> Column:
    """Index of the squared-distance-nearest center — the (d2, idx)
    struct-argmin every quantizer here shares (IVF cell assignment,
    PQ subspace encode). Struct ordering compares d2 first, then idx,
    so ties break toward the lower index deterministically."""
    return F.array_min(
        F.array(
            *[
                F.struct(
                    squared_distance(vec, _lit_vec(c)).alias("d2"),
                    F.lit(i).cast("int").alias("idx"),
                )
                for i, c in enumerate(centers)
            ]
        )
    )["idx"]


def _seed_centers(
    corpus: DataFrame, n: int, id_col: str, vec_col: str
) -> list[list[float]]:
    """First ``n`` corpus vectors by id — the zero-training,
    fully-deterministic coarse-quantizer centroids."""
    rows = (
        corpus.select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
        .orderBy("i")
        .limit(n)
        .collect()
    )
    return [[float(x) for x in r["v"]] for r in rows]


def _centers_df(spark, codebooks: list[list[list[float]]]) -> DataFrame:
    """Codebooks as a (subspace, centroid, center) table. Codebooks
    are DATA, broadcast to the encode join — NOT expression literals:
    a production m=8 x k=256 codebook inlined as literals builds a
    ~2000-subtree plan whose Catalyst analysis dominates wall-clock
    (measured: the literal design's PQ queries were near
    size-INDEPENDENT at ~4-6 s — planning-bound, not execution-bound)
    and eventually exceeds codegen limits. The broadcast table keeps
    the plan O(m) regardless of k."""
    rows = [
        (i, c, [float(v) for v in codebooks[i][c]])
        for i in range(len(codebooks))
        for c in range(len(codebooks[i]))
    ]
    return spark.createDataFrame(rows, "i int, c int, center array<double>")


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    extra_cols: list[Column] | None = None,
    err_col: str | None = None,
) -> DataFrame:
    """Encode each vector as ``m`` centroid indices — the 8x-64x
    wire/memory compression that makes billion-vector search fit on a
    cluster. Exploded-aggregate shape (same as
    :func:`~.dedup.minhash_signatures`): each vector fans out to its
    ``m`` subvectors, joins the BROADCAST centers table, and per-
    subspace argmin is a struct-min aggregate — (d2, c) struct
    ordering ties toward the lower centroid index, the same tie-break
    every quantizer here uses. One shuffle of (id, m small structs)
    with map-side partial combine; nothing leaves the JVM, no UDF.

    ``extra_cols``: per-row expressions (e.g. an IVF cell id) carried
    through the encode — evaluated once pre-explode, aggregated with
    ``min`` (constant within an id), so IVF-PQ's cell+code projection
    stays one pass.

    ``err_col``: also emit the vector's quantization error — the sum
    over subspaces of the squared distance to the CHOSEN (nearest)
    centroid. The struct-min already carries that d2, so the column is
    a post-aggregate projection, zero extra passes — and
    ``avg(err_col)`` over the encode IS the codebooks' mean
    distortion, exactly the objective Lloyd minimizes (the one-scan
    index-quality gauge; :func:`pq_distortion` computes the same
    number standalone when no encode is being built).

    Output: (id, code array<int> length m[, extras][, err]).
    """
    m = len(codebooks)
    ds = len(codebooks[0][0])
    spark = df.sparkSession
    extras = extra_cols or []
    # extras evaluate in a generator-free projection: Spark's
    # Generate-split rewrites the select around posexplode, and a
    # lambda-bearing extra (e.g. the struct-argmin cell id) loses its
    # struct field names under that rewrite (FIELD_NOT_FOUND) — two
    # narrow projections sidestep it at zero cost
    pre = df.select(F.col(id_col).alias("id"), *extras, F.col(vec_col).alias("__vec"))
    extra_names = pre.columns[1:-1]
    subs = pre.select(
        "id",
        *extra_names,
        F.posexplode(
            F.array(*[_subvec(F.col("__vec"), i, ds) for i in range(m)])
        ).alias("i", "sub"),
    )
    d2 = squared_distance(F.col("sub"), F.col("center"))
    joined = subs.join(F.broadcast(_centers_df(spark, codebooks)), "i")
    aggs = [
        F.min(
            F.when(
                F.col("i") == i, F.struct(d2.alias("d2"), F.col("c").alias("c"))
            )
        ).alias(f"m{i}")
        for i in range(m)
    ]
    aggs += [F.min(n).alias(n) for n in extra_names]
    err = [
        sum((F.col(f"m{i}.d2") for i in range(1, m)), F.col("m0.d2")).alias(
            err_col
        )
    ] if err_col else []
    return (
        joined.groupBy("id")
        .agg(*aggs)
        .select(
            "id",
            F.array(*[F.col(f"m{i}.c") for i in range(m)]).alias("code"),
            *extra_names,
            *err,
        )
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 5,
    refine: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes: DataFrame | None = None,
    luts: DataFrame | None = None,
) -> DataFrame:
    """PQ-ADC approximate nearest neighbors with exact re-ranking —
    the production IVF-PQ shape. Stage 1 scores every corpus point
    against a query through its code alone: asymmetric distance
    ``d2(q, x) ~= sum_i LUT_i[code_i]`` where ``LUT_i[c] = ||q_i -
    centroid_{i,c}||^2``. Stage 2 keeps the ``k * refine`` best per
    query and re-ranks just that shortlist with exact distances.

    The scale shape is the whole point: each query's LUT (m*k doubles)
    is computed ONCE in a projection over the (small) query frame,
    broadcast, and every corpus point then costs m array lookups —
    never a d-dimensional arithmetic pass; the corpus side of stage 1
    carries only (id, m small ints), ~64x narrower than the raw
    embeddings. Full vectors are touched again only for the shortlist
    (k*refine rows per query — an equi-join on the corpus id), so the
    exact math runs on a vanishing fraction of the corpus.

    ``refine`` is the recall dial: the shortlist covers more of each
    query's true neighborhood as it grows, at the cost of a linearly
    bigger — but still tiny — re-rank join; with ``k * refine >=
    |corpus|`` the result is exact by construction.

    ``codes`` / ``luts``: a precomputed (persisted) :func:`pq_encode`
    output / :func:`_query_luts` table — the build-once-query-many
    split every production ANN index uses. An index served for many
    query batches encodes the corpus exactly once; callers running
    several PQ variants over one corpus (e.g. PQ and IVF-PQ) share
    one encode the same way.

    Output: (query_id, rank, neighbor_id, d2), rank by ascending
    exact distance within the shortlist (ties by neighbor id).
    """
    enc = (
        codes.select("id", "code")
        if codes is not None
        else pq_encode(corpus, codebooks, id_col, vec_col)
    ).withColumnRenamed("id", "neighbor_id")
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    lut = luts if luts is not None else _query_luts(q, codebooks)
    scored = (
        enc.crossJoin(F.broadcast(lut))
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", _adc_score(len(codebooks)).alias("approx_d2"))
    )
    return _refine_exact(scored, corpus, q, k, refine, id_col, vec_col)


def _query_luts(q: DataFrame, codebooks: list[list[list[float]]]) -> DataFrame:
    """Per-query ADC lookup tables, (query_id, lut0..lut{m-1}) with
    lut_i[c] = squared distance from the query's i-th subvector to
    centroid c. Same broadcast-centers join shape as
    :func:`pq_encode` (see :func:`_centers_df` for why codebooks are
    data, not literals); the query frame is small by contract, so the
    m*k min-aggregates per query are trivial."""
    m = len(codebooks)
    ds = len(codebooks[0][0])
    spark = q.sparkSession
    subs = q.select(
        "query_id",
        F.posexplode(
            F.array(*[_subvec(F.col("q_vec"), i, ds) for i in range(m)])
        ).alias("i", "sub"),
    )
    d2 = squared_distance(F.col("sub"), F.col("center"))
    joined = subs.join(F.broadcast(_centers_df(spark, codebooks)), "i")
    aggs = [
        F.min(F.when((F.col("i") == i) & (F.col("c") == c), d2)).alias(f"l_{i}_{c}")
        for i in range(m)
        for c in range(len(codebooks[i]))
    ]
    return (
        joined.groupBy("query_id")
        .agg(*aggs)
        .select(
            "query_id",
            *[
                F.array(
                    *[F.col(f"l_{i}_{c}") for c in range(len(codebooks[i]))]
                ).alias(f"lut{i}")
                for i in range(m)
            ],
        )
    )


def _adc_score(m: int) -> Column:
    """sum_i lut_i[code_i] over a joined (code, lut*) row."""
    score = None
    for i in range(m):
        term = F.element_at(F.col(f"lut{i}"), F.col("code")[i] + 1)
        score = term if score is None else score + term
    return score


def _refine_exact(
    scored: DataFrame,
    corpus: DataFrame,
    q: DataFrame,
    k: int,
    refine: int,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Keep the k*refine best approx candidates per query, re-rank
    that shortlist with exact distances (raw vectors joined in only
    for shortlist rows), emit the final top-k."""
    w_adc = Window.partitionBy("query_id").orderBy(F.col("approx_d2"), F.col("neighbor_id"))
    shortlist = scored.withColumn("rank", F.row_number().over(w_adc)).where(
        F.col("rank") <= k * max(1, refine)
    )
    vecs = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("n_vec"))
    exact = (
        shortlist.select("query_id", "neighbor_id")
        .join(vecs, "neighbor_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "neighbor_id",
            squared_distance(F.col("q_vec"), F.col("n_vec")).alias("d2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("d2"), F.col("neighbor_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", F.round("d2", 6).alias("d2"))
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 5,
    n_clusters: int = 16,
    n_probe: int = 4,
    refine: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    codes: DataFrame | None = None,
    luts: DataFrame | None = None,
    centers: list[list[float]] | None = None,
    prune_codes: bool = False,
) -> DataFrame:
    """The full production ANN layout — IVF coarse cells x PQ codes x
    exact re-rank, the index structure behind every billion-scale
    vector store:

    1. coarse quantizer: seed centroids (first ``n_clusters`` corpus
       vectors by id — deterministic, zero training) partition the
       corpus; each point's cell AND its PQ code come out of ONE
       encode pass over the corpus scan (the cell rides through the
       encode's aggregate);
    2. each query probes its ``n_probe`` nearest cells, so the ADC
       scan touches ~n_probe/n_clusters of the codes instead of all
       of them — and those codes are ~64x narrower than the vectors;
    3. ADC shortlist (k*refine per query) re-ranks with exact
       distances, raw vectors joined in for shortlist rows only.

    The corpus-side operand at every stage is as small as it can be:
    codes for the probed cells, then vectors for the shortlist. Same
    output shape as :func:`pq_topk`.

    ``codes`` / ``luts``: the build-once-query-many split (see
    :func:`pq_topk`); ``codes`` here must be a :func:`pq_encode`
    output that carried the ``cell`` column through ``extra_cols``.
    ``centers``: pass the coarse centroids a persisted index was
    built with (:func:`load_ann_index`) — recomputing them here would
    silently mis-probe an index built from a different corpus order.
    ``prune_codes=True`` additionally collects the probed cell set
    (bounded by ``n_clusters``, never by corpus size) and pushes it
    as a filter on ``codes`` — against a cell-PARTITIONED persisted
    index that becomes a partition-pruned scan touching only probed
    cell directories, the point of the layout at scale.
    """
    if centers is None:
        centers = _seed_centers(corpus, n_clusters, id_col, vec_col)

    # one corpus pass: the encode's exploded-aggregate carries the
    # cell id along (evaluated pre-explode, min-aggregated — constant
    # within a vector), so cell + code still come out of one pipeline
    assigned = (
        codes.select("id", "code", "cell")
        if codes is not None
        else pq_encode(
            corpus,
            codebooks,
            id_col,
            vec_col,
            extra_cols=[_nearest_index(F.col(vec_col), centers).alias("cell")],
        )
    ).withColumnRenamed("id", "neighbor_id")
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    # LUTs are computed ONCE per query (they don't depend on the
    # cell), then joined onto the query's n_probe nearest cells
    cell_d2 = F.array(
        *[
            F.struct(
                squared_distance(F.col("q_vec"), _lit_vec(c)).alias("d2"),
                F.lit(i).cast("int").alias("cell"),
            )
            for i, c in enumerate(centers)
        ]
    )
    probes = q.select(
        "query_id",
        F.explode(F.slice(F.array_sort(cell_d2), 1, n_probe)).alias("p"),
    ).select("query_id", F.col("p.cell").alias("cell"))
    if prune_codes:
        probed = sorted(
            r["cell"] for r in probes.select("cell").distinct().collect()
        )
        assigned = assigned.where(F.col("cell").isin(probed))
    probe_luts = probes.join(
        luts if luts is not None else _query_luts(q, codebooks), "query_id"
    )
    scored = (
        assigned.join(F.broadcast(probe_luts), "cell")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", _adc_score(len(codebooks)).alias("approx_d2"))
    )
    return _refine_exact(scored, corpus, q, k, refine, id_col, vec_col)


def _ann_fs(spark, path: str):
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(path)
    return jvm, root.getFileSystem(spark._jsc.hadoopConfiguration()), root


def _ann_versions(fs, root, require_success: bool) -> list[int]:
    """Version numbers of ``v-%06d`` dirs under the index root —
    ``require_success=False`` includes torn builds (so the NEXT
    version number never collides with any existing dir, complete or
    not), ``True`` is the read path's visibility filter."""
    out = []
    if fs.exists(root):
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if not (st.isDirectory() and name.startswith("v-")):
                continue
            if require_success and not fs.exists(
                st.getPath().suffix("/_SUCCESS")
            ):
                continue
            out.append(int(name[2:]))
    return sorted(out)


def _next_ann_version(fs, root) -> int:
    """max+1, NOT count: a vacuumed/removed old version must never
    make a new write collide with (and corrupt) a live one."""
    vs = _ann_versions(fs, root, require_success=False)
    return (vs[-1] + 1) if vs else 0


def build_ann_index(
    corpus: DataFrame,
    path: str,
    m: int = 4,
    k: int = 8,
    n_clusters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    trained: bool = False,
    sample: int = 2048,
    iters: int = 5,
) -> dict:
    """Persist the full IVF-PQ index as a VERSIONED table artifact (r9
    verdict item 6) — the build-once-serve-many split a real 100-TB
    similarity pipeline needs: codebooks and cell assignments are paid
    once per corpus version, then every query batch reads the
    artifact instead of re-encoding the corpus per run.

    Layout under ``path`` (one ``v-%06d`` dir per build, ``_SUCCESS``
    committed last — same crash-visibility contract as the dedup
    signature store; :func:`load_ann_index` reads the latest complete
    version):

    - ``codes/``   — (id, code, __err) PARTITIONED BY ``cell``: a
      served query's probed-cells-only scan becomes partition-pruned
      directory reads (``ivfpq_topk(prune_codes=True)``);
    - ``books/``   — (i, j, center) PQ codebook rows (m*k, tiny);
    - ``centers/`` — (cell, center) coarse centroids (n_clusters,
      tiny);
    - ``meta/``    — one row of build parameters.

    ``trained=True`` fits Lloyd codebooks (:func:`train_pq_codebooks`,
    deterministic sample + seed) instead of the zero-training seeds.
    Returns the meta dict (incl. the committed ``version``).
    """
    import os

    spark = corpus.sparkSession
    jvm, fs, root = _ann_fs(spark, path)
    version = _next_ann_version(fs, root)
    vdir = os.path.join(path, f"v-{version:06d}")

    books = (
        train_pq_codebooks(corpus, m=m, k=k, sample=sample, iters=iters,
                           id_col=id_col, vec_col=vec_col)
        if trained
        else seed_pq_codebooks(corpus, m=m, k=k, id_col=id_col, vec_col=vec_col)
    )
    centers = _seed_centers(corpus, n_clusters, id_col, vec_col)
    enc = pq_encode(
        corpus,
        books,
        id_col,
        vec_col,
        extra_cols=[_nearest_index(F.col(vec_col), centers).alias("cell")],
        err_col="__err",
    )
    (
        enc.repartition("cell")
        .write.partitionBy("cell")
        .parquet(os.path.join(vdir, "codes"))
    )
    spark.createDataFrame(
        [(i, j, [float(x) for x in c]) for i, sub in enumerate(books) for j, c in enumerate(sub)],
        "i int, j int, center array<double>",
    ).repartition(1).write.parquet(os.path.join(vdir, "books"))
    spark.createDataFrame(
        [(cell, [float(x) for x in c]) for cell, c in enumerate(centers)],
        "cell int, center array<double>",
    ).repartition(1).write.parquet(os.path.join(vdir, "centers"))
    meta = {
        "version": version,
        "m": m,
        "k": k,
        "n_clusters": n_clusters,
        "trained": trained,
        "id_col": id_col,
        "vec_col": vec_col,
        "parent": None,
    }
    _write_ann_meta(spark, vdir, meta)
    fs.create(jvm.org.apache.hadoop.fs.Path(vdir, "_SUCCESS"), True).close()
    return meta


_ANN_META_SCHEMA = (
    "version int, m int, k int, n_clusters int, trained boolean, "
    "id_col string, vec_col string, parent int, tag string"
)


def _write_ann_meta(spark: SparkSession, vdir: str, meta: dict) -> None:
    import os

    # .get: metas written before a field existed (e.g. pre-r12 'tag')
    # flow through as NULL — per-version meta dirs read independently,
    # so mixed-schema chains are fine
    spark.createDataFrame(
        [tuple(meta.get(f.split(" ")[0]) for f in _ANN_META_SCHEMA.split(", "))],
        _ANN_META_SCHEMA,
    ).repartition(1).write.parquet(os.path.join(vdir, "meta"))


def _find_ann_tag(spark: SparkSession, path: str, tag: str) -> dict | None:
    """Meta of the complete chain version already carrying ``tag``,
    or None — the replay-idempotency scan behind the maintenance
    writers' ``tag`` parameter (bounded by chain length: one tiny
    one-row meta read per version, the same cost the chain walk in
    ``load_ann_index`` already pays)."""
    import os

    jvm, fs, root = _ann_fs(spark, path)
    for v in _ann_versions(fs, root, require_success=True):
        vdir = os.path.join(path, f"v-{v:06d}")
        row = spark.read.parquet(os.path.join(vdir, "meta")).first()
        meta = row.asDict()
        if meta.get("tag") == tag:
            return meta
    return None


def append_ann_index(
    new_vectors: DataFrame,
    path: str,
    version: int | None = None,
    tag: str | None = None,
) -> dict:
    """Grow a persisted index INCREMENTALLY — the continuously
    ingesting corpus case, where rebuilding a 10^10-vector index per
    increment is not viable. The new batch is encoded with the
    chain's FROZEN codebooks and coarse centers (quantizer drift
    would silently corrupt ADC distances against old codes), its
    cell-partitioned codes land in a NEW version dir, and the meta
    row records the parent version — old codes are referenced in
    place, zero bytes move. :func:`load_ann_index` unions the chain,
    so served queries see base + every increment; re-train by running
    :func:`build_ann_index` again (a fresh base, parent-less).

    New ids must be disjoint from the chain's (an id appended twice
    would serve duplicate neighbors) — enforced with one id-column
    semi-join scan, digest-width at any scale. Returns the committed
    meta (incl. ``version`` and ``parent``).

    ``tag`` makes the append IDEMPOTENT per logical batch (the
    streaming-maintenance contract, same as the signature/profile
    stores): a tag already carried by a complete chain version
    returns that version's meta without writing anything."""
    import os

    spark = new_vectors.sparkSession
    if tag is not None:
        prior = _find_ann_tag(spark, path, tag)
        if prior is not None:
            return prior  # replayed batch: already admitted
    idx = load_ann_index(spark, path, version)
    meta = idx["meta"]
    id_col, vec_col = meta["id_col"], meta["vec_col"]
    dup = (
        new_vectors.select(F.col(id_col).alias("id"))
        .join(idx["codes"].select("id"), "id", "left_semi")
        .limit(1)
        .count()
    )
    if dup:
        raise ValueError(
            "append_ann_index: new ids overlap the index chain; "
            "appends must carry previously-unseen ids"
        )
    jvm, fs, root = _ann_fs(spark, path)
    version = _next_ann_version(fs, root)
    vdir = os.path.join(path, f"v-{version:06d}")
    enc = pq_encode(
        new_vectors,
        idx["books"],
        id_col,
        vec_col,
        extra_cols=[_nearest_index(F.col(vec_col), idx["centers"]).alias("cell")],
        err_col="__err",
    )
    enc.repartition("cell").write.partitionBy("cell").parquet(
        os.path.join(vdir, "codes")
    )
    new_meta = dict(meta, version=version, parent=meta["version"], tag=tag)
    _write_ann_meta(spark, vdir, new_meta)
    fs.create(jvm.org.apache.hadoop.fs.Path(vdir, "_SUCCESS"), True).close()
    return new_meta


def delete_from_ann_index(
    ids: DataFrame,
    path: str,
    version: int | None = None,
    tag: str | None = None,
) -> dict:
    """Remove vectors from a persisted index without rewriting any
    codes — the tombstone half of incremental maintenance (dedup and
    takedown pipelines REMOVE corpus members as often as ingestion
    adds them). A new chain version holds only a ``tombstones/`` id
    table (+ meta with the parent); :func:`load_ann_index` anti-joins
    the chain's accumulated tombstones out of the unioned codes, so
    served queries never return a deleted neighbor and zero code
    bytes move. Missing ids are a no-op (Delta DELETE semantics).
    ``ids``: one column, the index's id column. Re-adding a deleted
    id later via :func:`append_ann_index` works — the append
    id-disjointness check runs against the LIVE (post-tombstone)
    code set. ``tag``: replay idempotency, as on
    :func:`append_ann_index`."""
    import os

    spark = ids.sparkSession
    if tag is not None:
        prior = _find_ann_tag(spark, path, tag)
        if prior is not None:
            return prior  # replayed batch: already applied
    # meta-only load: a tombstone write needs the chain head's meta,
    # not the books/centers collects or the codes union
    meta = load_ann_index(spark, path, version, meta_only=True)["meta"]
    jvm, fs, root = _ann_fs(spark, path)
    new_version = _next_ann_version(fs, root)
    vdir = os.path.join(path, f"v-{new_version:06d}")
    ids.toDF("id").dropDuplicates(["id"]).repartition(1).write.parquet(
        os.path.join(vdir, "tombstones")
    )
    new_meta = dict(meta, version=new_version, parent=meta["version"], tag=tag)
    _write_ann_meta(spark, vdir, new_meta)
    fs.create(jvm.org.apache.hadoop.fs.Path(vdir, "_SUCCESS"), True).close()
    return new_meta


def compact_ann_index(spark: SparkSession, path: str, sweep: bool = True) -> dict:
    """Fold an index CHAIN into one parent-less version — the
    lifecycle twin of ``dedup.compact_near_dedup_store`` (r10 verdict
    item 3): a long-lived incrementally-maintained index accumulates
    append/delete versions forever, and every served query pays one
    union arm + one anti-join per chain link. Compaction materializes
    the LIVE code set (chain union minus accumulated tombstones) once,
    after which :func:`load_ann_index` resolves in a single read.

    Protocol (each crash window read-correct, same reasoning as the
    profile-store compactor):

    1. write the new version dir — live codes (cell-PARTITIONED, so
       probed-cells pruning survives compaction), the base's frozen
       books/centers, a parent-less meta — with ``_SUCCESS`` last: a
       crash before the marker leaves the chain authoritative (the
       incomplete dir is invisible to loads and reaped by the next
       compaction's sweep);
    2. the ``_SUCCESS`` create IS the commit: loads serve the highest
       complete version, now the compacted one, and the old chain
       became garbage in the same instant;
    3. delete every older version dir — pure housekeeping; a crash
       mid-sweep changes nothing a reader serves, and leftovers are
       reaped by the next compaction.

    Compaction DESTROYS pinned-version history by design — the chain
    is a maintenance log, not time travel (the manifest tables in
    ``sources/manifest.py`` own that contract); run it when chain
    length, not history, is what you're paying for.

    CONCURRENT READERS: step 3's sweep assumes no LIVE reader holds a
    lazy DataFrame over the old chain — ``load_ann_index`` returns
    lazy scans, and a query planned before compaction that
    materializes after the sweep fails with FileNotFound (the crash
    windows above cover the WRITER, not readers). When readers may
    overlap maintenance, pass ``sweep=False``: the old dirs are left
    in place (still invisible to new loads — version resolution picks
    the highest complete dir) and the NEXT compaction's sweep reaps
    them, giving in-flight queries one full compaction interval of
    grace. Returns {'versions_before', 'version', 'undeleted'}."""
    import os

    idx = load_ann_index(spark, path)
    meta = idx["meta"]
    jvm, fs, root = _ann_fs(spark, path)
    all_vs = _ann_versions(fs, root, require_success=False)
    new_version = _next_ann_version(fs, root)
    vdir = os.path.join(path, f"v-{new_version:06d}")
    (
        idx["codes"]
        .repartition("cell")
        .write.partitionBy("cell")
        .parquet(os.path.join(vdir, "codes"))
    )
    spark.createDataFrame(
        [
            (i, j, [float(x) for x in c])
            for i, sub in enumerate(idx["books"])
            for j, c in enumerate(sub)
        ],
        "i int, j int, center array<double>",
    ).repartition(1).write.parquet(os.path.join(vdir, "books"))
    spark.createDataFrame(
        [(cell, [float(x) for x in c]) for cell, c in enumerate(idx["centers"])],
        "cell int, center array<double>",
    ).repartition(1).write.parquet(os.path.join(vdir, "centers"))
    _write_ann_meta(
        spark, vdir, dict(meta, version=new_version, parent=None, tag=None)
    )
    fs.create(jvm.org.apache.hadoop.fs.Path(vdir, "_SUCCESS"), True).close()
    undeleted: list[int] = []
    for v in all_vs:
        if v >= new_version:
            continue
        if not sweep:
            undeleted.append(v)  # grace mode: next compaction reaps
            continue
        p = jvm.org.apache.hadoop.fs.Path(os.path.join(path, f"v-{v:06d}"))
        if not fs.delete(p, True):
            undeleted.append(v)
    return {
        "versions_before": len(all_vs),
        "version": new_version,
        "undeleted": undeleted,
    }


def load_ann_index(
    spark: SparkSession,
    path: str,
    version: int | None = None,
    meta_only: bool = False,
) -> dict:
    """Load a :func:`build_ann_index` artifact: {'books', 'centers',
    'codes' (lazy DataFrame, cell-partitioned), 'meta'}. Latest
    ``_SUCCESS``-complete version unless pinned. The books/centers
    collects are bounded by construction (m*k and n_clusters rows) —
    the corpus-sized part of the index stays a lazy scan.
    ``meta_only=True`` skips them all and returns just {'meta'} (the
    tombstone-write path needs nothing else).

    An APPENDED version (:func:`append_ann_index`) resolves through
    its parent chain: codes are the UNION of every chain member's
    cell-partitioned dir (one read per dir — a pruning filter pushed
    by ``ivfpq_topk(prune_codes=True)`` lands below each union arm,
    so partition pruning survives the chain), books/centers come from
    the chain's base. Meta walks are bounded by chain length (tiny
    one-row reads)."""
    import os

    jvm, fs, root = _ann_fs(spark, path)
    complete = _ann_versions(fs, root, require_success=True)
    if not complete:
        raise FileNotFoundError(f"no complete ANN index version under {path!r}")
    v = max(complete) if version is None else int(version)
    if v not in complete:
        raise FileNotFoundError(f"ANN index version {v} not complete under {path!r}")
    vdir = os.path.join(path, f"v-{v:06d}")
    mrow = spark.read.parquet(os.path.join(vdir, "meta")).first()
    meta = mrow.asDict()
    if meta_only:
        return {"meta": meta}
    # resolve the parent chain: codes dirs newest-to-base; books and
    # centers live at the base (appends freeze the quantizers)
    chain = [v]
    cur = meta
    while cur.get("parent") is not None:
        p = int(cur["parent"])
        if p not in complete:
            raise FileNotFoundError(
                f"ANN index version {v} chains to incomplete parent {p}"
            )
        chain.append(p)
        cur = (
            spark.read.parquet(os.path.join(path, f"v-{p:06d}", "meta"))
            .first()
            .asDict()
        )
    vdir = os.path.join(path, f"v-{chain[-1]:06d}")  # base: books/centers
    m, k = meta["m"], meta["k"]
    books = [[None] * k for _ in range(m)]
    for r in spark.read.parquet(os.path.join(vdir, "books")).collect():
        books[r["i"]][r["j"]] = list(r["center"])
    centers_rows = spark.read.parquet(os.path.join(vdir, "centers")).collect()
    centers = [None] * len(centers_rows)
    for r in centers_rows:
        centers[r["cell"]] = list(r["center"])
    def _exists(cv: int, sub: str) -> bool:
        return fs.exists(
            jvm.org.apache.hadoop.fs.Path(os.path.join(path, f"v-{cv:06d}", sub))
        )

    # replay the chain base -> newest: each version either ADDS codes
    # (build/append) or MASKS the accumulated set with tombstones
    # (delete). A tombstone epoch masks only what PRECEDED it, so a
    # later re-append of a deleted id is live again. No broadcast
    # hint on the anti-join: tombstone sets are usually
    # takedown-sized (AQE broadcasts them), but a mass-delete epoch
    # can be arbitrarily large — let the planner pick.
    codes = None
    for cv in reversed(chain):
        vpath = os.path.join(path, f"v-{cv:06d}")
        if _exists(cv, "codes"):
            part = spark.read.parquet(os.path.join(vpath, "codes"))
            codes = part if codes is None else codes.unionByName(part)
        if _exists(cv, "tombstones") and codes is not None:
            tombs = spark.read.parquet(os.path.join(vpath, "tombstones"))
            codes = codes.join(tombs.dropDuplicates(["id"]), "id", "left_anti")
    return {
        "books": books,
        "centers": centers,
        "codes": codes,
        "meta": meta,
    }


# ------------------------------------------------------- query registry

N_QUERIES = 10

# per-(process, sf) home of the served-index artifact the
# 'ivfpq_served' leg answers from (built on first use, reused after)
_SERVED_IDX_CACHE: dict[str, str] = {}


def similarity_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def _load(spark, sf):
        emb = spark.read.parquet(f"{sf}/embeddings.parquet")
        return emb, emb.where(F.col("vec_id") < N_QUERIES)

    def q_topk_recall(spark, sf):
        # exact top-k + sign-bit-LSH top-k + per-query recall@5 of the
        # approximate path, all in one tagged entry (the driver's
        # correctness pass caps at 50 queries): 'brute'/'lsh' rows
        # carry val=cosine_sim; 'recall' rows carry val=recall@5.
        corpus, queries = _load(spark, sf)
        b = brute_force_topk(corpus, queries, k=5)
        l = lsh_topk(corpus, queries, k=5, n_bits=8)
        pair_rows = b.select(F.lit("brute").alias("kind"), "*").unionByName(
            l.select(F.lit("lsh").alias("kind"), "*")
        ).select("kind", "query_id", "rank", "neighbor_id", F.col("cosine_sim").alias("val"))
        recall_rows = ann_recall(b, l).select(
            F.lit("recall").alias("kind"),
            "query_id",
            F.lit(None).cast("int").alias("rank"),
            F.lit(None).cast("long").alias("neighbor_id"),
            F.col("recall").alias("val"),
        )
        return pair_rows.unionByName(recall_rows)

    def q_ivf(spark, sf):
        """Three tagged legs through one hash-matched result — the
        full production ANN ladder, every stage oracle-replayed:

        - 'ivf_recall': seed-centroid IVF (assign -> probe -> cell
          scan -> top-k) recall@5 vs exact brute force; rows carry
          val=recall (rank/neighbor null).
        - 'pq': PQ-ADC with exact re-rank over seed codebooks
          (:func:`seed_pq_codebooks` — zero-training, so the DuckDB
          twin recomputes codes, LUTs, the ADC shortlist, and the
          re-ranked top-k from the corpus alone); rows carry the final
          (rank, neighbor_id, val=exact d2) — a bit-level check of the
          ADC scan AND the re-rank.
        - 'ivfpq': the combined layout (coarse cells x PQ codes x
          exact re-rank), same row shape as 'pq'.
        - 'ivfpq_served': the SAME ladder answered from a PERSISTED
          index artifact (:func:`build_ann_index` to a scratch dir,
          :func:`load_ann_index`, probed-cells-only partition-pruned
          codes scan) — hash-compared against the same DuckDB twin
          as 'ivfpq', so save -> load -> query agreement with the
          build-fresh path is pinned row for row, and the index
          build cost is amortized out of query time.
        - 'pq_trained': the PRODUCTION Lloyd-trained codebooks
          (:func:`train_pq_codebooks` — deterministic sample, fixed
          seed) through the same encode -> ADC -> exact re-rank
          ladder. Lloyd iterations aren't SQL-replayable, so the
          driver row is an in-query quality assertion (val=1.0 when it
          holds): trained mean quantization DISTORTION — Lloyd's own
          objective, read off each persisted encode's ``err_col`` at
          agg cost (standalone gauge: :func:`pq_distortion`) — must be
          <= the seed books', and the trained ladder must return a
          full k rows per query. Training is deterministic (ordered
          sample, seeded RNG), so the check is stable run to run.

        KMeans centroids stay the quality default for IVF cells; the
        seed variants exist exactly so the 'pq'/'ivfpq' legs are
        engine-reproducible bit-for-bit (tests/test_pq.py additionally
        pins the trained path's absolute recall).
        """
        from data_integration_and_harmonization_spark.functions.caching import track

        corpus, queries = _load(spark, sf)
        # one small table feeds 4 pipelines + 2 driver collects
        # (seed centers + codebooks) — persist; the driver wrapper
        # releases it at the next query boundary
        corpus = track(corpus.persist())
        queries = corpus.where(F.col("vec_id") < N_QUERIES)
        books = seed_pq_codebooks(corpus, m=4, k=8)
        exact = brute_force_topk(corpus, queries, k=5)
        approx = ivf_topk(corpus, queries, k=5, n_clusters=8, n_probe=2, centroids="seed")
        recall_rows = ann_recall(exact, approx).select(
            F.lit("ivf_recall").alias("kind"),
            "query_id",
            F.lit(None).cast("int").alias("rank"),
            F.lit(None).cast("long").alias("neighbor_id"),
            F.col("recall").alias("val"),
        )
        # build-once-query-many: ONE persisted encode (codes + cell)
        # and ONE persisted LUT table serve both the PQ and IVF-PQ
        # legs — the way a served index amortizes its build
        centers = _seed_centers(corpus, 8, "vec_id", "embedding")
        enc = track(
            pq_encode(
                corpus,
                books,
                extra_cols=[_nearest_index(F.col("embedding"), centers).alias("cell")],
                err_col="__err",
            ).persist()
        )
        q = queries.select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec")
        )
        luts = track(_query_luts(q, books).persist())
        pq_res = pq_topk(corpus, queries, books, k=5, refine=4, codes=enc, luts=luts)
        pq_rows = pq_res.select(
            F.lit("pq").alias("kind"),
            "query_id",
            "rank",
            "neighbor_id",
            F.col("d2").alias("val"),
        )
        ivfpq_rows = ivfpq_topk(
            corpus, queries, books, k=5, n_clusters=8, n_probe=2, refine=4,
            codes=enc, luts=luts,
        ).select(
            F.lit("ivfpq").alias("kind"),
            "query_id",
            "rank",
            "neighbor_id",
            F.col("d2").alias("val"),
        )
        # served-from-artifact leg: build the index ONCE per
        # (process, sf) and reuse it across invocations — the serve
        # path is what this leg times; rebuilding per run would put
        # index-build I/O inside every timed bench pass, the exact
        # amortization the artifact exists to provide. Reuse is safe:
        # the build is deterministic in (corpus, params).
        import os as _os

        from data_integration_and_harmonization_spark.functions.caching import (
            scratch_dir,
        )

        # scratch path minted on the MAIN thread (scratch_dir's root
        # init isn't thread-safe); the build itself runs in the pool.
        cache_key = _os.path.abspath(sf)
        _new_idx_dir = (
            scratch_dir("ann_index") + "/idx"
            if _SERVED_IDX_CACHE.get(cache_key) is None
            else None
        )

        def _served_chain():
            idx_dir = _SERVED_IDX_CACHE.get(cache_key)
            if idx_dir is None:
                idx_dir = _new_idx_dir
                build_ann_index(corpus, idx_dir, m=4, k=8, n_clusters=8)
                # r11: the served artifact exercises the FULL
                # maintenance lifecycle before first use — tombstone a
                # slice, re-append the same vectors (legal: the
                # disjointness check runs against the LIVE set),
                # compact the 3-link chain to one parent-less version.
                # Encoding is deterministic under the frozen
                # quantizers, so the live set is bit-identical to the
                # fresh build — the hash-matched served rows below
                # therefore double as the delete->append->compact
                # equivalence pin, against the UNCHANGED DuckDB twin.
                slice_back = corpus.where(F.col("vec_id") % 5 == 2)
                delete_from_ann_index(slice_back.select("vec_id"), idx_dir)
                append_ann_index(slice_back, idx_dir)
                compact_ann_index(spark, idx_dir)
                _SERVED_IDX_CACHE[cache_key] = idx_dir
            idx = load_ann_index(spark, idx_dir)
            return ivfpq_topk(
                corpus, queries, idx["books"], k=5, n_clusters=8, n_probe=2,
                refine=4, codes=idx["codes"], centers=idx["centers"],
                prune_codes=True,
            ).select(
                F.lit("ivfpq_served").alias("kind"),
                "query_id",
                "rank",
                "neighbor_id",
                F.col("d2").alias("val"),
            )
        # Lloyd-trained leg: same ladder, production codebooks — and
        # the same build-once-query-many split as the seed leg: ONE
        # persisted trained encode (different books can't reuse `enc`)
        # feeds the ADC scan, the re-rank, AND the distortion gauge.
        # Quality assertion = DISTORTION, Lloyd's own objective (the
        # trained books must quantize the corpus with lower mean
        # reconstruction error than the zero-training seeds; recall@k
        # would be the wrong gauge — the seed centroids ARE the query
        # vectors, which query-aligns their shortlists). Both
        # distortions are avg(err_col) over the already-persisted
        # encodes — two tiny aggs, no extra corpus scans. Measured:
        # trained ~0.84 vs seed ~1.22 at every sf, a 3x margin over
        # the tolerance.
        def _trained_chain():
            t_books = train_pq_codebooks(corpus, m=4, k=8, sample=2048, iters=5)
            t_enc = track(pq_encode(corpus, t_books, err_col="__err").persist())
            t_luts = track(_query_luts(q, t_books).persist())
            t_n = pq_topk(
                corpus, queries, t_books, k=5, refine=4, codes=t_enc, luts=t_luts
            ).count()
            n_q = queries.count()
            d_trained = t_enc.agg(F.avg("__err")).collect()[0][0]
            return t_n, n_q, d_trained

        # r13 optimization (guide §2.6): the served-artifact chain
        # (build/maintain/load on first invocation), the Lloyd-trained
        # chain (5 training iterations + three gauge actions), and the
        # seed-encode distortion agg (which also pre-materializes the
        # enc/luts caches the pq/ivfpq serve legs read) are
        # independent; before they ran back-to-back, each a string of
        # short jobs. Concurrent driver threads overlap them; every
        # chain is deterministic in isolation, so values are
        # unchanged.
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=3) as _tpool:
            _f_served = _tpool.submit(_served_chain)
            _f_trained = _tpool.submit(_trained_chain)
            _f_dseed = _tpool.submit(
                lambda: enc.agg(F.avg("__err")).collect()[0][0]
            )
            served_rows = _f_served.result()
            t_n, n_q, d_trained = _f_trained.result()
            d_seed = _f_dseed.result()
        ok = d_trained <= d_seed + 1e-9 and t_n == 5 * n_q
        trained_row = spark.range(1).select(
            F.lit("pq_trained").alias("kind"),
            F.lit(None).cast("long").alias("query_id"),
            F.lit(None).cast("int").alias("rank"),
            F.lit(None).cast("long").alias("neighbor_id"),
            F.lit(1.0 if ok else 0.0).alias("val"),
        )
        return (
            recall_rows.unionByName(pq_rows)
            .unionByName(ivfpq_rows)
            .unionByName(served_rows)
            .unionByName(trained_row)
        )

    return {
        "sim_topk_recall": q_topk_recall,
        "sim_ivf_recall": q_ivf,
    }


_DOT = (
    "list_sum(list_transform(range(1, len(q.embedding) + 1), "
    "i -> CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))"
)
_QNORM = "sqrt(list_sum(list_transform(q.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
_CNORM = "sqrt(list_sum(list_transform(c.embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"

_BUCKET = (
    "list_sum(list_transform(range(1, 9), "
    "i -> CASE WHEN CAST({t}.embedding[i] AS DOUBLE) >= 0 THEN (1 << (i - 1)) ELSE 0 END))"
)


def similarity_oracles() -> dict[str, str]:
    brute = f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST({_DOT} AS DOUBLE) / ({_QNORM} * {_CNORM}) AS sim
  FROM embeddings c CROSS JOIN (SELECT * FROM embeddings WHERE vec_id < {N_QUERIES}) q
  WHERE q.vec_id <> c.vec_id
), ranked AS (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, rank::INTEGER AS rank, neighbor_id, round(sim, 6) AS cosine_sim
FROM ranked WHERE rank <= 5
"""
    lsh = f"""
WITH scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         CAST({_DOT} AS DOUBLE) / ({_QNORM} * {_CNORM}) AS sim
  FROM embeddings c
  JOIN (SELECT * FROM embeddings WHERE vec_id < {N_QUERIES}) q
    ON {_BUCKET.format(t='q')} = {_BUCKET.format(t='c')}
  WHERE q.vec_id <> c.vec_id
), ranked AS (
  SELECT query_id, neighbor_id, sim,
         row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
  FROM scored
)
SELECT query_id, rank::INTEGER AS rank, neighbor_id, round(sim, 6) AS cosine_sim
FROM ranked WHERE rank <= 5
"""
    recall = f"""
WITH exact AS (
  {brute}
), approx AS (
  {lsh}
)
SELECT e.query_id,
  round(CAST(count(a.neighbor_id) AS DOUBLE) / count(*), 6) AS recall
FROM exact e
LEFT JOIN approx a ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
GROUP BY e.query_id
"""
    topk_recall = f"""
SELECT 'brute' AS kind, query_id, rank, neighbor_id, cosine_sim AS val FROM ({brute})
UNION ALL
SELECT 'lsh' AS kind, query_id, rank, neighbor_id, cosine_sim AS val FROM ({lsh})
UNION ALL
SELECT 'recall' AS kind, query_id, CAST(NULL AS INTEGER) AS rank,
       CAST(NULL AS BIGINT) AS neighbor_id, recall AS val
FROM ({recall})
"""
    d2 = (
        "list_sum(list_transform(range(1, len(c.embedding) + 1), "
        "i -> (CAST(c.embedding[i] AS DOUBLE) - ct.center[i]) "
        "* (CAST(c.embedding[i] AS DOUBLE) - ct.center[i])))"
    )
    qd2 = d2.replace("c.embedding", "q.embedding")
    # PQ twin (m=4 subspaces x 16 dims, k=8 seed centroids, the same
    # first-8-by-id vectors as the IVF cells): sub-d2 of entity e's
    # i-th subvector to center ct — the element order and double casts
    # mirror squared_distance's sequential fold exactly.
    m, ds, refine_n = 4, 16, 20  # k*refine = 5*4
    subd2_e = (
        f"list_sum(list_transform(range(1, {ds} + 1), "
        f"j -> (CAST(e.embedding[s.i * {ds} + j] AS DOUBLE) - ct.center[s.i * {ds} + j]) "
        f"* (CAST(e.embedding[s.i * {ds} + j] AS DOUBLE) - ct.center[s.i * {ds} + j])))"
    )
    subd2_q = subd2_e.replace("e.embedding", "q.embedding")
    full_d2 = (
        "list_sum(list_transform(range(1, len(q.embedding) + 1), "
        "j -> (CAST(q.embedding[j] AS DOUBLE) - CAST(c.embedding[j] AS DOUBLE)) "
        "* (CAST(q.embedding[j] AS DOUBLE) - CAST(c.embedding[j] AS DOUBLE))))"
    )
    # ADC sum written as 4 explicit lookups added left-to-right — the
    # same order _adc_score evaluates, so float association matches.
    adc_sum = " + ".join(f"l.lut{i}[cd.c{i} + 1]" for i in range(m))
    code_pivot = ", ".join(
        f"max(CASE WHEN i = {i} THEN code END) AS c{i}" for i in range(m)
    )
    lut_pivot = ", ".join(
        f"max(CASE WHEN i = {i} THEN lut END) AS lut{i}" for i in range(m)
    )

    def shortlist_rerank(adc_cte: str, out: str) -> str:
        return f"""{out}_short AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id ORDER BY approx_d2, neighbor_id) AS rn
    FROM {adc_cte}
  ) WHERE rn <= {refine_n}
), {out}_final AS (
  SELECT query_id, rank, neighbor_id, round(d2, 6) AS d2 FROM (
    SELECT query_id, neighbor_id, d2,
           row_number() OVER (PARTITION BY query_id ORDER BY d2, neighbor_id) AS rank
    FROM (
      SELECT s.query_id, s.neighbor_id, {full_d2} AS d2
      FROM {out}_short s
      JOIN embeddings q ON q.vec_id = s.query_id
      JOIN embeddings c ON c.vec_id = s.neighbor_id
    )
  ) WHERE rank <= 5
)"""

    ivf = f"""
WITH cent AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cell,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS center
  FROM embeddings ORDER BY vec_id LIMIT 8
), assigned_cell AS (
  SELECT neighbor_id, cell FROM (
    SELECT c.vec_id AS neighbor_id, ct.cell,
           row_number() OVER (PARTITION BY c.vec_id ORDER BY {d2}, ct.cell) AS rn
    FROM embeddings c CROSS JOIN cent ct
  ) WHERE rn = 1
), probes AS (
  SELECT query_id, cell FROM (
    SELECT q.vec_id AS query_id, ct.cell,
           row_number() OVER (PARTITION BY q.vec_id ORDER BY {qd2}, ct.cell) AS rn
    FROM (SELECT * FROM embeddings WHERE vec_id < {N_QUERIES}) q CROSS JOIN cent ct
  ) WHERE rn <= 2
), scored AS (
  SELECT q.vec_id AS query_id, a.neighbor_id,
         CAST({_DOT} AS DOUBLE) / ({_QNORM} * {_CNORM}) AS sim
  FROM assigned_cell a
  JOIN probes p ON p.cell = a.cell
  JOIN embeddings q ON q.vec_id = p.query_id
  JOIN embeddings c ON c.vec_id = a.neighbor_id
  WHERE q.vec_id <> a.neighbor_id
), approx AS (
  SELECT query_id, neighbor_id FROM (
    SELECT query_id, neighbor_id,
           row_number() OVER (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
    FROM scored
  ) WHERE rank <= 5
), exact AS (
  {brute}
), sub AS (
  SELECT unnest(range({m})) AS i
), codes AS (
  -- PQ encode: per (vector, subspace) the nearest seed centroid, ties
  -- to the lower index — cent doubles as the codebook source (the
  -- subspace slice of the same first-8 vectors seed_pq_codebooks uses)
  SELECT vec_id, i, code FROM (
    SELECT e.vec_id, s.i, ct.cell AS code,
           row_number() OVER (PARTITION BY e.vec_id, s.i ORDER BY {subd2_e}, ct.cell) AS rn
    FROM embeddings e CROSS JOIN sub s CROSS JOIN cent ct
  ) WHERE rn = 1
), codesp AS (
  SELECT vec_id, {code_pivot} FROM codes GROUP BY 1
), lutrows AS (
  SELECT q.vec_id AS query_id, s.i, ct.cell AS c, {subd2_q} AS d2c
  FROM (SELECT * FROM embeddings WHERE vec_id < {N_QUERIES}) q
  CROSS JOIN sub s CROSS JOIN cent ct
), lutp AS (
  SELECT query_id, {lut_pivot} FROM (
    SELECT query_id, i, list(d2c ORDER BY c) AS lut FROM lutrows GROUP BY 1, 2
  ) GROUP BY 1
), pq_adc AS (
  SELECT l.query_id, cd.vec_id AS neighbor_id, {adc_sum} AS approx_d2
  FROM codesp cd CROSS JOIN lutp l
  WHERE l.query_id <> cd.vec_id
), {shortlist_rerank('pq_adc', 'pq')}
, ivfpq_adc AS (
  SELECT p.query_id, a.neighbor_id, {adc_sum} AS approx_d2
  FROM assigned_cell a
  JOIN probes p ON p.cell = a.cell
  JOIN codesp cd ON cd.vec_id = a.neighbor_id
  JOIN lutp l ON l.query_id = p.query_id
  WHERE p.query_id <> a.neighbor_id
), {shortlist_rerank('ivfpq_adc', 'ivfpq')}
SELECT 'ivf_recall' AS kind, e.query_id, CAST(NULL AS INTEGER) AS rank,
       CAST(NULL AS BIGINT) AS neighbor_id,
       round(CAST(count(a.neighbor_id) AS DOUBLE) / count(*), 6) AS val
FROM exact e
LEFT JOIN approx a ON e.query_id = a.query_id AND e.neighbor_id = a.neighbor_id
GROUP BY e.query_id
UNION ALL
SELECT 'pq', query_id, rank::INTEGER, neighbor_id, d2 FROM pq_final
UNION ALL
SELECT 'ivfpq', query_id, rank::INTEGER, neighbor_id, d2 FROM ivfpq_final
UNION ALL
-- ivfpq_served: the engine answers the SAME ladder from the persisted
-- index artifact (save -> load -> partition-pruned query); agreement
-- with the build-fresh path means the expected rows are identical
SELECT 'ivfpq_served', query_id, rank::INTEGER, neighbor_id, d2 FROM ivfpq_final
UNION ALL
-- pq_trained: the Lloyd path isn't SQL-replayable; the engine emits
-- 1.0 iff the trained books' mean quantization distortion <= the seed
-- books' AND the trained ladder returns k rows per query
-- (deterministic: ordered sample + seeded RNG) — expected constant.
SELECT 'pq_trained', CAST(NULL AS BIGINT), CAST(NULL AS INTEGER),
       CAST(NULL AS BIGINT), 1.0
"""
    return {
        "sim_topk_recall": topk_recall,
        "sim_ivf_recall": ivf,
    }
