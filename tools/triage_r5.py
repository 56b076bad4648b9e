"""Round-5 bench triage: per-leg timings for the queries that
regressed r3 -> r4 (samp_deterministic, mm_meta_features,
dedup_clusters, ml_classification trio). Run: python tools/triage_r5.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from data_integration_and_harmonization_spark import get_spark

SF = "/root/testdata/sf0.1"


def t(label, fn, n=2):
    times = []
    for _ in range(n):
        t0 = time.time()
        fn()
        times.append(round(time.time() - t0, 2))
    print(f"{label:40s} {times}", flush=True)


def main():
    spark = get_spark("triage")

    # ---------------- samp_deterministic legs
    from data_integration_and_harmonization_spark.operators.sampling import (
        deterministic_shuffle,
        hash_sample,
        mix_sources,
        stratified_sample,
    )

    keys = ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey"]
    slim = (
        spark.read.parquet(f"{SF}/lineitem.parquet")
        .select(*keys, "l_returnflag", "l_quantity")
        .repartition(spark.sparkContext.defaultParallelism)
        .persist()
    )
    agg = [
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
    ]
    t("samp: persist materialize", lambda: slim.count(), n=1)
    t("samp: hash leg", lambda: hash_sample(slim, keys, 0.1).groupBy("l_returnflag").agg(*agg).count())
    t("samp: stratified leg", lambda: stratified_sample(slim, "l_returnflag", keys, 0.05).groupBy("l_returnflag").agg(*agg).count())
    t(
        "samp: shuffle-rank leg",
        lambda: deterministic_shuffle(hash_sample(slim, keys, 0.1), keys, rank_col="__pos")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("n"), F.sum((F.col("__pos") + 1) * F.col("l_quantity")).alias("s"))
        .count(),
        n=3,
    )
    t(
        "samp: mix leg",
        lambda: mix_sources(
            {"even": slim.where(F.col("l_orderkey") % 2 == 0), "odd": slim.where(F.col("l_orderkey") % 2 == 1)},
            weights={"even": 0.3},
            key_cols=keys,
        )
        .groupBy(F.col("__mix_source"), "l_returnflag")
        .agg(*agg)
        .count(),
    )
    slim.unpersist()

    # ---------------- mm_meta_features legs
    from data_integration_and_harmonization_spark.operators import multimodal as MM
    from data_integration_and_harmonization_spark.functions import media_codecs as MC
    import numpy as np

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    media = MM.to_media_table(
        docs.select("doc_id", F.encode("text", "UTF-8").alias("payload")),
        "doc_id",
        "payload",
        "text/plain",
    )
    y, x, c = np.ogrid[0:16, 0:16, 0:3]
    png = MC.encode_png(((x * 16 + y + c) % 256).astype(np.uint8))
    gif = MC.encode_gif([np.full((8, 8, 3), v, dtype=np.uint8) for v in (30, 60, 90)])
    synth = spark.createDataFrame(
        [(-1, bytearray(png), "image/png"), (-2, bytearray(gif), "image/gif")],
        "media_id long, payload binary, media_type string",
    ).withColumn("n_bytes", F.length("payload").cast("long"))
    t("mm: media projection alone", lambda: media.count())
    t("mm: meta leg", lambda: media.select("media_id", "media_type", "n_bytes", "digest").count())
    t(
        "mm: feature leg (mapInPandas)",
        lambda: MM.extract_features(media.select("media_id", "payload", "media_type", "n_bytes"))
        .select("media_id", "n_bytes", F.posexplode("feature").alias("bucket", "freq"))
        .count(),
    )
    t("mm: real leg (codecs)", lambda: MM.extract_features(synth).count())

    # ---------------- dedup_clusters legs
    from data_integration_and_harmonization_spark.operators.dedup import (
        duplicate_clusters,
        lsh_verified_pairs,
    )
    from data_integration_and_harmonization_spark.operators.linkage import (
        candidate_links,
        resolve_entities,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    t("clusters: lsh_verified_pairs(md5)", lambda: lsh_verified_pairs(docs, threshold=0.5, hash_family="md5").count())
    t(
        "clusters: doc leg total (pairs+CC)",
        lambda: duplicate_clusters(lsh_verified_pairs(docs, threshold=0.5, hash_family="md5")).count(),
    )
    cust = spark.read.parquet(f"{SF}/customer.parquet")
    t(
        "clusters: er candidate_links",
        lambda: candidate_links(cust, "c_custkey", "c_name", ["c_nationkey", "c_mktsegment"], max_edit=1).count(),
    )
    t(
        "clusters: er leg total",
        lambda: resolve_entities(cust, id_col="c_custkey", name_col="c_name", block_cols=["c_nationkey", "c_mktsegment"], max_edit=1).count(),
    )

    # ---------------- ml trio per-fit
    from data_integration_and_harmonization_spark.operators import ml as ML

    li = spark.read.parquet(f"{SF}/lineitem.parquet").where(F.col("l_orderkey") % 20 == 0)
    labeled = li.select(
        "l_quantity",
        "l_discount",
        "l_tax",
        "l_extendedprice",
        F.when(F.col("l_returnflag") == "A", 0)
        .when(F.col("l_returnflag") == "N", 1)
        .otherwise(2)
        .alias("target"),
    )
    t("ml: train_models cls (3 fits)", lambda: ML.train_models(labeled, "target", is_classification=True))

    # per-model timing: monkeypatch zoo to one model at a time
    import data_integration_and_harmonization_spark.operators.ml as mlmod

    orig_zoo = mlmod._model_zoo
    for keep in ["Decision Tree", "Random Forest", "XGBoost"]:
        mlmod._model_zoo = lambda c, s, _k=keep: {_k: orig_zoo(c, s)[_k]}
        t(f"ml: cls fit {keep} only", lambda: ML.train_models(labeled, "target", is_classification=True), n=2)
    mlmod._model_zoo = orig_zoo

    reg = li.select("l_quantity", "l_discount", "l_tax", "l_extendedprice")
    t("ml: train_models reg (3 fits)", lambda: ML.train_models(reg, "l_extendedprice", is_classification=False))

    spark.stop()


if __name__ == "__main__":
    main()
