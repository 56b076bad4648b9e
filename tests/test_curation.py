"""Curation-funnel pins: monotone flag chain, per-stage semantics
(quality bounds, language gate, exact + near dedup keep-minimum,
decontamination, deterministic sampling), and funnel-report
consistency with the flags."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_integration_and_harmonization_spark.plans.curation import (
    STAGES,
    curate_annotate,
    curate_and_pack,
    curation_report,
)

GOOD = (
    "the quick brown fox jumps over the lazy dog and then the dog "
    "and the fox walk away to the river where they drink water and rest "
    "for a while before they return home in the evening light together"
)


def _docs(spark):
    rows = [
        (0, GOOD),                          # survives everything
        (1, GOOD + " extra tail words"),    # near-dup of 0 -> dropped at near_dedup
        (2, GOOD),                          # exact dup of 0 -> dropped at exact_dedup
        (3, "short text"),                  # fails quality (too few tokens)
        (4, "le chat et le chien et la maison et le jour et la nuit "
            "et les amis et les autres et encore les mots pour la langue "
            "avec des articles et des pronoms dans une phrase assez longue"),  # fr
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _ann(spark, rate=1.0):
    docs = _docs(spark)
    ev = spark.createDataFrame([("nothing shared here",)], "text string")
    return curate_annotate(docs, ev, sample_rate=rate)


def test_flags_are_monotone_and_staged(spark):
    got = {r.doc_id: r.asDict() for r in _ann(spark).collect()}
    # each stage implies its predecessor
    order = ["quality_pass", "language_pass", "exact_dedup_pass",
             "near_dedup_pass", "decontaminate_pass", "sample_pass"]
    for d in got.values():
        flags = [bool(d[c]) for c in order]
        assert flags == sorted(flags, reverse=True), (d["doc_id"], flags)
    assert got[0]["sample_pass"]                       # clean survivor
    assert got[2]["language_pass"] and not got[2]["exact_dedup_pass"]
    assert got[1]["exact_dedup_pass"] and not got[1]["near_dedup_pass"]
    assert not got[3]["quality_pass"]
    assert got[4]["lang_pred"] == "fr" and not got[4]["language_pass"]


def test_decontamination_stage_drops_eval_overlap(spark):
    docs = _docs(spark)
    # eval set = a verbatim slice of doc 0 -> doc 0 becomes contaminated
    ev = spark.createDataFrame([(GOOD[:120],)], "text string")
    got = {r.doc_id: r.asDict() for r in curate_annotate(docs, ev).collect()}
    assert got[0]["near_dedup_pass"] and not got[0]["decontaminate_pass"]


def test_report_matches_flags_and_pack_totals(spark):
    ann = _ann(spark)
    rep = {r.stage: (r.n_docs, r.n_tokens) for r in curation_report(ann).collect()}
    assert rep["input"][0] == 5
    for s in STAGES:
        n = ann.where(F.col(f"{s}_pass")).count()
        assert rep[s][0] == n, s
    packs = curate_and_pack(ann, chunk_size=16, stride=12, budget=32)
    # every packed token comes from a sampled survivor's chunks
    surv = {r.doc_id for r in ann.where("sample_pass").collect()}
    assert {r.id for r in packs.collect()} <= surv
    assert packs.agg(F.sum("tok_in_pack")).first()[0] > 0
