"""duplicated_ngram_stats pins: exact duplicated-fraction semantics on
a corpus with known shared n-grams."""

from __future__ import annotations

from data_integration_and_harmonization_spark.operators.dedup import (
    duplicated_ngram_stats,
)


def test_duplicated_ngram_fraction_exact(spark):
    shared = "one two three four five"          # exactly one 5-gram
    rows = [
        (1, shared + " alpha beta"),            # 3 distinct 5-grams, 1 shared
        (2, shared),                            # 1 5-gram, shared with #1
        (3, "totally different words here now"),# 1 5-gram, unique
        (4, "tiny"),                            # < 5 tokens -> no grams
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.id: (r.n_grams, r.n_dup_grams, r.dup_frac)
           for r in duplicated_ngram_stats(df, gram=5).collect()}
    assert got[1] == (3, 1, round(1 / 3, 6))
    assert got[2] == (1, 1, 1.0)
    assert got[3] == (1, 0, 0.0)
    assert got[4] == (0, 0, 0.0)
