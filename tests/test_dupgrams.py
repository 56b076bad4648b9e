"""duplicated_ngram_stats / exact_substring_spans pins: exact
duplicated-fraction and merged-span semantics on corpora with known
shared n-grams."""

from __future__ import annotations

from data_integration_and_harmonization_spark.operators.dedup import (
    duplicated_ngram_stats,
    exact_substring_spans,
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


def test_exact_substring_spans_geometry(spark):
    """Merged-span semantics, hand-computed at k=3:

    - docs 1/2 share 'a b c d e' (dup 3-gram starts 0,1,2 -> one
      merged span of 5 tokens) and 'p q r' (start 8 -> its own span);
    - doc 3 is unique -> zeros; doc 4 has < k tokens -> zeros;
    - doc 5 repeats 'r1 r2 r3' WITHIN itself (the suffix-array
      criterion counts any repeat) -> two 3-token spans;
    - docs 6/7 pin the adjacency merge: doc 6's dup starts {0, 3}
      (gap == k) merge into ONE 6-token span, doc 7's dup starts
      {0, 5} (gap > k) stay two spans.
    """
    rows = [
        (1, "a b c d e x y z p q r"),
        (2, "a b c d e m n o p q r"),
        (3, "u v w uu vv ww"),
        (4, "t1 t2"),
        (5, "r1 r2 r3 q1 r1 r2 r3"),
        (6, "s1 s2 s3 s4 s5 s6 f1"),
        (7, "s1 s2 s3 g1 g2 s4 s5 s6 g3"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.id: (r.n_tokens, r.n_dup_spans, r.dup_span_tokens, r.dup_span_frac)
        for r in exact_substring_spans(df, k=3).collect()
    }
    assert got[1] == (11, 2, 8, round(8 / 11, 6))
    assert got[2] == (11, 2, 8, round(8 / 11, 6))
    assert got[3] == (6, 0, 0, 0.0)
    assert got[4] == (2, 0, 0, 0.0)
    assert got[5] == (7, 2, 6, round(6 / 7, 6))
    assert got[6] == (7, 1, 6, round(6 / 7, 6))
    assert got[7] == (9, 2, 6, round(6 / 9, 6))
