"""Text analysis for training-data pipelines (engine extension; no
reference counterpart — SURVEY §7 north-star ops).

All pure ``pyspark.sql.functions`` column expressions — tokenization,
quality scoring, language ID, and fingerprinting stay inside
whole-stage codegen; no Python UDF anywhere, so the per-document cost
is JVM-side and the operators scale linearly with no Arrow transfer.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

TOKEN_RE = r"[A-Za-z0-9_]+"

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deliberately small + deterministic (mirrored in the oracle
# SQL verbatim).
STOPWORDS = {
    "en": ["the", "a", "and", "of", "to", "in", "is", "on", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "ein", "mit", "auf", "zu", "von"],
    "fr": ["le", "la", "les", "et", "est", "un", "une", "dans", "pour", "sur"],
    "es": ["el", "la", "los", "y", "es", "un", "una", "en", "para", "con"],
}


def tokens(col: Column | str) -> Column:
    """Word tokens via regexp — the whitespace+punct tokenizer."""
    return F.regexp_extract_all(F.lower(F.col(col) if isinstance(col, str) else col), F.lit(TOKEN_RE), 0)


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


# GPT-2-flavored pre-tokenizer pattern, restricted to constructs both
# Java regex (Spark) and RE2 (DuckDB) support (no lookahead).
BPE_RE = r"'(?:[sdmt]|ll|ve|re)| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9]+|\s+"


def bpe_token_count(col: Column | str) -> Column:
    """BPE-ish token count: the GPT-2 pre-tokenizer split (contraction
    suffixes, space-prefixed word/number/punct runs). A practical
    stand-in for 'how many tokens will the LLM tokenizer produce' at
    corpus-triage time — no vocab needed, pure regex, codegen'd."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_RE), 0))


def train_bpe_merges(
    df,
    text_col: str = "text",
    n_merges: int = 50,
):
    """Train byte-pair-encoding merge rules over a corpus — the
    Sennrich et al. (2016) algorithm, distributed: the pair statistics
    each round come from ONE Spark aggregation over the distinct-word
    table, and only the (pair, count) winner reaches the driver.

    Round structure (the driver loop is inherent — each merge depends
    on the statistics AFTER the previous merge):

    1. distinct words + corpus frequencies (one groupBy, done once —
       all later rounds operate on this ~|vocab|-row table, NOT the
       corpus);
    2. per round: adjacent-symbol-pair counts weighted by word
       frequency (explode + groupBy, max-by-count with lexicographic
       tie-break so training is deterministic), then a codegen'd
       left-to-right greedy merge of the winning pair inside every
       word's symbol array (``aggregate`` fold — no Python);
    3. stop early when no pair repeats.

    Returns the ordered merge list [(a, b), ...]. At 100 TB step 1 is
    the only corpus-sized pass; the per-round work scales with
    DISTINCT words (Zipf-bounded), which is why classic BPE trainers
    are feasible at web scale. ``n_merges`` Spark jobs of vocab-table
    size are the honest cost of the sequential algorithm.

    Lineage truncation (r10 verdict item; the documented
    connected-components lesson, ``dedup.py`` loop): each round wraps
    ``syms`` in another codegen'd ``aggregate`` fold, so round k would
    otherwise analyze k nested lambdas — O(n^2) analysis time and an
    eventual codegen blowup at large ``n_merges``. Every 16 rounds the
    words table is ``localCheckpoint``-ed (eager), restarting the plan
    from materialized partitions; 16 nested folds stay comfortably
    under the analyzer/Janino limits while amortizing the checkpoint
    I/O (vocab-sized, not corpus-sized) across rounds.
    """
    base = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .withColumn("syms", F.split(F.col("w"), ""))
        .select("syms", "freq")
        .persist()
    )
    words = base
    merges: list[tuple[str, str]] = []
    try:
        for round_no in range(n_merges):
            if round_no and round_no % 16 == 0:
                # truncate the nested-fold lineage (see docstring)
                words = words.localCheckpoint(eager=True)
            pairs = (
                words.select(
                    F.explode(
                        F.expr(
                            "transform(slice(syms, 1, size(syms) - 1),"
                            " (s, i) -> struct(s AS a, element_at(syms, i + 2) AS b))"
                        )
                    ).alias("p"),
                    "freq",
                )
                .groupBy("p")
                .agg(F.sum("freq").alias("n"))
                .where(F.col("n") >= 2)
                # deterministic winner: max count, then lexicographic
                .orderBy(F.desc("n"), F.col("p.a"), F.col("p.b"))
                .limit(1)
                .collect()
            )
            if not pairs:
                break
            a, b = pairs[0]["p"]["a"], pairs[0]["p"]["b"]
            merges.append((a, b))
            merged = a + b
            # greedy non-overlapping left-to-right merge as a fold:
            # append x, except when the accumulated tail is 'a' and x
            # is 'b' — then replace the tail with the merged symbol
            words = words.withColumn(
                "syms",
                F.expr(
                    f"aggregate(syms, cast(array() AS array<string>),"
                    f" (acc, x) -> CASE WHEN size(acc) > 0"
                    f"   AND element_at(acc, -1) = '{a}' AND x = '{b}'"
                    f"  THEN concat(slice(acc, 1, size(acc) - 1),"
                    f"              array('{merged}'))"
                    f"  ELSE concat(acc, array(x)) END)"
                ),
            )
        return merges
    finally:
        # unpersist the frame that was actually persisted (the loop
        # reassigns `words` to derived frames, whose unpersist would
        # be a no-op on the cached vocab table)
        base.unpersist(False)


def bpe_segment_sql(col_sql: str, merges: list[tuple[str, str]]) -> Column:
    """SQL-composed variant of merge replay: pass a column NAME (or
    SQL expression) and get the segmented symbol array after all
    merges. Each merge nests one ``aggregate`` fold around the
    previous — n_merges folds in one whole-stage-codegen projection."""
    src = f"split({col_sql}, '')"
    for a, b in merges:
        ae = a.replace("'", "\\'")
        be = b.replace("'", "\\'")
        me = (a + b).replace("'", "\\'")
        src = (
            f"aggregate({src}, cast(array() AS array<string>),"
            f" (acc, x) -> CASE WHEN size(acc) > 0"
            f"   AND element_at(acc, -1) = '{ae}' AND x = '{be}'"
            f"  THEN concat(slice(acc, 1, size(acc) - 1), array('{me}'))"
            f"  ELSE concat(acc, array(x)) END)"
        )
    return F.expr(src)


def normalized(col: Column | str) -> Column:
    """Canonical text form for fingerprinting: lower, non-alnum runs to
    single spaces, trimmed. (Byte-identical formula in the oracle.)"""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), "[^a-z0-9]+", " "))


def fingerprint(col: Column | str) -> Column:
    """Exact-dup document fingerprint: md5 of the normalized text."""
    return F.md5(normalized(col))


def minhash_gram_fingerprint(
    col: Column | str, gram: int = 3, toks: Column | None = None
) -> Column:
    """Winnowing-style near-dup fingerprint: the minimum md5 over the
    document's word ``gram``-shingles. Documents sharing a minimum are
    near-dup candidates. One expression, no shuffle."""
    # zip-of-slices, not element_at(t, i+j) in the lambda: a captured
    # outer expression re-evaluates per element in interpreted HOFs —
    # the tokenizer would run once per shingle (see dedup.word_shingles)
    t = tokens(col) if toks is None else toks
    n = F.greatest(F.size(t) - (gram - 1), F.lit(0))
    z = F.arrays_zip(*[F.slice(t, j + 1, n) for j in range(gram)])
    shingles = F.transform(
        z, lambda x: F.concat_ws(" ", *[x[str(j)] for j in range(gram)])
    )
    return F.array_min(F.transform(shingles, F.md5))


_HTML_BLOCK_CLOSERS = r"(?i)</(p|div|li|h[1-6]|tr|title|nav|footer|header)>|<br[^>]*>"
_HTML_ENTITIES = [  # decode order matters: &amp; LAST, or "&amp;lt;" double-decodes
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def html_to_text(col: Column | str) -> Column:
    """HTML → plain text extraction, the first stage of every
    web-crawl curation pipeline (the reference has nothing like it;
    trafilatura/jusText are the library-world equivalents — this is
    the regex-pipeline core of that idea, deliberately limited to
    well-formed-ish markup so it stays a PURE COLUMN EXPRESSION):

    1. drop <script>/<style> blocks and <!-- comments --> whole;
    2. block-closing tags (</p>, </div>, </li>, </h*>, </tr>,
       </title>, </nav>, </footer>, </header>, <br>) become newlines
       — paragraph structure survives tag-stripping;
    3. every remaining tag becomes a space;
    4. the six ubiquitous entities decode (&amp; last — decoding it
       first would double-decode "&amp;lt;");
    5. per line: collapse runs of spaces/tabs, trim, drop empties,
       re-join with newlines.

    All steps are regexp_replace / split / transform / filter — one
    whole-stage-codegen projection, no UDF — and every regex avoids
    backreferences so an RE2-based oracle (DuckDB) replays the
    pipeline byte-for-byte (:func:`_sql_html_extract`). At 100 TB the
    extraction runs at scan speed next to the quality columns."""
    c = F.col(col) if isinstance(col, str) else col
    c = F.regexp_replace(c, r"(?is)<script[^>]*>.*?</script>", " ")
    c = F.regexp_replace(c, r"(?is)<style[^>]*>.*?</style>", " ")
    c = F.regexp_replace(c, r"(?s)<!--.*?-->", " ")
    c = F.regexp_replace(c, _HTML_BLOCK_CLOSERS, "\n")
    c = F.regexp_replace(c, r"<[^>]+>", " ")
    for ent, ch in _HTML_ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    lines = F.split(c, "\n")
    cleaned = F.transform(
        lines, lambda ln: F.trim(F.regexp_replace(ln, r"[ \t]+", " "))
    )
    return F.array_join(F.filter(cleaned, lambda ln: ln != ""), "\n")


def wikitext_to_text(col: Column | str) -> Column:
    """Wikitext → plain text, the MediaWiki sibling of
    :func:`html_to_text` (the cleaner every encyclopedic corpus pass
    runs between ``read_mediawiki`` and quality/dedup):

    1. ``{{templates}}`` drop whole (two passes, so one level of
       nesting resolves — infoboxes inside infoboxes beyond that
       leave their inner braces, which the quality filters catch);
    2. ``[[File:...]]``/``[[Image:...]]``/``[[Category:...]]`` drop
       whole (their payloads are captions/sort keys, not prose);
    3. ``[[target|label]]`` keeps the label, ``[[target]]`` the
       target; ``[http://url label]`` keeps the label, bare bracketed
       URLs drop;
    4. ``<ref.../>`` and ``<ref>...</ref>`` drop whole (citations),
       remaining HTML-ish tags strip;
    5. bold/italic quote runs (``''``+) strip; ``== heading ==``
       lines keep their text;
    6. same line normalization as the HTML pipeline.

    Pure column expressions, RE2-safe (no backreferences), so a SQL
    oracle replays it — the ``__wikitxt`` leg pins fixture->cleaned
    pairs byte-for-byte."""
    c = F.col(col) if isinstance(col, str) else col
    for _ in range(2):
        c = F.regexp_replace(c, r"\{\{[^{}]*\}\}", " ")
    c = F.regexp_replace(c, r"(?i)\[\[(file|image|category):[^\[\]]*\]\]", " ")
    c = F.regexp_replace(c, r"\[\[[^\[\]|]*\|([^\[\]]*)\]\]", "$1")
    c = F.regexp_replace(c, r"\[\[([^\[\]]*)\]\]", "$1")
    c = F.regexp_replace(c, r"\[https?://[^\s\]]+\s+([^\]]*)\]", "$1")
    c = F.regexp_replace(c, r"\[https?://[^\]]*\]", " ")
    c = F.regexp_replace(c, r"(?is)<ref[^>]*/>", " ")
    c = F.regexp_replace(c, r"(?is)<ref[^>]*>.*?</ref>", " ")
    c = F.regexp_replace(c, r"<[^>]+>", " ")
    c = F.regexp_replace(c, r"''+", "")
    c = F.regexp_replace(c, r"(?m)^[ \t]*=+ *([^=\n]*?) *=+[ \t]*$", "$1")
    lines = F.split(c, "\n")
    cleaned = F.transform(
        lines, lambda ln: F.trim(F.regexp_replace(ln, r"[ \t]+", " "))
    )
    return F.array_join(F.filter(cleaned, lambda ln: ln != ""), "\n")


def _sql_html_extract(expr: str) -> str:
    """DuckDB twin of :func:`html_to_text` over the SQL string
    expression ``expr`` — same regexes (RE2-safe: no backreferences),
    same entity decode order, same line normalization."""
    c = f"regexp_replace({expr}, '(?is)<script[^>]*>.*?</script>', ' ', 'g')"
    c = f"regexp_replace({c}, '(?is)<style[^>]*>.*?</style>', ' ', 'g')"
    c = f"regexp_replace({c}, '(?s)<!--.*?-->', ' ', 'g')"
    c = (
        f"regexp_replace({c}, "
        f"'(?i)</(p|div|li|h[1-6]|tr|title|nav|footer|header)>|<br[^>]*>', "
        f"chr(10), 'g')"
    )
    c = f"regexp_replace({c}, '<[^>]+>', ' ', 'g')"
    for ent, ch in _HTML_ENTITIES:
        lit = ch.replace("'", "''")
        c = f"replace({c}, '{ent}', '{lit}')"
    return (
        f"array_to_string(list_filter(list_transform(string_split({c}, chr(10)), "
        f"l -> trim(regexp_replace(l, '[ \\t]+', ' ', 'g'))), l -> l <> ''), chr(10))"
    )


# Deterministic wrap for the driver-visible extraction check: every
# strip path is exercised (script with a raw '<', style, comment,
# entities, nav boilerplate, block closers). Engine and oracle build
# the same HTML around each document, extract with their twin
# pipelines, and must agree on the md5 of the result.
_HTML_WRAP_PRE = (
    '<html><head><title>D</title><style>p { color: red; }</style>'
    '<script type="text/javascript">if (1 < 2) { var x = "&amp;"; }</script>'
    "</head><body><nav>Home &amp; About &lt;nav&gt;</nav><h1>Doc</h1><p>"
)
_HTML_WRAP_POST = (
    "</p><div>footer &nbsp;&quot;fin&quot;</div><!-- comment --></body></html>"
)


def html_roundtrip_md5(col: Column | str) -> Column:
    """md5 of :func:`html_to_text` over the deterministic wrap of a
    text column — the driver leg's extraction checksum."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(
        html_to_text(F.concat(F.lit(_HTML_WRAP_PRE), c, F.lit(_HTML_WRAP_POST)))
    )


def _sql_html_roundtrip_md5(text_expr: str = "text") -> str:
    pre = _HTML_WRAP_PRE.replace("'", "''")
    post = _HTML_WRAP_POST.replace("'", "''")
    return "md5(" + _sql_html_extract(f"'{pre}' || {text_expr} || '{post}'") + ")"


def stopword_hits(col: Column | str, lang: str, toks: Column | None = None) -> Column:
    """Number of tokens (with multiplicity) in ``lang``'s stopword list.

    ``toks``: a pre-computed :func:`tokens` column. Catalyst does not
    CSE regexp trees across expressions, so a caller computing several
    token-derived signals should tokenize ONCE in a prior projection
    and pass the column here (CollapseProject keeps a non-cheap,
    multiply-referenced alias staged — measured: the 4-language ID
    plan evaluates regexp_extract_all once instead of 5 times, 2.1x
    faster on the profile pass). Same tokens, same values."""
    words = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    t = tokens(col) if toks is None else toks
    return F.size(F.filter(t, lambda x: F.array_contains(words, x)))


def quality_columns(text_col: str = "text", toks: Column | None = None) -> list[Column]:
    """Per-document quality signal COLUMNS: token count, char count,
    mean token length, alpha ratio, stopword ratio, and a composite
    score in [0,1].

    Score formula (deterministic, mirrored in oracle): mean of
    - length_ok:   1 if 20 <= n_tokens <= 10000 else 0
    - alpha_ok:    alpha_chars / n_chars
    - stop_ok:     min(1, stopword_ratio * 5)  (well-formed prose has
                   some function words; synthetic keyword soup doesn't)
    """
    t = tokens(text_col) if toks is None else toks
    n_tok = F.size(t)
    n_chars = F.length(F.col(text_col))
    alpha = F.length(F.regexp_replace(F.col(text_col), "[^A-Za-z]", ""))
    stop_hits = stopword_hits(text_col, "en", toks=t)
    stop_ratio = F.when(n_tok > 0, stop_hits.cast("double") / n_tok).otherwise(F.lit(0.0))
    length_ok = F.when((n_tok >= 20) & (n_tok <= 10000), F.lit(1.0)).otherwise(F.lit(0.0))
    alpha_ok = F.when(n_chars > 0, alpha.cast("double") / n_chars).otherwise(F.lit(0.0))
    stop_ok = F.least(F.lit(1.0), stop_ratio * 5)
    return [
        n_tok.alias("n_tokens"),
        n_chars.alias("n_chars"),
        F.round(
            F.when(n_tok > 0, F.aggregate(t, F.lit(0), lambda a, x: a + F.length(x)).cast("double") / n_tok).otherwise(F.lit(0.0)),
            6,
        ).alias("avg_token_len"),
        F.round(alpha_ok, 6).alias("alpha_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round((length_ok + alpha_ok + stop_ok) / 3, 6).alias("quality_score"),
    ]


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.select("doc_id", *quality_columns(text_col))


def language_id_column(text_col: str = "text", toks: Column | None = None) -> Column:
    """Stopword-overlap language ID: score each language by stopword
    hits (with multiplicity); predict the argmax, 'und' (undetermined)
    when no language scores. Ties break lexicographically — fully
    deterministic, mirrored in the oracle. Pass ``toks`` (a staged
    :func:`tokens` column) to tokenize once instead of per language."""
    scores = [
        (lang, stopword_hits(text_col, lang, toks=toks))
        for lang in sorted(STOPWORDS)
    ]
    best = F.greatest(*[s for _, s in scores])
    pred = F.lit("und")
    # reversed so earlier (lexicographically smaller) languages win ties
    for lang, s in reversed(scores):
        pred = F.when((s == best) & (best > 0), F.lit(lang)).otherwise(pred)
    return pred


def language_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.select("doc_id", language_id_column(text_col).alias("lang_pred"))


def repetition_columns(text_col: str = "text", toks: Column | None = None) -> list[Column]:
    """Within-document repetition signals (the boilerplate/keyword-spam
    detector): distinct-token ratio and the frequency share of the
    most-repeated token. Pure expressions, no shuffle.

    The max-multiplicity is computed as the longest equal-run in the
    SORTED token array (one sort + one linear aggregate, O(n log n)
    per doc) — the tempting ``transform(distinct, d -> count(=d))``
    form is O(distinct x tokens), which melts on the long documents a
    real corpus contains. The oracle uses the quadratic spelling (same
    value, spec only)."""
    t = tokens(text_col) if toks is None else toks
    n_tok = F.size(t)
    st = F.array_sort(t)
    # accumulator: (prev token, current run, best run). Tokens are
    # non-empty by construction, so "" is a safe init sentinel.
    run = lambda acc, x: F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))  # noqa: E731
    top = F.aggregate(
        st,
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            run(acc, x).alias("run"),
            F.greatest(acc["best"], run(acc, x)).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    return [
        F.round(
            F.when(n_tok > 0, F.size(F.array_distinct(t)).cast("double") / n_tok).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("distinct_token_ratio"),
        F.round(
            F.when(n_tok > 0, top.cast("double") / n_tok).otherwise(F.lit(0.0)), 6
        ).alias("top_token_ratio"),
    ]


def document_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """ALL per-document text signals in ONE projection — quality
    metrics, repetition stats, language ID, exact + near-dup
    fingerprints, BPE-ish token count. One scan, zero joins, zero
    shuffles; at 100 TB this is the shape a corpus-triage pass should
    have (each signal family as its own query would scan the corpus
    once per family)."""
    # Tokenize ONCE in a staged projection: Catalyst does not CSE
    # regexp trees across the ~10 token-derived signals below, and
    # CollapseProject keeps a non-cheap multiply-referenced alias
    # staged — one regexp_extract_all per row instead of ~10 (r13;
    # same tokens, same values; plan pinned by tests).
    staged = df.select("doc_id", F.col(text_col), tokens(text_col).alias("__toks"))
    tk = F.col("__toks")
    return staged.select(
        "doc_id",
        *quality_columns(text_col, toks=tk),
        *repetition_columns(text_col, toks=tk),
        language_id_column(text_col, toks=tk).alias("lang_pred"),
        fingerprint(text_col).alias("fp"),
        minhash_gram_fingerprint(text_col, 3, toks=tk).alias("min_shingle_fp"),
        bpe_token_count(text_col).alias("n_bpe_tokens"),
    )


def pdf_text_table(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """(id, text) extraction over a PDF corpus: ONE Arrow
    ``mapInPandas`` stage runs the engine's from-spec baseline
    extractor (:mod:`..functions.pdf` — Flate content streams +
    Tj/TJ/'/\" show operators, ISO 32000-1) per payload. Non-PDF or
    text-free payloads surface with text NULL so a curation pass can
    quarantine them; everything downstream (``document_profile``,
    dedup, quality gates) consumes the text column like any other
    document source. Same cost model as the media codecs: payload
    bytes cross into Python once, batch-wise; only the extracted text
    comes back."""
    import pandas as pd

    from data_integration_and_harmonization_spark.functions.pdf import (
        extract_pdf_text,
    )

    src = df.select(
        F.col(id_col).cast("long").alias("id"), F.col(payload_col).alias("payload")
    )

    def batches(it):
        for pdf in it:
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "text": [extract_pdf_text(p) for p in pdf["payload"]],
                }
            )

    return src.mapInPandas(batches, schema="id long, text string")


def docx_text_table(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """(id, text) extraction over a DOCX corpus — the
    WordprocessingML sibling of :func:`pdf_text_table`: ONE Arrow
    ``mapInPandas`` stage runs the engine's stdlib ECMA-376 extractor
    (:mod:`..sources.docx` — zip + ``word/document.xml`` run walk)
    per payload. Non-docx or text-free payloads surface with text
    NULL for quarantine; only the extracted text crosses back."""
    import pandas as pd

    from data_integration_and_harmonization_spark.sources.docx import (
        extract_docx_text,
    )

    src = df.select(
        F.col(id_col).cast("long").alias("id"), F.col(payload_col).alias("payload")
    )

    def batches(it):
        for pdf in it:
            yield pd.DataFrame(
                {
                    "id": pdf["id"],
                    "text": [extract_docx_text(p) for p in pdf["payload"]],
                }
            )

    return src.mapInPandas(batches, schema="id long, text string")


def document_text_table(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """(id, fmt, text) extraction over a MIXED document corpus in ONE
    Arrow stage, dispatched by magic bytes — the document sibling of
    ``dedup.media_signature_table``: PDF payloads run the from-spec
    ISO 32000-1 extractor, DOCX the stdlib ECMA-376 run walk, PPTX
    the DrawingML slide-text walk, EPUB the OCF/OPF spine-order
    chapter walk. A real crawl's document bucket
    holds these shapes interleaved, and one fused stage costs one
    Python worker round-trip instead of one per format (the r4
    fixed-overhead lesson). Unrecognized or text-free payloads ride
    with fmt/text NULL for quarantine."""
    import pandas as pd

    from data_integration_and_harmonization_spark.functions.pdf import (
        extract_pdf_text,
        is_pdf,
    )
    from data_integration_and_harmonization_spark.sources.docx import (
        extract_docx_text,
        extract_pptx_text,
        is_docx,
        is_pptx,
    )
    from data_integration_and_harmonization_spark.sources.epub import (
        extract_epub_text,
        is_epub,
    )

    src = df.select(
        F.col(id_col).cast("long").alias("id"), F.col(payload_col).alias("payload")
    )

    def batches(it):
        for pdf in it:
            fmts, texts = [], []
            for p in pdf["payload"]:
                if p is not None and is_pdf(p):
                    fmts.append("pdf")
                    texts.append(extract_pdf_text(p))
                elif p is not None and is_docx(p):
                    fmts.append("docx")
                    texts.append(extract_docx_text(p))
                elif p is not None and is_epub(p):
                    fmts.append("epub")
                    texts.append(extract_epub_text(p))
                elif p is not None and is_pptx(p):
                    fmts.append("pptx")
                    texts.append(extract_pptx_text(p))
                else:
                    fmts.append(None)
                    texts.append(None)
            yield pd.DataFrame({"id": pdf["id"], "fmt": fmts, "text": texts})

    return src.mapInPandas(batches, schema="id long, fmt string, text string")


# ------------------------------------------------------- query registry

def text_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    def q_profile(spark, sf):
        # one query covering quality + langid + fingerprints + token
        # counts (merged from r1's four text_* queries — the driver's
        # correctness pass records at most 50 queries; one projection
        # also IS the right scale shape: one scan, not four), plus the
        # corpus-level duplicated-5-gram fraction (r5): the one
        # profile column that needs a cross-document pass — a digest
        # groupBy + join, see dedup.duplicated_ngram_stats
        from data_integration_and_harmonization_spark.operators.dedup import (
            duplicated_ngram_stats,
            exact_substring_spans,
            line_dedup,
        )

        docs = spark.read.parquet(f"{sf}/documents.parquet")
        dup = duplicated_ngram_stats(docs, gram=5).select(
            F.col("id").alias("doc_id"),
            F.col("n_grams").alias("n_5grams"),
            F.col("dup_frac").alias("dup_5gram_frac"),
        )
        # r8: C4-style cross-document line dedup as three more profile
        # columns — same per-doc join shape as the 5-gram pass; the
        # reassembled text rides as an md5 so only 16 bytes/doc reach
        # the result (the full text_deduped column is for pipelines,
        # not profiles)
        ld = line_dedup(docs).select(
            F.col("id").alias("doc_id"),
            "n_lines",
            "n_dup_lines",
            F.md5("text_deduped").alias("dedup_text_md5"),
        )
        # r9: HTML->text extraction checksum — each doc wrapped in the
        # deterministic HTML shell, extracted by html_to_text, md5'd;
        # the oracle replays the identical regex pipeline in SQL
        hx = docs.select(
            "doc_id", html_roundtrip_md5("text").alias("html_extract_md5")
        )
        # r9 second wave: ExactSubstr-style duplicated-span geometry
        # (dedup.exact_substring_spans) — merged >=2-occurrence 5-token
        # windows per doc; same per-doc join shape as the 5-gram and
        # line-dedup passes (k=5 suits the fixture's ~30-token docs;
        # production k is 50)
        ss = exact_substring_spans(docs, k=5).select(
            F.col("id").alias("doc_id"),
            "n_dup_spans",
            "dup_span_tokens",
            "dup_span_frac",
        )
        return (
            document_profile(docs)
            .join(dup, "doc_id")
            .join(ld, "doc_id")
            .join(hx, "doc_id")
            .join(ss, "doc_id")
        )

    return {"text_profile": q_profile}


def _sql_stop_hits(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (
        f"len(list_filter(regexp_extract_all(lower(text), '{TOKEN_RE}'), "
        f"t -> list_contains([{words}], t)))"
    )


def text_oracles() -> dict[str, str]:
    hits = {lang: _sql_stop_hits(lang) for lang in sorted(STOPWORDS)}
    best = f"greatest({hits['de']}, {hits['en']}, {hits['es']}, {hits['fr']})"
    langid_case = "CASE " + " ".join(
        f"WHEN {best} > 0 AND {hits[lang]} = {best} THEN '{lang}'" for lang in sorted(STOPWORDS)
    ) + " ELSE 'und' END"
    return {
        "text_profile": f"""
WITH t AS (
  SELECT doc_id, text,
         regexp_extract_all(lower(text), '{TOKEN_RE}') AS toks,
         length(text) AS n_chars,
         length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS alpha,
         {hits['en']} AS stop_hits,
         {langid_case} AS lang_pred
  FROM documents
), s AS (
  SELECT doc_id, text, lang_pred, len(toks) AS n_tokens, n_chars,
    CASE WHEN len(toks) > 0
         THEN CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks)
         ELSE 0.0 END AS avg_tok,
    CASE WHEN n_chars > 0 THEN CAST(alpha AS DOUBLE) / n_chars ELSE 0.0 END AS alpha_ok,
    CASE WHEN len(toks) > 0 THEN CAST(stop_hits AS DOUBLE) / len(toks) ELSE 0.0 END AS stop_ratio,
    CASE WHEN len(toks) BETWEEN 20 AND 10000 THEN 1.0 ELSE 0.0 END AS length_ok,
    CASE WHEN len(toks) > 0
         THEN CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) ELSE 0.0 END AS distinct_ratio,
    CASE WHEN len(toks) > 0
         THEN CAST(list_max(list_transform(list_distinct(toks),
              d -> len(list_filter(toks, x -> x = d)))) AS DOUBLE) / len(toks)
         ELSE 0.0 END AS top_ratio
  FROM t
), g5 AS (
  SELECT doc_id,
         md5(unnest(list_distinct(list_transform(
           range(1, greatest(len(toks) - 4, 0) + 1),
           i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                || ' ' || toks[i+3] || ' ' || toks[i+4])))) AS h
  FROM t
), fr AS (
  SELECT h, count(*)::BIGINT AS df FROM g5 GROUP BY 1
), pd AS (
  SELECT g5.doc_id, count(*)::BIGINT AS n_5grams,
         sum(CASE WHEN fr.df >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup
  FROM g5 JOIN fr ON fr.h = g5.h GROUP BY 1
), ld AS (
  SELECT id, pos, line, md5(trim(line)) AS h FROM (
    SELECT doc_id AS id, unnest(ls) AS line, generate_subscripts(ls, 1) AS pos
    FROM (SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents))
), lf AS (
  SELECT h, count(DISTINCT id)::BIGINT AS ldf FROM ld GROUP BY 1
), lpd AS (
  SELECT ld.id, count(*)::BIGINT AS n_lines,
         sum(CASE WHEN lf.ldf >= 2 THEN 1 ELSE 0 END)::BIGINT AS n_dup_lines,
         md5(coalesce(string_agg(CASE WHEN lf.ldf < 2 THEN ld.line END,
                                 chr(10) ORDER BY ld.pos), '')) AS dedup_text_md5
  FROM ld JOIN lf ON lf.h = ld.h GROUP BY 1
), ssg AS (
  SELECT doc_id, list_transform(
           range(1, greatest(len(toks) - 4, 0) + 1),
           i -> md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                    || ' ' || toks[i+3] || ' ' || toks[i+4])) AS gs
  FROM t
), sse AS (
  SELECT doc_id AS id, unnest(gs) AS h, generate_subscripts(gs, 1) - 1 AS pos
  FROM ssg
), ssf AS (
  SELECT h FROM sse GROUP BY h HAVING count(*) >= 2
), ssd AS (
  SELECT sse.id, sse.pos FROM sse JOIN ssf USING (h)
), ssi AS (
  SELECT id, pos,
         sum(CASE WHEN prev IS NULL OR pos - prev > 5 THEN 1 ELSE 0 END)
           OVER (PARTITION BY id ORDER BY pos) AS span_id
  FROM (SELECT id, pos, lag(pos) OVER (PARTITION BY id ORDER BY pos) AS prev
        FROM ssd)
), ssp AS (
  SELECT id, span_id, max(pos) - min(pos) + 5 AS covered
  FROM ssi GROUP BY 1, 2
), ssa AS (
  SELECT id, count(*)::BIGINT AS n_dup_spans,
         sum(covered)::BIGINT AS dup_span_tokens
  FROM ssp GROUP BY 1
)
SELECT s.doc_id AS doc_id, n_tokens::INTEGER AS n_tokens, n_chars::INTEGER AS n_chars,
  round(avg_tok, 6) AS avg_token_len,
  round(alpha_ok, 6) AS alpha_ratio,
  round(stop_ratio, 6) AS stopword_ratio,
  round((length_ok + alpha_ok + least(1.0, stop_ratio * 5)) / 3, 6) AS quality_score,
  round(distinct_ratio, 6) AS distinct_token_ratio,
  round(top_ratio, 6) AS top_token_ratio,
  lang_pred,
  md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp,
  list_min(list_transform(
    list_transform(
      range(1, greatest(len(regexp_extract_all(lower(text), '{TOKEN_RE}')) - 2, 0) + 1),
      i -> regexp_extract_all(lower(text), '{TOKEN_RE}')[i] || ' ' ||
           regexp_extract_all(lower(text), '{TOKEN_RE}')[i+1] || ' ' ||
           regexp_extract_all(lower(text), '{TOKEN_RE}')[i+2]
    ), sh -> md5(sh))) AS min_shingle_fp,
  len(regexp_extract_all(text, '{BPE_RE.replace("'", "''")}'))::INTEGER AS n_bpe_tokens,
  coalesce(pd.n_5grams, 0)::BIGINT AS n_5grams,
  round(CASE WHEN coalesce(pd.n_5grams, 0) > 0
        THEN pd.n_dup::DOUBLE / pd.n_5grams ELSE 0.0 END, 6) AS dup_5gram_frac,
  lpd.n_lines AS n_lines,
  lpd.n_dup_lines AS n_dup_lines,
  lpd.dedup_text_md5 AS dedup_text_md5,
  {_sql_html_roundtrip_md5("s.text")} AS html_extract_md5,
  coalesce(ssa.n_dup_spans, 0)::BIGINT AS n_dup_spans,
  coalesce(ssa.dup_span_tokens, 0)::BIGINT AS dup_span_tokens,
  round(CASE WHEN s.n_tokens > 0
        THEN coalesce(ssa.dup_span_tokens, 0)::DOUBLE / s.n_tokens
        ELSE 0.0 END, 6) AS dup_span_frac
FROM s LEFT JOIN pd ON pd.doc_id = s.doc_id
JOIN lpd ON lpd.id = s.doc_id
LEFT JOIN ssa ON ssa.id = s.doc_id
""",
    }
