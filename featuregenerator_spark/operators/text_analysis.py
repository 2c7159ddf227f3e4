"""Text-analysis kernels for training-data pipelines.

These are the engine's document-level operators (language-ID, token
counting, quality scoring, fingerprinting) — first-class components of a
100 TB curation pipeline. All are pure Column expressions (whole-stage
codegen; no Python in the hot path) and deterministic, so every one has a
closed-form SQL oracle.

The reference has no direct analogue (fg_lite is a per-row kernel library
for ranking features); these lift the same "declare a feature over a
column" style (SingleFeatureConfig -> Column, SURVEY.md §3.1) onto
document curation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# word-token pattern: letter runs, digit runs, or single punctuation —
# a BPE-ish pre-tokenizer split (same regex dialect in Java and RE2).
TOKEN_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"

# every char the first two TOKEN_PATTERN branches can consume, plus the
# space separator — translate()-deleting these leaves only "other" chars.
_ALNUM_SPACE = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789 "
)

# tiny per-language marker sets (n-gram heuristic stand-in; the real list
# would be the top-k stopwords per language).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and"),
    "de": ("der", "die", "das", "und"),
    "fr": ("le", "la", "les", "et"),
}

STOPWORDS = ("the", "a", "of", "and")


def token_count(text: Column) -> Column:
    """#tokens under the BPE-ish regex pre-tokenizer (int).

    Computed as two run-counting regex scans (letter runs, digit runs)
    plus a regex-FREE ``translate`` for the third class — delete every
    [A-Za-z0-9 ] char and the remaining length is exactly the number of
    "other" chars, each of which is its own single-char token under
    TOKEN_PATTERN. The classes are disjoint, so the sum equals the
    3-way-alternation token count. Measured over 500k docs (noop-sink
    harness, 2 reps each): alternation extract_all 5.9 s; this form
    2.8 s (2.1x — no materialized match array, no per-position branch
    attempts); and the naive third variant, regexp_count of the
    negated class '[^A-Za-z0-9 ]', a pathological 25 s — one regex
    match-loop iteration per punctuation char. translate() is a plain
    char-map (no regex at all), so the third count costs one linear
    pass. The SQL oracle keeps the TOKEN_PATTERN extract_all form —
    the equality of the two definitions is exactly what the gate then
    proves."""
    return (
        F.regexp_count(text, F.lit("[A-Za-z]+"))
        + F.regexp_count(text, F.lit("[0-9]+"))
        + F.length(F.translate(text, _ALNUM_SPACE, ""))
    ).cast("int")


def _marker_hits(toks: Column, markers: tuple[str, ...]) -> Column:
    marr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda t: F.array_contains(marr, t)))


def lang_id(text: Column, default: str = "und") -> Column:
    """Marker-voting language ID: language with the most marker hits;
    deterministic tie-break by the LANG_MARKERS declaration order;
    ``default`` when no marker hits at all.

    SUPERSEDED for production use by the 10-language character-trigram
    classifier ``functions.lang_trigram.with_lang_id_trigram`` (accuracy
    >= 0.95 pinned on a held-out multilingual fixture); this 3-language
    marker voter is kept as the cheap single-Column form (no join) for
    pipelines that only need an en/de/fr split."""
    toks = F.split(text, " ")
    hits = {lang: _marker_hits(toks, ms) for lang, ms in LANG_MARKERS.items()}
    best = F.greatest(*hits.values())
    out = F.lit(default)
    # build the when-chain in reverse so earlier languages win ties
    for lang in reversed(list(LANG_MARKERS)):
        out = F.when((best > 0) & (hits[lang] == best), F.lit(lang)).otherwise(out)
    return out


def quality_score(text: Column) -> Column:
    """Deterministic [0,1] quality score from length / punctuation /
    stopword ratios (the usual cheap pre-filter before model scoring):

        0.4 * min(1, n_tokens/64)            # enough content
      + 0.3 * min(1, 4 * stop_ratio)         # looks like prose
      + 0.3 * (1 - min(1, 4 * punct_ratio))  # not symbol soup
    """
    toks = F.split(text, " ")
    n = F.size(toks).cast("double")
    stop = _marker_hits(toks, STOPWORDS).cast("double")
    punct = F.length(text) - F.length(
        F.regexp_replace(text, r"[^A-Za-z0-9 ]", "")
    )
    length_part = F.least(F.lit(1.0), n / 64.0)
    stop_part = F.least(F.lit(1.0), 4.0 * stop / n)
    # empty text: Spark x/0 is NULL, DuckDB/IEEE is NaN — define the
    # punct ratio as 0 for empty docs so the score is a plain number
    punct_ratio = F.when(
        F.length(text) > 0, 4.0 * punct.cast("double") / F.length(text)
    ).otherwise(F.lit(0.0))
    punct_part = 1.0 - F.least(F.lit(1.0), punct_ratio)
    return 0.4 * length_part + 0.3 * stop_part + 0.3 * punct_part


FINGERPRINT_MOD = 1_000_000_007


def rolling_fingerprint(text: Column) -> Column:
    """Order-sensitive polynomial rolling hash over tokens (document
    fingerprint): fold ``acc = (acc*31 + tokcode) mod p`` where
    ``tokcode = length(tok)*17 + ascii(first_char)``. Stays in BIGINT the
    whole way (max acc*31 + code < 2^35), identical arithmetic in any SQL
    engine — unlike md5/xxhash this is engine-portable."""
    toks = F.split(text, " ")
    codes = F.transform(
        toks, lambda t: (F.length(t) * 17 + F.ascii(t)).cast("long")
    )
    return F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * 31 + c) % FINGERPRINT_MOD,
    )


def tfidf_top_terms(df, k: int = 5, text_col: str = "text", id_col: str = "doc_id"):
    """Top-k TF-IDF terms per document — the classic salient-term
    extractor (tf * smoothed idf, the scikit-learn formulation
    ``idf = ln((N+1)/(df+1)) + 1`` — public convention), fully
    relational:

    1. explode once -> groupBy(doc, term) count = tf (map-side combine,
       the shuffle carries one row per distinct doc-term);
    2. document frequency = groupBy(term) over the distinct doc-term
       rows (vocabulary-sized output; AQE broadcasts it back);
    3. N rides a broadcast one-row cross join, never a driver collect;
    4. row_number per doc ordered by (score DESC, term ASC) — the term
       tiebreak makes top-k deterministic across engines and runs; both
       engines compute the identical IEEE double from the same integer
       (tf, df, N) inputs, so the ranking itself is exact.

    Returns (id, term, tfidf rounded, rank 1..k). Pure relational ops —
    exact DuckDB mirror, no per-row Python.
    """
    from pyspark.sql.window import Window

    terms = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("term")
    )
    tf = terms.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    score = F.col("tf") * (
        F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0
    )
    ranked = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("tfidf", score)
        .withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy(id_col).orderBy(
                    F.col("tfidf").desc(), F.col("term").asc()
                )
            ),
        )
        .filter(F.col("rank") <= k)
    )
    return ranked.select(
        id_col, "term", F.round("tfidf", 4).alias("tfidf"), "rank"
    )
