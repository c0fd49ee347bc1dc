"""Text-analysis operators for training-data pipelines over ``documents``.

All pure Column expressions (codegen'd, no UDFs) and — deliberately —
expressible in ANSI SQL so every operator has a DuckDB oracle in
``__spark_entry__.py``. Hashing uses md5 (available bit-identically in
both engines) rather than xxhash64 (Spark-only).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ensure_parallelism(df: DataFrame, factor: int = 1) -> DataFrame:
    """Spread a narrow scan across the cluster before CPU-heavy per-row
    expression work.

    A small parquet file arrives as ONE input partition, serializing all
    downstream per-row compute on a single core (observed: the whole
    minhash pipeline single-threaded). At corpus scale inputs have
    plenty of splits and this is a no-op — the repartition only fires
    when the scan is narrower than the cluster."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df

# Small per-language stopword vocabularies for the n-gram/stopword
# language-ID heuristic. Deliberately tiny — the operator's shape (token
# overlap scoring + argmax) is what matters, not lexicon quality.
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "was", "for"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "sich"],
    "fr": ["le", "la", "les", "et", "est", "une", "dans", "que", "pour", "pas"],
    "es": ["el", "la", "los", "y", "es", "una", "en", "que", "por", "con"],
}


def nd_barrier(col: Column) -> Column:
    """Value-identity wrapper that carries a non-deterministic taint.

    ``when(monotonically_increasing_id() >= 0, col)`` always evaluates to
    ``col`` (the id is non-negative by construction), but the taint stops
    Catalyst's CollapseProject from inlining the projection into every
    downstream reference — the optimizer-duplication fix the guide (§4.4)
    applies to expensive UDFs, here applied to expensive pure-JVM
    expression trees (tokenizers, per-shingle md5). Unlike a
    ``localCheckpoint`` barrier this costs NO extra job and NO
    materialization: the staged projection is evaluated once per row,
    streaming, and its result is referenced as a concrete value by the
    consuming projection. (Measured on the sf1.0 minhash signature
    pipeline: 2.26 s with checkpoint barriers → 1.97 s with ND barriers,
    identical output.) Deterministic in effect — the wrapped value never
    depends on the id — so retry/replay semantics are unchanged."""
    return F.when(F.monotonically_increasing_id() >= 0, col)


def tokens(col: Column | str) -> Column:
    """Whitespace tokenization of trimmed, lowercased text; empty text →
    empty array (split('') yields [''] — filtered)."""
    c = F.col(col) if isinstance(col, str) else col
    raw = F.split(F.lower(F.trim(c)), r"\s+")
    return F.filter(raw, lambda x: x != "")


def token_count(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


BPE_PIECE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_ish_token_count(col: Column | str) -> Column:
    """A BPE-ish proxy: count of word-piece matches (letter runs, digit
    runs, single symbols) — the regex decomposition a byte-pair encoder's
    pre-tokenizer performs. regexp_count keeps it RE2-compatible (the
    DuckDB oracle mirrors it with regexp_extract_all)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_PIECE_RE)).cast("long")


def punct_ratio(col: Column | str) -> Column:
    """Fraction of characters that are not alphanumeric/space.
    split+array_join instead of regexp_replace — identical semantics,
    but regexp_replace serializes across tasks in one JVM on this Spark
    build (memory trap #14)."""
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.array_join(F.split(c, r"[A-Za-z0-9\s]"), "")
    return F.when(F.length(c) > 0, F.length(stripped) / F.length(c)).otherwise(F.lit(0.0))


def stopword_ratio_from_tokens(toks: Column, lang: str = "en") -> Column:
    """:func:`stopword_ratio` over a precomputed token array (stage it
    behind :func:`nd_barrier` — the column form tokenizes per reference)."""
    sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def stopword_ratio(col: Column | str, lang: str = "en") -> Column:
    """Fraction of tokens that are (given-language) stopwords."""
    return stopword_ratio_from_tokens(tokens(col), lang)


def mean_token_len(col: Column | str) -> Column:
    toks = tokens(col)
    total = F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) > 0, total / F.size(toks)).otherwise(F.lit(0.0))


def quality_score_from_tokens(
    toks: Column, text: Column, lang: str = "en"
) -> Column:
    """:func:`quality_score` over a PRECOMPUTED token array.

    Same arithmetic, operation for operation (the DuckDB oracle mirrors
    it), but the caller stages ``toks`` once — the column form re-inlines
    the tokenizer into each of its three consumers (token count, stopword
    ratio, mean token length: 3 full splits of the text per row).
    Stage with :func:`nd_barrier` (verified output-identical on the
    corpus; measured −13% on t3 at sf1.0)."""
    n_tok = F.size(toks).cast("double")
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    sw_arr = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw_arr, t)))
    sw = F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))
    sw_score = F.least(sw / F.lit(0.3), F.lit(1.0))
    stripped = F.array_join(F.split(text, r"[A-Za-z0-9\s]"), "")
    punct = F.when(
        F.length(text) > 0, F.length(stripped) / F.length(text)
    ).otherwise(F.lit(0.0))
    punct_score = F.greatest(F.lit(0.0), F.lit(1.0) - punct * 2)
    total = F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
    mlen = F.when(F.size(toks) > 0, total / F.size(toks)).otherwise(F.lit(0.0))
    mlen_score = F.when((mlen >= 3) & (mlen <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round(
        len_score * 0.3 + sw_score * 0.3 + punct_score * 0.2 + mlen_score * 0.2, 4
    )


def quality_score(col: Column | str) -> Column:
    """Heuristic document-quality score in [0, 1]: rewards moderate
    length, healthy stopword density, low punctuation noise, plausible
    word lengths. The shape (clipped linear mix of cheap signals) follows
    published pretraining-corpus quality filters. Column form — for the
    cheaper staged pipeline see :func:`quality_score_from_tokens`."""
    c = F.col(col) if isinstance(col, str) else col
    return quality_score_from_tokens(tokens(c), c)


def lang_scores_from_tokens(toks: Column) -> dict[str, Column]:
    """Per-language stopword-hit counts over a precomputed token array."""
    out = {}
    for lang, words in LANG_STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in words])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return out


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Per-language stopword-hit counts (the language-ID evidence)."""
    return lang_scores_from_tokens(tokens(col))


def lang_id_from_tokens(toks: Column) -> Column:
    """:func:`lang_id` over a precomputed token array (stage it behind
    :func:`nd_barrier` — the column form tokenizes once per language)."""
    scores = lang_scores_from_tokens(toks)
    best = F.array_max(
        F.array(
            *[
                F.struct(s.cast("long").alias("score"), F.lit(lang).alias("lang"))
                for lang, s in sorted(scores.items())
            ]
        )
    )
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def lang_id(col: Column | str) -> Column:
    """argmax over language scores via max(struct(score, lang)); ties are
    broken deterministically toward the lexicographically LARGER language
    code (struct comparison); all-zero scores → 'und'."""
    return lang_id_from_tokens(tokens(col))


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 over the canonicalized text (lowercase,
    punctuation stripped, whitespace collapsed). Robust to formatting-only
    edits; identical in DuckDB for the oracle."""
    from .dedup import canonical_text

    return F.md5(canonical_text(col))
