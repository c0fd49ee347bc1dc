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


def stopword_ratio(col: Column | str, lang: str = "en") -> Column:
    """Fraction of tokens that are (given-language) stopwords."""
    toks = tokens(col)
    sw = F.array(*[F.lit(w) for w in LANG_STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return F.when(F.size(toks) > 0, hits / F.size(toks)).otherwise(F.lit(0.0))


def mean_token_len(col: Column | str) -> Column:
    toks = tokens(col)
    total = F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) > 0, total / F.size(toks)).otherwise(F.lit(0.0))


def quality_score(col: Column | str) -> Column:
    """Heuristic document-quality score in [0, 1]: rewards moderate
    length, healthy stopword density, low punctuation noise, plausible
    word lengths. The shape (clipped linear mix of cheap signals) follows
    published pretraining-corpus quality filters."""
    c = F.col(col) if isinstance(col, str) else col
    n_tok = token_count(c).cast("double")
    len_score = F.least(n_tok / F.lit(100.0), F.lit(1.0))
    sw = stopword_ratio(c)
    sw_score = F.least(sw / F.lit(0.3), F.lit(1.0))
    punct = punct_ratio(c)
    punct_score = F.greatest(F.lit(0.0), F.lit(1.0) - punct * 2)
    mlen = mean_token_len(c)
    mlen_score = F.when((mlen >= 3) & (mlen <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round(
        len_score * 0.3 + sw_score * 0.3 + punct_score * 0.2 + mlen_score * 0.2, 4
    )


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Per-language stopword-hit counts (the language-ID evidence)."""
    toks = tokens(col)
    out = {}
    for lang, words in LANG_STOPWORDS.items():
        sw = F.array(*[F.lit(w) for w in words])
        out[lang] = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return out


def lang_id(col: Column | str) -> Column:
    """argmax over language scores via max(struct(score, lang)); ties are
    broken deterministically toward the lexicographically LARGER language
    code (struct comparison); all-zero scores → 'und'."""
    scores = lang_scores(col)
    best = F.array_max(
        F.array(
            *[
                F.struct(s.cast("long").alias("score"), F.lit(lang).alias("lang"))
                for lang, s in sorted(scores.items())
            ]
        )
    )
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


def fingerprint(col: Column | str) -> Column:
    """Document fingerprint: md5 over the canonicalized text (lowercase,
    punctuation stripped, whitespace collapsed). Robust to formatting-only
    edits; identical in DuckDB for the oracle."""
    from .dedup import canonical_text

    return F.md5(canonical_text(col))
