"""Deduplication operators for training-data pipelines over ``documents``.

Five dedup families, each a ``queries()`` entry with a DuckDB oracle
(hashing via md5, bit-identical across engines — Spark's xxhash64/hash
have no DuckDB twin):

* exact         — sha2 of canonical text, keep min doc_id per group
* n-gram Jaccard— exact set similarity on shingles (explode + join)
* MinHash + LSH — shingle → k minhashes → band buckets → candidate pairs
* SimHash       — 32-bit sign-sum sketch, near-dup = small Hamming dist
* embedding     — cosine similarity over embedding vectors (see
                  similarity.py for the ANN formulation)

Scale notes per operator are inline; the common theme: shuffles carry
signatures/buckets (tiny), never full documents, and pair generation is
bounded by bucket size, never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import ensure_parallelism, nd_barrier as _nd_barrier, tokens


# ---------------------------------------------------------------------------
# shared: md5-based 60-bit hash (DuckDB twin:
#   ('0x' || substr(md5(x), 1, 15))::BIGINT )
# 15 hex chars = 60 bits — always positive, no sign divergence.
# ---------------------------------------------------------------------------
def md5_long(col: Column, salt: Column | None = None) -> Column:
    src = col if salt is None else F.concat(salt, F.lit("|"), col)
    return F.conv(F.substring(F.md5(src), 1, 15), 16, 10).cast("long")


def canonical_text(col: Column | str) -> Column:
    """lower → drop non-alnum → collapse whitespace → trim.

    Built from ``split``+``array_join`` instead of ``regexp_replace``:
    bit-identical semantics (regexp_replace(x, P, "") ≡
    array_join(split(x, P), ""); the \\s+→" " collapse ≡ join-with-space
    — verified DISTINCT-FROM-free on corpus + adversarial edges), but
    ``regexp_replace`` serializes across tasks inside one JVM on this
    Spark build (measured FLAT 30k docs/s at any core count, while
    ``split`` scales ~0.8 — project memory trap #14)."""
    c = F.col(col) if isinstance(col, str) else col
    alnum = F.array_join(F.split(F.lower(c), r"[^a-z0-9\s]"), "")
    return F.trim(F.array_join(F.split(alnum, r"\s+"), " "))


def canonical_tokens(col: Column | str) -> Column:
    """``tokens(canonical_text(col))`` fused to two regex passes.

    ``canonical_text`` collapses whitespace to single spaces and trims
    purely so the string form is canonical; a consumer that only needs
    the TOKENS can skip that pass — splitting the alnum-filtered text on
    ``\\s+`` and dropping empties yields exactly the same token array
    (leading/trailing/repeated whitespace only ever produces empty
    fragments, which the filter removes). One fewer full split+join over
    the text per row; verified token-identical on the corpus."""
    c = F.col(col) if isinstance(col, str) else col
    alnum = F.array_join(F.split(F.lower(c), r"[^a-z0-9\s]"), "")
    return F.filter(F.split(alnum, r"\s+"), lambda x: x != "")


def shingles(col: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles over canonical tokens — see
    shingles_from_tokens. Prefer the DataFrame-level operators
    (hashed_shingles etc.), which materialize the token array first so
    the tokenizer isn't re-inlined per reference."""
    return shingles_from_tokens(tokens(canonical_text(col)), n)


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Positional word n-grams from a token-array column (NOT deduped —
    min-hash is multiset-safe; Jaccard dedups relationally).

    Linear construction: zip the token array against its shifts — each
    lambda touches only its arguments. The naive per-index
    ``slice(toks, i, n)`` form embeds the whole token subtree inside the
    lambda, which Spark's interpreted higher-order functions re-evaluate
    PER ELEMENT (observed quadratic: ~2.5 ms/row on 300-word docs). Docs
    shorter than n words yield their full token join so no document is
    silently dropped."""
    size = F.size(toks)
    grams = toks
    for j in range(1, n):
        shifted = F.slice(toks, j + 1, F.greatest(size - j, F.lit(0)))
        grams = F.zip_with(grams, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    grams = F.filter(grams, lambda x: x.isNotNull())
    return (
        F.when(size >= n, grams)
        .when(size > 0, F.array(F.concat_ws(" ", toks)))
        .otherwise(F.array().cast("array<string>"))
    )


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------
def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Groups of byte-identical (canonicalized) docs: one row per
    duplicated hash with the member ids. groupBy on a 64-hex string —
    uniform keys, no skew; partial agg collapses singletons map-side."""
    h = F.sha2(canonical_text(text_col), 256).alias("content_hash")
    return (
        ensure_parallelism(df).select(F.col(id_col).alias("doc_id"), h)
        .groupBy("content_hash")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("doc_id").alias("keep_doc_id"),
            F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
        )
        .filter(F.col("n_docs") > 1)
    )


def exact_dedup_keep(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """The deduplicated corpus: smallest id per canonical hash survives.
    max_by/min_by keeps this one-shuffle (no self-join back)."""
    h = F.sha2(canonical_text(text_col), 256)
    others = [c for c in df.columns]
    return (
        df.withColumn("_h", h)
        .groupBy("_h")
        .agg(*[F.min_by(F.col(c), F.col(id_col)).alias(c) for c in others])
        .drop("_h")
    )


# ---------------------------------------------------------------------------
# N-gram Jaccard
# ---------------------------------------------------------------------------
def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.5,
    stop_shingle_max_docs: int | None = None,
) -> DataFrame:
    """Exact Jaccard over shingle sets: explode shingles, self-join on the
    shingle (only co-occurring docs meet), count intersections, derive
    |A∪B| = |A|+|B|−|A∩B|.

    Scale: the join key is a shingle — frequency-skewed. One boilerplate
    shingle shared by f docs (a license header) creates an f² bucket, so
    ``stop_shingle_max_docs`` drops shingles present in more than that
    many docs BEFORE the self-join (one extra groupBy + semi-join over the
    sketch-sized shingle stream; at corpus scale set it to ~0.1% of |docs|).
    The cap also removes the stop-shingles from the Jaccard universe —
    exactly the standard stop-shingle semantics (near-dup evidence from
    ubiquitous text is noise, not signal). ``None`` (oracle scale) keeps
    the exact textbook Jaccard. Output: (doc_a, doc_b, jaccard), doc_a <
    doc_b.
    """
    sh = (
        ensure_parallelism(df).select(
            F.col(id_col).alias("doc_id"),
            # tokens staged behind an ND barrier so the tokenizer runs
            # once per row, not once per reference inside the shingle
            # expression (see hashed_shingles)
            _nd_barrier(canonical_tokens(text_col)).alias("_tk"),
        )
        .select(
            "doc_id", F.explode(shingles_from_tokens(F.col("_tk"), n)).alias("sh")
        )
        .dropDuplicates(["doc_id", "sh"])  # set semantics, relationally —
        # a hash shuffle beats per-row O(n²) array_distinct at scale
        .localCheckpoint(eager=True)  # shared by self-join sides + sizes
    )
    if stop_shingle_max_docs is not None:
        keep = (
            sh.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= stop_shingle_max_docs)
            .select("sh")
        )
        sh = sh.join(keep, "sh", "left_semi").localCheckpoint(eager=True)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 4
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------
# Universal-hash permutation family for MinHash: one md5 per shingle,
# then sig_i = min((a_i * h30 + b_i) mod P). All arithmetic stays inside
# 64-bit (h30 < 2^30, a_i < 2^20 → product < 2^50), so Spark and DuckDB
# compute bit-identical values. Coefficients are md5-derived constants —
# reproducible, no RNG state.
MINHASH_PRIME = 2147483647  # 2^31 - 1
_H30 = 1 << 30


def minhash_coeffs(k: int = 16, seed: int = 42) -> list[tuple[int, int]]:
    import hashlib

    out = []
    for i in range(k):
        a = int(hashlib.md5(f"a|{seed}|{i}".encode()).hexdigest()[:5], 16) | 1
        b = int(hashlib.md5(f"b|{seed}|{i}".encode()).hexdigest()[:7], 16)
        out.append((a, b))
    return out


def minhash_signature(col: Column | str, k: int = 16) -> Column:
    """k-permutation MinHash over one md5 per shingle (see minhash_coeffs).
    array<long> of length k; empty shingle set → nulls (doc excluded from
    banding). Prefer minhash_signatures (DataFrame form): it materializes
    the hashed-shingle column once between projections."""
    hs = F.transform(shingles(col), lambda s: md5_long(s) % F.lit(_H30))
    return _sig_from_hashes(hs, k)


def _sig_from_hashes(hs: Column, k: int) -> Column:
    def perm(a: int, b: int):
        return lambda h: (h * F.lit(a) + F.lit(b)) % F.lit(MINHASH_PRIME)

    return F.array(
        *[F.array_min(F.transform(hs, perm(a, b))) for a, b in minhash_coeffs(k)]
    )


def hashed_shingles(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, _hs: array<long>) with ONE md5 per shingle, each stage
    evaluated once per row. The ND barriers are deliberate optimizer
    fences: without them Catalyst's CollapseProject merges the staged
    projections back into one and inlines the whole
    text→token→shingle→md5 subtree into EVERY downstream consumer
    (16 sig permutations × filter pushdown — observed 38s vs ~3s at
    5000 docs). Earlier rounds used ``localCheckpoint`` barriers, which
    also materialize the intermediate (an extra job + serialize/
    deserialize of every token array); the ND barrier keeps the
    once-per-row evaluation while the pipeline streams (measured −13%
    on the sf1.0 signature stage, r6)."""
    tk_df = ensure_parallelism(df).select(
        F.col(id_col).alias("doc_id"),
        _nd_barrier(canonical_tokens(text_col)).alias("_tk"),
    )
    return tk_df.select(
        "doc_id",
        _nd_barrier(
            F.transform(
                shingles_from_tokens(F.col("_tk")),
                lambda s: md5_long(s) % F.lit(_H30),
            )
        ).alias("_hs"),
    )


def minhash_signatures_jvm(
    df: DataFrame, id_col: str, text_col: str, k: int = 16
) -> DataFrame:
    """Pure-JVM signature pipeline: k cheap arithmetic permutations over
    the staged shingle-hash column (see hashed_shingles for why the
    barrier matters). Semantics twin of the Arrow kernel — the parity
    test pins them equal on the corpus."""
    return hashed_shingles(df, id_col, text_col).select(
        "doc_id", _sig_from_hashes(F.col("_hs"), k).alias("sig")
    )


# ---------------------------------------------------------------------------
# Arrow sketch kernels (guide §4.2): Spark distributes and shuffles; the
# per-doc sketch math runs in Python workers over Arrow batches with the
# hashing in native code (hashlib md5) and the k permutations as one
# vectorized numpy min. The JVM expression pipeline computes the same
# values through interpreted higher-order functions (HOFs are
# CodegenFallback) — measured at sf1.0 (50k docs): minhash 1.99 s → 0.52 s,
# simhash 2.16 s → 0.50 s, bit-identical output on every SF.
#
# Cross-engine note: the Python tokenizer pins re.ASCII so `\s` and
# `[^a-z0-9\s]` match Java regex semantics, and str.lower() == Java
# toLowerCase for ASCII — the gate corpora are ASCII word-soup. For a
# non-ASCII corpus select the JVM twin (SPARK_GRAFT_SKETCH_IMPL=jvm).
# ---------------------------------------------------------------------------
_SPLIT_NONALNUM = None
_SPLIT_WS = None


def _py_tokens(s):
    """Python twin of canonical_tokens (ASCII-pinned regex semantics)."""
    global _SPLIT_NONALNUM, _SPLIT_WS
    if _SPLIT_NONALNUM is None:
        import re

        _SPLIT_NONALNUM = re.compile(r"[^a-z0-9\s]", re.ASCII).split
        _SPLIT_WS = re.compile(r"\s+", re.ASCII).split
    if s is None:
        return None
    return [t for t in _SPLIT_WS("".join(_SPLIT_NONALNUM(s.lower()))) if t]


def _sketch_impl() -> str:
    import os

    return os.environ.get("SPARK_GRAFT_SKETCH_IMPL", "arrow")


def minhash_signatures(df: DataFrame, id_col: str, text_col: str, k: int = 16) -> DataFrame:
    """(doc_id, sig: array<long>) — MinHash signatures. Default: Arrow
    kernel (see block comment above); ``SPARK_GRAFT_SKETCH_IMPL=jvm``
    selects the pure-expression twin. No shuffle either way: the kernel
    is map-only over the (spread) scan."""
    if _sketch_impl() != "arrow":
        return minhash_signatures_jvm(df, id_col, text_col, k)
    import hashlib

    import numpy as np

    coeffs = minhash_coeffs(k)
    A = np.array([a for a, _ in coeffs], dtype=np.int64)[:, None]
    B = np.array([b for _, b in coeffs], dtype=np.int64)[:, None]

    def kernel(batches):
        import pandas as pd

        md5 = hashlib.md5
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            sigs = []
            for s in pdf[text_col]:
                toks = _py_tokens(s)
                n = len(toks) if toks is not None else 0
                if n >= 3:
                    sh = [
                        toks[i] + " " + toks[i + 1] + " " + toks[i + 2]
                        for i in range(n - 2)
                    ]
                elif n > 0:
                    sh = [" ".join(toks)]
                else:
                    # no shingles → all-null signature, exactly like
                    # array_min over an empty transform in the JVM twin
                    sigs.append([None] * k)
                    continue
                hs = np.array(
                    [int(md5(x.encode()).hexdigest()[:15], 16) % _H30 for x in sh],
                    dtype=np.int64,
                )
                sigs.append(((A * hs[None, :] + B) % MINHASH_PRIME).min(axis=1).tolist())
            yield pd.DataFrame({"doc_id": ids, "sig": sigs})

    src = ensure_parallelism(df).select(F.col(id_col).alias(id_col), text_col)
    # the id column keeps its INPUT type (the JVM twin aliases it through
    # unchanged; ids are not always numeric — e.g. string doc keys)
    id_dt = df.schema[id_col].dataType.simpleString()
    return src.mapInPandas(kernel, f"doc_id {id_dt}, sig array<long>")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """LSH banding: split the k-long signature into ``bands`` bands of
    k/bands rows; docs sharing any band value are candidates; candidates
    are verified with the estimated Jaccard (fraction of equal signature
    positions).

    Scale: the shuffle key is (band_idx, band_hash) — a sketch, not text.
    Bucket sizes follow true duplicate clusters; pair fan-out is quadratic
    only within a bucket (i.e. within a near-dup cluster), which is the
    point of LSH. Output: (doc_a, doc_b, est_jaccard), doc_a < doc_b.
    """
    rows_per_band = k // bands
    sigs = minhash_signatures(df, id_col, text_col, k).filter(
        ~F.exists("sig", lambda x: x.isNull())
    )
    # EAGERLY materialize signatures before the self-join: sketches are
    # tiny (k longs/doc) and both join sides + the estimate stage consume
    # them. (eager=False is a trap: a lazily-checkpointed RDD consumed by
    # several stages of one job recomputes its lineage per consumer.)
    sigs = sigs.localCheckpoint(eager=True)
    banded = sigs.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.concat_ws(
                            ",",
                            *[
                                F.element_at("sig", b * rows_per_band + r + 1).cast("string")
                                for r in range(rows_per_band)
                            ],
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "sig", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    est = F.round(
        F.size(F.filter(F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda e: e))
        / F.lit(k),
        4,
    )
    return (
        cand.withColumn("est_jaccard", est)
        .filter(F.col("est_jaccard") >= threshold)
        .select("doc_a", "doc_b", "est_jaccard")
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------
def simhash32(col: Column | str) -> Column:
    """32-bit SimHash over canonical tokens: per bit b, sum +1/-1 by
    token-hash bit; simhash bit = 1 iff the sum > 0. Pure higher-order
    expressions: per row, over tokens × 32 bits. Cross-engine: token hash
    is md5-based; bit test is integer shift+mask."""
    toks = tokens(canonical_text(col))
    th = F.transform(toks, lambda t: md5_long(t))

    def bit_merge(b: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    bit_sums = [F.aggregate(th, F.lit(0), bit_merge(b)) for b in range(32)]
    out = F.lit(0).cast("long")
    for b, s in enumerate(bit_sums):
        out = out + F.when(s > 0, F.lit(2**b).cast("long")).otherwise(F.lit(0).cast("long"))
    return out


def simhash_signatures(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, sig) — 32-bit SimHash. Default: Arrow kernel (token md5
    in native code, the 32 sign-sums as one vectorized numpy pass; see
    the Arrow block comment above); ``SPARK_GRAFT_SKETCH_IMPL=jvm``
    selects the pure-expression twin. Map-only either way."""
    if _sketch_impl() != "arrow":
        return simhash_signatures_jvm(df, id_col, text_col)
    import hashlib

    import numpy as np

    bits = np.arange(32, dtype=np.int64)[:, None]
    weights = (np.int64(1) << np.arange(32, dtype=np.int64))

    def kernel(batches):
        import pandas as pd

        md5 = hashlib.md5
        for pdf in batches:
            ids = pdf[id_col].to_numpy()
            sigs = np.zeros(len(ids), dtype=np.int64)
            for i, s in enumerate(pdf[text_col]):
                toks = _py_tokens(s)
                if not toks:
                    continue  # no tokens → every bit sum is 0 → sig 0
                th = np.array(
                    [int(md5(t.encode()).hexdigest()[:15], 16) for t in toks],
                    dtype=np.int64,
                )
                sums = (2 * ((th[None, :] >> bits) & 1) - 1).sum(axis=1)
                sigs[i] = np.sum((sums > 0) * weights)
            yield pd.DataFrame({"doc_id": ids, "sig": sigs})

    src = ensure_parallelism(df).select(F.col(id_col).alias(id_col), text_col)
    id_dt = df.schema[id_col].dataType.simpleString()  # see minhash twin note
    return src.mapInPandas(kernel, f"doc_id {id_dt}, sig long")


def simhash_signatures_jvm(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Pure-JVM twin of :func:`simhash_signatures`: token hashes computed
    once per row behind an ND barrier (CollapseProject would otherwise
    inline the tokenize subtree into all 32 bit-sum aggregates — see
    hashed_shingles), then the 32 sign-sums over the int array."""
    th_df = ensure_parallelism(df).select(
        F.col(id_col).alias("doc_id"),
        _nd_barrier(
            F.transform(canonical_tokens(text_col), lambda t: md5_long(t))
        ).alias("_th"),
    )

    def bit_merge(b: int):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    bit_sums = [F.aggregate(F.col("_th"), F.lit(0), bit_merge(b)) for b in range(32)]
    out = F.lit(0).cast("long")
    for b, s in enumerate(bit_sums):
        out = out + F.when(s > 0, F.lit(2**b).cast("long")).otherwise(F.lit(0).cast("long"))
    return th_df.select("doc_id", out.alias("sig"))


def hamming32(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming.

    Banding trick for scale: split 32 bits into 4 bytes; pairs within
    Hamming ≤ 3 share at least one exact byte (pigeonhole), so the join
    key is (byte_idx, byte_value) — never all-pairs.
    """
    sigs = simhash_signatures(df, id_col, text_col).localCheckpoint(
        eager=True
    )  # one long/doc; never recompute per join side
    banded = sigs.select(
        "doc_id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright("sig", i * 8).bitwiseAND(F.lit(255)).alias("byte"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bb"),
    ).select("doc_id", "sig", "bb.band", "bb.byte")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.byte") == F.col("b.byte"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming32(F.col("a.sig"), F.col("b.sig")).alias("hamming"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .filter(F.col("hamming") <= max_hamming)
    )


# ---------------------------------------------------------------------------
# duplicate CLUSTERS: pairs → connected components → one survivor
# ---------------------------------------------------------------------------

def _large_star(e: DataFrame) -> DataFrame:
    """Large-star round: every node connects its strictly LARGER
    neighbors to the minimum of its closed neighborhood. Preserves
    connectivity and bounds high-degree blowup (the giant-component
    hub never fans out to smaller ids)."""
    sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (
        sym.groupBy("u")
        .agg(F.min("v").alias("mn"))  # map-side combine: min is partial
        .select("u", F.least("mn", F.col("u")).alias("m"))
    )
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e: DataFrame) -> DataFrame:
    """Small-star round: orient every edge high→low, then each node
    connects its (all smaller) neighbors and itself to the minimum."""
    oriented = e.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).where(F.col("u") != F.col("v"))
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    return (
        oriented.join(mins, "u")
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .union(mins.select(F.col("u"), F.col("m").alias("v")))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Connected components over a duplicate-pair edge list →
    ``(id, component)`` where ``component`` is the MINIMUM id in the
    cluster (deterministic label, no ordering assumptions beyond a
    total order on ids — longs and strings both work).

    Alternating large-star / small-star (Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC 2014): converges in
    O(log n) rounds — unlike naive label propagation, whose round count
    is the graph DIAMETER (a pathological near-dup chain of 10k docs
    would need 10k shuffles; this needs ~14). Each round is two
    min-aggregations and two equi-joins on node id; shuffled payload is
    one (id, id) pair per edge — never document text. The edge set
    SHRINKS toward one star per component, so later rounds are cheap;
    ``localCheckpoint`` after each round cuts the iterative lineage
    (the classic iterative-plan blowup) and re-reads the shrinking
    edge set, not the original pairs.

    Only ids appearing in ``pairs`` are returned (an isolated document
    is its own component — callers left-join and coalesce, see
    :func:`near_dedup_keep`). Raises if not converged within
    ``max_iterations`` (log2-ish bound: 25 rounds covers any realistic
    edge count).
    """
    e = (
        pairs.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u").isNotNull() & F.col("v").isNotNull())
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev_sig = None
    for _ in range(max_iterations):
        e2 = _small_star(_large_star(e)).localCheckpoint(eager=True)
        sig = e2.agg(
            F.count(F.lit(1)).alias("n"),
            # bit_xor: order-independent, overflow-free (ANSI-safe)
            # fingerprint of the DISTINCT edge set
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).collect()[0]
        sig = (sig["n"], sig["h"])
        e = e2
        if sig == prev_sig:
            break
        prev_sig = sig
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "rounds — edge set still changing (pass a larger "
            "max_iterations; O(log n) rounds is the expected bound)"
        )
    # converged: e is a star forest, every edge u→root. Roots map to
    # themselves.
    return (
        e.select(F.col("u").alias("id"), F.col("v").alias("component"))
        .union(
            e.select(F.col("v").alias("id"), F.col("v").alias("component"))
        )
        .distinct()
    )


def near_dedup_keep(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
    prefer: Column | None = None,
) -> DataFrame:
    """The step after pair generation a real corpus dedup needs: group
    near-duplicate PAIRS (from :func:`minhash_lsh_pairs`,
    :func:`simhash_pairs`, :func:`ngram_jaccard_pairs`, or
    ``similarity.srp_near_dup``) into clusters and keep ONE survivor
    per cluster.

    ``prefer`` ranks survivors (higher wins — e.g. a quality score or
    ``F.length("content")``); ties and the default fall back to the
    MINIMUM id (deterministic). Returns ``docs``' full rows for the
    survivors plus ``component`` (cluster label) and ``cluster_size``.
    Documents in no pair survive trivially as their own singleton.

    Plan shape at scale: components over the (tiny) pair list, then ONE
    broadcast-or-shuffle left join of docs against the component map
    (near-dup members are a small fraction of the corpus, so Spark
    broadcasts the map when it fits; the docs table itself is never
    shuffled in that case), and a single ``min_by``/``max_by`` shuffle
    on component for survivor election.
    """
    cc = connected_components(pairs, src=src, dst=dst)
    labeled = (
        docs.join(cc, docs[id_col] == cc["id"], "left")
        .drop("id")
        .withColumn("component", F.coalesce("component", F.col(id_col)))
    )
    rank = (
        F.struct(F.col(id_col).alias("tie"))
        if prefer is None
        else F.struct((-prefer).alias("rank"), F.col(id_col).alias("tie"))
    )
    winners = labeled.groupBy("component").agg(
        F.min_by(F.col(id_col), rank).alias("__keep"),
        F.count(F.lit(1)).alias("cluster_size"),
    )
    return (
        labeled.join(winners, "component")
        .where(F.col(id_col) == F.col("__keep"))
        .drop("__keep")
    )
