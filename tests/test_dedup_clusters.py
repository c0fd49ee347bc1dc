"""Duplicate clustering: pairs → connected components → one survivor.

Pins the alternating large-star/small-star components operator against
a pure-Python union-find oracle (random graphs, string and long ids),
its O(log n)-round convergence on a pathological CHAIN (naive label
propagation would need diameter rounds), and the survivor-selection
semantics of ``near_dedup_keep`` (min-id default, ``prefer`` ranking,
singleton passthrough, cluster sizes) — including end-to-end from
``minhash_lsh_pairs`` output.
"""

import random

import pytest
from pyspark.sql import functions as F

from encode_ingest_spark.operators.dedup import (
    connected_components,
    minhash_lsh_pairs,
    near_dedup_keep,
)


def _union_find(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    # canonical label = min member per component
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for members in comp.values() for n in members}


@pytest.mark.parametrize("seed,as_str", [(7, False), (11, True), (23, False)])
def test_components_match_union_find(spark, seed, as_str):
    rng = random.Random(seed)
    n_nodes, n_edges = 300, 420
    edges = {
        (rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(n_edges)
    }
    edges = [(a, b) for a, b in edges if a != b]
    if as_str:
        edges = [(f"d{a:04d}", f"d{b:04d}") for a, b in edges]
    nodes = {x for e in edges for x in e}
    want = _union_find(nodes, edges)

    pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    got = {
        r.id: r.component for r in connected_components(pairs).collect()
    }
    assert got == want


def test_components_converge_on_chain(spark):
    """A 200-link chain has diameter 200; label propagation needs 200
    rounds, large-star/small-star a handful — the default
    max_iterations=25 doubles as the convergence-speed assertion."""
    edges = [(i, i + 1) for i in range(200)]
    pairs = spark.createDataFrame(edges, ["doc_a", "doc_b"])
    got = connected_components(pairs).collect()
    assert {r.component for r in got} == {0}
    assert {r.id for r in got} == set(range(201))


def test_components_empty_and_self_pairs(spark):
    pairs = spark.createDataFrame(
        [(1, 1), (2, 2)], ["doc_a", "doc_b"]
    )  # self-loops only: no real edges
    assert connected_components(pairs).count() == 0


def _docs(spark):
    return spark.createDataFrame(
        [
            ("d1", "alpha", 0.9),
            ("d2", "alpha copy", 0.5),
            ("d3", "alpha copy 2", 0.7),
            ("d4", "beta", 0.1),
            ("d5", "beta copy", 0.8),
            ("d6", "lonely", 0.4),
        ],
        ["doc_id", "content", "quality"],
    )


def test_near_dedup_keep_min_id_default(spark):
    pairs = spark.createDataFrame(
        [("d1", "d2"), ("d2", "d3"), ("d4", "d5")], ["doc_a", "doc_b"]
    )
    kept = near_dedup_keep(_docs(spark), pairs).collect()
    by_id = {r.doc_id: r for r in kept}
    assert set(by_id) == {"d1", "d4", "d6"}
    assert by_id["d1"].cluster_size == 3
    assert by_id["d4"].cluster_size == 2
    assert by_id["d6"].cluster_size == 1
    assert by_id["d6"].component == "d6"  # singleton labels itself


def test_near_dedup_keep_prefer_ranking(spark):
    """prefer picks the HIGHEST-ranked member; ties fall to min id."""
    pairs = spark.createDataFrame(
        [("d1", "d2"), ("d2", "d3"), ("d4", "d5")], ["doc_a", "doc_b"]
    )
    kept = near_dedup_keep(
        _docs(spark), pairs, prefer=F.col("quality")
    ).collect()
    assert {r.doc_id for r in kept} == {"d1", "d5", "d6"}
    # tie on the ranking column → deterministic min id
    tied = _docs(spark).withColumn("quality", F.lit(1.0))
    kept = near_dedup_keep(tied, pairs, prefer=F.col("quality")).collect()
    assert {r.doc_id for r in kept} == {"d1", "d4", "d6"}


def test_near_dedup_keep_from_lsh_pairs(spark):
    """End-to-end: LSH candidate pairs over a corpus with two near-dup
    families collapse to one survivor per family plus the uniques."""
    base_a = "the quick brown fox jumps over the lazy dog again and again"
    base_b = "entirely different content about spark shuffle partitioning"
    docs = spark.createDataFrame(
        [
            ("a1", base_a),
            ("a2", base_a + " extra"),
            ("a3", base_a.replace("lazy", "sleepy")),
            ("b1", base_b),
            ("b2", base_b + " tail"),
            ("u1", "unique short text with nothing in common here at all"),
        ],
        ["doc_id", "content"],
    )
    pairs = minhash_lsh_pairs(docs, "doc_id", "content").select(
        "doc_a", "doc_b"
    )
    kept = near_dedup_keep(docs, pairs)
    ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert "u1" in ids
    assert len(ids & {"a1", "a2", "a3"}) == 1
    assert len(ids & {"b1", "b2"}) == 1
