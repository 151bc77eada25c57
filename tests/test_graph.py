"""Connected components (operators/graph.py): fixtures with known
components, differential vs a pure-Python union-find, deep-chain
convergence the propagation kernel can't reach, and the prop-vs-star
equality the dedup_cc_keepers oracle relies on."""

import pytest
from pyspark.sql import functions as F

from distributed_search_engine_spark.operators import dedup as D
from distributed_search_engine_spark.operators.graph import (
    cc_propagate,
    components_from_pairs,
    connected_components,
    dedup_keep_canonical,
)


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "u long, v long")


def _labels(df):
    return {r[0]: r[1] for r in df.collect()}


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


FIXTURE = [
    # two triangles bridged by one edge + an isolated pair + a 4-chain
    (1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (12, 10), (3, 10),
    (20, 21),
    (30, 31), (31, 32), (32, 33),
]
FIXTURE_WANT = {
    1: 1, 2: 1, 3: 1, 10: 1, 11: 1, 12: 1,
    20: 20, 21: 20,
    30: 30, 31: 30, 32: 30, 33: 30,
}


def test_star_kernel_fixture(spark):
    got = _labels(connected_components(_edges(spark, FIXTURE)))
    assert got == FIXTURE_WANT


def test_propagation_fixture_converged(spark):
    # diameter of the biggest fixture component is 4 -> 4 rounds converge
    got = _labels(cc_propagate(_edges(spark, FIXTURE), 4))
    assert got == FIXTURE_WANT


def test_propagation_partial_rounds_deterministic(spark):
    # 1 round on the 4-chain: each node takes the min within 1 hop —
    # NOT converged, but exactly what the unrolled oracle computes
    got = _labels(cc_propagate(_edges(spark, [(30, 31), (31, 32), (32, 33)]), 1))
    assert got == {30: 30, 31: 30, 32: 31, 33: 32}


def test_star_kernel_deep_chain(spark):
    # a 60-hop chain: propagation would need 60 rounds; the star kernel
    # collapses it in O(log^2 n) alternations
    chain = [(i, i + 1) for i in range(60)]
    got = _labels(connected_components(_edges(spark, chain)))
    assert got == {i: 0 for i in range(61)}


def test_star_vs_union_find_random(spark):
    # deterministic pseudo-random graph, differential vs union-find
    pairs = [((i * 7919) % 97, (i * 104729) % 97) for i in range(120)]
    pairs = [(a, b) for a, b in pairs if a != b]
    got = _labels(connected_components(_edges(spark, pairs)))
    assert got == _union_find(pairs)


def test_prop_equals_star_on_corpus_pairs(spark, sf_dir="/root/testdata/sf0.001"):
    # the dedup_cc_keepers oracle unrolls 4 propagation rounds; this
    # pins that 4 rounds HAVE converged on the real near-dup pair graph
    # (measured component diameter 1 at sf0.001-0.1)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = D.lsh_candidate_pairs(D.minhash_signatures(D.shingles(docs)))
    prop = _labels(components_from_pairs(pairs, iterations=4))
    star = _labels(components_from_pairs(pairs))
    assert prop == star
    assert len(prop) > 0


def test_keep_canonical(spark):
    docs = spark.createDataFrame(
        [(i, f"d{i}") for i in range(8)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        # {1,2,3} transitively via 1-2, 2-3; {5,7} direct
        [("1", "2"), ("2", "3"), ("5", "7")], "doc_a string, doc_b string"
    )
    kept = sorted(
        r["doc_id"] for r in dedup_keep_canonical(docs, pairs).collect()
    )
    # losers 2, 3 (component min 1) and 7 (component min 5)
    assert kept == [0, 1, 4, 5, 6]


def test_star_kernel_nonconvergence_guard(spark):
    with pytest.raises(RuntimeError):
        connected_components(
            _edges(spark, [(i, i + 1) for i in range(40)]), max_rounds=1
        )


def test_candidate_volume_bounded(spark):
    # star rounds only shrink the edge set: a hot star (500 edges into
    # one hub) must not blow up intermediate edge counts
    hub = [(0, i) for i in range(1, 500)]
    e = _edges(spark, hub)
    out = connected_components(e)
    assert out.count() == 500
    assert _labels(out) == {i: 0 for i in range(500)}
