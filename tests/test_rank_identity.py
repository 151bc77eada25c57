"""Rank identity: the DataFrame engine vs the independent pure-Python
reference oracle on the FIXTURES.md §5 query set over a seeded corpus.
Both implement the reference formula chain independently — exact score
agreement is the rank-identity gate (BASELINE.json metric)."""

import pytest
from pyspark.sql import functions as F

from distributed_search_engine_spark.corpus import generate_rows, ingest, make_corpus
from distributed_search_engine_spark.operators.postings import build_index
from distributed_search_engine_spark.query.engine import SearchIndex, search
from tests.naive_reference import naive_search

# FIXTURES.md §5 queries (9/10 — spellcheck and autocomplete are covered in
# test_suggest.py; query 9/10 are not ranking queries)
QUERY_SET = [
    "compute",            # 1: single common term
    "the",                # 2: stop word -> empty
    "computing",          # 3: stemmable, expansion + dedup
    "compute computing",  # 4: two stemmable terms sharing a stem
    "spark shuffle",      # 5: two-term co-occurrence
    "spark nonexistent",  # 6: never co-occurring -> empty
    "alpha beta gamma",   # 8: 3-term mixed
    "engine",             # 7-ish: term that appears in titles
    "2024",               # numeric term
]

N_DOCS = 120


@pytest.fixture(scope="module")
def setup(spark):
    src = make_corpus(spark, n_docs=N_DOCS, seed=13)
    docs = ingest(src)
    idx = build_index(docs)
    sidx = SearchIndex(
        postings=idx["postings"], term_stats=idx["term_stats"],
        doc_stats=idx["doc_stats"], term_dict=idx["term_dict"],
        total_docs=idx["total_docs"],
    )
    corpus = {}
    rows = list(generate_rows(N_DOCS, seed=13))
    import hashlib

    for repo, path, commit, lang, content in rows:
        doc_id = hashlib.sha256(
            ("\x00".join([repo, path, commit])).encode()
        ).hexdigest()
        corpus[doc_id] = content
    return sidx, corpus


@pytest.mark.parametrize("query", QUERY_SET)
def test_rank_identity(spark, setup, query):
    sidx, corpus = setup
    got = [
        (r["doc_id"], r["score"])
        for r in search(spark, sidx, query, k=1000, mode="reference").collect()
    ]
    want = naive_search(corpus, query, k=1000)
    assert [d for d, _ in got] == [d for d, _ in want], query
    for (d1, s1), (d2, s2) in zip(got, want):
        assert abs(s1 - s2) < 1e-9, (query, d1, s1, s2)


def test_match_rate_is_100_percent(spark, setup):
    """The BASELINE metric: top-k rank-identical match rate over the query
    set — docIDs AND scores."""
    sidx, corpus = setup
    matches = 0
    ranking_queries = [q for q in QUERY_SET]
    for q in ranking_queries:
        got = [
            (r["doc_id"], round(r["score"], 9))
            for r in search(spark, sidx, q, k=20, mode="reference").collect()
        ]
        want = [(d, round(s, 9)) for d, s in naive_search(corpus, q, k=20)]
        if got == want:
            matches += 1
    assert matches == len(ranking_queries)  # 100% match rate


def test_batch_bm25_matches_per_query(spark):
    """One-job batch scoring must equal the per-query BM25 engine for every
    query in the set (6dp-rounded scores; identical rank order)."""
    from distributed_search_engine_spark.corpus import ingest, make_corpus
    from distributed_search_engine_spark.operators.postings import build_index
    from distributed_search_engine_spark.query.engine import (
        SearchIndex,
        search,
        search_bm25_batch,
    )

    idx = build_index(ingest(make_corpus(spark, n_docs=80, seed=13)))
    sidx = SearchIndex(
        postings=idx["postings"], term_stats=idx["term_stats"],
        doc_stats=idx["doc_stats"], term_dict=idx["term_dict"],
        total_docs=idx["total_docs"],
    )
    queries = ["spark compute", "partition", "the", "computing engine"]
    batch = search_bm25_batch(spark, sidx, queries, k=7).collect()
    by_q = {}
    for r in batch:
        by_q.setdefault(r["query"], []).append((r["doc_id"], r["score"], r["rank"]))
    assert "the" not in by_q  # lone stop word short-circuits
    for q in ["spark compute", "partition", "computing engine"]:
        want = [
            (r["doc_id"], round(r["score"], 6))
            for r in search(spark, sidx, q, k=7, mode="bm25").collect()
        ]
        got = [(d, s) for d, s, _ in sorted(by_q[q], key=lambda t: t[2])]
        assert got == want, q


def test_cached_term_dict_matches_distributed_lookup(spark):
    """cache_term_dict must not change any result — same related-words
    expansion, same scores (reference mode exercises the expansion)."""
    from distributed_search_engine_spark.corpus import ingest, make_corpus
    from distributed_search_engine_spark.operators.postings import build_index
    from distributed_search_engine_spark.query.engine import SearchIndex, search

    idx = build_index(ingest(make_corpus(spark, n_docs=50, seed=21)))
    def mk():
        return SearchIndex(
            postings=idx["postings"], term_stats=idx["term_stats"],
            doc_stats=idx["doc_stats"], term_dict=idx["term_dict"],
            total_docs=idx["total_docs"],
        )
    for q in ["computing engine", "spark searches"]:
        a = [tuple(r) for r in search(spark, mk(), q, k=20, mode="reference").collect()]
        b = [tuple(r) for r in search(spark, mk().cache_term_dict(), q, k=20, mode="reference").collect()]
        assert a == b, q
