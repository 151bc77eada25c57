"""RM3 pseudo-relevance feedback (query/engine.search_rm3): the
recall-boost property, expansion-term exclusion rules, determinism, and
the bounded shape of the feedback chain."""

from __future__ import annotations

from distributed_search_engine_spark.operators.postings import build_index
from distributed_search_engine_spark.query.engine import (
    SearchIndex,
    search_rm3,
)

# Corpus engineered so 'engine' co-occurs with 'turbine' in the docs
# that match the query, and one doc ("4") contains ONLY the co-occurring
# vocabulary — plain BM25 can never return it for the query, RM3 can.
CORPUS = {
    "0": "engine turbine rotor engine turbine",
    "1": "engine turbine blade cooling",
    "2": "engine exhaust turbine casing",
    "3": "unrelated words about cooking pasta sauce",
    "4": "turbine rotor blade casing",  # no query term
}


def _sidx(spark):
    docs = spark.createDataFrame(
        list(CORPUS.items()), "doc_id string, text string"
    )
    idx = build_index(
        docs, doc_id_col="doc_id", content_col="text", with_stems=False
    )
    return SearchIndex(
        postings=idx["postings"], term_stats=idx["term_stats"],
        doc_stats=idx["doc_stats"], term_dict=idx["term_dict"],
        total_docs=idx["total_docs"],
    )


def test_rm3_recall_boost_and_exclusions(spark):
    sidx = _sidx(spark)
    out = search_rm3(
        spark, sidx, ["engine"], k=10, fb_docs=3, fb_terms=3, beta=0.6
    ).collect()
    docs = [r["doc_id"] for r in out]
    # the expansion-only doc is retrieved (pure BM25 cannot do this) ...
    assert "4" in docs
    # ... and the off-topic doc is not pulled in by feedback
    assert "3" not in docs
    # ranks are 1..n dense and ordered by (score desc, doc_id asc)
    assert [r["rank"] for r in out] == list(range(1, len(out) + 1))
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True) or len(set(scores)) < len(
        scores
    )


def test_rm3_beta_zero_equals_bm25_ranking(spark):
    """With beta=0 the expansion contributes nothing: scores equal the
    plain first-pass BM25 scores."""
    sidx = _sidx(spark)
    rm3 = {
        r["doc_id"]: r["score"]
        for r in search_rm3(
            spark, sidx, ["engine"], k=10, fb_docs=3, fb_terms=3, beta=0.0
        ).collect()
    }
    # expansion-only docs surface with EXACTLY zero added mass ...
    assert rm3["4"] == 0.0
    # ... and query-term docs score identically to plain BM25
    # (fb_terms=0 disables mining entirely -> pure first-pass scores)
    plain = {
        r["doc_id"]: r["score"]
        for r in search_rm3(
            spark, sidx, ["engine"], k=10, fb_docs=3, fb_terms=0, beta=0.6
        ).collect()
    }
    assert plain == {d: s for d, s in rm3.items() if d != "4"}


def test_rm3_deterministic(spark):
    sidx = _sidx(spark)
    a = search_rm3(spark, sidx, ["engine", "blade"], k=10).collect()
    b = search_rm3(spark, sidx, ["engine", "blade"], k=10).collect()
    assert a == b
