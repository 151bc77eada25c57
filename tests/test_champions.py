"""Champion lists (index/champions.py): per-term cut determinism,
m=inf == exact batch BM25, recall curve monotonicity, and the recall
numbers recorded in RECALL.md."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_search_engine_spark.index.champions import (
    champion_postings,
    champion_recall,
    search_bm25_champion,
)
from distributed_search_engine_spark.operators.postings import build_index
from distributed_search_engine_spark.query.engine import (
    SearchIndex,
    search_bm25_batch,
)

QUERIES = [["data", "stream"], ["window"], ["hash", "sort", "merge"]]


@pytest.fixture(scope="module")
def idx(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    built = build_index(
        docs, doc_id_col="doc_id", content_col="text", with_stems=False
    )
    for name in ("postings", "term_stats", "doc_stats"):
        built[name] = built[name].persist()
    return built


def _sidx(built):
    return SearchIndex(
        postings=built["postings"],
        term_stats=built["term_stats"],
        doc_stats=built["doc_stats"],
        term_dict=built["term_dict"],
        total_docs=built["total_docs"],
    )


def test_champion_lists_cut_to_m_per_term(spark, idx):
    champs = champion_postings(
        idx["postings"], idx["term_stats"], _sidx(idx).avgdl, 5
    )
    per_term = champs.groupBy("term").count().agg(F.max("count")).collect()
    assert per_term[0][0] <= 5


def test_huge_m_equals_exact_topk_docs(spark, idx):
    """With m >= every df, champions are the full index; the top-k doc
    sets must equal the exact batch scorer's (scores differ only by the
    per-contrib rounding discipline, so compare docs per rank)."""
    sidx = _sidx(idx)
    champs = champion_postings(
        idx["postings"], idx["term_stats"], sidx.avgdl, 10**9
    )
    approx = search_bm25_champion(spark, champs, QUERIES, k=10)
    qtexts = [" ".join(q) for q in QUERIES]
    exact = search_bm25_batch(spark, sidx, qtexts, k=10)
    a = {
        (r["query"], r["rank"]): r["doc_id"] for r in approx.collect()
    }
    e = {(r["query"], r["rank"]): r["doc_id"] for r in exact.collect()}
    assert a == e


def test_recall_monotone_in_m_and_recorded(spark, idx):
    sidx = _sidx(idx)
    qtexts = [" ".join(q) for q in QUERIES]
    exact = search_bm25_batch(spark, sidx, qtexts, k=10).persist()
    recalls = {}
    for m in (5, 20, 80):
        champs = champion_postings(
            idx["postings"], idx["term_stats"], sidx.avgdl, m
        )
        approx = search_bm25_champion(spark, champs, QUERIES, k=10)
        r = champion_recall(approx, exact, k=10).agg(
            (F.sum("n_hit") / F.sum("n_exact")).alias("r")
        ).collect()[0]["r"]
        recalls[m] = float(r)
    assert recalls[5] <= recalls[20] <= recalls[80]
    # measured curve at sf0.001 (recorded in RECALL.md): multi-term docs
    # accumulate many small contribs, so head-only lists miss a real
    # tail — the honest tiered-index trade-off, not a bug
    assert recalls[80] >= 0.55
    # the deepest tier is a deterministic approximation, never empty
    assert recalls[5] > 0.0


def test_champion_choice_is_deterministic(spark, idx):
    sidx = _sidx(idx)
    c1 = champion_postings(
        idx["postings"], idx["term_stats"], sidx.avgdl, 7
    ).orderBy("term", "doc_id").collect()
    c2 = champion_postings(
        idx["postings"], idx["term_stats"], sidx.avgdl, 7
    ).orderBy("term", "doc_id").collect()
    assert [tuple(r) for r in c1] == [tuple(r) for r in c2]
