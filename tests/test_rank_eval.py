"""Rank-metric evaluation (operators/rank_eval.py): hand-computed
P@k / recall@k / MRR / nDCG@k, zero-relevance and missing-qrels edges."""

from __future__ import annotations

import math

from distributed_search_engine_spark.operators import rank_eval as RE


def _run(spark, runs, qrels, k):
    rdf = spark.createDataFrame(runs, "query string, doc_id string, rank int")
    qdf = spark.createDataFrame(
        qrels, "query string, doc_id string, grade int"
    )
    return {r["query"]: r for r in RE.rank_metrics(rdf, qdf, k=k).collect()}


def test_hand_computed_metrics(spark):
    out = _run(
        spark,
        runs=[("q", "d1", 1), ("q", "d2", 2), ("q", "d3", 3)],
        qrels=[("q", "d1", 2), ("q", "d3", 1), ("q", "d4", 3)],
        k=3,
    )["q"]
    assert out["n_rel"] == 3
    assert out["p_at_k"] == round(2 / 3, 6)
    assert out["recall_at_k"] == round(2 / 3, 6)
    assert out["mrr"] == 1.0
    dcg = 3 / math.log2(2) + 1 / math.log2(4)
    idcg = 7 / math.log2(2) + 3 / math.log2(3) + 1 / math.log2(4)
    assert abs(out["ndcg_at_k"] - round(dcg / idcg, 6)) < 1e-9


def test_no_relevant_retrieved_and_missing_qrels(spark):
    out = _run(
        spark,
        runs=[("a", "d1", 1), ("a", "d2", 2), ("b", "d9", 1)],
        qrels=[("a", "d7", 1)],  # relevant doc never retrieved; b unjudged
        k=2,
    )
    a, b = out["a"], out["b"]
    assert (a["p_at_k"], a["recall_at_k"], a["mrr"], a["ndcg_at_k"]) == (
        0.0, 0.0, 0.0, 0.0,
    )
    assert a["n_rel"] == 1
    assert b["n_rel"] == 0 and b["recall_at_k"] == 0.0 and b["ndcg_at_k"] == 0.0


def test_rank_cutoff_applies(spark):
    """A relevant doc at rank k+1 contributes nothing."""
    out = _run(
        spark,
        runs=[("q", "d1", 1), ("q", "d2", 2), ("q", "d3", 3)],
        qrels=[("q", "d3", 1)],
        k=2,
    )["q"]
    assert out["mrr"] == 0.0 and out["p_at_k"] == 0.0
    # perfect retrieval at k=3 gives ndcg exactly 1
    out3 = _run(
        spark,
        runs=[("q", "d3", 1)],
        qrels=[("q", "d3", 1)],
        k=3,
    )["q"]
    assert out3["ndcg_at_k"] == 1.0 and out3["recall_at_k"] == 1.0
