"""Trigram substring index (index/trigram.py): window generation edge
cases, pruning losslessness, occurrence counting, fallback paths."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_search_engine_spark.index import trigram as TRI

DOCS = [
    (1, "Data Stream processing over a data stream"),
    (2, "no match here at all"),
    (3, "datastream fused word"),
    (4, "ab"),  # too short for any trigram
    (5, None),  # null text survives the build guard
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_trigram_windows_and_short_doc_guard(spark):
    docs = spark.createDataFrame(
        [(1, "AbCd"), (2, "xy"), (3, None)], "doc_id long, text string"
    )
    rows = TRI.trigram_postings(docs).collect()
    got = {(r["doc_id"], r["trigram"]) for r in rows}
    assert got == {(1, "abc"), (1, "bcd")}


def test_substring_search_counts_and_case(spark):
    docs = _docs(spark)
    post = TRI.trigram_postings(docs)
    out = {
        r["doc_id"]: r["n_occurrences"]
        for r in TRI.substring_search(docs, post, "Data Stream").collect()
    }
    # doc 1 matches twice (case-insensitive); doc 3's fused word does not
    # contain the space
    assert out == {1: 2}


def test_pruning_is_lossless_at_every_prune_to(spark):
    """Candidates from ANY rarest-subset size must verify to the same
    exact answer — the Cox/Zoekt invariant the gate oracle checks."""
    docs = _docs(spark)
    post = TRI.trigram_postings(docs)
    want = {
        r["doc_id"]: r["n_occurrences"]
        for r in TRI.substring_search(docs, post, "data", prune_to=99).collect()
    }
    for p in (1, 2, 3):
        got = {
            r["doc_id"]: r["n_occurrences"]
            for r in TRI.substring_search(docs, post, "data", prune_to=p).collect()
        }
        assert got == want, p
    assert want == {1: 2, 3: 1}


def test_absent_trigram_short_circuits_empty(spark):
    docs = _docs(spark)
    post = TRI.trigram_postings(docs)
    assert TRI.substring_search(docs, post, "zzzqqq").count() == 0


def test_short_needle_falls_back_to_exact_scan(spark):
    docs = _docs(spark)
    post = TRI.trigram_postings(docs)
    out = {
        r["doc_id"]: r["n_occurrences"]
        for r in TRI.substring_search(docs, post, "at").collect()
    }
    # 'at' in doc1 (x2: "Data"/"data"... exact: 'at' occurs in Data,
    # Stream? no; data x2 -> 2), doc2 ("match"+"at" -> 2), doc3 (1)
    assert out == {1: 2, 2: 2, 3: 1}


def test_build_plan_is_jvm_side(spark):
    from tests.test_plans import plan_of

    p = plan_of(TRI.trigram_postings(_docs(spark)))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p
