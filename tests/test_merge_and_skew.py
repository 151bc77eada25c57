"""Incremental index merge (I14) + hot-term skew (salted caps) tests."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from distributed_search_engine_spark.corpus import ingest, make_corpus
from distributed_search_engine_spark.operators import postings as P
from distributed_search_engine_spark.operators.postings import (
    build_index,
    build_term_stats,
    merge_postings,
)


def _pkey(rows):
    return {
        (r["term"], r["doc_id"]): (
            r["tf"],
            round(r["normalized_tf"], 12),
            list(r["positions"]),
        )
        for r in rows
    }


def test_incremental_merge_equals_full_rebuild(spark):
    docs = ingest(make_corpus(spark, n_docs=60, seed=3))
    batch_a = docs.where(F.pmod(F.xxhash64("doc_id"), 2) == 0)
    batch_b = docs  # overlaps batch_a entirely -> dedup path exercised
    idx_a = build_index(batch_a)
    idx_b = build_index(batch_b)
    merged = merge_postings(idx_a["postings"], idx_b["postings"], idx_b["term_dict"])
    full = build_index(docs)
    got = _pkey(merged.collect())
    want = _pkey(full["postings"].collect())
    # same doc content in both batches -> identical posting rows, old kept
    # EXCEPT normalized_tf in batch_a: same doc -> same max_tf -> identical.
    assert got == want
    # IDF recomputed from merged df matches the full rebuild
    ts_m = {
        r["term"]: (r["df"], round(r["idf"], 12))
        for r in build_term_stats(merged, full["total_docs"]).collect()
    }
    ts_f = {
        r["term"]: (r["df"], round(r["idf"], 12))
        for r in full["term_stats"].collect()
    }
    assert ts_m == ts_f


def test_merge_prefers_existing_entry(spark):
    old = spark.createDataFrame(
        [("t", "d1", 5, 5.0, 1.0, 10, [1, 2, 3, 4, 5], [1.0] * 5)],
        "term string, doc_id string, tf int, weighted_tf double, "
        "normalized_tf double, doc_len int, positions array<int>, weights array<float>",
    )
    new = spark.createDataFrame(
        [("t", "d1", 1, 1.0, 0.5, 3, [9], [1.0])], old.schema
    )
    td = spark.createDataFrame([("t", "t", False)], "term string, stem string, is_stop boolean")
    merged = merge_postings(old, new, td).collect()
    assert len(merged) == 1
    assert merged[0]["tf"] == 5  # old entry wins (jobs/Indexer.java:1044-1080)


def test_salted_caps_equal_global_window(spark):
    """Zipfian hot term: the two-phase (term, salt) -> term cap must equal a
    single global window — the correctness proof for the skew defense
    (SURVEY §4 O3)."""
    rows = [(f"d{i:04d}", "hot " * (1 + i % 7) + f"uniq{i}") for i in range(300)]
    docs = spark.createDataFrame(rows, "doc_id string, content string")
    idx = build_index(docs, with_stems=False)
    capped = P.apply_caps(
        idx["postings"], idx["term_dict"], n_salts=16, max_docs=50, max_docs_stop=10
    )
    got = sorted(
        (r["doc_id"], r["weighted_tf"])
        for r in capped.where(F.col("term") == "hot").collect()
    )
    # naive single-window reference
    w = Window.partitionBy("term").orderBy(F.desc("weighted_tf"), F.asc("doc_id"))
    naive = (
        idx["postings"].withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") <= 50) & (F.col("term") == "hot"))
    )
    want = sorted((r["doc_id"], r["weighted_tf"]) for r in naive.collect())
    assert got == want
    assert len(got) == 50


def test_caps_change_df_and_idf_feedback(spark):
    """SURVEY §7.3 item 3: truncation feeds back into df/idf."""
    import math

    rows = [(f"d{i}", "hot") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id string, content string")
    idx = build_index(docs, with_stems=False)
    capped = P.apply_caps(idx["postings"], idx["term_dict"], n_salts=4, max_docs=7, max_docs_stop=3)
    ts = build_term_stats(capped, 30).where(F.col("term") == "hot").collect()[0]
    assert ts["df"] == 7
    assert abs(ts["idf"] - math.log(30 / 7)) < 1e-12


def test_merge_recap_orders_by_normalized_tf(spark):
    """I14 fidelity (jobs/Indexer.java:1087-1101): the merge-time re-cap
    sorts by normalizedTf desc — NOT the initial build's weighted_tf order.
    Fixture: doc A has higher weighted_tf but lower normalized_tf (bigger
    max_tf); with cap=1 the merge must keep doc B."""
    schema = (
        "term string, doc_id string, tf int, weighted_tf double, "
        "normalized_tf double, doc_len int, positions array<int>, weights array<float>"
    )
    # A: wtf=5, max_tf=50 -> ntf=0.46 ; B: wtf=4, max_tf=4 -> ntf=1.0
    old = spark.createDataFrame(
        [("t", "a", 5, 5.0, 0.4 + 0.6 * 5 / 50, 100, [1], [1.0])], schema
    )
    new = spark.createDataFrame(
        [("t", "b", 4, 4.0, 1.0, 8, [2], [1.0])], schema
    )
    td = spark.createDataFrame(
        [("t", "t", False)], "term string, stem string, is_stop boolean"
    )
    merged = merge_postings(old, new, td, max_docs=1, max_docs_stop=1).collect()
    assert len(merged) == 1
    assert merged[0]["doc_id"] == "b"  # normalized_tf desc, not weighted_tf
