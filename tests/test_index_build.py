"""Index-build correctness on hand-checkable docs (logical ops I1-I12)."""

import math

import pytest
from pyspark.sql import functions as F

from distributed_search_engine_spark.operators.docstats import build_doc_stats
from distributed_search_engine_spark.operators.postings import build_index

DOCS = [
    # doc_id, content
    ("d1", "space travel\nspace to travel a space ship"),
    # tokens: space(1) travel(2) space(3) to(4) travel(5) a(6) space(7) ship(8)
    # worthy: all except 'a' (len 1); 'to' is a stop word but still indexed
    ("d2", "computing engines\nthe computing of engines"),
    ("d3", "zz"),
    ("d4", "x" * 1_000_001),  # oversized -> skipped entirely
]


@pytest.fixture(scope="module")
def index(spark):
    docs = spark.createDataFrame(DOCS, "doc_id string, content string")
    return build_index(docs)


def test_total_docs_skips_oversized(index):
    assert index["total_docs"] == 3


def test_doc_stats_values(spark):
    docs = spark.createDataFrame(DOCS, "doc_id string, content string")
    stats = {r["doc_id"]: r.asDict() for r in build_doc_stats(docs).collect()}
    # d1: worthy tokens = space travel space to travel space ship -> len 7
    assert stats["d1"]["doc_len"] == 7
    assert stats["d1"]["max_tf"] == 3  # 'space' x3
    assert stats["d1"]["title"] == "space travel"
    # d3: 'zz' worthy -> len 1, max_tf 1
    assert stats["d3"]["doc_len"] == 1 and stats["d3"]["max_tf"] == 1
    assert "d4" not in stats


def test_postings_positions_and_tf(index):
    p = {
        (r["term"], r["doc_id"]): r.asDict()
        for r in index["postings"].collect()
    }
    d1_space = p[("space", "d1")]
    # stream positions: space=1, travel=2, space=3, to=4, travel=5, a=6(rejected,
    # still counted), space=7, ship=8
    assert d1_space["positions"] == [1, 3, 7]
    assert d1_space["tf"] == 3
    assert d1_space["weighted_tf"] == 3.0
    assert d1_space["doc_len"] == 7
    # normalized_tf = 0.4 + 0.6 * 3/3 = 1.0
    assert abs(d1_space["normalized_tf"] - 1.0) < 1e-12
    d1_travel = p[("travel", "d1")]
    assert d1_travel["positions"] == [2, 5]
    assert abs(d1_travel["normalized_tf"] - (0.4 + 0.6 * 2 / 3)) < 1e-12
    # stop word 'to' IS indexed
    assert ("to", "d1") in p
    # stem emission: computing -> comput at same positions as computing
    d2_comp = p[("comput", "d2")]
    d2_computing = p[("computing", "d2")]
    assert d2_comp["positions"] == d2_computing["positions"] == [1, 4]
    # 'the' in d2 at position 3
    assert p[("the", "d2")]["positions"] == [3]


def test_idf(index):
    ts = {r["term"]: r.asDict() for r in index["term_stats"].collect()}
    n = index["total_docs"]
    assert ts["space"]["df"] == 1
    assert abs(ts["space"]["idf"] - math.log(n / 1)) < 1e-12
    assert ts["to"]["is_stop"] and not ts["space"]["is_stop"]
    # BM25 idf
    assert abs(ts["space"]["idf_bm25"] - math.log((n - 1 + 0.5) / 1.5 + 1)) < 1e-12


def test_content_sha_invariant(spark, index):
    """Per-row invariant (BASELINE input_hint): sha256(content) carried by
    doc_stats equals sha256 computed directly on the source table."""
    docs = spark.createDataFrame(DOCS, "doc_id string, content string")
    src = docs.select("doc_id", F.sha2("content", 256).alias("sha"))
    joined = (
        index["doc_stats"].select("doc_id", "content_sha")
        .join(src, "doc_id")
        .where(F.col("content_sha") != F.col("sha"))
    )
    assert joined.count() == 0


def test_caps_truncate_and_recompute_idf(spark):
    # 30 docs containing 'zipf'; cap at 10 -> df must drop to 10 and idf
    # recomputed from the truncated df (jobs/Indexer.java:807-810)
    from distributed_search_engine_spark.operators import postings as P

    docs = spark.createDataFrame(
        [(f"d{i}", "zipf " + ("zipf " * (i % 5)) + f"uniq{i}") for i in range(30)],
        "doc_id string, content string",
    )
    idx = build_index(docs)
    capped = P.apply_caps(
        idx["postings"], idx["term_dict"], n_salts=4, max_docs=10, max_docs_stop=5
    )
    ts = P.build_term_stats(capped, 30)
    row = ts.where(F.col("term") == "zipf").collect()[0]
    assert row["df"] == 10
    assert abs(row["idf"] - math.log(30 / 10)) < 1e-12
    # kept docs are the top-10 by weighted_tf desc, doc_id asc
    kept = sorted(
        r["doc_id"] for r in capped.where(F.col("term") == "zipf").collect()
    )
    assert len(kept) == 10
