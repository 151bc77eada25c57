"""Round-5 operators: BM25F fielded scoring, asymmetric containment,
SCD2 state-change compression."""

import math

import pytest
from pyspark.sql import functions as F

from distributed_search_engine_spark.operators import dedup as D
from distributed_search_engine_spark.query.engine import (
    BM25_K1,
    BM25F_B_BODY,
    BM25F_B_TITLE,
    BM25F_W_BODY,
    BM25F_W_TITLE,
    search_bm25f,
)


# ---------------------------------------------------------------------------
# BM25F
# ---------------------------------------------------------------------------


def _bm25f_py(docs, terms, w_t=BM25F_W_TITLE, w_b=BM25F_W_BODY,
              b_t=BM25F_B_TITLE, b_b=BM25F_B_BODY, k1=BM25_K1):
    """Independent Python model of simple BM25F over {first-line title,
    full-text body} with the engine's tokenizer contract reduced to
    lowercase-alnum splitting (fixtures below only use plain words)."""
    def toks(s):
        return [t for t in s.lower().split() if 2 <= len(t) <= 20]

    fields = {}
    for doc_id, text in docs:
        title = text.split("\n")[0]
        fields[doc_id] = (toks(title), toks(text.replace("\n", " ")))
    n = float(len(fields))
    avgl_t = sum(len(t) for t, _ in fields.values()) / n
    avgl_b = sum(len(b) for _, b in fields.values()) / n
    dfs = {
        t: sum(1 for tt, bb in fields.values() if t in tt or t in bb)
        for t in terms
    }
    out = {}
    for doc_id, (tt, bb) in fields.items():
        s = 0.0
        for t in terms:
            tf_t, tf_b = float(tt.count(t)), float(bb.count(t))
            if tf_t == 0 and tf_b == 0:
                continue
            bt = (1 - b_t) + b_t * (len(tt) / avgl_t if avgl_t > 0 else 1.0)
            btf = (1 - b_b) + b_b * (len(bb) / avgl_b if avgl_b > 0 else 1.0)
            pseudo = w_t * tf_t / bt + w_b * tf_b / btf
            idf = math.log((n - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1.0)
            s += idf * pseudo / (k1 + pseudo)
        if round(s, 6) > 0:
            out[doc_id] = round(s, 6)
    return out


BM25F_DOCS = [
    ("1", "spark engine overview\nbody talks about shuffle and join plans"),
    ("2", "storage layer notes\nspark spark appears twice in this body text"),
    ("3", "join ordering deep dive\nspark appears once here with join body"),
    ("4", "unrelated title line\nnothing matching in the body either"),
]


def test_bm25f_matches_python_model(spark):
    docs = spark.createDataFrame(BM25F_DOCS, "doc_id string, text string")
    got = {
        r["doc_id"]: r["score"]
        for r in search_bm25f(docs, ["spark", "join"]).collect()
    }
    assert got == _bm25f_py(BM25F_DOCS, ["spark", "join"])


def test_bm25f_title_hit_outranks_equal_body_hit(spark):
    # same total tf=1 for the term, but doc t carries it in the TITLE:
    # w_title=2 + the shorter field length must put it strictly first
    rows = [
        ("t", "needle in title\nfiller words only in this body here"),
        ("b", "plain title line\nneedle appears within the body text here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    got = {r["doc_id"]: r["score"] for r in search_bm25f(docs, ["needle"]).collect()}
    assert got["t"] > got["b"]


# ---------------------------------------------------------------------------
# containment
# ---------------------------------------------------------------------------


def _contain_fixture(spark):
    small = "alpha beta gamma delta epsilon zeta eta theta"
    big = (
        "intro words before the quoted block "
        + small
        + " and a long unique tail that dominates the union so jaccard "
        "stays low while containment is total for the small document"
    )
    return spark.createDataFrame(
        [("s", small), ("l", big), ("x", "completely different content here")],
        "doc_id string, text string",
    )


def test_containment_detects_doc_inside_doc(spark):
    # explicit candidate pair: the kernel contract is exactness on GIVEN
    # pairs — a low-jaccard containment pair is precisely the case the
    # jaccard-tuned MinHash-LSH generator may miss (RECALL.md row)
    docs = _contain_fixture(spark)
    sh = D.shingles(docs)
    cand = spark.createDataFrame([("l", "s")], "doc_a string, doc_b string")
    rows = {(r["doc_a"], r["doc_b"]): r
            for r in D.containment_pairs(sh, candidates=cand).collect()}
    assert ("l", "s") in rows
    r = rows[("l", "s")]
    # every shingle of the small doc occurs in the large one
    assert r["cont_b_in_a"] == 1.0
    assert r["containment"] == 1.0
    assert r["cont_a_in_b"] < 0.5  # direction matters
    # jaccard on the same pair is far below the containment signal
    j = {
        (x["doc_a"], x["doc_b"]): x["jaccard"]
        for x in D.jaccard_pairs(sh, candidates=cand).collect()
    }[("l", "s")]
    assert j < 0.5


def test_containment_values_exact_on_given_pairs(spark):
    # kernel exactness: hand-checkable shingle sets via an explicit
    # candidate list (bypasses LSH recall entirely)
    docs = spark.createDataFrame(
        [("a", "w1 w2 w3 w4 w5"), ("b", "w3 w4 w5 w6 w7")],
        "doc_id string, text string",
    )
    sh = D.shingles(docs)  # 3-shingles: a has 3, b has 3, common = 1
    cand = spark.createDataFrame([("a", "b")], "doc_a string, doc_b string")
    r = D.containment_pairs(sh, candidates=cand).collect()[0]
    assert r["cont_a_in_b"] == round(1 / 3, 6)
    assert r["cont_b_in_a"] == round(1 / 3, 6)
    assert r["containment"] == round(1 / 3, 6)


# ---------------------------------------------------------------------------
# SCD2 compression (gate entry; exercised through queries())
# ---------------------------------------------------------------------------


def test_scd2_compresses_runs(spark, tmp_path):
    import __spark_entry__ as E

    rows = [
        # user 1: view,view,buy,view  -> 3 runs
        (1, "2024-01-01 00:00:00", 1, "view", 1.0, ""),
        (2, "2024-01-01 00:01:00", 1, "view", 1.0, ""),
        (3, "2024-01-01 00:02:00", 1, "buy", 1.0, ""),
        (4, "2024-01-01 00:03:00", 1, "view", 1.0, ""),
        # user 2: one run
        (5, "2024-01-01 00:00:30", 2, "view", 1.0, ""),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = E.queries()["events_scd2_compress"](spark, str(tmp_path))
    got = sorted(
        (r["user_id"], r["event_type"], r["n_events"], r["valid_to"])
        for r in out.collect()
    )
    inf = float("inf")
    base = 1704067200.0  # 2024-01-01 UTC
    assert got == [
        (1, "buy", 1, base + 180.0),
        (1, "view", 1, inf),
        (1, "view", 2, base + 120.0),
        (2, "view", 1, inf),
    ]
