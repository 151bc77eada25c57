"""BPE tokenizer (operators/bpe.py): training-loop semantics pinned by
hand-computed merges, cross-checked against the gated bpe_pair_counts
kernel, and encode round-trip/determinism. (The merge loop is iterative
with data-dependent ranks — the declared non-SQL-expressible exemption —
so these tests are the operator's correctness contract.)"""

import pytest

from distributed_search_engine_spark.operators import bpe as B
from distributed_search_engine_spark.operators import text_analysis as TA


@pytest.fixture(scope="module")
def corpus(spark):
    # word counts: "aaab" x3, "aab" x2, "cd" x1 -> pair counts:
    # (a,a): 3*2 + 2*1 = 8, (a,b): 3 + 2 = 5, (c,d): 1
    rows = [
        ("1", "aaab aaab aab cd"),
        ("2", "aaab aab"),
    ]
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_train_hand_computed(spark, corpus):
    merges = B.bpe_train(corpus, n_merges=3)
    # merge 1: (a,a) count 8. After it: aaab -> (aa,a,b), aab -> (aa,b).
    # merge 2 pairs: (aa,a): 3, (a,b): 3, (aa,b): 2, (c,d): 1
    #   -> tie on count 3, pair-ascending picks ('a','b')
    # after: aaab -> (aa,ab), aab -> (aa,b)
    # merge 3 pairs: (aa,ab): 3, (aa,b): 2, (c,d): 1 -> ('aa','ab')
    assert merges == [("a", "a"), ("a", "b"), ("aa", "ab")]


def test_train_first_merge_matches_gated_pair_kernel(spark, corpus):
    top = TA.bpe_pair_counts(corpus, k=1).collect()[0]
    merges = B.bpe_train(corpus, n_merges=1)
    assert " ".join(merges[0]) == top["pair"]


def test_train_exhausts_gracefully(spark):
    docs = spark.createDataFrame([("1", "ab ab")], "doc_id string, text string")
    # only (a,b) exists; after merging it no pairs remain
    assert B.bpe_train(docs, n_merges=50) == [("a", "b")]


def test_encode_round_trip_and_counts(spark, corpus):
    merges = B.bpe_train(corpus, n_merges=3)
    out = {r["doc_id"]: r for r in B.bpe_encode(corpus, merges).collect()}
    # doc 1: aaab->[aaab] (aa+ab merged at rank 3... aa,ab -> aaab? no:
    # merge 3 ('aa','ab') joins them, so aaab encodes to ONE symbol)
    assert out["1"]["n_words"] == 4
    sub1 = out["1"]["subwords"]
    # concatenating subwords must reproduce the token stream exactly
    assert "".join(sub1) == "aaabaaabaabcd"
    assert sub1 == ["aaab", "aaab", "aa", "b", "c", "d"]
    assert out["1"]["n_subwords"] == 6
    assert out["2"]["subwords"] == ["aaab", "aa", "b"]


def test_encode_no_merges_yields_chars(spark):
    docs = spark.createDataFrame([("1", "abc de")], "doc_id string, text string")
    out = B.bpe_encode(docs, []).collect()[0]
    assert out["subwords"] == ["a", "b", "c", "d", "e"]
    assert out["n_words"] == 2 and out["n_subwords"] == 5


def test_encode_unseen_word_partial_merges(spark, corpus):
    merges = B.bpe_train(corpus, n_merges=3)
    docs = spark.createDataFrame(
        [("9", "aaaa bz")], "doc_id string, text string"
    )
    out = B.bpe_encode(docs, merges).collect()[0]
    # 'aaaa': rank-0 (a,a) merges left-to-right -> (aa, aa); no (aa,aa) rank
    # 'bz': no applicable merge -> chars
    assert out["subwords"] == ["aa", "aa", "b", "z"]


def test_encode_deterministic(spark, corpus):
    merges = B.bpe_train(corpus, n_merges=2)
    a = B.bpe_encode(corpus, merges).orderBy("doc_id").collect()
    b = B.bpe_encode(corpus, merges).orderBy("doc_id").collect()
    assert a == b
