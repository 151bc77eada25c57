"""Structural code-search ranking, vendored-copy detection, keyset
pagination (query/code_search.py).

The oracle gates (search_code_ranked / dedup_cross_repo /
search_page_after) cover cross-engine value parity at both SFs; these
tests pin the SEMANTICS on controlled corpora: the exact multiplier a
definition match and a path match apply, the >=2-repos filter, and
keyset-pagination == rank-window-pagination under ties.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from distributed_search_engine_spark.query.code_search import (
    code_search_ranked,
    cross_repo_dupes,
    search_after_page,
)


@pytest.fixture(scope="module")
def boost_docs(spark):
    # four docs, identical identifier-stream shape (doc_len 3 each, term
    # 'parse' tf 1 each, df 4): A DEFINES parse, C carries it in the
    # path, B/D are plain mentions -> pure multiplier measurements
    rows = [
        ("a", "python", "src/alpha/m.py", "def parse(a):\n    return a"),
        ("b", "python", "src/beta/m.py", "xyz = parse(a)\n    return a"),
        ("c", "python", "src/parse/m.py", "xyz = parse(a)\n    return a"),
        ("d", "python", "src/delta/m.py", "xyz = parse(a)\n    return a"),
    ]
    return spark.createDataFrame(rows, "doc_id string, lang string, path string, content string")


def _scores(df):
    return {r["doc_id"]: r["score"] for r in df.collect()}


def test_definition_match_doubles_the_contribution(boost_docs):
    s = _scores(code_search_ranked(boost_docs, ["parse"]))
    # sym_weight=1.0 -> x2 vs the identical-shape plain mention
    assert s["a"] == pytest.approx(2.0 * s["b"], abs=2e-6)


def test_path_match_applies_its_multiplier(boost_docs):
    s = _scores(code_search_ranked(boost_docs, ["parse"]))
    # path_weight=0.5 -> x1.5; plain mentions agree with each other
    assert s["c"] == pytest.approx(1.5 * s["d"], abs=2e-6)
    assert s["b"] == pytest.approx(s["d"], abs=1e-9)


def test_n_matched_counts_distinct_query_terms(boost_docs):
    out = code_search_ranked(boost_docs, ["parse", "return"]).collect()
    by_id = {r["doc_id"]: r["n_matched"] for r in out}
    assert by_id == {"a": 2, "b": 2, "c": 2, "d": 2}


def test_cross_repo_dupes_requires_two_repos(spark):
    rows = [
        ("1", "r1", "X"),
        ("2", "r1", "X"),   # same repo dup: does NOT make X cross-repo alone
        ("3", "r2", "X"),   # second repo -> X qualifies
        ("4", "r3", "Y"),   # unique content -> filtered
        ("5", "r3", "Z"),
        ("6", "r3", "Z"),   # dup but single-repo -> filtered
    ]
    docs = spark.createDataFrame(rows, "doc_id string, repo string, content string")
    out = cross_repo_dupes(docs).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_copies"] == 3 and r["n_repos"] == 2
    assert r["repos"] == "r1,r2" and r["keeper"] == "1"


def test_search_after_page_equals_rank_window(spark):
    # 25 rows with planted score ties: keyset filtering past the cursor
    # must reproduce exactly rows 11..20 of the total (score desc,
    # doc_id asc) order
    rows = [(f"d{i:02d}", float(round((i % 7) * 0.5, 6))) for i in range(25)]
    scored = spark.createDataFrame(rows, "doc_id string, score double")
    expect = sorted(rows, key=lambda r: (-r[1], r[0]))[10:20]
    got = [
        (r["doc_id"], r["score"])
        for r in search_after_page(scored, page_size=10, page=2)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .collect()
    ]
    assert got == expect


def test_collapsed_keeps_best_copy_and_counts_matched_dupes(spark):
    # two vendored copies of the same file (identical content, different
    # repos/paths) + one unique file: the collapsed result has one row
    # per content group; the dup group keeps the lexicographically-first
    # doc on a score tie and reports n_copies=2
    from distributed_search_engine_spark.query.code_search import (
        code_search_collapsed,
    )

    rows = [
        ("a", "python", "src/x/m.py", "def parse(a):\n    return a"),
        ("b", "python", "src/y/m.py", "def parse(a):\n    return a"),
        ("c", "python", "src/z/m.py", "def other(a):\n    return parse"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id string, lang string, path string, content string"
    )
    out = {
        r["doc_id"]: r
        for r in code_search_collapsed(docs, ["parse"]).collect()
    }
    assert set(out) == {"a", "c"}  # b collapsed into a's group
    assert out["a"]["n_copies"] == 2 and out["c"]["n_copies"] == 1


def test_search_after_past_the_end_is_empty(spark):
    scored = spark.createDataFrame(
        [("a", 1.0), ("b", 0.5)], "doc_id string, score double"
    )
    assert search_after_page(scored, page_size=10, page=3).count() == 0


def test_code_ranked_plan_prunes_terms_before_the_agg_and_broadcasts(
    boost_docs,
):
    """Scale shape: the literal query-term IN filter must prune the
    exploded identifier stream BELOW the (term, doc_id) aggregate (the
    shuffle then carries only matching terms, not the whole vocabulary),
    and the 1-row / per-term stat frames must join by broadcast — never
    a CartesianProduct."""
    df = code_search_ranked(boost_docs, ["parse", "return"])
    opt = df._jdf.queryExecution().optimizedPlan().toString()
    lines = opt.splitlines()
    for i, ln in enumerate(lines):
        if "Filter" in ln and " IN (" in ln and "term" in ln:
            # pushed below the agg: the filter's child (next line) is the
            # stream projection/generate, NOT an Aggregate
            assert i + 1 < len(lines) and "Aggregate" not in lines[i + 1], (
                "term filter sits above an Aggregate:\n" + opt
            )
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in phys
