"""Code-identifier tokenization (functions/code.py): dual-index
camelCase/snake_case splitting — hand-computed semantics, Spark/DuckDB
parity on code-shaped content, and the one-exchange plan contract."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from distributed_search_engine_spark.functions import code as C

SNIPPET = (
    "def getUserName(user_id):\n"
    "    return HTTPServerV2.lookup(user_id) or __init__\n"
)


def _stream(spark, content: str) -> list[str]:
    row = spark.createDataFrame([(content,)], "text string").select(
        C.code_token_stream_col(F.col("text")).alias("s")
    )
    return row.collect()[0]["s"]


def test_camel_snake_acronym_splits(spark):
    # camelCase: whole form + subtokens
    assert _stream(spark, "getUserName") == [
        "getusername", "get", "user", "name",
    ]
    # snake_case: same dual emission
    assert _stream(spark, "get_user_name") == [
        "get_user_name", "get", "user", "name",
    ]
    # acronym boundary + trailing version digit
    assert _stream(spark, "HTTPServerV2") == [
        "httpserverv2", "http", "server", "v2",
    ]
    # dunder keeps its underscored whole form alongside the core token
    assert _stream(spark, "__init__") == ["__init__", "init"]
    # trivial split: emitted once, not twice
    assert _stream(spark, "foo") == ["foo"]
    # stream order across a real snippet (identifier occurrence order)
    assert _stream(spark, "x = fooBar(baz)")[:4] == [
        "x", "foobar", "foo", "bar",
    ]


def test_code_postings_tf_and_worth_gate(spark):
    docs = spark.createDataFrame(
        [(1, SNIPPET)], "doc_id long, text string"
    )
    out = {
        (r["term"], r["doc_id"]): r["tf"]
        for r in C.code_postings(docs).collect()
    }
    # user_id appears twice -> whole form tf=2, subtokens tf=2 each
    assert out[("user_id", 1)] == 2
    assert out[("id", 1)] == 2
    # 'user' = 2 from user_id splits + 1 from getUserName split
    assert out[("user", 1)] == 3
    assert out[("getusername", 1)] == 1
    assert out[("http", 1)] == 1 and out[("server", 1)] == 1
    assert out[("__init__", 1)] == 1 and out[("init", 1)] == 1
    # 1-char identifiers fail the worth gate (no 'x'-style noise terms)
    assert ("or", 1) in out and not any(len(t) < 2 for t, _ in out)


def test_code_postings_duckdb_parity(spark):
    """The oracle twin (RE2 regexes, \\1 backrefs, 'g' flag) produces the
    identical postings table on code-shaped content."""
    from distributed_search_engine_spark import oracle

    rows = [
        (1, SNIPPET),
        (2, "class MyHTTPHandler:\n    MAX_RETRY_COUNT = 3\n"),
        (3, "snake_case camelCase SCREAMING_SNAKE mixedUp_style2"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r["term"], r["doc_id"], r["tf"])
        for r in C.code_postings(docs).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE documents AS SELECT * FROM (VALUES "
        + ", ".join("(?, ?)" for _ in rows)
        + ") t(doc_id, text)",
        [x for r in rows for x in r],
    )
    want = sorted(
        (t, str(d), tf)
        for t, d, tf in con.execute(oracle.code_postings_sql()).fetchall()
    )
    assert [(t, int(d), tf) for t, d, tf in want] == got


def test_code_postings_plan_one_exchange(spark):
    """Stream emission is a pure projection; the only exchange is the
    (term, doc_id) partial-agg groupBy."""
    from tests.test_plans import plan_of

    docs = spark.createDataFrame([(1, SNIPPET)], "doc_id long, text string")
    p = plan_of(C.code_postings(docs))
    assert p.count("+- Exchange") == 1
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_code_autocomplete_crosses_naming_conventions(spark):
    """'user' completes across conventions (snake subtoken + camel
    whole/sub forms) ranked by df desc with term-asc ties."""
    docs = spark.createDataFrame(
        [
            (1, "getUserName(user_id)"),
            (2, "user_name = resolve(user_id)"),
            (3, "class UserHandler: pass"),
            (4, "unrelated tokens only"),
        ],
        "doc_id long, text string",
    )
    post = C.code_postings(docs)
    out = [
        (r["term"], r["df"])
        for r in C.code_autocomplete(post, "user").collect()
    ]
    terms = [t for t, _ in out]
    # subtoken 'user' present in docs 1, 2, 3 -> df 3, ranked first
    assert out[0] == ("user", 3)
    assert "user_id" in terms and "user_name" in terms
    assert "userhandler" in terms  # whole lowercased camel form
    # ranked by df desc then term asc
    dfs = [d for _, d in out]
    assert dfs == sorted(dfs, reverse=True)
