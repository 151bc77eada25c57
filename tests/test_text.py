"""Tokenizer unit tests (SURVEY §5): Spark Column, pure-Python, and the
position-counter semantics (counter advances on rejected tokens,
reference jobs/Indexer.java:453-460)."""

from pyspark.sql import functions as F

from distributed_search_engine_spark.functions import text as T

SAMPLES = [
    "Hello, World! The quick-brown fox 2024.",
    "  a b  cc   d1 ",
    "",
    "<script>var x=1;</script>Visible Text Here",
    "UPPER lower MiXeD 12345 99 x",
    "tab\tand\nnewline  spaces",
]


def test_tokenize_py_basic():
    assert T.tokenize_py("Hello, World!") == ["hello", "world"]
    assert T.tokenize_py("") == []
    assert T.tokenize_py("   ") == []
    assert T.tokenize_py("a-b") == ["a", "b"]


def test_is_worth():
    assert T.is_worth_py("hello")
    assert T.is_worth_py("ab")
    assert not T.is_worth_py("a")  # too short
    assert not T.is_worth_py("x" * 21)  # too long
    assert T.is_worth_py("2024") and T.is_worth_py("99")
    assert not T.is_worth_py("12345")  # 5 digits
    assert not T.is_worth_py("x1")  # mixed alnum fails both patterns
    assert not T.is_worth_py("1")


def test_positions_advance_on_rejected_tokens():
    # 'a' (rejected, len 1) and 'x1' (rejected, mixed) still consume positions
    out = T.positioned_tokens_py("a hello x1 world")
    assert out == [("hello", 2), ("world", 4)]


def test_spark_column_parity(spark):
    df = spark.createDataFrame([(i, s) for i, s in enumerate(SAMPLES)], "id int, content string")
    got = {
        r["id"]: r["toks"]
        for r in df.select("id", T.tokens_col(F.col("content")).alias("toks")).collect()
    }
    for i, s in enumerate(SAMPLES):
        assert got[i] == T.tokenize_py(s), f"sample {i}: {got[i]}"


def test_spark_worth_parity(spark):
    toks = sorted({t for s in SAMPLES for t in T.tokenize_py(s)} | {"2024", "12345", "x1", "a"})
    df = spark.createDataFrame([(t,) for t in toks], "tok string")
    got = {
        r["tok"]: r["w"]
        for r in df.select("tok", T.is_worth_col(F.col("tok")).alias("w")).collect()
    }
    for t in toks:
        assert got[t] == T.is_worth_py(t), t


def test_duckdb_tokenizer_parity():
    import duckdb

    expr = T.duckdb_tokens_expr("s")
    for s in SAMPLES:
        got = duckdb.sql(
            f"select {expr} t from (select ? s)", params=[s]
        ).fetchone()[0]
        got = [t for t in got if t]
        assert got == T.tokenize_py(s), s


def test_title():
    assert T.title_py("first  line here\nsecond line") == "first line here"
    assert len(T.title_py("x" * 500)) == 200
