"""Symbol-definition extraction (operators/code_symbols.py): per-language
rules, line numbering, stats, and camel/snake-insensitive lookup."""

from __future__ import annotations

from distributed_search_engine_spark.operators.code_symbols import (
    extract_symbols,
    symbol_lookup,
    symbol_stats,
)

DOCS = [
    (
        1,
        "python",
        "def get_user(x):\n    return x\nclass UserHandler:\n"
        "    pass\n  def _inner(y):",
    ),
    (
        2,
        "go",
        "func main() {\nfunc (s *Srv) Handle(w, r) {\ntype Config struct {",
    ),
    (
        3,
        "javascript",
        "function doWork() {}\nconst fetchData = async (url) => {}\n"
        "class Widget {}",
    ),
    (
        4,
        "java",
        "public final class Index {\n"
        "    private static int count(List<String> xs) {",
    ),
    (
        5,
        "c",
        "static void *worker_run(void *arg)\n"
        "int main(int argc, char **argv) {\n   x = call(1);",
    ),
    (6, "rust", "fn unknown_lang() {}"),  # no rule table -> no rows
    (7, "python", None),
]


def _syms(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, lang string, content string")
    return extract_symbols(df)


def test_definition_sites_per_language(spark):
    got = {
        (r["doc_id"], r["kind"], r["symbol"], r["line_no"])
        for r in _syms(spark).collect()
    }
    assert got == {
        (1, "function", "get_user", 1),
        (1, "class", "UserHandler", 3),
        (1, "function", "_inner", 5),  # nested def, indented
        (2, "function", "main", 1),
        (2, "function", "Handle", 2),  # method receiver skipped
        (2, "type", "Config", 3),
        (3, "function", "doWork", 1),
        (3, "function", "fetchData", 2),  # const arrow fn
        (3, "class", "Widget", 3),
        (4, "class", "Index", 1),
        (4, "method", "count", 2),  # generic return type tolerated
        (5, "function", "worker_run", 1),
        (5, "function", "main", 2),  # plain call on line 3 NOT matched
    }


def test_symbol_stats_counts_defs_and_docs(spark):
    stats = {
        (r["symbol"], r["kind"]): (r["n_defs"], r["n_docs"])
        for r in symbol_stats(_syms(spark)).collect()
    }
    assert stats[("main", "function")] == (2, 2)  # go + c
    assert stats[("get_user", "function")] == (1, 1)


def test_lookup_whole_symbol_is_case_insensitive(spark):
    rows = symbol_lookup(_syms(spark), "userhandler").collect()
    assert [(r["doc_id"], r["line_no"]) for r in rows] == [(1, 3)]


def test_lookup_subtokens_crosses_naming_conventions(spark):
    # 'user' as a camel/snake subtoken hits both get_user and UserHandler
    rows = symbol_lookup(_syms(spark), "user", subtokens=True).collect()
    assert [(r["symbol"]) for r in rows] == ["get_user", "UserHandler"]
    # without subtokens: no whole symbol is 'user'
    assert symbol_lookup(_syms(spark), "user").count() == 0
