"""Symbol-definition extraction over a source-code corpus — the
ctags/Sourcegraph-symbol-index layer the reference engine lacks (its
tokenizer, jobs/Indexer.java:1275-1291, strips structure; a code corpus
needs "go to definition": ``symbol -> (repo, path, line)``).

Per-language definition-site rules (anchored line regexes, the
ctags-lite subset that covers the overwhelming share of lookups):

  python     ``def name(`` / ``class Name``
  java       ``class|interface|enum Name`` / modifier-prefixed methods
  javascript ``function name`` / ``class Name`` / ``const name = (``
  go         ``func name(`` / ``func (recv) name(`` / ``type Name``
  c          ``ret name(`` at column 0 (the classic ctags heuristic)

Everything is JVM-side: one ``split`` on newlines + ``posexplode`` for
line numbers, then per-kind ``regexp_extract`` — no UDFs, one Generate,
zero exchanges before any caller aggregation. Lookup supports the same
camel/snake-insensitive matching as :mod:`functions.code` by joining on
subtokens.

100-TB shape: extraction is a pure map-side projection (scales with
input bytes); ``symbol_stats`` is one groupBy on the symbol key, far
smaller than token postings (defs, not occurrences); ``symbol_lookup``
broadcast-joins a one-row query. The DuckDB twin in
oracle.code_symbols_sql applies the same line split + RE2 regexes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.code import split_ident_col

RE_NAME = "[A-Za-z_][A-Za-z0-9_]*"

# lang -> [(kind, line-anchored regex, extract group index)]
# group 1 must capture the symbol name; regexes stay inside the
# Java-regex/RE2 common dialect so the DuckDB twin runs them verbatim.
SYMBOL_RULES: dict[str, list[tuple[str, str]]] = {
    "python": [
        ("function", rf"^[ \t]*def[ \t]+({RE_NAME})[ \t]*\("),
        ("class", rf"^[ \t]*class[ \t]+({RE_NAME})"),
    ],
    "java": [
        ("class", rf"^[ \t]*(?:public[ \t]+|final[ \t]+|abstract[ \t]+)*(?:class|interface|enum)[ \t]+({RE_NAME})"),
        ("method", rf"^[ \t]+(?:public|private|protected|static)[ \t][A-Za-z0-9_<>\[\], \t]*[ \t]({RE_NAME})[ \t]*\("),
    ],
    "javascript": [
        ("function", rf"^[ \t]*(?:async[ \t]+)?function[ \t]+({RE_NAME})"),
        ("class", rf"^[ \t]*class[ \t]+({RE_NAME})"),
        ("function", rf"^[ \t]*(?:const|let|var)[ \t]+({RE_NAME})[ \t]*=[ \t]*(?:async[ \t]+)?\("),
    ],
    "go": [
        ("function", rf"^func[ \t]+(?:\([^)]*\)[ \t]+)?({RE_NAME})[ \t]*\("),
        ("type", rf"^type[ \t]+({RE_NAME})"),
    ],
    "c": [
        ("function", rf"^[A-Za-z_][A-Za-z0-9_ \t\*]*[ \t\*]({RE_NAME})[ \t]*\([^;]*$"),
    ],
}


def extract_symbols(
    docs: DataFrame,
    doc_id_col: str = "doc_id",
    lang_col: str = "lang",
    content_col: str = "content",
) -> DataFrame:
    """(doc_id, lang, kind, symbol, line_no): every definition site the
    per-language rules find. line_no is 1-based. Docs whose ``lang`` has
    no rule table contribute nothing (documented: add a rule, not a
    scan). NULL content is skipped by the split guard."""
    lines = docs.select(
        F.col(doc_id_col).alias("doc_id"),
        F.col(lang_col).alias("lang"),
        F.posexplode(
            F.split(F.coalesce(F.col(content_col), F.lit("")), "\n")
        ).alias("_ln0", "line"),
    ).select("doc_id", "lang", (F.col("_ln0") + 1).alias("line_no"), "line")
    # ONE union branch per LANGUAGE (not per rule): all of a language's
    # rules apply in a single projection via stack(), so each doc's
    # lines are generated once per its own branch — the other branches'
    # lang filters push below the Generate and prune rows before the
    # split. regexp_extract needs a literal pattern, which is why the
    # per-lang stack (not a per-row pattern column) is the right shape.
    per_lang = []
    for lang, rules in SYMBOL_RULES.items():
        branch = lines.where(F.col("lang") == lang)
        stack_args: list = []
        for kind, pat in rules:
            stack_args.append(F.lit(kind))
            stack_args.append(F.regexp_extract("line", pat, 1))
        per_lang.append(
            branch.select(
                "doc_id",
                "lang",
                "line_no",
                F.stack(F.lit(len(rules)), *stack_args).alias(
                    "kind", "symbol"
                ),
            ).where(F.col("symbol") != "")
        )
    out = per_lang[0]
    for b in per_lang[1:]:
        out = out.unionByName(b)
    # a line can satisfy two rules of the same kind (js const+function
    # never overlap, but keep the contract strict): one row per
    # (doc, line, kind, symbol)
    return out.select(
        "doc_id", "lang", "kind", "symbol", "line_no"
    ).distinct()


def symbol_stats(symbols: DataFrame) -> DataFrame:
    """(symbol, kind, n_defs, n_docs): how often and how widely each
    symbol is defined — the ranking table for go-to-definition."""
    return symbols.groupBy("symbol", "kind").agg(
        F.count(F.lit(1)).cast("int").alias("n_defs"),
        F.countDistinct("doc_id").cast("int").alias("n_docs"),
    )


def symbol_lookup(
    symbols: DataFrame, name: str, subtokens: bool = False
) -> DataFrame:
    """Definition sites for ``name`` (case-insensitive on the whole
    symbol; with ``subtokens=True`` also camel/snake-insensitive —
    ``user_name`` finds ``getUserName``). Deterministic order:
    (doc_id asc, line_no asc)."""
    low = name.lower()
    hit = F.lower(F.col("symbol")) == low
    if subtokens:
        hit = hit | F.array_contains(
            split_ident_col(F.col("symbol")), low
        )
    return symbols.where(hit).orderBy("doc_id", "line_no")
