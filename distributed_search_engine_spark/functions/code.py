"""Code-identifier tokenization — the payload=code extension of the
reference tokenizer (jobs/Indexer.java:1275-1291, which strips
punctuation and lowercases — destroying identifier structure a code
corpus needs preserved).

Dual-index scheme used by production code-search engines (GitHub code
search, Sourcegraph's symbol index): every identifier is indexed BOTH
as its whole lowercased form AND as its camelCase/snake_case subtokens,
so queries for ``getUserName``, ``get_user_name``, ``user`` or ``name``
all hit the same definition site.

Splitting rules (all JVM-side regex, whole-stage codegen — no UDF):

1. identifiers = every ``[A-Za-z_][A-Za-z0-9_]*`` match, in stream order
2. acronym boundary: ``HTTPServer`` -> ``HTTP Server``
   (``([A-Z]+)([A-Z][a-z])`` -> ``$1 $2``)
3. camel boundary: ``getUser2Name`` -> ``get User2 Name``
   (``([a-z0-9])([A-Z])`` -> ``$1 $2``)
4. lowercase, split on ``[_ ]+``, drop empties -> subtoken list
5. emitted stream per identifier: ``lower(ident)`` followed by the
   subtokens, UNLESS the split is trivial (subtokens == [lower(ident)]),
   in which case the identifier is emitted once
6. a code token is worth indexing iff 2 <= len <= 30 (identifiers run
   longer than English words; ``__init__`` keeps its underscores as a
   whole-form term)

100-TB shape: the whole stream is one map-side projection (explode +
regexp per row, zero exchanges before the (term, doc_id) partial-agg
groupBy); the DuckDB twin in oracle.code_postings_sql applies the same
regexes through RE2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RE_IDENT = "[A-Za-z_][A-Za-z0-9_]*"
RE_ACRONYM = "([A-Z]+)([A-Z][a-z])"
RE_CAMEL = "([a-z0-9])([A-Z])"
MIN_CODE_TOKEN_LEN = 2
MAX_CODE_TOKEN_LEN = 30


def identifiers_col(content: Column) -> Column:
    """array<string>: every identifier occurrence, in stream order."""
    return F.regexp_extract_all(content, F.lit(RE_IDENT), F.lit(0))


def split_ident_col(ident: Column) -> Column:
    """array<string>: lowercased camelCase/snake_case subtokens of one
    identifier (rules 2-4)."""
    spaced = F.regexp_replace(
        F.regexp_replace(ident, RE_ACRONYM, "$1 $2"), RE_CAMEL, "$1 $2"
    )
    return F.filter(
        F.split(F.lower(spaced), "[_ ]+"), lambda t: t != F.lit("")
    )


def code_token_stream_col(content: Column) -> Column:
    """array<string>: the dual-index token stream (rule 5) for a content
    column — whole identifiers interleaved with their subtokens."""
    def per_ident(i: Column) -> Column:
        parts = split_ident_col(i)
        whole = F.lower(i)
        return F.when(parts == F.array(whole), F.array(whole)).otherwise(
            F.concat(F.array(whole), parts)
        )

    return F.flatten(F.transform(identifiers_col(content), per_ident))


def is_worth_code_col(tok: Column) -> Column:
    return (F.length(tok) >= MIN_CODE_TOKEN_LEN) & (
        F.length(tok) <= MAX_CODE_TOKEN_LEN
    )


def code_postings(
    docs: DataFrame,
    doc_id_col: str = "doc_id",
    content_col: str = "text",
) -> DataFrame:
    """(term, doc_id, tf): inverted postings over the dual-index code
    token stream. One Generate (the stream explode) and ONE exchange
    (the (term, doc_id) groupBy, map-side combined since a doc's tokens
    are colocated) — the same plan discipline as operators/postings.py,
    no UDF anywhere."""
    toks = docs.select(
        F.col(doc_id_col).alias("doc_id"),
        F.explode(code_token_stream_col(F.col(content_col))).alias("term"),
    ).where(is_worth_code_col(F.col("term")))
    return toks.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("tf")
    )


def code_autocomplete(
    postings: DataFrame, prefix: str, limit: int = 10
) -> DataFrame:
    """(term, df): ranked identifier completion over the dual code index
    — most-widely-used first (df desc, term asc), the GitHub/Sourcegraph
    completion contract, vs the reference's alphabetical Q14 (its
    SearchEngine.java:943-971 sorts ascending; code users want the hot
    identifier, not the lexicographic first). Because the dual index
    holds whole identifiers AND subtokens, a prefix completes across
    naming conventions: 'user' surfaces both ``user_name``'s subtoken
    and ``userhandler``'s whole form.

    One partial-agg groupBy over the prefix-filtered postings + an
    ordered limit (TakeOrdered — never a global sort)."""
    p = prefix.lower()
    return (
        postings.where(F.col("term").startswith(p))
        .groupBy("term")
        .agg(F.count_distinct("doc_id").cast("int").alias("df"))
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(limit)
    )
