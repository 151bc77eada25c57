"""Trigram substring index — the code-search candidate-pruning structure
(Cox, "Regular Expression Matching with a Trigram Index", Google Code
Search 2012; Zoekt's ngram index). The reference engine only matches
whole tokens (jobs/Indexer.java tokenizer); a source-code corpus needs
SUBSTRING search (``strcpy(``, ``data stream``) — token postings can't
answer it, trigram postings can:

  build: every distinct lowercased 3-char window of every doc ->
         (trigram, doc_id) postings + per-trigram df stats
  query: a needle's candidates = docs containing its rarest trigrams
         (a doc containing the needle necessarily contains EVERY needle
         trigram under the same normalization, so pruning to any subset
         is lossless); exact containment verify runs only on candidates.

100-TB shape: the build is one Generate (the window projection, all
JVM-side — ``Column.substr`` over a ``sequence``) + one distinct-style
exchange keyed by (trigram, doc_id); hot trigrams skew the key space
far less than token postings (alphabet^3 keys, near-uniform over code).
Query-side the rarest-q selection (a <=len(needle)-row bounded collect
against the stats table) keeps the candidate join fan-in tiny — the
Zoekt trick — and the exact verify touches only candidate rows. The
gate oracle for search is an INDEPENDENT full-scan ``contains()`` in
DuckDB: equality proves the pruning chain is lossless, not merely
twin-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def trigram_postings(
    docs: DataFrame,
    doc_id_col: str = "doc_id",
    content_col: str = "text",
) -> DataFrame:
    """(trigram, doc_id): distinct lowercased 3-char windows per doc."""
    text = F.lower(F.col(content_col))
    # guard: Spark's sequence(1, stop) runs DESCENDING when stop < 1, so
    # short/null docs must short-circuit to an empty array
    grams = F.when(
        text.isNotNull() & (F.length(text) >= 3),
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.length(text) - 2),
                lambda i: text.substr(i, F.lit(3)),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    return docs.select(
        F.col(doc_id_col).alias("doc_id"), F.explode(grams).alias("trigram")
    ).where(F.length("trigram") == 3).distinct()


def trigram_stats(postings: DataFrame) -> DataFrame:
    """(trigram, df): document frequency per trigram — the rarity table
    the query planner consults."""
    return postings.groupBy("trigram").agg(
        F.count(F.lit(1)).cast("int").alias("df")
    )


def _needle_trigrams(needle: str) -> list[str]:
    s = needle.lower()
    return sorted({s[i : i + 3] for i in range(len(s) - 2)})


def substring_search(
    docs: DataFrame,
    postings: DataFrame,
    needle: str,
    prune_to: int = 4,
    doc_id_col: str = "doc_id",
    content_col: str = "text",
) -> DataFrame:
    """(doc_id, n_occurrences): every doc whose lowercased text contains
    ``needle`` (lowercased), found through the trigram index.

    Selection: the ``prune_to`` rarest needle trigrams by (df asc,
    trigram asc) — a bounded <=len(needle)-row collect against the
    stats table — then one semi-join-shaped candidate aggregation
    (docs holding ALL selected trigrams) and an exact ``contains``
    verify + occurrence count on candidates only. Needles shorter than
    3 chars degrade to the full exact scan (documented seam)."""
    grams = _needle_trigrams(needle)
    text = F.lower(F.col(content_col))
    pat = F.lit(needle.lower())
    exact = docs.select(
        F.col(doc_id_col).alias("doc_id"),
        (
            (F.length(text) - F.length(F.replace(text, pat)))
            / F.length(pat)
        ).cast("int").alias("n_occurrences"),
        text.contains(pat).alias("_hit"),
    )
    if not grams:
        return exact.where("_hit").drop("_hit")
    stats = trigram_stats(postings.where(F.col("trigram").isin(grams)))
    picked = [
        r["trigram"]
        for r in stats.orderBy(F.asc("df"), F.asc("trigram"))
        .limit(prune_to)
        .collect()
    ]
    if len(picked) < len(grams) and len(picked) < prune_to:
        # a needle trigram absent from the whole corpus -> no doc can
        # contain the needle
        return exact.where(F.lit(False)).drop("_hit")
    cand = (
        postings.where(F.col("trigram").isin(picked))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") == len(picked))
        .select("doc_id")
    )
    return (
        exact.join(cand, "doc_id")
        .where("_hit")
        .select("doc_id", "n_occurrences")
    )
