"""Grep-style line results over the trigram index — the code-search
RESULT SHAPE (ripgrep / GitHub code search): not "which docs match" but
"which LINES match, with N lines of context". The reference engine's
result page shows a token-window preview (SearchEngine.java snippet
path); a source-code corpus wants the matching line plus surrounding
lines, keyed for display as (doc, line_no).

Plan shape: candidates come from the trigram index exactly as in
:func:`trigram.substring_search` (rarest-trigram pruning, broadcast
candidate join) — only candidate docs are line-split. The line explode
is one Generate over candidate rows; the contains() filter is a
map-side projection; context lines attach via a per-doc window over
(doc_id, line_no) — bounded by the doc's own line count, never global.
At 100 TB the per-query cost is ∝ candidate doc bytes, the same
contract as substring_search, plus a candidate-only explode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .trigram import _needle_trigrams, trigram_stats


def grep_lines(
    docs: DataFrame,
    postings: DataFrame,
    needle: str,
    context: int = 0,
    doc_id_col: str = "doc_id",
    content_col: str = "text",
) -> DataFrame:
    """(doc_id, line_no, line, is_match): every line containing
    ``needle`` case-insensitively, plus ``context`` lines above and
    below (grep -C), 1-based line numbers, deduplicated where context
    windows overlap. Only candidate docs (trigram pruning) are split.

    Needles under 3 chars degrade to splitting every doc (documented,
    same seam as substring_search); an absent trigram short-circuits
    empty."""
    grams = _needle_trigrams(needle)
    keyed = docs.withColumn("doc_id", F.col(doc_id_col))
    if grams:
        stats = trigram_stats(postings.where(F.col("trigram").isin(grams)))
        picked = [
            r["trigram"]
            for r in stats.orderBy(F.asc("df"), F.asc("trigram"))
            .limit(4)
            .collect()
        ]
        if len(picked) < len(grams) and len(picked) < 4:
            keyed = keyed.where(F.lit(False))
        else:
            cand = (
                postings.where(F.col("trigram").isin(picked))
                .groupBy("doc_id")
                .agg(F.count(F.lit(1)).alias("_n"))
                .where(F.col("_n") == len(picked))
                .select("doc_id")
            )
            keyed = keyed.join(cand, "doc_id")
    lines = keyed.select(
        "doc_id",
        F.posexplode(
            F.split(F.coalesce(F.col(content_col), F.lit("")), "\n")
        ).alias("_ln0", "line"),
    ).select("doc_id", (F.col("_ln0") + 1).alias("line_no"), "line")
    hit = F.lower(F.col("line")).contains(F.lit(needle.lower()))
    if context <= 0:
        return lines.where(hit).withColumn("is_match", F.lit(True))
    # a line survives when ANY line within +-context of it matches:
    # one bounded per-doc window over the match flag
    w = (
        Window.partitionBy("doc_id")
        .orderBy("line_no")
        .rowsBetween(-context, context)
    )
    flagged = lines.withColumn("_m", hit.cast("int"))
    return (
        flagged.withColumn("_near", F.max("_m").over(w))
        .where(F.col("_near") == 1)
        .select(
            "doc_id",
            "line_no",
            "line",
            (F.col("_m") == 1).alias("is_match"),
        )
    )
