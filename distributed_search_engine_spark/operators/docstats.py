"""Document statistics (logical op I5/I6, reference jobs/Indexer.java:196-299).

doc_stats(doc_id, content_sha, doc_len, max_tf, title):
  - doc_len = number of worthy tokens (plain tokenize I2 keeps only tokens
    passing isWorthIndexing; jobs/Indexer.java:1275-1291)
  - max_tf  = max raw per-term count, floor 1 (jobs/Indexer.java:220-225)
  - title   = first-line analog, <= 200 chars (jobs/Indexer.java:1418-1430)
  - content_sha = sha256(content), the per-row invariant column carried
    through every stage (BASELINE input_hint)

Docs longer than MAX_DOC_CHARS are excluded entirely (jobs/Indexer.java:208).

Scale notes: one shuffle — groupBy(doc_id, term) with map-side partial
aggregation, then groupBy(doc_id). Both keys are doc-sided, so no hot keys
(no single document explodes a reducer thanks to the 1 MB doc cap). All
expressions are JVM-side (whole-stage codegen); no Python in this path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T


def filter_indexable(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """I1: drop null/oversized docs (jobs/Indexer.java:175-213)."""
    c = F.col(content_col)
    return docs.where(c.isNotNull() & (F.length(c) <= T.MAX_DOC_CHARS))


def build_doc_stats(
    docs: DataFrame,
    doc_id_col: str = "doc_id",
    content_col: str = "content",
) -> DataFrame:
    docs = filter_indexable(docs, content_col)
    base = docs.select(
        F.col(doc_id_col).cast("string").alias("doc_id"),
        F.sha2(F.col(content_col), 256).alias("content_sha"),
        T.title_col(F.col(content_col)).alias("title"),
        F.filter(T.tokens_col(F.col(content_col)), T.is_worth_col).alias("toks"),
    )
    per_term = base.select(
        "doc_id", "content_sha", "title", F.explode_outer("toks").alias("term")
    ).groupBy("doc_id", "content_sha", "title", "term").agg(F.count("term").alias("tf"))
    return per_term.groupBy("doc_id", "content_sha", "title").agg(
        F.coalesce(F.sum("tf"), F.lit(0)).cast("int").alias("doc_len"),
        F.greatest(F.coalesce(F.max("tf"), F.lit(0)), F.lit(1)).cast("int").alias("max_tf"),
    ).select("doc_id", "content_sha", "doc_len", "max_tf", "title")
