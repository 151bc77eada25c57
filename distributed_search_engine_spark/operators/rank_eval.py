"""Offline retrieval-quality evaluation — the TREC metric battery
(P@k, recall@k, MRR, nDCG@k per Järvelin & Kekäläinen TOIS'02) computed
distributedly over a runs table and a qrels table. The reference repo
has no evaluation harness at all (its TestPhraseSearch asserts fixed
doc ids); a production relevance pipeline regression-gates every
ranker change on exactly these numbers.

Scale shape: one equi-join of the (already k-bounded) runs against
qrels on (query, doc_id), two per-query partial aggregations, and one
window PARTITIONED by query (bounded: <=k qrel rows per query feed the
ideal-DCG rank) — nothing global, nothing driver-side. DuckDB twin:
oracle.rank_metrics_sql with identical arithmetic and 6dp rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

def rank_metrics(runs: DataFrame, qrels: DataFrame, k: int = 10) -> DataFrame:
    """(query, n_rel, p_at_k, recall_at_k, mrr, ndcg_at_k).

    ``runs``: (query, doc_id, rank) with rank 1-based; rows with
    rank > k are ignored. ``qrels``: (query, doc_id, grade) with
    grade >= 1 meaning relevant (graded gains (2^grade - 1)).
    Queries present in runs but absent from qrels score 0 across the
    board (n_rel 0). Ideal DCG ranks qrel rows by (grade desc, doc_id
    asc) — the doc_id tiebreak makes the ideal ordering total, so both
    engines rank identically."""
    r = runs.where(F.col("rank") <= k).select("query", "doc_id", "rank")
    rel = qrels.where(F.col("grade") > 0).select("query", "doc_id", "grade")
    gain = F.pow(F.lit(2.0), F.col("grade")) - 1.0
    j = r.join(rel, ["query", "doc_id"], "left")
    hit = F.col("grade").isNotNull()
    per_q = j.groupBy("query").agg(
        F.sum(F.when(hit, 1).otherwise(0)).alias("_n_hit"),
        F.min(F.when(hit, F.col("rank"))).alias("_first"),
        F.sum(
            F.when(hit, gain / F.log2(F.col("rank") + 1.0)).otherwise(0.0)
        ).alias("_dcg"),
    )
    n_rel = rel.groupBy("query").agg(F.count(F.lit(1)).alias("_n_rel"))
    wq = Window.partitionBy("query").orderBy(
        F.desc("grade"), F.asc("doc_id")
    )
    ideal = (
        rel.withColumn("_rn", F.row_number().over(wq))
        .where(F.col("_rn") <= k)
        .groupBy("query")
        .agg(
            F.sum(gain / F.log2(F.col("_rn") + 1.0)).alias("_idcg")
        )
    )
    out = (
        per_q.join(n_rel, "query", "left")
        .join(ideal, "query", "left")
        .select(
            "query",
            F.coalesce("_n_rel", F.lit(0)).cast("int").alias("n_rel"),
            F.round(F.col("_n_hit") / F.lit(float(k)), 6).alias("p_at_k"),
            F.round(
                F.when(
                    F.coalesce("_n_rel", F.lit(0)) > 0,
                    F.col("_n_hit") / F.col("_n_rel"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("recall_at_k"),
            F.round(
                F.when(
                    F.col("_first").isNotNull(), 1.0 / F.col("_first")
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("mrr"),
            F.round(
                F.when(
                    F.coalesce("_idcg", F.lit(0.0)) > 0,
                    F.col("_dcg") / F.col("_idcg"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("ndcg_at_k"),
        )
    )
    return out


def term_overlap_qrels(
    postings: DataFrame, query_terms: dict[str, list[str]]
) -> DataFrame:
    """(query, doc_id, grade): deterministic pseudo-qrels — grade = how
    many of the query's distinct terms the doc contains (from the
    postings table, so both engines read the identical capped rows).
    The standard cheap-labels trick for smoke-testing a ranker without
    human judgments."""
    pairs = [
        (q, t) for q, terms in sorted(query_terms.items()) for t in terms
    ]
    spark = postings.sparkSession
    qt = spark.createDataFrame(pairs, "query string, term string")
    return (
        postings.join(F.broadcast(qt), "term")
        .groupBy("query", "doc_id")
        .agg(F.count_distinct("term").cast("int").alias("grade"))
    )
