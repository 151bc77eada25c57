"""Incremental indexing over a document stream.

Batch-incremental design (the Spark-idiomatic analog of the reference's
resumable bucket loop, jobs/Indexer.java:368-396): each micro-batch builds
its postings with the same Arrow kernel as the batch indexer, then merges
into the previous index version with merge_postings (I14 semantics:
existing (term, doc) entries win, caps re-applied, IDF recomputed from the
merged df). Index state is versioned — state_dir/v<k>/ plus a CURRENT
pointer written last — so readers never see a half-written index and the
streaming checkpoint makes the whole pipeline exactly-once.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import text as T
from ..functions.stopwords import STOP_WORDS
from ..operators.postings import build_index, build_term_stats, merge_postings


def _current_version(state_dir: str) -> int | None:
    path = os.path.join(state_dir, "CURRENT")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)["version"]


def read_current_index(spark: SparkSession, state_dir: str) -> dict | None:
    v = _current_version(state_dir)
    if v is None:
        return None
    base = os.path.join(state_dir, f"v{v}")
    with open(os.path.join(base, "meta.json")) as f:
        meta = json.load(f)
    return {
        "postings": spark.read.parquet(os.path.join(base, "postings")),
        "doc_stats": spark.read.parquet(os.path.join(base, "doc_stats")),
        "term_stats": spark.read.parquet(os.path.join(base, "term_stats")),
        "total_docs": meta["total_docs"],
        "version": v,
    }


def _write_version(state_dir: str, version: int, postings, doc_stats, term_stats, total_docs):
    base = os.path.join(state_dir, f"v{version}")
    postings.write.mode("overwrite").parquet(os.path.join(base, "postings"))
    doc_stats.write.mode("overwrite").parquet(os.path.join(base, "doc_stats"))
    term_stats.write.mode("overwrite").parquet(os.path.join(base, "term_stats"))
    with open(os.path.join(base, "meta.json"), "w") as f:
        json.dump({"version": version, "total_docs": total_docs}, f)
    # pointer write is the atomic commit point
    tmp = os.path.join(state_dir, "CURRENT.tmp")
    with open(tmp, "w") as f:
        json.dump({"version": version}, f)
    os.replace(tmp, os.path.join(state_dir, "CURRENT"))


def incremental_index(
    spark: SparkSession,
    input_path: str,
    state_dir: str,
    checkpoint_dir: str,
    schema: str = "doc_id string, content string",
    doc_id_col: str = "doc_id",
    content_col: str = "content",
    available_now: bool = True,
):
    """Start the incremental indexing stream; returns the StreamingQuery.

    With available_now=True the stream drains everything currently in
    input_path and stops — the test/bootstrap mode; in production leave it
    False for continuous micro-batches."""
    os.makedirs(state_dir, exist_ok=True)
    stream = spark.readStream.schema(schema).parquet(input_path)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        new_idx = build_index(batch_df, doc_id_col, content_col)
        cur = read_current_index(spark, state_dir)
        if cur is None:
            version = 0
            postings = new_idx["postings"]
            doc_stats = new_idx["doc_stats"]
            total_docs = new_idx["total_docs"]
            term_stats = new_idx["term_stats"]
        else:
            version = cur["version"] + 1
            postings = merge_postings(
                cur["postings"], new_idx["postings"], new_idx["term_dict"]
            ).drop("is_stop")
            # doc stats: existing docs win (same doc re-crawled keeps its
            # first-indexed stats, like the reference's resume skip)
            doc_stats = (
                cur["doc_stats"].withColumn("_src", F.lit(0))
                .unionByName(new_idx["doc_stats"].withColumn("_src", F.lit(1)))
            )
            from pyspark.sql import Window

            w = Window.partitionBy("doc_id").orderBy("_src")
            doc_stats = (
                doc_stats.withColumn("_rn", F.row_number().over(w))
                .where(F.col("_rn") == 1)
                .drop("_src", "_rn")
            )
            total_docs = doc_stats.count()
            stop_lit = F.array(*[F.lit(wd) for wd in sorted(STOP_WORDS)])
            term_stats = build_term_stats(
                postings.withColumn("is_stop", F.array_contains(stop_lit, F.col("term"))),
                total_docs,
            )
        _write_version(state_dir, version, postings, doc_stats, term_stats, total_docs)

    writer = (
        stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def token_trends(
    docs_stream: DataFrame,
    ts_col: str = "ts",
    content_col: str = "content",
    window_duration: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Event-time windowed term counts with late-data watermark: the
    streaming analog of term_stats for monitoring corpus drift."""
    toks = docs_stream.select(
        F.col(ts_col),
        F.explode(T.tokens_col(F.col(content_col))).alias("term"),
    ).where(T.is_worth_col(F.col("term")))
    return (
        toks.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_duration), "term")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "term",
            "n",
        )
    )


def compact_to_segments(
    spark: SparkSession,
    state_dir: str,
    out_dir: str,
    n_partitions: int = 32,
):
    """Compact the CURRENT incremental-index version into compressed query
    segments (index/segments layout) — the bridge from the streaming write
    path to the partition-pruned read path. Returns a segment-backed
    SearchIndex over the compacted segments.

    Idempotent per version: out_dir/v<k> is built once (manifest-resumable
    inside, like any segment build); re-running after new micro-batches
    compacts the new CURRENT version into its own directory, so readers
    keep an immutable segment set per version."""
    import os as _os

    from ..index.segments import (
        assign_docnums,
        build_segments,
        segment_search_index,
    )
    from ..operators.postings import build_term_dict

    cur = read_current_index(spark, state_dir)
    if cur is None:
        raise ValueError(f"no CURRENT index version under {state_dir}")
    seg_dir = _os.path.join(out_dir, f"v{cur['version']}")
    ds = assign_docnums(cur["doc_stats"], n_partitions=max(4, n_partitions // 4))
    ds = ds.persist()
    avgdl_row = ds.agg(F.avg("doc_len")).collect()[0]
    avgdl = float(avgdl_row[0] or 1.0)
    stop_lit = F.array(*[F.lit(w) for w in sorted(STOP_WORDS)])
    ts = cur["term_stats"]
    if "is_stop" not in ts.columns:
        ts = ts.withColumn("is_stop", F.array_contains(stop_lit, F.col("term")))
    build_segments(
        cur["postings"], ts, ds, seg_dir, avgdl,
        n_partitions=n_partitions, batch_partitions=n_partitions,
    )
    term_dict = build_term_dict(cur["postings"].select("term"))
    return segment_search_index(
        spark, seg_dir, ds, ts, term_dict, cur["total_docs"], n_partitions
    )
