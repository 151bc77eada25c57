"""Incremental indexing over a document stream — LSM-style delta segments.

Batch-incremental design (the Spark-idiomatic analog of the reference's
resumable bucket loop, jobs/Indexer.java:368-396), round-3 layout: each
micro-batch writes ONLY its own postings/doc_stats as an immutable delta
directory (O(batch) I/O — the round-2 version unioned the full previous
index and rewrote all three tables every batch, O(index) I/O per batch).
I14 merge semantics (existing (term, doc) wins, caps re-applied, IDF
recomputed from merged df — jobs/Indexer.java:947-1174) are applied as a
LAZY FOLD over base + deltas at read time, and MATERIALIZED every
``compact_every`` batches into a new base version (classic LSM: write
amplification is amortized 1/compact_every, read amplification bounded by
compact_every). The CURRENT pointer — written last, via atomic rename —
lists the base version and the committed delta batch ids, so readers never
see a half-written index and the streaming checkpoint keeps the pipeline
exactly-once (a replayed batch overwrites its own delta dir and its
manifest append is idempotent).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as T
from ..functions.stopwords import STOP_WORDS
from ..operators.postings import (
    build_index,
    build_term_dict,
    build_term_stats,
    merge_postings,
)

POSTING_COLS = [
    "term", "doc_id", "tf", "weighted_tf", "normalized_tf", "doc_len",
    "positions", "weights",
]


def _current(state_dir: str) -> dict | None:
    path = os.path.join(state_dir, "CURRENT")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        cur = json.load(f)
    # round-2 layout ({"version": k} only, tables under v<k>/) reads as a
    # base with no deltas
    if "deltas" not in cur:
        cur = {"version": cur["version"], "base": cur["version"], "deltas": [],
               "legacy": True}
    return cur


def _write_current(state_dir: str, cur: dict) -> None:
    tmp = os.path.join(state_dir, "CURRENT.tmp")
    with open(tmp, "w") as f:
        json.dump(cur, f)
    os.replace(tmp, os.path.join(state_dir, "CURRENT"))


def _base_dir(state_dir: str, version: int, legacy: bool = False) -> str:
    return os.path.join(state_dir, f"v{version}" if legacy else f"base/v{version}")


def _delta_dir(state_dir: str, batch_id: int) -> str:
    return os.path.join(state_dir, f"delta/b{batch_id}")


def _merge_doc_stats(old: DataFrame, new: DataFrame) -> DataFrame:
    """Existing docs win (a re-crawled doc keeps its first-indexed stats,
    like the reference's resume skip)."""
    tagged = (
        old.withColumn("_src", F.lit(0))
        .unionByName(new.withColumn("_src", F.lit(1)))
    )
    w = Window.partitionBy("doc_id").orderBy("_src")
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_src", "_rn")
    )


def _fold_index(spark: SparkSession, state_dir: str, cur: dict) -> dict:
    """Logical (postings, doc_stats) = I14 fold of base + deltas in commit
    order. Each fold step is the same merge_postings the round-2 eager
    path ran per batch, so the folded result is IDENTICAL to the old
    version chain — it just runs at read/compaction time over at most
    compact_every deltas instead of on every ingest."""
    parts: list[tuple[DataFrame, DataFrame]] = []
    if cur.get("base") is not None:
        b = _base_dir(state_dir, cur["base"], cur.get("legacy", False))
        parts.append(
            (
                spark.read.parquet(os.path.join(b, "postings")),
                spark.read.parquet(os.path.join(b, "doc_stats")),
            )
        )
    for bid in cur["deltas"]:
        d = _delta_dir(state_dir, bid)
        parts.append(
            (
                spark.read.parquet(os.path.join(d, "postings")),
                spark.read.parquet(os.path.join(d, "doc_stats")),
            )
        )
    postings, doc_stats = parts[0]
    for new_p, new_ds in parts[1:]:
        term_dict = build_term_dict(
            postings.select("term").unionByName(new_p.select("term"))
        )
        postings = merge_postings(postings, new_p, term_dict).drop("is_stop")
        doc_stats = _merge_doc_stats(doc_stats, new_ds)
    return {"postings": postings, "doc_stats": doc_stats}


def read_current_index(spark: SparkSession, state_dir: str) -> dict | None:
    cur = _current(state_dir)
    if cur is None:
        return None
    folded = _fold_index(spark, state_dir, cur)
    doc_stats = folded["doc_stats"].persist()
    total_docs = doc_stats.count()
    stop_lit = F.array(*[F.lit(w) for w in sorted(STOP_WORDS)])
    term_stats = build_term_stats(
        folded["postings"].withColumn(
            "is_stop", F.array_contains(stop_lit, F.col("term"))
        ),
        total_docs,
    )
    return {
        "postings": folded["postings"],
        "doc_stats": doc_stats,
        "term_stats": term_stats,
        "total_docs": total_docs,
        "version": cur["version"],
        "base": cur.get("base"),
        "deltas": list(cur["deltas"]),
    }


def _compact(spark: SparkSession, state_dir: str, cur: dict) -> dict:
    """Materialize the fold into a new base version and clear the deltas.
    The only O(index) write in the pipeline — runs once per compact_every
    batches, not per batch."""
    version = cur["version"]
    folded = _fold_index(spark, state_dir, cur)
    base = _base_dir(state_dir, version)
    doc_stats = folded["doc_stats"].persist()
    total_docs = doc_stats.count()
    folded["postings"].write.mode("overwrite").parquet(
        os.path.join(base, "postings")
    )
    doc_stats.write.mode("overwrite").parquet(os.path.join(base, "doc_stats"))
    with open(os.path.join(base, "meta.json"), "w") as f:
        json.dump({"version": version, "total_docs": total_docs}, f)
    doc_stats.unpersist()
    return {"version": version, "base": version, "deltas": []}


def incremental_index(
    spark: SparkSession,
    input_path: str,
    state_dir: str,
    checkpoint_dir: str,
    schema: str = "doc_id string, content string",
    doc_id_col: str = "doc_id",
    content_col: str = "content",
    available_now: bool = True,
    compact_every: int = 4,
):
    """Start the incremental indexing stream; returns the StreamingQuery.

    Per micro-batch I/O is O(batch): the batch's postings/doc_stats land as
    an immutable delta dir named by batch_id (idempotent on replay); every
    ``compact_every`` committed deltas, the I14 fold is materialized into a
    new base and the deltas retire. With available_now=True the stream
    drains everything currently in input_path and stops — the
    test/bootstrap mode; in production leave it False for continuous
    micro-batches."""
    os.makedirs(state_dir, exist_ok=True)
    stream = spark.readStream.schema(schema).parquet(input_path)

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        cur = _current(state_dir)
        if cur is not None and batch_id in cur["deltas"]:
            return  # replayed batch already committed (exactly-once)
        new_idx = build_index(batch_df, doc_id_col, content_col)
        ddir = _delta_dir(state_dir, batch_id)
        new_idx["postings"].select(*POSTING_COLS).write.mode("overwrite").parquet(
            os.path.join(ddir, "postings")
        )
        new_idx["doc_stats"].write.mode("overwrite").parquet(
            os.path.join(ddir, "doc_stats")
        )
        with open(os.path.join(ddir, "meta.json"), "w") as f:
            json.dump({"batch_id": batch_id, "batch_docs": new_idx["total_docs"]}, f)
        if cur is None:
            cur = {"version": 0, "base": None, "deltas": [batch_id]}
        else:
            cur = {
                "version": cur["version"] + 1,
                "base": cur.get("base"),
                "deltas": cur["deltas"] + [batch_id],
                **({"legacy": True} if cur.get("legacy") else {}),
            }
        if len(cur["deltas"]) >= compact_every:
            cur = _compact(spark, state_dir, cur)
        _write_current(state_dir, cur)

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
    snapshot: bool = False,
):
    """Compact the CURRENT incremental-index state into compressed query
    segments (index/segments layout) — the bridge from the streaming write
    path to the partition-pruned read path. Returns a segment-backed
    SearchIndex over the compacted segments.

    Idempotent per version: out_dir/v<k> is built once (manifest-resumable
    inside, like any segment build); re-running after new micro-batches
    compacts the new CURRENT version into its own directory, so readers
    keep an immutable segment set per version.

    ``snapshot=True`` additionally publishes each compacted version
    through the index/snapshots metadata layer (out_dir as the table
    root): the version becomes visible to snapshot readers only after
    its segment build fully commits, older versions stay time-travel
    readable until ``expire_snapshots`` reclaims them, and a re-compact
    of an already-published version is a no-op commit-wise."""
    import os as _os

    from ..index.segments import (
        assign_docnums,
        build_segments,
        segment_search_index,
    )

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
    if snapshot:
        from ..index.snapshots import (
            commit_snapshot,
            current_snapshot_id,
            list_snapshots,
        )

        op = f"compact-v{cur['version']}"
        already = any(
            s["operation"] == op for s in list_snapshots(out_dir)
        )
        if not already:
            commit_snapshot(
                out_dir,
                f"v{cur['version']}/data",
                op,
                parent_id=current_snapshot_id(out_dir),
                summary={
                    "index_version": cur["version"],
                    "total_docs": cur["total_docs"],
                },
            )
    return segment_search_index(
        spark, seg_dir, ds, ts, term_dict, cur["total_docs"], n_partitions
    )
