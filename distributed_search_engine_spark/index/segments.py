"""Partitioned compressed index segments + lineage manifests + resume.

North-star physical layer: postings are salted-repartitioned by term hash,
sorted-merged per term into delta-gap + varint blocks with per-block
max-score metadata, and persisted as Parquet partitioned by
``part = pmod(xxhash64(term), n_partitions)`` — so a query's term lookups
are partition-pruned scans. A manifest row per partition (FIXTURES.md §4)
records lineage and enables checkpointed resume: a re-run skips partitions
whose manifest row is already 'done' (the Spark analog of the reference's
hash-bucket checkpoint loop, jobs/Indexer.java:368-396,1247-1252).

Docnum assignment (dense int64 per doc_id) is the scalable two-phase
pattern: range-partition by doc_id, count per partition (small collect),
cumulative base offsets + within-partition rank — no global window, no
single-task sort.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..query.engine import BM25_B, BM25_K1
from .codec import (
    BLOCK_SIZE,
    block_boundaries,
    encode_docnums,
    encode_positions,
    varint_encode,
)

SEGMENT_SCHEMA = (
    "term string, df int, idf double, idf_bm25 double, is_stop boolean, "
    "n_docs int, "
    "blocks array<struct<last_docnum: long, max_score: double, "
    "docs: binary, tfs: binary, dls: binary>>, "
    "norm_tfs binary, positions binary"
)

MANIFEST_COLS = [
    "partition_id", "status", "input_rows", "output_rows", "bytes", "wall_ms",
]


def assign_docnums(doc_stats: DataFrame, n_partitions: int = 32) -> DataFrame:
    """doc_stats + dense docnum (long), deterministic given doc_id set.

    Two-phase: range partition by doc_id -> per-partition counts (tiny
    collect) -> base offset + local rank within partition. Scales without a
    global sort window."""
    parted = doc_stats.repartitionByRange(n_partitions, "doc_id").withColumn(
        "_pid", F.spark_partition_id()
    )
    parted = parted.persist()
    counts = {
        r["_pid"]: r["c"]
        for r in parted.groupBy("_pid").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    bases, acc = {}, 0
    for pid in sorted(counts):
        bases[pid] = acc
        acc += counts[pid]
    base_df = parted.sparkSession.createDataFrame(
        [(pid, b) for pid, b in bases.items()], "_pid int, _base long"
    )
    w = Window.partitionBy("_pid").orderBy("doc_id")
    out = (
        parted.join(F.broadcast(base_df), "_pid")
        .withColumn("docnum", F.row_number().over(w) - 1 + F.col("_base"))
        .drop("_pid", "_base")
    )
    return out


def _encode_term_group(pdf: pd.DataFrame, avgdl: float) -> pd.DataFrame:
    """applyInPandas kernel: one input group = all postings of one term;
    output = one segment row with compressed blocks + block-max metadata."""
    term = pdf["term"].iloc[0]
    order = np.argsort(pdf["docnum"].to_numpy(), kind="mergesort")
    docnums = pdf["docnum"].to_numpy()[order].astype(np.uint64)
    tfs = pdf["tf"].to_numpy()[order].astype(np.uint64)
    dls = pdf["doc_len"].to_numpy()[order].astype(np.uint64)
    ntfs = pdf["normalized_tf"].to_numpy()[order]
    poss = [list(pdf["positions"].iloc[i]) for i in order]
    n = len(docnums)
    df_ = int(pdf["df"].iloc[0])
    idf_bm25 = float(pdf["idf_bm25"].iloc[0])
    # BM25 score per posting (upper bound source for WAND)
    scores = (
        idf_bm25
        * tfs.astype(np.float64)
        * (BM25_K1 + 1.0)
        / (tfs + BM25_K1 * (1.0 - BM25_B + BM25_B * dls.astype(np.float64) / avgdl))
    )
    blocks = []
    for s, e in block_boundaries(n, BLOCK_SIZE):
        blocks.append(
            {
                "last_docnum": int(docnums[e - 1]),
                "max_score": float(scores[s:e].max()),
                # each block is independently decodable (delta within block)
                "docs": encode_docnums(docnums[s:e]),
                "tfs": varint_encode(tfs[s:e]),
                "dls": varint_encode(dls[s:e]),
            }
        )
    return pd.DataFrame(
        {
            "term": [term],
            "df": [df_],
            "idf": [float(pdf["idf"].iloc[0])],
            "idf_bm25": [idf_bm25],
            "is_stop": [bool(pdf["is_stop"].iloc[0])],
            "n_docs": [n],
            "blocks": [blocks],
            "norm_tfs": [varint_encode((ntfs * 1e6).round().astype(np.uint64))],
            "positions": [encode_positions(poss)],
        }
    )


def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest.jsonl")


def read_manifest(out_dir: str) -> dict[int, dict]:
    path = _manifest_path(out_dir)
    done: dict[int, dict] = {}
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                row = json.loads(line)
                if row.get("status") == "done":
                    done[row["partition_id"]] = row
    return done


def _append_manifest(out_dir: str, rows: list[dict]) -> None:
    with open(_manifest_path(out_dir), "a") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")


def build_segments(
    postings: DataFrame,
    term_stats: DataFrame,
    doc_stats_with_docnum: DataFrame,
    out_dir: str,
    avgdl: float,
    n_partitions: int = 32,
    batch_partitions: int = 8,
    fail_after_batches: int | None = None,
) -> None:
    """Build compressed segments under out_dir/part=<p>/, checkpointed.

    Partitions are processed in batches (one Spark job each); a manifest row
    per partition lands after its batch commits, so a crash resumes from the
    last complete batch. ``fail_after_batches`` injects a crash for the
    resume test. Idempotent: done partitions are skipped on re-run.
    """
    os.makedirs(out_dir, exist_ok=True)
    done = read_manifest(out_dir)
    todo = [p for p in range(n_partitions) if p not in done]
    if not todo:
        return

    enriched = (
        postings.join(
            doc_stats_with_docnum.select("doc_id", "docnum"), "doc_id"
        )
        .join(term_stats.select("term", "df", "idf", "idf_bm25", "is_stop"), "term")
        .withColumn("part", F.pmod(F.xxhash64("term"), F.lit(n_partitions)).cast("int"))
    ).persist()

    def _kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        return _encode_term_group(pdf, avgdl)

    batches_done = 0
    for i in range(0, len(todo), batch_partitions):
        batch = todo[i : i + batch_partitions]
        t0 = time.time()
        sub = enriched.where(F.col("part").isin(batch))
        input_rows = {
            r["part"]: r["c"]
            for r in sub.groupBy("part").agg(F.count(F.lit(1)).alias("c")).collect()
        }
        seg = sub.groupBy("part", "term").applyInPandas(
            lambda key, pdf: _kernel(pdf).assign(part=int(key[0])),
            schema="part int, " + SEGMENT_SCHEMA,
        )
        (
            seg.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("part")
            .parquet(out_dir + "/data")
        )
        wall_ms = int((time.time() - t0) * 1000)
        rows = []
        for p in batch:
            pdir = os.path.join(out_dir, "data", f"part={p}")
            nbytes = sum(
                os.path.getsize(os.path.join(pdir, f))
                for f in os.listdir(pdir)
            ) if os.path.isdir(pdir) else 0
            rows.append(
                {
                    "partition_id": p,
                    "status": "done",
                    "input_rows": int(input_rows.get(p, 0)),
                    "output_rows": None,
                    "bytes": nbytes,
                    "wall_ms": wall_ms,
                }
            )
        _append_manifest(out_dir, rows)
        batches_done += 1
        if fail_after_batches is not None and batches_done >= fail_after_batches:
            enriched.unpersist()
            raise RuntimeError("injected failure for resume test")
    enriched.unpersist()


def read_segments_for_terms(
    spark: SparkSession, out_dir: str, terms: list[str], n_partitions: int = 32
) -> DataFrame:
    """Partition-pruned read: only the part= directories that can contain
    the query terms are scanned (check .explain: partition filters on part)."""
    df = spark.read.parquet(out_dir + "/data")
    parts_df = spark.createDataFrame([(t,) for t in terms], "term string").select(
        F.pmod(F.xxhash64("term"), F.lit(n_partitions)).cast("int").alias("p")
    )
    parts = [r["p"] for r in parts_df.distinct().collect()]
    return df.where(F.col("part").isin(parts) & F.col("term").isin(terms))
