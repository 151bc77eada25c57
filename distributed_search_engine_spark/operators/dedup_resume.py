"""Checkpoint/resume manifests for the corpus-scale LSH dedup pipeline.

The index build has per-partition lineage manifests (index/segments.py);
this gives the OTHER long-running 100-TB pipeline — shingles -> MinHash
signatures -> LSH band candidates -> jaccard verify — the same
crash-at-hour-20 story: every stage persists partitioned parquet under
``out_dir/<stage>/data/part=<p>/`` with a ``_manifest.jsonl`` row per
partition (input partition id, bytes, wall), done partitions are skipped
idempotently on re-run, and a resumed run is value-identical to an
uninterrupted one (pytest-gated with an injected crash, mirroring
tests/test_segments.py's resume test).

Partition keys are chosen so every batch is a self-contained job and a
crash can never split work that must commit together:

- **signatures**: ``pmod(xxhash64(doc_id), n)`` — the signature groupBy is
  keyed by doc_id, so the batch filter prunes before the aggregate.
- **candidates**: ``pmod(xxhash64(band_id, band_key), n)`` — BOTH sides of
  a candidate pair share (band_id, band_key), so bucket-batching never
  splits a pair across batches. A pair surfacing in several bands may land
  in several partitions; the verify stage's distinct collapses them (kept
  per-partition-independent here on purpose).
- **verified**: ``pmod(xxhash64(doc_a, doc_b), n)`` over distinct pairs;
  each batch verifies only its pairs against the shingle table.

Reference parity: the reference Indexer checkpoints via KVS table renames
(jobs/Indexer.java checkpoint tables); this is the Spark-native form —
partitioned parquet + lineage manifest, identical to the index segments'
discipline (SURVEY.md I13/I15).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..index.segments import _append_manifest, read_manifest
from .dedup import (
    DEFAULT_BANDS,
    DEFAULT_MINHASHES,
    DEFAULT_SHINGLE_N,
    jaccard_pairs,
    minhash_signatures,
    shingles,
)


class CrashAfter:
    """Injected-failure budget for the resume test: raises after N batch
    commits (manifest rows land first, like a real mid-run crash)."""

    def __init__(self, n_batches: int):
        self.left = int(n_batches)

    def tick(self) -> None:
        self.left -= 1
        if self.left <= 0:
            raise RuntimeError("injected failure for resume test")


def _checkpointed_write(
    df: DataFrame,
    out_dir: str,
    n_partitions: int,
    batch_partitions: int,
    crash: CrashAfter | None = None,
) -> None:
    """Write ``df`` (must carry an int ``part`` column in [0, n)) under
    ``out_dir/data/part=<p>/`` in batches of partitions, one manifest row
    per completed partition; done partitions skip idempotently."""
    os.makedirs(out_dir, exist_ok=True)
    done = read_manifest(out_dir)
    todo = [p for p in range(n_partitions) if p not in done]
    if not todo:
        return
    multi_batch = len(todo) > batch_partitions
    if multi_batch:
        df = df.persist()
    try:
        for i in range(0, len(todo), batch_partitions):
            batch = todo[i : i + batch_partitions]
            t0 = time.time()
            sub = df.where(F.col("part").isin(batch)).repartition(
                max(len(batch), 1), "part"
            )
            (
                sub.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("part")
                .parquet(out_dir + "/data")
            )
            wall_ms = int((time.time() - t0) * 1000)
            rows = []
            for p in batch:
                pdir = os.path.join(out_dir, "data", f"part={p}")
                nbytes = (
                    sum(
                        os.path.getsize(os.path.join(pdir, f))
                        for f in os.listdir(pdir)
                    )
                    if os.path.isdir(pdir)
                    else 0
                )
                rows.append(
                    {
                        "partition_id": p,
                        "status": "done",
                        "bytes": nbytes,
                        "wall_ms": wall_ms,
                    }
                )
            _append_manifest(out_dir, rows)
            if crash is not None:
                crash.tick()
    finally:
        if multi_batch:
            df.unpersist()


def lsh_dedup_resumable(
    docs: DataFrame,
    out_dir: str,
    n_hashes: int = DEFAULT_MINHASHES,
    bands: int = DEFAULT_BANDS,
    threshold: float = 0.5,
    shingle_n: int = DEFAULT_SHINGLE_N,
    n_partitions: int = 8,
    batch_partitions: int = 4,
    fail_after_batches: int | None = None,
    doc_id_col: str = "doc_id",
    content_col: str = "text",
) -> DataFrame:
    """Run the full LSH near-dup pipeline with per-stage checkpoint
    manifests; returns the verified (doc_a, doc_b, jaccard) pairs read
    back from the final stage's parquet. Re-invoking after a crash skips
    every committed partition and produces value-identical output
    (deterministic hashing end to end)."""
    spark = docs.sparkSession
    crash = CrashAfter(fail_after_batches) if fail_after_batches else None

    # stage 1: signatures, partitioned by doc hash
    sig_dir = os.path.join(out_dir, "signatures")
    sigs = minhash_signatures(
        shingles(docs, n=shingle_n, doc_id_col=doc_id_col, content_col=content_col),
        n_hashes,
    ).withColumn(
        "part", F.pmod(F.xxhash64("doc_id"), F.lit(n_partitions)).cast("int")
    )
    _checkpointed_write(sigs, sig_dir, n_partitions, batch_partitions, crash)
    sig_df = spark.read.parquet(sig_dir + "/data").drop("part")

    # stage 2: banded candidate pairs, partitioned by bucket hash (both
    # sides of a pair share the bucket -> batches never split a pair)
    cand_dir = os.path.join(out_dir, "candidates")
    rows_per_band = n_hashes // bands
    band_cols = []
    for b in range(bands):
        key = F.concat_ws(
            "|",
            *[F.col(f"mh_{b * rows_per_band + i}") for i in range(rows_per_band)],
        )
        band_cols.append(
            F.struct(F.lit(b).alias("band_id"), key.alias("band_key"))
        )
    banded = (
        sig_df.select("doc_id", F.explode(F.array(*band_cols)).alias("band"))
        .select("doc_id", "band.band_id", "band.band_key")
        .withColumn(
            "part",
            F.pmod(F.xxhash64("band_id", "band_key"), F.lit(n_partitions)).cast(
                "int"
            ),
        )
    )
    a, b2 = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b2,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.part").alias("part"),
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .dropDuplicates(["part", "doc_a", "doc_b"])
    )
    _checkpointed_write(cand, cand_dir, n_partitions, batch_partitions, crash)

    # stage 3: exact-jaccard verify, partitioned by pair hash (the
    # distinct here also collapses cross-band duplicate candidates)
    ver_dir = os.path.join(out_dir, "verified")
    cand_df = (
        spark.read.parquet(cand_dir + "/data").select("doc_a", "doc_b").distinct()
    )
    sh = shingles(
        docs, n=shingle_n, doc_id_col=doc_id_col, content_col=content_col
    )
    ver = jaccard_pairs(sh, threshold, candidates=cand_df).withColumn(
        "part", F.pmod(F.xxhash64("doc_a", "doc_b"), F.lit(n_partitions)).cast("int")
    )
    _checkpointed_write(ver, ver_dir, n_partitions, batch_partitions, crash)
    return (
        spark.read.parquet(ver_dir + "/data")
        .select("doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard"))
    )
