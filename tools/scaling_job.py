"""One indexing run at a given parallelism level — the unit job for the
N-vs-4N scaling evidence (BASELINE.json north rule). Run via subprocess so
each level gets its own driver JVM:

  python tools/scaling_job.py <n_executors> <corpus_parquet>   # 2 cores each

Runs on Spark's local-cluster[N,2,mem] master: N SEPARATE two-core
executor JVM processes — the faithful sandbox stand-in for an N-executor
cluster (the north rule's "N and 4N executors"). Thread-based local[N]
is NOT used for the measurement: a single JVM's task threads stop scaling
at ~2.5x on this VM while separate processes scale with the hardware
(control experiments in BENCH/BASELINE.md).

The measured job = full physical index build: tokenize -> postings ->
doc stats/term stats -> docnums -> compressed segments with manifests.
Corpus load + session startup are excluded (both levels pay identical
fixed costs; the rule targets the scaling of the indexing work itself).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import SparkSession, functions as F

from distributed_search_engine_spark.index.segments import (
    assign_docnums,
    build_segments,
)
from distributed_search_engine_spark.operators.postings import build_index


def cluster_session(n_executors: int, executor_mem_mb: int = 5120) -> SparkSession:
    return (
        SparkSession.builder.master(f"local-cluster[{n_executors},2,{executor_mem_mb}]")
        .appName(f"scaling-{n_executors}x2")
        .config("spark.sql.shuffle.partitions", "64")
        .config("spark.sql.adaptive.enabled", "true")
        # keep AQE from coalescing the caps-window shuffle below the 4N
        # core count: with the default 64 MB advisory size the ~1 GB
        # window input coalesced to 11 partitions — 2 ragged waves on 8
        # cores (r5 event-log stage analysis, BENCH/BASELINE.md)
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32m")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.executor.memory", f"{executor_mem_mb - 512}m")
        .config("spark.driver.memory", "6g")
        .config("spark.ui.enabled", "false")
        # executor python workers need the engine package (the spark-submit
        # --py-files equivalent for this in-repo run)
        .config(
            "spark.executorEnv.PYTHONPATH",
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        )
        .getOrCreate()
    )


def main() -> None:
    cores = int(sys.argv[1])
    corpus_path = sys.argv[2]
    spark = cluster_session(cores)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(corpus_path)
    n_docs = docs.count()  # warms the input (page cache), not timed

    t0 = time.time()
    idx = build_index(docs, doc_id_col="doc_id", content_col="content")
    idx["postings"] = idx["postings"].persist()
    n_postings = idx["postings"].count()
    # warm term_stats before the segment build (same fix bench.py got in
    # r4): its lineage carries is_stop, which the returned postings frame
    # drops, so the persisted postings cache cannot serve it — without
    # this the whole caps-window pipeline re-runs inside build_segments
    # (r5 event logs: the 933 MB window stage appeared TWICE per run)
    idx["term_stats"] = idx["term_stats"].persist()
    idx["term_stats"].count()
    ds = assign_docnums(idx["doc_stats"], n_partitions=max(4, cores)).persist()
    avgdl = float(ds.agg(F.avg("doc_len")).collect()[0][0])
    seg_dir = tempfile.mkdtemp(prefix=f"dse_scale_{cores}_")
    build_segments(
        idx["postings"], idx["term_stats"], ds, seg_dir, avgdl,
        n_partitions=64, batch_partitions=64,
    )
    wall = time.time() - t0
    shutil.rmtree(seg_dir, ignore_errors=True)
    print(
        json.dumps(
            {
                "cores": cores,
                "n_docs": n_docs,
                "n_postings": n_postings,
                "wall_sec": round(wall, 2),
                "docs_per_sec": round(n_docs / wall, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
