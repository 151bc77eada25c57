"""SparkSession factory tuned for the indexing workload.

Scale notes (100 TB / 1000-executor design intent):
- AQE on: runtime coalescing + skew-join splitting for the term-keyed
  shuffles (hot stop-word terms are Zipfian; see operators/postings.py
  salting as the explicit defense).
- shuffle.partitions sized by caller (bench uses cores; a real cluster
  would use ~2-3x total cores).
- Arrow enabled: every Python-side transform is a vectorized pandas/Arrow
  UDF per the input_hint ("no per-row Python").
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "distributed-search-engine-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "4"))
    if shuffle_partitions is None:
        shuffle_partitions = max(cores, 4)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # doc_stats / term dictionaries are broadcast-sized well past the
        # 10 MB default; a real cluster would size this to executor memory
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # let the planner pick shuffled-hash over sort-merge when its size
        # conditions hold (guide §9 baseline): the bigram-LM and dedup
        # candidate joins lose their sorts of the big side (A/B at 60k:
        # lm 6.3->5.9 s, jaccard 4.0->3.3 s, consistent across rounds).
        # Scale note: SHJ needs the per-partition build side in memory;
        # AQE partition sizing + skew splitting (both on) keep that
        # bounded, and broadcast joins still take precedence.
        .config("spark.sql.join.preferSortMergeJoin", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
