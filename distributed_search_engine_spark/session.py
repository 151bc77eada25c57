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
        # NOTE (r6): spark.sql.join.preferSortMergeJoin=false was trialed
        # (guide §9 suggests allowing shuffled-hash joins) and REVERTED:
        # the apparent per-stage wins came from a fixed-order warm-up
        # artifact in the A/B; with the comparison order reversed the
        # default sort-merge planning won or tied on every stage measured
        # (OPTIMIZATION_r06.md, negative results).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
