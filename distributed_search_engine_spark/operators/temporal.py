"""Temporal joins Spark lacks natively, re-expressed as bounded
equi-joins (the as-of join lives in the events_asof_join query as a
single running window; this module adds the interval/range join).

``range_join`` matches point events to [start, end) intervals. The
naive formulation is a theta join — O(|events| x |intervals|) with a
BroadcastNestedLoop/cartesian plan that dies at scale. The scale path
here is BUCKETING: quantize time into fixed-width buckets; an interval
spanning b buckets emits b rows, an event maps to exactly one bucket;
the join becomes an equi-join on bucket id plus a residual range
filter. Candidate volume is |events| x (avg intervals overlapping one
bucket) — linear when the bucket width tracks the typical interval
length. This is the standard Spark treatment of interval joins (the
same trick databases call "grid partitioning" for 1-D ranges).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    events: DataFrame,
    intervals: DataFrame,
    ts_col: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    bucket_secs: int = 3600,
) -> DataFrame:
    """Rows of ``events`` x matching [start, end) rows of ``intervals``
    (inner; one output row per overlapping interval), via the bucketed
    equi-join. Both inputs keep all their columns (names must not
    collide). End bound is EXCLUSIVE.
    """
    # TIMESTAMP_NTZ won't cast straight to double; epoch doubles pass
    # through both casts unchanged
    ev_epoch = F.col(ts_col).cast("timestamp").cast("double")
    iv_start = F.col(start_col).cast("timestamp").cast("double")
    iv_end = F.col(end_col).cast("timestamp").cast("double")

    ev = events.withColumn("_bucket", F.floor(ev_epoch / bucket_secs))
    # one row per bucket the interval overlaps: sequence() is JVM-side;
    # end is exclusive, so a boundary-aligned end emits no extra bucket.
    # Empty intervals (start >= end) are dropped up front — otherwise
    # sequence(hi, lo) would run DESCENDING and emit junk bucket rows
    # (harmless after the residual filter, but wasted).
    iv = intervals.where(iv_start < iv_end).withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(iv_start / bucket_secs),
                F.floor(
                    (iv_end - F.lit(1e-6)) / bucket_secs
                ).cast("long"),
            )
        ),
    )
    in_range = (ev_epoch >= iv_start) & (ev_epoch < iv_end)
    return ev.join(iv, "_bucket").where(in_range).drop("_bucket")
