"""Streaming dedup: cross-micro-batch exact content dedup — the
continuous twin of operators/dedup.exact_dedup (whose batch query is
oracle-gated as dedup_exact).

Two forms, picked by the state-size regime:

- ``dedup_stream``: idiomatic Structured Streaming
  dropDuplicatesWithinWatermark on the content sha — the state store
  evicts keys once the event-time watermark passes, so state is
  O(keys-per-watermark-window), the only shape that survives an
  unbounded 100 TB/day feed. Duplicates farther apart than the
  watermark are NOT caught (that's the documented contract of the
  watermarked form — catch them downstream with the batch exact_dedup
  over the sink).

- ``dedup_stream_unbounded``: applyInPandasWithState first-seen-wins
  with no timeout — EXACT cross-batch dedup for feeds whose distinct
  key count fits the state store (e.g. a bounded re-crawl window).
  State per key is a single boolean, shuffled once per micro-batch on
  the hash key.

The reference dedups at crawl time by content hash against the KVS
(jobs/Crawler.java:1091-1105, content-seen table); these are the
Spark-streaming re-expressions of that same exactly-once contract.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def with_content_sha(
    docs: DataFrame, content_col: str = "content"
) -> DataFrame:
    """sha256 of the raw content bytes — same key as the batch
    exact_dedup / the reference's content-seen hash."""
    return docs.withColumn(
        "content_sha", F.sha2(F.col(content_col).cast("binary"), 256)
    )


def dedup_stream(
    docs: DataFrame,
    ts_col: str = "ts",
    content_col: str = "content",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Watermark-bounded streaming dedup on the content sha. State is
    evicted as event time advances; emits the FIRST occurrence of each
    content within the watermark horizon."""
    return (
        with_content_sha(docs, content_col)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["content_sha"])
    )


_OUT_SCHEMA_SUFFIX = "doc_id string, content string, content_sha string"


def dedup_stream_unbounded(docs: DataFrame, content_col: str = "content") -> DataFrame:
    """Exact cross-batch first-seen-wins dedup via explicit per-key
    state (one boolean per distinct content sha, no timeout). Emits
    each distinct content exactly once, keyed deterministically to the
    min doc_id WITHIN the batch it first appears (ties across rows of
    one micro-batch)."""

    def _fn(key, pdf_iter: Iterator[pd.DataFrame], state: GroupState):
        if state.exists:
            return
        first: pd.DataFrame | None = None
        for pdf in pdf_iter:
            if len(pdf) == 0:
                continue
            pdf = pdf.sort_values("doc_id").head(1)
            if first is None or pdf["doc_id"].iloc[0] < first["doc_id"].iloc[0]:
                first = pdf
        if first is None:
            # nothing arrived for this key: do NOT mark it seen, or the
            # first real occurrence would be silently suppressed later
            return
        state.update((True,))
        yield first[["doc_id", "content", "content_sha"]]

    hashed = with_content_sha(docs, content_col)
    return hashed.groupBy("content_sha").applyInPandasWithState(
        _fn,
        outputStructType=_OUT_SCHEMA_SUFFIX,
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
