"""Streaming sketches: the mergeable-sketch family (count-min counters,
HyperLogLog registers) as windowed Structured Streaming aggregations.

The batch forms (`text_analysis.cms_build` / `hll_distinct`, both
oracle-gated) were designed mergeable precisely so they could ride a
stream: CMS counters merge by ADDITION and HLL registers by MAX, which
are exactly the partial aggregates Spark's streaming state store keeps
per window — so the streaming form is the SAME groupBy, keyed by the
event-time window, with no custom state handler. At 100 TB/day this is
the profile pass that replaces exact token groupBys: state per window is
d*width counters (CMS) or m registers (HLL) regardless of vocabulary.

Estimates are read the same way as batch: min over the d counters for a
probe token, alpha_m * m^2 / sum(2^-reg) over the registers. Register
tables for a CLOSED window are byte-identical to running the batch
operator over that window's rows (asserted in tests/test_streaming.py),
so every correctness property carries over from the gated batch twins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_bucket, md5_prefix_long
from ..functions.text import tokens_col


def _stream_tokens(
    docs: DataFrame, ts_col: str, content_col: str
) -> DataFrame:
    return docs.select(
        F.col(ts_col).alias("ts"),
        F.explode(tokens_col(F.col(content_col))).alias("tok"),
    ).where(F.col("tok") != "")


def cms_stream(
    docs: DataFrame,
    window_duration: str = "1 minute",
    d: int = 4,
    width: int = 1024,
    ts_col: str = "ts",
    content_col: str = "content",
    watermark: str = "10 minutes",
) -> DataFrame:
    """(window_start, row, bucket, c): per-window count-min counter
    tables. Same d x width md5 buckets as the gated batch cms_build;
    counts accumulate in the state store by addition (Spark's partial
    count agg) and each window's table finalizes when the watermark
    passes."""
    t = _stream_tokens(docs, ts_col, content_col).withWatermark(
        "ts", watermark
    )
    rb = t.select(
        "ts",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(r).alias("row"),
                    md5_bucket(F.col("tok"), width, salt=f"cms{r}:").alias(
                        "bucket"
                    ),
                )
                for r in range(d)
            ])
        ).alias("rb"),
    )
    return (
        rb.groupBy(
            F.window("ts", window_duration).alias("w"),
            F.col("rb.row").alias("row"),
            F.col("rb.bucket").alias("bucket"),
        )
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
        .select(F.col("w.start").alias("window_start"), "row", "bucket", "c")
    )


def hll_stream(
    docs: DataFrame,
    window_duration: str = "1 minute",
    b: int = 8,
    ts_col: str = "ts",
    content_col: str = "content",
    watermark: str = "10 minutes",
) -> DataFrame:
    """(window_start, bucket, reg): per-window HyperLogLog registers —
    same bucket/rank arithmetic as the gated batch hll_distinct;
    registers accumulate by MAX in the state store. Estimate downstream
    with the batch formula (or union windows by another max-groupBy:
    registers compose across windows too)."""
    rem = 32 - b
    t = _stream_tokens(docs, ts_col, content_col).withWatermark(
        "ts", watermark
    )
    h = md5_prefix_long(F.col("tok"))
    r = h.bitwiseAND(F.lit((1 << rem) - 1))
    rho = F.when(r == 0, F.lit(rem + 1)).otherwise(
        F.lit(rem + 1) - F.length(F.bin(r))
    )
    return (
        t.select("ts", F.shiftright(h, rem).alias("bucket"), rho.alias("rho"))
        .groupBy(
            F.window("ts", window_duration).alias("w"), F.col("bucket")
        )
        .agg(F.max("rho").cast("int").alias("reg"))
        .select(F.col("w.start").alias("window_start"), "bucket", "reg")
    )
