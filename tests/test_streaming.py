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
