"""Checkpoint/resume manifests for the LSH dedup pipeline
(operators/dedup_resume.py): injected-crash resume must skip committed
partitions and produce value-identical output vs both an uninterrupted
checkpointed run and the plain in-memory pipeline."""

import json
import os

import pytest
from pyspark.sql import functions as F

from distributed_search_engine_spark.corpus import ingest, make_corpus
from distributed_search_engine_spark.index.segments import read_manifest
from distributed_search_engine_spark.operators.dedup import (
    jaccard_pairs,
    lsh_candidate_pairs,
    minhash_signatures,
    shingles,
)
from distributed_search_engine_spark.operators.dedup_resume import (
    lsh_dedup_resumable,
)

N_PARTS = 4


@pytest.fixture(scope="module")
def docs(spark):
    # duplicate a slice of the corpus so near-dup pairs actually exist
    base = ingest(make_corpus(spark, n_docs=40, seed=7)).select(
        "doc_id", F.col("content").alias("text")
    )
    dup = base.orderBy("doc_id").limit(8).select(
        F.concat(F.lit("d"), "doc_id").alias("doc_id"), "text"
    )
    return base.unionByName(dup)


def _pairs_set(df):
    return {
        (r["doc_a"], r["doc_b"], r["jaccard"])
        for r in df.select(
            "doc_a", "doc_b", F.round("jaccard", 6).alias("jaccard")
        ).collect()
    }


def test_resumable_matches_plain_pipeline(spark, docs, tmp_path):
    out = str(tmp_path / "dedup_ck")
    got = lsh_dedup_resumable(
        docs, out, threshold=0.5, n_partitions=N_PARTS, batch_partitions=2
    )
    sh = shingles(docs)
    want = jaccard_pairs(
        sh, 0.5, candidates=lsh_candidate_pairs(minhash_signatures(sh))
    )
    assert _pairs_set(got) == _pairs_set(want)
    assert len(_pairs_set(got)) > 0
    # every stage carries a complete manifest
    for stage in ("signatures", "candidates", "verified"):
        assert sorted(read_manifest(os.path.join(out, stage))) == list(
            range(N_PARTS)
        )


def test_resume_after_injected_crash_is_value_identical(spark, docs, tmp_path):
    clean = str(tmp_path / "clean")
    crashed = str(tmp_path / "crashed")
    want = lsh_dedup_resumable(
        docs, clean, threshold=0.5, n_partitions=N_PARTS, batch_partitions=2
    )
    # crash after 3 batch commits: signatures fully done (2 batches),
    # candidates half done (1 of 2 batches)
    with pytest.raises(RuntimeError, match="injected failure"):
        lsh_dedup_resumable(
            docs, crashed, threshold=0.5, n_partitions=N_PARTS,
            batch_partitions=2, fail_after_batches=3,
        )
    assert len(read_manifest(os.path.join(crashed, "signatures"))) == N_PARTS
    assert len(read_manifest(os.path.join(crashed, "candidates"))) == 2
    assert read_manifest(os.path.join(crashed, "verified")) == {}

    # committed partitions must NOT be rewritten on resume: fingerprint
    # the completed signature partition files before resuming
    def _sig_fps(d):
        out = {}
        for p in sorted(os.listdir(os.path.join(d, "signatures", "data"))):
            if not p.startswith("part="):
                continue
            pdir = os.path.join(d, "signatures", "data", p)
            for f in sorted(os.listdir(pdir)):
                if f.endswith(".parquet"):
                    st = os.stat(os.path.join(pdir, f))
                    out[(p, f)] = (st.st_size, st.st_mtime_ns)
        return out

    before = _sig_fps(crashed)
    got = lsh_dedup_resumable(
        docs, crashed, threshold=0.5, n_partitions=N_PARTS, batch_partitions=2
    )
    assert _sig_fps(crashed) == before  # idempotent skip, not rewrite
    assert _pairs_set(got) == _pairs_set(want)
    # manifests record one row per partition, no duplicates after resume
    with open(os.path.join(crashed, "candidates", "_manifest.jsonl")) as f:
        rows = [json.loads(line) for line in f]
    ids = [r["partition_id"] for r in rows if r["status"] == "done"]
    assert sorted(ids) == list(range(N_PARTS))
