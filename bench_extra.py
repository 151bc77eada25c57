"""Round-6 optimization micro-bench: isolates the sub-stages of the hot
bench.py stages with the noop sink (guide §1.4) so per-operator changes
can be A/B'd without the frozen bench.py's stage mixing.

Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 python bench_extra.py [stage ...]
Stages: lsh simhash substring sketches lm trigram cc decontam
Prints one JSON line of {substage: sec}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from distributed_search_engine_spark.corpus import ingest, make_corpus_distributed
from distributed_search_engine_spark.session import get_spark

T: dict[str, float] = {}


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(name, fn):
    spark = get_spark()
    spark.sparkContext.setJobDescription(name)
    t0 = time.time()
    out = fn()
    T[name] = round(time.time() - t0, 3)
    spark.sparkContext.setJobDescription(None)
    print(f"##  {name}: {T[name]}", file=sys.stderr)
    return out


def main():
    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("dse-bench-extra", cores=cores, shuffle_partitions=max(cores, 8))
    spark.sparkContext.setLogLevel("ERROR")
    which = set(sys.argv[1:]) or {
        "lsh", "simhash", "substring", "sketches", "lm", "trigram", "cc",
        "decontam",
    }

    n_big = int(os.environ.get("SPARK_GRAFT_BENCH_BIG_DOCS", "60000"))
    big = ingest(
        make_corpus_distributed(spark, n_big, seed=42, n_partitions=max(2 * cores, 16))
    ).persist()
    big.count()
    boiler = (
        "terms of service apply to this document revision "
        "please read carefully before proceeding further"
    )
    hsel = F.pmod(F.xxhash64("doc_id"), F.lit(1000))
    ded = big.select(
        "doc_id",
        F.when(
            hsel < 3,
            F.concat(F.lit((boiler + " ") * 6), F.substring("content", 1, 24)),
        )
        .when(hsel < 50, F.concat(F.lit(boiler + " "), F.col("content")))
        .otherwise(F.col("content"))
        .alias("text"),
    )

    # warm up codegen/JIT/arrow once with a small slice
    warm = ded.limit(2000)
    from distributed_search_engine_spark.operators import dedup as D
    from distributed_search_engine_spark.operators import text_analysis as TA

    noop(D.shingles(warm))
    noop(D.simhash(warm, content_col="text"))

    if "lsh" in which:
        dsh = timed("lsh/shingles+persist", lambda: D.shingles(ded).persist())
        timed("lsh/shingles_count", lambda: dsh.count())
        timed("lsh/minhash", lambda: noop(D.minhash_signatures(dsh)))
        dcand = timed(
            "lsh/banding+persist",
            lambda: D.lsh_candidate_pairs(D.minhash_signatures(dsh)).persist(),
        )
        timed("lsh/banding_count", lambda: dcand.count())
        timed(
            "lsh/jaccard",
            lambda: D.jaccard_pairs(dsh, threshold=0.5, candidates=dcand).count(),
        )
        dsh.unpersist()
        dcand.unpersist()

    if "simhash" in which:
        timed("simhash/tokens_md5_only", lambda: noop(
            D._tokens(ded, "doc_id", "text").select("doc_id", F.md5(F.col("tok")).alias("h"))
        ))
        timed("simhash/full", lambda: noop(D.simhash(ded, content_col="text")))
        timed("simhash/pairs", lambda: D.simhash_pairs(D.simhash(ded, content_col="text"), 3).count())

    if "substring" in which:
        toks = D._token_arrays(ded, "doc_id", "text")
        timed("substring/tokenize_only", lambda: noop(toks))
        timed("substring/window_hashes", lambda: noop(D._window_hashes(toks, 8)))
        timed("substring/dup_windows", lambda: noop(D.duplicate_windows(ded, 8)))
        timed("substring/full_stats", lambda: D.substring_dup_stats(ded, w=8).where("dup_fraction > 0").count())

    if "sketches" in which:
        timed("sketches/cms_build", lambda: noop(TA.cms_build(ded)))
        timed("sketches/cms_heavy_hitters", lambda: TA.cms_heavy_hitters(ded, k=20).collect())
        timed("sketches/hll", lambda: TA.hll_distinct(ded).collect())

    if "lm" in which:
        timed("lm/bigram_stream", lambda: noop(TA._bigram_stream(ded, "doc_id", "text")))
        timed(
            "lm/full",
            lambda: TA.bigram_lm_stats(ded).agg(F.sum("n_bigrams")).collect(),
        )

    if "trigram" in which:
        from distributed_search_engine_spark.index import trigram as TRI

        timed("trigram/build", lambda: noop(
            TRI.trigram_postings(big, doc_id_col="doc_id", content_col="content")
        ))
        tpost = TRI.trigram_postings(
            big, doc_id_col="doc_id", content_col="content"
        ).persist()
        tpost.count()
        import tempfile, shutil

        tri_dir = tempfile.mkdtemp(prefix="dse_tri_extra_")
        timed("trigram/store", lambda: TRI.store_trigram_postings(tpost, tri_dir, n_partitions=64))
        n_files = sum(len(fs) for _, _, fs in os.walk(tri_dir))
        print(f"##  trigram store files: {n_files}", file=sys.stderr)
        shutil.rmtree(tri_dir, ignore_errors=True)
        tpost.unpersist()

    if "cc" in which:
        from distributed_search_engine_spark.operators.graph import connected_components

        n_cc = 300_000
        cc_edges = spark.range(n_cc).where(F.col("id") % 50 != 0).select(
            F.col("id").alias("u"), (F.col("id") - 1).alias("v")
        )
        timed("cc/full", lambda: connected_components(cc_edges).where(
            F.col("component") != F.col("node") - F.col("node") % 50
        ).count())

    if "decontam" in which:
        from distributed_search_engine_spark.operators.bloom import bloom_prune, build_bloom

        is_bench = F.pmod(F.xxhash64("doc_id"), F.lit(30)) == 0
        bench_docs = ded.where(is_bench)
        timed("decontam/exact", lambda: D.decontaminate(ded.where(~is_bench), bench_docs).where("contaminated").count())
        bench_sh = timed("decontam/bench_shingles", lambda: D.shingles(bench_docs).select("shingle").distinct())
        bitmap = timed("decontam/bloom_build", lambda: build_bloom(bench_sh, "shingle", m_bits=1 << 23, hash_family="fast"))
        train_sh = D.shingles(ded.where(~is_bench))
        timed("decontam/bloom_probe", lambda: bloom_prune(
            train_sh, "shingle", bitmap, m_bits=1 << 23, hash_family="fast"
        ).select("doc_id").distinct().count())

    big.unpersist()
    print(json.dumps(T))


if __name__ == "__main__":
    main()
