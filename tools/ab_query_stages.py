"""Controlled A/B attribution for the two round-4 bench regressions
(VERDICT.md 'What's wrong' #3): `query_wand_60k_x10` 2.0->4.4 s and
`query_bm25_batch_60k_seg_x10` 2.1->3.8 s in the driver's single-run
BENCH_r04 vs BENCH_r03, at a *better* host marker.

Method (the same discipline as the r4 index-build post-mortem): build the
60k index + segments ONCE exactly as bench.py does, then run the two
stages back-to-back ALTERNATING k times in one session, host marker
before and after. If the medians sit at the r3/healthy-rerun level
(~2 s), the r4 driver numbers were a transient host window, not code;
any stable elevation is a real regression to chase.

  python tools/ab_query_stages.py [repeats=6]
prints one JSON line with all samples + medians + host markers.
"""

from __future__ import annotations

import json
import statistics
import sys
import time

sys.path.insert(0, ".")

from bench import N_SEG_PARTS, QUERY_SET, host_control  # noqa: E402


def main() -> None:
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from distributed_search_engine_spark.corpus import (
        ingest,
        make_corpus_distributed,
    )
    from distributed_search_engine_spark.index.segments import (
        assign_docnums,
        build_segments,
        read_segments_for_terms,
        segment_search_index,
    )
    from distributed_search_engine_spark.index.wand import wand_topk
    from distributed_search_engine_spark.operators.postings import build_index
    from distributed_search_engine_spark.query.engine import (
        SearchIndex,
        search_bm25_batch,
    )
    from distributed_search_engine_spark.session import get_spark

    cores = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("ab-query-stages", cores=cores,
                      shuffle_partitions=cores)
    spark.sparkContext.setLogLevel("ERROR")

    ctrl_before = host_control()
    n_big = 60_000
    big = ingest(
        make_corpus_distributed(spark, n_big, seed=42,
                                n_partitions=max(2 * cores, 16))
    ).persist()
    big.count()
    bidx = build_index(big, doc_id_col="doc_id", content_col="content")
    bidx["postings"] = bidx["postings"].persist()
    bidx["postings"].count()
    bidx["term_stats"] = bidx["term_stats"].persist()
    bidx["term_stats"].count()
    bds = assign_docnums(bidx["doc_stats"], n_partitions=max(4, cores // 4)).persist()
    bavgdl = float(bds.agg(F.avg("doc_len")).collect()[0][0])
    bseg_dir = tempfile.mkdtemp(prefix="dse_ab_segs_")
    build_segments(
        bidx["postings"], bidx["term_stats"], bds, bseg_dir, bavgdl,
        n_partitions=N_SEG_PARTS, batch_partitions=N_SEG_PARTS,
    )
    bseg_sidx = segment_search_index(
        spark, bseg_dir, bds, bidx["term_stats"], bidx["term_dict"],
        bidx["total_docs"], n_partitions=N_SEG_PARTS,
    ).cache_term_dict()

    def stage_wand() -> float:
        t0 = time.time()
        for q in QUERY_SET:
            rows = [
                r.asDict()
                for r in read_segments_for_terms(
                    spark, bseg_dir, q.split(), N_SEG_PARTS
                ).select("idf_bm25", "blocks").collect()
            ]
            wand_topk(
                [
                    {"idf_bm25": r["idf_bm25"],
                     "blocks": [b.asDict() for b in r["blocks"]]}
                    for r in rows
                ],
                bavgdl, 10,
            )
        return time.time() - t0

    def stage_seg_batch() -> float:
        t0 = time.time()
        search_bm25_batch(spark, bseg_sidx, QUERY_SET, k=20).collect()
        return time.time() - t0

    samples = {"query_wand_60k_x10": [], "query_bm25_batch_60k_seg_x10": []}
    for _ in range(repeats):
        samples["query_wand_60k_x10"].append(round(stage_wand(), 3))
        samples["query_bm25_batch_60k_seg_x10"].append(
            round(stage_seg_batch(), 3)
        )
    ctrl_after = host_control()
    shutil.rmtree(bseg_dir, ignore_errors=True)
    out = {
        "when": time.strftime("%Y-%m-%d %H:%M"),
        "repeats": repeats,
        "samples": samples,
        "medians": {
            k: round(statistics.median(v), 3) for k, v in samples.items()
        },
        "mins": {k: round(min(v), 3) for k, v in samples.items()},
        "host_before": ctrl_before,
        "host_after": ctrl_after,
        "r3_reference": {"query_wand_60k_x10": 2.0,
                         "query_bm25_batch_60k_seg_x10": 2.1},
        "r4_driver": {"query_wand_60k_x10": 4.4,
                      "query_bm25_batch_60k_seg_x10": 3.8},
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
