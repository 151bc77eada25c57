"""One indexing run at a given parallelism level — the unit job for the
N-vs-4N scaling evidence (BASELINE.json north rule). Run via subprocess so
each level gets its own JVM:

  python tools/scaling_job.py <cores> <corpus_parquet> <out_json_line>

The measured job = full physical index build: tokenize -> postings ->
doc stats/term stats -> docnums -> compressed segments with manifests.
Corpus load + session startup are excluded (both levels pay identical
fixed costs; the rule targets the scaling of the indexing work itself).
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from distributed_search_engine_spark.index.segments import (
    assign_docnums,
    build_segments,
)
from distributed_search_engine_spark.operators.postings import build_index
from distributed_search_engine_spark.session import get_spark


def main() -> None:
    cores = int(sys.argv[1])
    corpus_path = sys.argv[2]
    spark = get_spark(f"scaling-{cores}", cores=cores, shuffle_partitions=cores * 2)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(corpus_path)
    n_docs = docs.count()  # warms the input (page cache), not timed

    t0 = time.time()
    idx = build_index(docs, doc_id_col="doc_id", content_col="content")
    idx["postings"] = idx["postings"].persist()
    n_postings = idx["postings"].count()
    ds = assign_docnums(idx["doc_stats"], n_partitions=max(4, cores)).persist()
    avgdl = float(ds.agg(F.avg("doc_len")).collect()[0][0])
    seg_dir = tempfile.mkdtemp(prefix=f"dse_scale_{cores}_")
    build_segments(
        idx["postings"], idx["term_stats"], ds, seg_dir, avgdl,
        n_partitions=64, batch_partitions=64,
    )
    wall = time.time() - t0
    shutil.rmtree(seg_dir, ignore_errors=True)
    print(
        json.dumps(
            {
                "cores": cores,
                "n_docs": n_docs,
                "n_postings": n_postings,
                "wall_sec": round(wall, 2),
                "docs_per_sec": round(n_docs / wall, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
