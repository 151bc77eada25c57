"""N-vs-4N scaling benchmark (BASELINE.json north rule, sandbox form):
the identical index-build job at local[8] and local[32] on the same input;
report throughput at both + scaling efficiency = (tp_4N / tp_N) / 4.

  python tools/scaling_bench.py [n_docs]

Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, ".")

CORPUS = "/tmp/dse_scaling_corpus"
N_DOCS_DEFAULT = 120_000


def ensure_corpus(n_docs: int) -> None:
    if os.path.exists(CORPUS + "/_SUCCESS"):
        return
    from distributed_search_engine_spark.corpus import ingest, make_corpus_distributed
    from distributed_search_engine_spark.session import get_spark

    spark = get_spark("gen-corpus", cores=32, shuffle_partitions=64)
    spark.sparkContext.setLogLevel("ERROR")
    docs = ingest(make_corpus_distributed(spark, n_docs, seed=42, n_partitions=64))
    docs.write.mode("overwrite").parquet(CORPUS)
    spark.stop()


def run_level(cores: int) -> dict:
    out = subprocess.run(
        [sys.executable, "tools/scaling_job.py", str(cores), CORPUS],
        capture_output=True, text=True, timeout=3000, cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else N_DOCS_DEFAULT
    ensure_corpus(n_docs)
    r8 = run_level(8)
    r32 = run_level(32)
    eff = (r32["docs_per_sec"] / r8["docs_per_sec"]) / 4.0
    result = {
        "n_docs": n_docs,
        "local8": r8,
        "local32": r32,
        "scaling_efficiency_8_to_32": round(eff, 3),
        "pass_0_8": eff >= 0.8,
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "w") as f:
        f.write(f"""# BENCH/BASELINE — measured numbers

## Scaling evidence (BASELINE.json north rule, sandbox form)

Same physical index-build job (tokenize -> postings -> doc/term stats ->
docnums -> compressed segments + manifests) on the same {n_docs:,}-doc
deterministic corpus (`corpus.make_corpus_distributed`, seed 42), at two
parallelism levels in separate JVMs (`tools/scaling_job.py`):

| level | wall (s) | docs/sec | postings |
|---|---|---|---|
| local[8]  (N)  | {r8['wall_sec']} | {r8['docs_per_sec']:,} | {r8['n_postings']:,} |
| local[32] (4N) | {r32['wall_sec']} | {r32['docs_per_sec']:,} | {r32['n_postings']:,} |

**Scaling efficiency = (tp_4N / tp_N) / 4 = {eff:.3f}** (target >= 0.8: {'PASS' if eff >= 0.8 else 'FAIL'}).

Reproduce: `python tools/scaling_bench.py {n_docs}`.

## Reference baseline

The reference repo publishes no benchmark numbers (BASELINE.md); its only
quantitative facts are worker counts and caps. Rank identity vs the
reference formula chain is gated by pytest goldens
(tests/test_query_golden.py) and the driver's DuckDB oracle
(CORRECTNESS_r*.json).
""")
    print(json.dumps(result))


if __name__ == "__main__":
    main()
