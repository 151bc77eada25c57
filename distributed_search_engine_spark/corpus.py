"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

One row per source file: (repo, path, commit, lang, content), all derived
from a fixed seed — no external data. The vocabulary is Zipfian over a fixed
word list that includes stop words and stemmable families (compute/computing/
computer/...) so stemming, stop-word and skew paths are all exercised. A few
rows exceed 1,000,000 chars to exercise the oversize-skip rule
(reference jobs/Indexer.java:208).

Derived at ingest (ingest()):
  doc_id      = sha256(repo || '\\x00' || path || '\\x00' || commit)
  content_sha = sha256(content)   — the per-row invariant column
"""

from __future__ import annotations

import hashlib
import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

LANGS = ["py", "java", "js", "go", "md"]

# Stemmable families + neutral code-ish words + stop words (Zipf head).
_VOCAB = (
    ["the", "and", "of", "to", "is", "in", "that", "for", "with", "this"]  # stop head
    + ["compute", "computing", "computer", "computation", "computed"]
    + ["search", "searching", "searched", "engine", "engines"]
    + ["index", "indexing", "indexed", "relational", "operational"]
    + ["query", "queries", "running", "runner", "runs"]
    + ["spark", "shuffle", "partition", "broadcast", "executor", "driver"]
    + ["token", "posting", "ranker", "crawler", "graph", "vector", "matrix"]
    + ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "theta", "kappa"]
    + ["2024", "404", "007", "99", "x1", "foo", "bar", "baz", "qux"]
    + [f"ident{i}" for i in range(60)]
)

SOURCE_SCHEMA = StructType(
    [
        StructField("repo", StringType(), False),
        StructField("path", StringType(), False),
        StructField("commit", StringType(), False),
        StructField("lang", StringType(), False),
        StructField("content", StringType(), False),
    ]
)


def _zipf_choice(rng: random.Random, n: int) -> int:
    """Zipf(s=1.1)-ish index in [0, n) via inverse CDF on precomputed weights."""
    # rejection-free: use rng.random()^k trick — cheap approximate Zipf
    u = rng.random()
    return min(int(n * (u ** 2.2)), n - 1)


def generate_rows(n_docs: int, seed: int = 42, oversize_every: int = 0):
    """Yield (repo, path, commit, lang, content) tuples deterministically."""
    rng = random.Random(seed)
    nv = len(_VOCAB)
    for i in range(n_docs):
        repo = f"org/repo-{i % max(1, n_docs // 20):04d}"
        path = f"src/pkg{i % 7}/file_{i:06d}.{LANGS[i % len(LANGS)]}"
        commit = hashlib.sha1(f"{seed}:{i}".encode()).hexdigest()
        lang = LANGS[i % len(LANGS)]
        n_tokens = 30 + _zipf_choice(rng, 400)
        words = [
            _VOCAB[_zipf_choice(rng, nv)] for _ in range(n_tokens)
        ]
        # first "line" acts as the title (operators/docstats title_col)
        title_words = words[: min(6, len(words))]
        body = " ".join(words)
        content = " ".join(title_words) + "\n" + body
        if oversize_every and i % oversize_every == oversize_every - 1:
            content = content + " pad" * 400_000  # > 1,000,000 chars -> skipped
        yield (repo, path, commit, lang, content)


def make_corpus(
    spark: SparkSession,
    n_docs: int = 2000,
    seed: int = 42,
    oversize_every: int = 0,
    n_partitions: int | None = None,
) -> DataFrame:
    rows = list(generate_rows(n_docs, seed, oversize_every))
    df = spark.createDataFrame(rows, SOURCE_SCHEMA)
    if n_partitions:
        df = df.repartition(n_partitions)
    return df


def make_corpus_distributed(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    n_partitions: int = 128,
    synthetic_vocab: int = 20_000,
) -> DataFrame:
    """Large-scale deterministic corpus generated ON THE EXECUTORS (no
    driver-side row list): content tokens are picked from the fixed
    vocabulary via xxhash64-based Zipf-ish draws, all in JVM expressions.
    Same schema as make_corpus; used by the scaling benchmark where the
    driver-side generator would bottleneck."""
    from pyspark.sql import functions as F

    nv = len(_VOCAB)
    total_vocab = max(nv, synthetic_vocab)
    vocab = F.array(*[F.lit(w) for w in _VOCAB])
    df = spark.range(0, n_docs, 1, n_partitions).withColumnRenamed("id", "i")
    u = F.pmod(F.xxhash64(F.col("i") * 7919 + F.lit(seed)), 100_000) / 100_000.0
    n_tokens = (30 + F.floor(370 * F.pow(u, 2.2))).cast("int")

    def _word(j):
        # Zipf-ish index per position: floor(V * u^3); head indices hit the
        # curated vocabulary (stop words, stemmable families), the tail maps
        # to synthetic pure-alpha words (base-36 then digits->letters, so
        # they pass isWorthIndexing)
        uj = (
            F.pmod(F.xxhash64(F.col("i") * 1_000_003 + j + F.lit(seed * 17)), 1_000_000)
            / 1_000_000.0
        )
        idx = F.least(
            F.floor(total_vocab * F.pow(uj, 3.0)).cast("int"), F.lit(total_vocab - 1)
        )
        synth = F.concat(
            F.lit("q"),
            F.translate(F.conv(idx.cast("string"), 10, 36), "0123456789", "ghijklmnop"),
        )
        return F.when(idx < nv, F.element_at(vocab, idx + 1)).otherwise(synth)

    words = F.transform(F.sequence(F.lit(1), n_tokens), _word)
    body = F.array_join(words, " ")
    title = F.array_join(F.slice(words, 1, 6), " ")
    return df.select(
        F.concat(F.lit("org/repo-"), F.lpad((F.col("i") % 500).cast("string"), 4, "0")).alias("repo"),
        F.concat(F.lit("src/pkg"), (F.col("i") % 7).cast("string"), F.lit("/file_"), F.col("i").cast("string"), F.lit(".py")).alias("path"),
        F.sha1(F.concat(F.lit(str(seed) + ":"), F.col("i").cast("string"))).alias("commit"),
        F.element_at(F.array(*[F.lit(l) for l in LANGS]), (F.col("i") % len(LANGS)).cast("int") + 1).alias("lang"),
        F.concat(title, F.lit("\n"), body).alias("content"),
    )


def ingest(source: DataFrame) -> DataFrame:
    """Derive doc_id + content_sha (BASELINE input_hint invariants)."""
    return source.select(
        F.sha2(
            F.concat_ws("\x00", F.col("repo"), F.col("path"), F.col("commit")), 256
        ).alias("doc_id"),
        "repo",
        "path",
        "commit",
        "lang",
        "content",
        F.sha2(F.col("content"), 256).alias("content_sha"),
    )
