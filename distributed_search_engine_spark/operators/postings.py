"""Inverted-index postings construction (logical ops I7-I12, SURVEY §2.2).

Reference semantics (jobs/Indexer.java:403-822):
  - 1-based position counter over the token stream, advancing even for
    rejected tokens (:453-460) — handled by posexplode over ALL tokens,
    then filtering worthy ones.
  - every worthy token emits (term, doc, pos, weight); non-stop tokens whose
    Porter stem differs ALSO emit (stem, doc, pos, weight) (:463-475).
  - per (term, doc): positions sorted ascending, tf = count,
    weighted_tf = sum(weights) (:485, 656, 692-696).
  - normalized_tf = 0.4 + 0.6 * weighted_tf / max_tf when both > 0 (:546,739).
  - per-term doc caps: 20,000 docs (5,000 for stop words), kept in
    weighted_tf-descending order; df and idf recomputed AFTER truncation
    (:17-20, 659-683, 785-810).
  - idf = ln(total_docs / df), 0 if either is 0 (:781-782).

Spark-first physical strategy (100 TB design):
  - Tokenize/explode entirely JVM-side (split/posexplode/filter): stays in
    whole-stage codegen, no Python per token.
  - Stemming: Python Porter stemmer applied ONCE to the distinct-term
    dictionary (a pandas UDF over ~1e6-1e8 distinct terms), then joined back.
    The dictionary join is salted-safe: the build-side (dictionary) is
    broadcast when small, else a shuffle join on `term` whose skew AQE splits.
    This avoids running Python over every posting occurrence.
  - Hot-term skew (O3 in SURVEY §4): the per-term cap window is two-phase —
    top-cap per (term, salt-bucket) first, then top-cap per term over the
    bounded survivors — so a stop word's postings never pile into a single
    task. Salt = pmod(xxhash64(doc_id), n_salts).
  - groupBy aggregations rely on Spark's map-side partial aggregation; no
    explicit combiner code needed (the reference hand-rolled this,
    jobs/Indexer.java:427-513).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import StringType

from ..functions import text as T
from ..functions.stemmer import stem_series
from ..functions.stopwords import STOP_WORDS
from .docstats import build_doc_stats, filter_indexable

# Per-term document caps (reference jobs/Indexer.java:17-20). The 500 MB /
# 50 MB byte caps were physical properties of the reference's string format
# and do not apply to columnar storage (SURVEY §7.3 item 7).
MAX_DOCS_PER_TERM = 20_000
MAX_DOCS_PER_STOP_TERM = 5_000
DEFAULT_SALTS = 32

stem_udf = F.pandas_udf(stem_series, StringType())


def occurrences(
    docs: DataFrame,
    doc_id_col: str = "doc_id",
    content_col: str = "content",
) -> DataFrame:
    """(doc_id, term, pos, weight) for every worthy token occurrence.

    Weight is 1.0 for all tokens in a plain-text/source-code corpus; the
    reference's 0.001 metadata weight (jobs/Indexer.java:1348,1365) applied
    only to HTML script/style content, which this corpus does not carry.
    The weight column is kept so weighted scoring machinery stays exact.
    """
    docs = filter_indexable(docs, content_col)
    toks = docs.select(
        F.col(doc_id_col).cast("string").alias("doc_id"),
        F.posexplode(T.tokens_col(F.col(content_col))).alias("pos0", "term"),
    )
    return toks.where(T.is_worth_col(F.col("term"))).select(
        "doc_id",
        "term",
        (F.col("pos0") + 1).alias("pos"),
        F.lit(1.0).alias("weight"),
    )


def build_term_dict(occ: DataFrame) -> DataFrame:
    """term_dict(term, stem, is_stop) — the broadcastable term dictionary.

    Mirrors the reference's stemToWords map built by a full index scan
    (frontend/SearchEngine.java:893-923), but built once at index time.
    Stop words are never stemmed (jobs/Indexer.java:469).
    """
    stop_lit = F.array(*[F.lit(w) for w in sorted(STOP_WORDS)])
    return (
        occ.select("term")
        .distinct()
        .withColumn("is_stop", F.array_contains(stop_lit, F.col("term")))
        .withColumn(
            "stem",
            F.when(F.col("is_stop"), F.col("term")).otherwise(stem_udf(F.col("term"))),
        )
    )


def with_stem_emissions(occ: DataFrame, term_dict: DataFrame) -> DataFrame:
    """Add the extra (stem, doc, pos) emissions for non-stop tokens whose
    stem differs (jobs/Indexer.java:463-475). Output carries is_stem_emit
    so scorers can distinguish raw hits from stem hits (Q5 dedup)."""
    joined = occ.join(F.broadcast(term_dict), "term")
    raw = joined.select(
        "term", "doc_id", "pos", "weight", F.lit(False).alias("is_stem_emit")
    )
    stems = joined.where(~F.col("is_stop") & (F.col("stem") != F.col("term"))).select(
        F.col("stem").alias("term"), "doc_id", "pos", "weight",
        F.lit(True).alias("is_stem_emit"),
    )
    return raw.unionByName(stems)


def aggregate_postings(emissions: DataFrame, doc_stats: DataFrame) -> DataFrame:
    """Per-(term, doc) posting rows with sorted positions and normalized TF.

    One shuffle on (term, doc_id) — doc_id spreads hot terms across
    partitions, so this aggregation is skew-safe by construction; only the
    later per-term window needs salting.
    """
    per_td = emissions.groupBy("term", "doc_id").agg(
        F.sort_array(F.collect_list(F.struct("pos", "weight"))).alias("pw"),
        F.count(F.lit(1)).cast("int").alias("tf"),
        F.sum("weight").alias("weighted_tf"),
    )
    per_td = per_td.select(
        "term",
        "doc_id",
        "tf",
        "weighted_tf",
        F.transform("pw", lambda s: s["pos"]).alias("positions"),
        F.transform("pw", lambda s: s["weight"].cast("float")).alias("weights"),
    )
    stats = doc_stats.select("doc_id", "doc_len", "max_tf")
    out = per_td.join(stats, "doc_id")
    return out.select(
        "term",
        "doc_id",
        "tf",
        "weighted_tf",
        F.when(
            (F.col("weighted_tf") > 0) & (F.col("max_tf") > 0),
            0.4 + 0.6 * F.col("weighted_tf") / F.col("max_tf"),
        ).otherwise(0.0).alias("normalized_tf"),
        F.col("doc_len"),
        "positions",
        "weights",
    )


def apply_caps(
    postings: DataFrame,
    term_dict: DataFrame,
    n_salts: int = DEFAULT_SALTS,
    max_docs: int = MAX_DOCS_PER_TERM,
    max_docs_stop: int = MAX_DOCS_PER_STOP_TERM,
) -> DataFrame:
    """I10: keep top-N docs per term by weighted_tf desc (ties: doc_id asc,
    a deterministic refinement of the reference's unspecified tie order).

    Two-phase to defuse hot-term skew: rank within (term, salt) first —
    bounding any single task to ~cap rows per term — then rank the
    survivors per term. Equivalent to a single global window because the
    global top-N per term is contained in the union of per-salt top-Ns.

    is_stop is evaluated directly against the stop-word set (not via
    term_dict, which holds only raw terms — stem-emitted terms like
    'comput' must survive this stage too).
    """
    stop_lit = F.array(*[F.lit(w) for w in sorted(STOP_WORDS)])
    p = postings.withColumn("is_stop", F.array_contains(stop_lit, F.col("term"))).withColumn(
        "cap",
        F.when(F.col("is_stop"), F.lit(max_docs_stop)).otherwise(F.lit(max_docs)),
    )
    salt = F.pmod(F.xxhash64("doc_id"), F.lit(n_salts))
    w_salt = Window.partitionBy("term", salt).orderBy(
        F.desc("weighted_tf"), F.asc("doc_id")
    )
    p = p.withColumn("rn1", F.row_number().over(w_salt)).where(F.col("rn1") <= F.col("cap"))
    w_term = Window.partitionBy("term").orderBy(F.desc("weighted_tf"), F.asc("doc_id"))
    p = p.withColumn("rn", F.row_number().over(w_term)).where(F.col("rn") <= F.col("cap"))
    return p.drop("rn1", "rn", "cap")


def build_term_stats(postings: DataFrame, total_docs: int) -> DataFrame:
    """I11: df + idf per term, computed AFTER caps (jobs/Indexer.java:807-810).

    idf = ln(total_docs / df); 0 when either side is 0. Also carries the
    BM25 idf ln((N - df + 0.5)/(df + 0.5) + 1) for the BM25 scorer (north
    star: k1=1.2, b=0.75 — Robertson-Sparck Jones idf).
    """
    n = F.lit(float(total_docs))
    return postings.groupBy("term", "is_stop").agg(
        F.count(F.lit(1)).cast("int").alias("df")
    ).select(
        "term",
        "df",
        "is_stop",
        F.when((n > 0) & (F.col("df") > 0), F.log(n / F.col("df")))
        .otherwise(0.0)
        .alias("idf"),
        F.log((n - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0).alias("idf_bm25"),
    )


def build_index(
    docs: DataFrame,
    doc_id_col: str = "doc_id",
    content_col: str = "content",
    with_stems: bool = True,
    n_salts: int = DEFAULT_SALTS,
) -> dict[str, DataFrame]:
    """Full logical index build: returns doc_stats, postings, term_stats,
    term_dict DataFrames (FIXTURES.md §4 schemas). Lazy — nothing runs until
    the caller writes/collects. Callers at scale should persist doc_stats
    (it is joined twice) and write postings partitioned by term hash
    (index/segments.py)."""
    doc_stats = build_doc_stats(docs, doc_id_col, content_col).persist()
    occ = occurrences(docs, doc_id_col, content_col)
    term_dict = build_term_dict(occ)
    emissions = (
        with_stem_emissions(occ, term_dict)
        if with_stems
        else occ.withColumn("is_stem_emit", F.lit(False))
    )
    postings = aggregate_postings(emissions, doc_stats)
    postings = apply_caps(postings, term_dict, n_salts=n_salts)
    total_docs = doc_stats.count()
    term_stats = build_term_stats(postings, total_docs)
    return {
        "doc_stats": doc_stats,
        "postings": postings.drop("is_stop"),
        "term_stats": term_stats,
        "term_dict": term_dict,
        "total_docs": total_docs,
    }
