"""Anchor-text extraction and aggregation — the ranking signal the
reference extracts but never indexes.

The reference crawler parses every ``<a ...>inner</a>`` into
``Link(href, text)`` and cleans the inner text (jobs/Crawler.java:307-353:
``cleanAnchorText`` strips nested tags and collapses whitespace) — then
``extractAndAddLinks`` (jobs/Crawler.java:734-752) keeps only
``link.href`` for the crawl frontier and drops the text on the floor.
Web-scale engines aggregate exactly that text into the TARGET document's
index as a high-signal field (Brin & Page 1998 §2.2: anchors often
describe the target better than the target describes itself; BM25F
treats inbound anchor text as a document field — Zaragoza et al.,
CIKM'04). This module completes that pipeline Spark-first.

Corpus analog: on the code/markdown corpus, anchors are markdown links
``[anchor text](target-ref)`` — the md-lang twin of the crawler's
``A_TAG_RE`` — resolved to doc ids through the same module-map equi-join
the PageRank link extraction uses (operators/pagerank.resolve_links,
itself the analog of Crawler.java:422-491 URL normalization).

Scale shape (the 100-TB audit):
  - extraction is a pure map-side ``regexp_extract_all`` projection —
    zero shuffle, whole-stage codegen, no pandas UDF;
  - resolution is ONE equi-join against the corpus-sized module map
    (uniform ref keys; broadcast it when the map fits, as resolve_links
    documents);
  - the anchor-field index is ONE (dst, term) exchange with map-side
    partial counts.  In-degree skew (every page links the same hub)
    lands on the (dst, term) key — strictly finer than dst alone — and
    the count is a partial-agg sum, so hot targets combine map-side
    exactly like hot terms do under I10.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import text as T

# Markdown link: [inner text](ref).  Inner may be empty (the crawler keeps
# links whose cleaned text is ''); ref must be non-empty, no nesting.
MD_LINK_RE = r"\[([^\]]*)\]\(([^()\s]+)\)"

ANCHOR_K1 = 1.2  # same saturation constant the BM25 path uses


def clean_anchor_col(text_col):
    """cleanAnchorText twin (jobs/Crawler.java:319-325): strip nested
    tags, collapse whitespace, trim."""
    no_tags = F.regexp_replace(text_col, T.RE_HTML_TAGS, " ")
    return F.trim(F.regexp_replace(no_tags, T.RE_WS, " "))


def extract_anchor_pairs(
    docs: DataFrame,
    content_col: str = "content",
    src_col: str = "doc_id",
) -> DataFrame:
    """(src, ref, anchor_text): every markdown link with its cleaned
    anchor text, in document order — extractLinks (Crawler.java:328-353)
    done as ONE JVM-side projection: two regexp_extract_all passes over
    the same pattern (group 1 = text, group 2 = ref) zipped positionally.
    No shuffle; no Python."""
    texts = F.regexp_extract_all(F.col(content_col), F.lit(MD_LINK_RE), F.lit(1))
    refs = F.regexp_extract_all(F.col(content_col), F.lit(MD_LINK_RE), F.lit(2))
    pair = F.explode(F.arrays_zip(texts.alias("t"), refs.alias("r"))).alias("p")
    return docs.select(
        F.col(src_col).cast("string").alias("src"), pair
    ).select(
        "src",
        F.col("p.r").alias("ref"),
        clean_anchor_col(F.col("p.t")).alias("anchor_text"),
    )


def anchor_postings(
    pairs: DataFrame,
    module_map: DataFrame,
    broadcast_map: bool = False,
) -> DataFrame:
    """(doc_id, term, anchor_tf, n_srcs): the aggregated anchor FIELD of
    each target document — term frequency over ALL inbound anchor texts
    plus the number of distinct linking documents that contributed the
    term (the classic anchor-quality signal: many independent sources >
    one page repeating itself).

    module_map is (module, dst), as in pagerank.resolve_links; pass
    broadcast_map=True when it fits in the driver (at 100 TB it is
    corpus-sized — leave it a shuffle join).  Tokenization is the shared
    worth-filtered tokenizer (functions/text.py I2/I3 contract), so the
    anchor field speaks the same vocabulary as the body index."""
    mm = F.broadcast(module_map) if broadcast_map else module_map
    resolved = pairs.join(mm, pairs["ref"] == mm["module"]).select(
        "src", F.col("dst").cast("string").alias("doc_id"), "anchor_text"
    )
    toks = resolved.select(
        "src",
        "doc_id",
        F.explode(
            F.filter(
                T.tokens_col(F.col("anchor_text")),
                lambda x: (x != "") & T.is_worth_col(x),
            )
        ).alias("term"),
    )
    return toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).cast("int").alias("anchor_tf"),
        F.countDistinct("src").cast("int").alias("n_srcs"),
    )


def anchor_scores(
    anchor_idx: DataFrame,
    terms: list[str],
    n_docs: float,
    k1: float = ANCHOR_K1,
) -> DataFrame:
    """(doc_id, anchor_score): saturated anchor-field score for a bag of
    query terms — score = Σ_t ln(N/df_a(t)) · tf_a/(k1 + tf_a), with
    df_a = number of docs whose ANCHOR field contains t (anchor idf, not
    body idf: a term rare in anchors is a strong inbound signal even
    when common in bodies).  Map-side after one term-keyed df aggregate
    over the (tiny) query-term slice of the anchor index."""
    tlist = [t for t in terms if t]
    hit = anchor_idx.where(F.col("term").isin(tlist))
    df_a = hit.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df_a"))
    return (
        hit.join(F.broadcast(df_a), "term")
        .withColumn(
            "_contrib",
            F.log(F.lit(float(n_docs)) / F.col("df_a"))
            * (F.col("anchor_tf") / (F.lit(float(k1)) + F.col("anchor_tf"))),
        )
        .groupBy("doc_id")
        .agg(F.sum("_contrib").alias("anchor_score"))
    )
