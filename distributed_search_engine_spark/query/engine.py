"""Query pipeline (logical ops Q1-Q12, reference frontend/SearchEngine.java).

Two scorer modes (SURVEY §7.1):
  - "reference": exact reproduction of the reference chain —
    per-original-term dedup (first VALID expanded posting in expansion order
    wins; stop/zero-tf entries skipped for scoring but their positions still
    merged, SearchEngine.java:256-358), AND filter (:365-389), phrase x1.5
    (:391-431), PageRank blend score*(1+pr) (:576-584), all-terms-matched
    x4.0 / partial (0.3+0.7*ratio) / none x0.1 (:589-603), title boost
    (:679-799).
  - "bm25": BM25 (k1=1.2, b=0.75, Robertson idf) blended with PageRank as
    score*(1+pr) — the north-star benchmark scorer.

Spark-first: the expanded-terms set (a few dozen strings) is broadcast; the
postings join is an equi-join on `term` that Catalyst turns into a
broadcast-hash join against the (tiny) expansion table, so only matching
index partitions are read when postings are stored term-hash-partitioned
(index/segments.py provides the pruned reader). Everything after the first
join touches only candidate docs — a small DataFrame.

Deterministic tie-break: (score desc, doc_id asc); the reference leaves ties
unspecified (SearchEngine.java:616, HashMap order) — SURVEY §4 item 5.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.stemmer import porter_stem
from ..functions.stopwords import STOP_WORDS
from ..functions.text import tokenize_py

BM25_K1 = 1.2
BM25_B = 0.75

PRIORITY_ORIG = 0
PRIORITY_STEM = 1
PRIORITY_RELATED = 2


@dataclass
class SearchIndex:
    """Handles to the index DataFrames (FIXTURES.md §4 schemas).

    ``postings_for_terms`` (optional) is the pruned provider: given the
    query's lookup terms it returns only their posting rows (the
    segment-backed path, index/segments.read_postings_for_terms). When set,
    every query path scans ONLY the index partitions that can hold the
    terms instead of the whole postings table — the 100x-scale requirement
    for reference-mode queries. Rows it returns may carry idf/idf_bm25/
    is_stop already (segments store them); the term_stats join is then
    skipped."""

    postings: DataFrame | None
    term_stats: DataFrame
    doc_stats: DataFrame
    term_dict: DataFrame
    total_docs: int
    ranks: DataFrame | None = None  # (doc_id, rank)
    postings_for_terms: object | None = None  # Callable[[list[str]], DataFrame]
    _avgdl: float | None = field(default=None, repr=False)
    # opt-in driver-side stem -> [terms] map: saves one Spark job per query
    # on the related-words lookup. Only cache when the vocabulary fits the
    # driver (the reference holds its whole term dictionary in frontend
    # memory, SearchEngine.java:893-923 — same tradeoff); leave None at
    # web scale and the lookup stays a pruned distributed scan.
    _stem_map: dict | None = field(default=None, repr=False)

    def cache_term_dict(self) -> "SearchIndex":
        """Collect the (stem -> terms) map once for repeated-query
        workloads (bench / interactive frontends)."""
        out: dict[str, list[str]] = {}
        for r in self.term_dict.select("stem", "term").collect():
            out.setdefault(r["stem"], []).append(r["term"])
        self._stem_map = out
        return self

    def lookup_postings(self, terms: list[str]) -> DataFrame:
        if self.postings_for_terms is not None:
            return self.postings_for_terms(terms)
        if self.postings is None:
            raise ValueError(
                "SearchIndex needs either a postings DataFrame or a "
                "postings_for_terms provider"
            )
        return self.postings.where(F.col("term").isin(terms))

    @property
    def avgdl(self) -> float:
        if self._avgdl is None:
            row = self.doc_stats.agg(F.avg("doc_len").alias("a")).collect()[0]
            self._avgdl = float(row["a"] or 0.0)
        return self._avgdl


def tokenize_query(query: str) -> list[str]:
    """Q1 (SearchEngine.java:652-673): same strip/lower/split as indexing,
    but NO worth-indexing filter — 1-char query tokens survive."""
    return tokenize_py(query)


def expand_terms(
    search_terms: list[str], related_words_by_stem: dict[str, list[str]]
) -> list[tuple[str, str, int]]:
    """Q3 expansion: [(expanded_term, original_term, priority)].

    Faithful to SearchEngine.java:129-181:
    - the expanded list is [orig, stem?, related...] per original term, in
      query order; the scorer processes it in order and the FIRST occurrence
      of an expanded term is the one that counts -> priority = index of
      first occurrence in that list.
    - expandedToOriginal is a put()-built map: a LATER original term's
      expansion overwrites an earlier mapping (last writer wins).
    - related words come from a HashSet in the reference (unordered); we
      order them lexicographically — the only deterministic refinement.
    """
    expanded_list: list[str] = []
    exp_to_orig: dict[str, str] = {}
    for term in search_terms:
        group = [term]
        stem = porter_stem(term)
        if stem and stem != term and term not in STOP_WORDS:
            group.append(stem)
            group += [
                rel
                for rel in sorted(related_words_by_stem.get(stem, []))
                if rel != term and rel != stem
            ]
        expanded_list += group
        for t in group:
            exp_to_orig[t] = term
    first_idx: dict[str, int] = {}
    for i, t in enumerate(expanded_list):
        first_idx.setdefault(t, i)
    return [(t, exp_to_orig[t], i) for t, i in first_idx.items()]


def matched_boost_pairs(search_terms: list[str]) -> list[tuple[str, str]]:
    """Q10 term sets: for each original term, {term, stem(term)} — stem
    fetched even for stop words (SearchEngine.java:500-504), independent of
    the Q3 expansion. [(lookup_term, original_term)]."""
    pairs: list[tuple[str, str]] = []
    seen: set[str] = set()
    for term in search_terms:
        if term in seen:
            continue
        seen.add(term)
        pairs.append((term, term))
        stem = porter_stem(term)
        if stem and stem != term:
            pairs.append((stem, term))
    return pairs


def _related_words(index: SearchIndex, stems: set[str]) -> dict[str, list[str]]:
    """stemToWords lookup (SearchEngine.java:893-923) — a pruned scan of the
    broadcastable term dictionary, collected (bounded by vocabulary size per
    stem, tiny)."""
    if not stems:
        return {}
    if index._stem_map is not None:
        return {s: index._stem_map.get(s, []) for s in stems}
    rows = (
        index.term_dict.where(F.col("stem").isin(list(stems)))
        .select("stem", "term")
        .collect()
    )
    out: dict[str, list[str]] = {}
    for r in rows:
        out.setdefault(r["stem"], []).append(r["term"])
    return out


def _candidates(
    spark: SparkSession, index: SearchIndex, expansion: list[tuple[str, str, int]]
) -> DataFrame:
    """Postings x expansion join: one row per (expanded term, doc) hit."""
    exp_df = spark.createDataFrame(expansion, "term string, orig string, priority int")
    base = index.lookup_postings([t for t, _, _ in expansion])
    out = base.join(F.broadcast(exp_df), "term")
    if "idf" not in base.columns:
        out = out.join(
            F.broadcast(index.term_stats.select("term", "idf", "idf_bm25", "is_stop")),
            "term",
        )
    return out


def title_boost_py(title: str, search_terms: list[str]) -> float:
    """Q11 (SearchEngine.java:679-799) — exact port of getTitleBoost."""
    if not title or not search_terms:
        return 1.0
    title_tokens = tokenize_py(title)
    if not title_tokens:
        return 1.0
    title_stems = [porter_stem(t) for t in title_tokens]
    term_positions: dict[str, list[int]] = {}
    for term in search_terms:
        positions = [j for j, tt in enumerate(title_tokens) if tt == term]
        stem = porter_stem(term)
        if stem:
            for j, ts in enumerate(title_stems):
                if ts == stem and j not in positions:
                    positions.append(j)
        if positions:
            term_positions[term] = positions
    if not term_positions:
        return 1.0
    matching = len(term_positions)
    n = len(search_terms)

    def in_order() -> bool:
        if n < 2:
            return False
        earliest = []
        for term in search_terms:
            pos = term_positions.get(term)
            if not pos:
                return False
            earliest.append(min(pos))
        return all(earliest[i] < earliest[i + 1] for i in range(len(earliest) - 1))

    if n == 1 and matching == 1:
        pos = term_positions.get(search_terms[0], [])
        if pos:
            if 0 in pos:
                return 3.5
            if any(p < 3 for p in pos):
                return 2.5
            return 2.0
    if n > 1 and matching == n:
        ordered = in_order()
        all_early = all(
            any(p < 4 for p in term_positions.get(t, [])) for t in search_terms
        )
        if ordered and all_early:
            return 4.0
        if ordered:
            return 3.0
        if all_early:
            return 2.5
        return 2.0
    base = 1.0 + 0.2 * matching
    if in_order():
        return base * (1.85 if matching == n else 1.30)
    return base


def search(
    spark: SparkSession,
    index: SearchIndex,
    query: str,
    k: int | None = 200,
    mode: str = "reference",
    all_matched_boost: bool = True,
    use_title_boost: bool = True,
) -> DataFrame:
    """Returns (doc_id, score, tfidf, pagerank, title) top-k, deterministic.

    ``k=None`` returns the FULL scored frame with no ordering/limit node —
    for consumers that re-rank or hash order-insensitively (the oracle
    gate, the hybrid-RRF pool): no million-row TakeOrdered ever enters
    the plan.

    ``all_matched_boost=False`` reproduces the README-era formula (golden
    scores 1.8/1.2 instead of 7.2/4.8 — SURVEY §5 discrepancy note).
    """
    search_terms = tokenize_query(query)
    empty = spark.createDataFrame(
        [], "doc_id string, score double, tfidf double, pagerank double, title string"
    )
    if not search_terms:
        return empty
    # Q2: single-term stop-word short-circuit (SearchEngine.java:117-127)
    if len(search_terms) == 1 and search_terms[0] in STOP_WORDS:
        return empty

    stems = {
        porter_stem(t)
        for t in search_terms
        if t not in STOP_WORDS and porter_stem(t) != t
    }
    expansion = expand_terms(search_terms, _related_words(index, stems))
    cand = _candidates(spark, index, expansion)

    if mode == "bm25":
        return _score_bm25(spark, index, cand, search_terms, k)

    # ---- reference mode ----
    n_terms = len(search_terms)
    distinct_terms = list(dict.fromkeys(search_terms))

    # Q5: first VALID expanded posting per (doc, orig) contributes tfidf;
    # Q6: positions merged across ALL expanded postings (incl. stop entries).
    valid = (~F.col("is_stop")) & (F.col("normalized_tf") > 0)
    per_doc_orig = cand.groupBy("doc_id", "orig").agg(
        F.min(
            F.when(
                valid,
                F.struct(
                    F.col("priority"), F.col("term"),
                    (F.col("normalized_tf") * F.col("idf")).alias("contrib"),
                ),
            )
        ).alias("best"),
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("positions")))).alias("positions"),
    )
    per_doc_orig = per_doc_orig.select(
        "doc_id", "orig", "positions", F.col("best.contrib").alias("contrib")
    )

    agg = per_doc_orig.groupBy("doc_id").agg(
        F.sum("contrib").alias("tfidf"),
        F.count(F.when(F.size("positions") > 0, 1)).alias("terms_with_pos"),
        F.map_from_entries(F.collect_list(F.struct("orig", "positions"))).alias("posmap"),
    )
    # docs enter tfidfSums only via a valid contribution
    agg = agg.where(F.col("tfidf").isNotNull())

    if n_terms > 1:
        # Q7 AND filter: every original term must have positions in the doc
        agg = agg.where(F.col("terms_with_pos") == len(distinct_terms))
        # Q8 phrase boost: every adjacent pair adjacent somewhere in the doc
        pair_checks = [
            F.arrays_overlap(
                F.transform(F.col("posmap")[w1], lambda p: p + 1),
                F.col("posmap")[w2],
            )
            for w1, w2 in zip(search_terms, search_terms[1:])
        ]
        phrase = pair_checks[0]
        for pc in pair_checks[1:]:
            phrase = phrase & pc
        agg = agg.withColumn(
            "tfidf", F.when(phrase, F.col("tfidf") * 1.5).otherwise(F.col("tfidf"))
        )

    # Q9: PageRank blend
    ranks = index.ranks
    if ranks is not None:
        agg = agg.join(ranks.select("doc_id", "rank"), "doc_id", "left")
    else:
        agg = agg.withColumn("rank", F.lit(None).cast("double"))
    agg = agg.withColumn("pagerank", F.coalesce(F.col("rank"), F.lit(0.0)))
    agg = agg.withColumn("score", F.col("tfidf") * (1.0 + F.col("pagerank")))

    # Q10: matched-terms boost — counts per-original-term hits in the raw or
    # stem postings only (NOT related words; SearchEngine.java:495-573).
    if n_terms > 1 and all_matched_boost:
        boost_pairs = matched_boost_pairs(search_terms)
        pairs_df = spark.createDataFrame(boost_pairs, "term string, orig string")
        matched = (
            index.lookup_postings([t for t, _ in boost_pairs])
            .select("term", "doc_id")
            .join(F.broadcast(pairs_df), "term")
            .select("doc_id", "orig")
            .distinct()
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("matched"))
        )
        agg = agg.join(matched, "doc_id", "left").withColumn(
            "matched", F.coalesce(F.col("matched"), F.lit(0))
        )
        ratio = F.col("matched") / F.lit(float(n_terms))
        agg = agg.withColumn(
            "score",
            F.when(F.col("matched") == n_terms, F.col("score") * 4.0)
            .when(F.col("matched") > 0, F.col("score") * (0.3 + 0.7 * ratio))
            .otherwise(F.col("score") * 0.1),
        )

    # Q11: title boost (pandas UDF over the small candidate set)
    agg = agg.join(index.doc_stats.select("doc_id", "title"), "doc_id", "left")
    if use_title_boost:
        import pandas as pd
        from pyspark.sql.types import DoubleType

        terms_closure = list(search_terms)

        def _tboost(titles):
            return titles.map(lambda t: title_boost_py(t or "", terms_closure))

        tboost = F.pandas_udf(_tboost, DoubleType())

        agg = agg.withColumn("tb", tboost(F.col("title"))).withColumn(
            "score",
            F.when(F.col("tb") > 1.0, F.col("score") * F.col("tb")).otherwise(
                F.col("score")
            ),
        )

    # Q12: deterministic top-k (k=None -> full frame, no sort node)
    out = agg.select("doc_id", "score", "tfidf", "pagerank", "title")
    if k is None:
        return out
    return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def search_bm25_batch(
    spark: SparkSession,
    index: SearchIndex,
    queries: list[str],
    k: int = 10,
) -> DataFrame:
    """(query, doc_id, score, rank): BM25 top-k for a whole query SET in
    ONE Spark job — the batch-throughput form the reference cannot express
    (its frontend scores one query per HTTP request, SearchEngine.java:66).

    Plan shape: every query's expansion rows carry a query column; the
    postings table is joined ONCE against the broadcast union of all
    expansions; per-(query, doc, orig) dedup and per-(query, doc) summation
    are ordinary partial-aggregated groupBys; top-k is a window PARTITIONED
    by query (bounded per query — never global). Ranking uses the
    6dp-ROUNDED score (ties -> doc_id asc): sums of doubles are
    order-sensitive in the last ulp, so an unrounded sort could rank
    near-ties differently run to run.

    Queries that tokenize to nothing or to a lone stop word contribute no
    rows (Q2 short-circuit)."""
    rows: list[tuple[str, str, str, int]] = []
    all_stems: set[str] = set()
    parsed: list[tuple[str, list[str]]] = []
    for q in queries:
        terms = tokenize_query(q)
        if not terms or (len(terms) == 1 and terms[0] in STOP_WORDS):
            continue
        parsed.append((q, terms))
        all_stems |= {
            porter_stem(t) for t in terms
            if t not in STOP_WORDS and porter_stem(t) != t
        }
    if not parsed:
        return spark.createDataFrame(
            [], "query string, doc_id string, score double, rank int"
        )
    related = _related_words(index, all_stems)
    for q, terms in parsed:
        for term, orig, priority in expand_terms(terms, related):
            rows.append((q, term, orig, priority))
    exp_df = spark.createDataFrame(
        rows, "query string, term string, orig string, priority int"
    )
    base = index.lookup_postings(sorted({r[1] for r in rows}))
    cand = base.join(F.broadcast(exp_df), "term")
    if "idf_bm25" not in base.columns:
        cand = cand.join(
            F.broadcast(index.term_stats.select("term", "idf_bm25")), "term"
        )
    avgdl = index.avgdl or 1.0
    tf = F.col("best.tf")
    dl = F.col("best.doc_len")
    denom = tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / F.lit(avgdl))
    per_doc_orig = cand.groupBy("query", "doc_id", "orig").agg(
        F.min(
            F.struct(
                F.col("priority"), F.col("term"),
                F.col("tf"), F.col("doc_len"), F.col("idf_bm25"),
            )
        ).alias("best")
    )
    scored = per_doc_orig.select(
        "query",
        "doc_id",
        (F.col("best.idf_bm25") * tf * (BM25_K1 + 1.0) / denom).alias("contrib"),
    )
    agg = scored.groupBy("query", "doc_id").agg(
        F.round(F.sum("contrib"), 6).alias("score")
    )
    w = Window.partitionBy("query").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        agg.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query", "doc_id", "score", "rank")
    )


def search_reference_batch(
    spark: SparkSession,
    index: SearchIndex,
    queries: list[str],
    k: int | None = None,
    all_matched_boost: bool = True,
    use_title_boost: bool = True,
) -> DataFrame:
    """(query, doc_id, score, tfidf, pagerank, title[, rank]): the FULL
    reference chain Q1-Q12 (expansion, per-orig dedup, position merge, AND
    filter, phrase x1.5, PageRank blend, matched-terms boost, title boost)
    for a whole query SET in ONE Spark job — per-query hash-equal to
    ``search(mode="reference")`` (pytest-asserted), at batch cost.

    Plan shape mirrors ``search_bm25_batch``: every query's expansion rows
    carry a query column; the postings table is joined ONCE against the
    broadcast union of all expansions; the AND filter / phrase pairs /
    matched-boost sets become tiny broadcast per-query metadata tables;
    every groupBy and window is keyed (or partitioned) by query — bounded
    per query, never global. The per-query driver loop this replaces costs
    one multi-job chain per query (~2.7 s/query measured at sf0.1);
    the batch form amortizes the whole set over one chain.

    ``k=None`` returns full scored frames (the gate/bench form); with k,
    rank is assigned per query over the 6dp-ROUNDED score (ties ->
    doc_id asc), the deterministic refinement batch BM25 already uses.

    Queries that tokenize to nothing or to a lone stop word contribute no
    rows (Q2 short-circuit, SearchEngine.java:117-127)."""
    import pandas as pd
    from pyspark.sql.types import DoubleType

    parsed: list[tuple[str, list[str]]] = []
    all_stems: set[str] = set()
    for q in dict.fromkeys(queries):  # dup query strings would fan out joins
        terms = tokenize_query(q)
        if not terms or (len(terms) == 1 and terms[0] in STOP_WORDS):
            continue
        parsed.append((q, terms))
        all_stems |= {
            porter_stem(t) for t in terms
            if t not in STOP_WORDS and porter_stem(t) != t
        }
    empty_schema = (
        "query string, doc_id string, score double, tfidf double, "
        "pagerank double, title string"
        + (", rank int" if k is not None else "")
    )
    if not parsed:
        return spark.createDataFrame([], empty_schema)

    related = _related_words(index, all_stems)
    exp_rows: list[tuple[str, str, str, int]] = []
    meta_rows: list[tuple[str, int, int, bool]] = []
    pair_rows: list[tuple[str, str, str]] = []
    boost_rows: list[tuple[str, str, str]] = []
    terms_by_query: dict[str, list[str]] = {}
    for q, terms in parsed:
        terms_by_query[q] = terms
        for term, orig, priority in expand_terms(terms, related):
            exp_rows.append((q, term, orig, priority))
        n_terms = len(terms)
        n_distinct = len(dict.fromkeys(terms))
        meta_rows.append((q, n_terms, n_distinct, n_terms > 1))
        if n_terms > 1:
            pair_rows += [(q, w1, w2) for w1, w2 in zip(terms, terms[1:])]
            if all_matched_boost:
                boost_rows += [
                    (q, t, o) for t, o in matched_boost_pairs(terms)
                ]

    exp_df = spark.createDataFrame(
        exp_rows, "query string, term string, orig string, priority int"
    )
    qmeta = spark.createDataFrame(
        meta_rows, "query string, n_terms int, n_distinct int, multi boolean"
    )

    base = index.lookup_postings(sorted({r[1] for r in exp_rows}))
    cand = base.join(F.broadcast(exp_df), "term")
    if "idf" not in base.columns:
        cand = cand.join(
            F.broadcast(
                index.term_stats.select("term", "idf", "idf_bm25", "is_stop")
            ),
            "term",
        )

    # Q5 first-valid-expansion dedup + Q6 position merge, per (query, doc, orig)
    valid = (~F.col("is_stop")) & (F.col("normalized_tf") > 0)
    per_doc_orig = cand.groupBy("query", "doc_id", "orig").agg(
        F.min(
            F.when(
                valid,
                F.struct(
                    F.col("priority"), F.col("term"),
                    (F.col("normalized_tf") * F.col("idf")).alias("contrib"),
                ),
            )
        ).alias("best"),
        F.array_sort(
            F.array_distinct(F.flatten(F.collect_list("positions")))
        ).alias("positions"),
    )
    agg = per_doc_orig.groupBy("query", "doc_id").agg(
        F.sum("best.contrib").alias("tfidf"),
        F.count(F.when(F.size("positions") > 0, 1)).alias("terms_with_pos"),
        F.map_from_entries(
            F.collect_list(F.struct("orig", "positions"))
        ).alias("posmap"),
    )
    agg = agg.where(F.col("tfidf").isNotNull()).join(
        F.broadcast(qmeta), "query"
    )
    # Q7 AND filter (multi-term queries only)
    agg = agg.where(
        (~F.col("multi")) | (F.col("terms_with_pos") == F.col("n_distinct"))
    )
    # Q8 phrase x1.5: every adjacent pair adjacent somewhere in the doc
    if pair_rows:
        pairs_df = spark.createDataFrame(
            pair_rows, "query string, w1 string, w2 string"
        )
        ph = (
            agg.select("query", "doc_id", "posmap")
            .join(F.broadcast(pairs_df), "query")
            .select(
                "query",
                "doc_id",
                F.arrays_overlap(
                    F.transform(
                        F.element_at(F.col("posmap"), F.col("w1")),
                        lambda p: p + 1,
                    ),
                    F.element_at(F.col("posmap"), F.col("w2")),
                ).alias("adj"),
            )
            .groupBy("query", "doc_id")
            .agg(F.bool_and("adj").alias("phrase"))
        )
        agg = agg.join(ph, ["query", "doc_id"], "left").withColumn(
            "tfidf",
            F.when(
                F.col("multi") & F.coalesce(F.col("phrase"), F.lit(False)),
                F.col("tfidf") * 1.5,
            ).otherwise(F.col("tfidf")),
        )
    # Q9 PageRank blend
    ranks = index.ranks
    if ranks is not None:
        agg = agg.join(ranks.select("doc_id", "rank"), "doc_id", "left")
    else:
        agg = agg.withColumn("rank", F.lit(None).cast("double"))
    agg = agg.withColumn(
        "pagerank", F.coalesce(F.col("rank"), F.lit(0.0))
    ).withColumn("score", F.col("tfidf") * (1.0 + F.col("pagerank")))
    # Q10 matched-terms boost (multi-term queries only; raw/stem sets)
    if boost_rows:
        bp_df = spark.createDataFrame(
            boost_rows, "query string, term string, orig string"
        )
        matched = (
            index.lookup_postings(sorted({r[1] for r in boost_rows}))
            .select("term", "doc_id")
            .join(F.broadcast(bp_df), "term")
            .select("query", "doc_id", "orig")
            .distinct()
            .groupBy("query", "doc_id")
            .agg(F.count(F.lit(1)).alias("matched"))
        )
        agg = agg.join(matched, ["query", "doc_id"], "left").withColumn(
            "matched", F.coalesce(F.col("matched"), F.lit(0))
        )
        ratio = F.col("matched") / F.col("n_terms").cast("double")
        agg = agg.withColumn(
            "score",
            F.when(~F.col("multi"), F.col("score"))
            .when(F.col("matched") == F.col("n_terms"), F.col("score") * 4.0)
            .when(F.col("matched") > 0, F.col("score") * (0.3 + 0.7 * ratio))
            .otherwise(F.col("score") * 0.1),
        )
    # Q11 title boost (pandas UDF keyed by the query column)
    agg = agg.join(index.doc_stats.select("doc_id", "title"), "doc_id", "left")
    if use_title_boost:
        tbq = dict(terms_by_query)

        # no type hints: `pd` is function-local, so postponed-evaluation
        # string annotations would not resolve in pandas_udf's inference
        def _tboost(qs, titles):
            return pd.Series(
                [
                    title_boost_py(t or "", tbq.get(q, []))
                    for q, t in zip(qs, titles)
                ]
            )

        tb = F.pandas_udf(_tboost, DoubleType())
        agg = agg.withColumn("tb", tb(F.col("query"), F.col("title"))).withColumn(
            "score",
            F.when(F.col("tb") > 1.0, F.col("score") * F.col("tb")).otherwise(
                F.col("score")
            ),
        )
    out = agg.select("query", "doc_id", "score", "tfidf", "pagerank", "title")
    if k is None:
        return out
    # Q12 per-query top-k over the 6dp-rounded score (deterministic)
    w = Window.partitionBy("query").orderBy(
        F.desc(F.round("score", 6)), F.asc("doc_id")
    )
    return (
        out.withColumn("rank", F.row_number().over(w).cast("int"))
        .where(F.col("rank") <= k)
    )


def _score_bm25(
    spark: SparkSession,
    index: SearchIndex,
    cand: DataFrame,
    search_terms: list[str],
    k: int | None,
) -> DataFrame:
    """BM25 (k1=1.2, b=0.75) x (1 + PageRank), per-original-term dedup by
    expansion priority (raw posting preferred over stem, like reference)."""
    avgdl = index.avgdl or 1.0
    tf = F.col("best.tf")
    dl = F.col("best.doc_len")
    denom = tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / F.lit(avgdl))
    per_doc_orig = cand.groupBy("doc_id", "orig").agg(
        F.min(
            F.struct(
                F.col("priority"), F.col("term"),
                F.col("tf"), F.col("doc_len"), F.col("idf_bm25"),
            )
        ).alias("best")
    )
    scored = per_doc_orig.select(
        "doc_id",
        (F.col("best.idf_bm25") * tf * (BM25_K1 + 1.0) / denom).alias("contrib"),
    )
    agg = scored.groupBy("doc_id").agg(F.sum("contrib").alias("tfidf"))
    ranks = index.ranks
    if ranks is not None:
        agg = agg.join(ranks.select("doc_id", "rank"), "doc_id", "left")
    else:
        agg = agg.withColumn("rank", F.lit(None).cast("double"))
    agg = (
        agg.withColumn("pagerank", F.coalesce(F.col("rank"), F.lit(0.0)))
        .withColumn("score", F.col("tfidf") * (1.0 + F.col("pagerank")))
        .join(index.doc_stats.select("doc_id", "title"), "doc_id", "left")
    )
    out = agg.select("doc_id", "score", "tfidf", "pagerank", "title")
    if k is None:
        return out
    return out.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def more_like_this(
    index: SearchIndex, doc_id: str, k: int = 10, materialize: bool = True
) -> DataFrame:
    """Doc-to-doc "more like this": cosine similarity in tf-idf term
    space, computed THROUGH the inverted index (no doc-vector
    materialization).

    weight(term, doc) = normalized_tf * idf (the reference's tf-idf
    weighting, jobs/Indexer.java normalized_tf + ln(N/df) idf); score =
    cos(w_q, w_d) over the shared-term dot product.

    Plan shape (scale path):
      - the query doc's weights are a broadcast (bounded by one doc's
        term count), so the candidate scan is postings ⋈ broadcast —
        only rows whose term appears in the query doc survive the scan;
      - per-doc dot + norm are groupBy sums (map-side partials);
      - top-k is an ordered limit (TakeOrderedAndProject, no global
        sort), rank assigned over the k survivors only.
    Scores are rounded to 6dp BEFORE ranking so the ordering is
    reproducible across engines (ties then break on doc_id asc).
    """
    # w feeds three subtrees (norms, qw, dots) — persist it for the
    # query's duration or the postings x term_stats join executes three
    # times (the oracle twin MATERIALIZEs the same CTEs). The k-row
    # result is materialized eagerly so the cache can be released
    # before returning.
    w = (
        index.postings.join(index.term_stats.select("term", "idf"), "term")
        .select(
            "term",
            "doc_id",
            (F.col("normalized_tf") * F.col("idf")).alias("wt"),
        )
        .persist()
    )
    try:
        norms = w.groupBy("doc_id").agg(
            F.sqrt(F.sum(F.col("wt") * F.col("wt"))).alias("nrm")
        )
        qw = w.where(F.col("doc_id") == doc_id).select(
            "term", F.col("wt").alias("qwt")
        )
        qn = norms.where(F.col("doc_id") == doc_id).select(
            F.col("nrm").alias("qnrm")
        )
        dots = (
            w.join(F.broadcast(qw), "term")
            .where(F.col("doc_id") != doc_id)
            .groupBy("doc_id")
            .agg(F.sum(F.col("wt") * F.col("qwt")).alias("dot"))
        )
        scored = (
            dots.join(norms, "doc_id")
            .crossJoin(F.broadcast(qn))
            .select(
                "doc_id",
                F.round(
                    F.col("dot") / (F.col("nrm") * F.col("qnrm")), 6
                ).alias("score"),
            )
        )
        top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        rank_w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
        out = top.withColumn("rank", F.row_number().over(rank_w).cast("int"))
        if not materialize:
            # lazy form for plan inspection/composition — caller owns the
            # persisted w lifetime implications (tests only)
            return out
        return out.localCheckpoint(eager=True)
    finally:
        if materialize:
            w.unpersist()


def build_forward_index(postings: DataFrame) -> DataFrame:
    """(doc_id, terms) forward index — the doc -> term-list mirror of the
    postings. One groupBy; persist partitioned by doc_id so per-doc
    lookups (more_like_this_pruned's first step) are pruned point reads,
    exactly as the term segments serve per-term lookups."""
    return postings.groupBy("doc_id").agg(
        F.array_sort(F.collect_set("term")).alias("terms")
    )


def tfidf_doc_norms(postings: DataFrame, term_stats: DataFrame) -> DataFrame:
    """(doc_id, nrm): L2 norm of each doc's tf-idf weight vector —
    precomputed ONCE per index build (like doc_stats) so per-query paths
    never re-scan the whole postings for normalization."""
    w = postings.join(term_stats.select("term", "idf"), "term").select(
        "doc_id", (F.col("normalized_tf") * F.col("idf")).alias("wt")
    )
    return w.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("wt") * F.col("wt"))).alias("nrm")
    )


def more_like_this_pruned(
    index: SearchIndex,
    doc_id: str,
    forward: DataFrame,
    doc_norms: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Scale-path more_like_this: identical output to more_like_this
    (pytest-gated equality), but no full-postings scan at query time —

      1. the query doc's term list comes from the FORWARD index (a
         pruned per-doc lookup, collected: one doc's vocabulary);
      2. candidate postings come through index.lookup_postings(terms) —
         the same partition-pruned segment provider every other scorer
         mode uses;
      3. doc norms come from the precomputed tfidf_doc_norms
         materialization (amortized across queries, like doc_stats).

    Per-query work is proportional to the query doc's posting lists,
    not the corpus.
    """
    terms = [
        r["term"]
        for r in forward.where(F.col("doc_id") == doc_id)
        .select(F.explode("terms").alias("term"))
        .collect()
    ]
    if not terms:
        return doc_norms.select(
            F.col("doc_id"), F.lit(0.0).alias("score"), F.lit(0).alias("rank")
        ).limit(0)
    p = index.lookup_postings(terms)
    if "idf" not in p.columns:
        p = p.join(index.term_stats.select("term", "idf"), "term")
    w = p.select(
        "term", "doc_id", (F.col("normalized_tf") * F.col("idf")).alias("wt")
    )
    qw = w.where(F.col("doc_id") == doc_id).select(
        "term", F.col("wt").alias("qwt")
    )
    qn = doc_norms.where(F.col("doc_id") == doc_id).select(
        F.col("nrm").alias("qnrm")
    )
    dots = (
        w.join(F.broadcast(qw), "term")
        .where(F.col("doc_id") != doc_id)
        .groupBy("doc_id")
        .agg(F.sum(F.col("wt") * F.col("qwt")).alias("dot"))
    )
    scored = (
        dots.join(doc_norms, "doc_id")
        .crossJoin(F.broadcast(qn))
        .select(
            "doc_id",
            F.round(F.col("dot") / (F.col("nrm") * F.col("qnrm")), 6).alias(
                "score"
            ),
        )
    )
    top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    rank_w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(rank_w).cast("int"))


def hybrid_rrf_topk(
    spark: SparkSession,
    sidx: "SearchIndex",
    query_text: str,
    emb: DataFrame,
    query_vec_id: int,
    k: int = 10,
    pool: int = 100,
    rrf_k: int = 60,
) -> DataFrame:
    """(doc_id, lex_rank, ann_rank, rrf, rank): hybrid lexical+vector
    retrieval via reciprocal-rank fusion (Cormack, Clarke & Buettcher
    SIGIR'09): rrf = sum over lists of 1/(rrf_k + rank), over the UNION
    of the BM25 top-``pool`` and the embedding-cosine top-``pool``
    (absent-from-a-list contributes 0; absent rank reported as 0).

    The modern search stack in one plan: both retrievers are the
    existing gated operators (BM25 through the inverted index, cosine
    through the broadcast-query ANN scan), the fusion is one
    ``pool``-bounded full-outer join + ordered-limit top-k — nothing in
    the fusion stage scales with corpus size, so the hybrid costs
    max(retriever costs) at 100 TB. Ranks on BOTH engines are assigned
    over 6dp-rounded scores (deterministic cross-engine order)."""
    from ..operators.similarity import ann_bruteforce_topk

    # Lexical arm, pool-bounded: k=None keeps the scorer's plan free of
    # any global sort; the 6dp-rounded (score, doc_id) order is TOTAL
    # (doc_id distinct), so TakeOrdered(limit=pool) selects exactly the
    # rows a global rank <= pool would, and row_number over those <= pool
    # survivors (the safe k-bounded-window-after-limit pattern) assigns
    # the same ranks — no million-row TakeOrdered, no unpartitioned
    # window over an unbounded input.
    lex = search(spark, sidx, query_text, k=None, mode="bm25").select(
        "doc_id", F.round("score", 6).alias("_s")
    )
    wl = Window.orderBy(F.desc("_s"), F.asc("doc_id"))
    lexr = (
        lex.orderBy(F.desc("_s"), F.asc("doc_id"))
        .limit(pool)
        .withColumn("lex_rank", F.row_number().over(wl))
        .select("doc_id", "lex_rank")
    )
    annr = ann_bruteforce_topk(emb, query_id=query_vec_id, k=pool).select(
        F.col("id").cast("string").alias("doc_id"),
        F.col("rank").alias("ann_rank"),
    )
    fused = lexr.join(annr, "doc_id", "full_outer").select(
        "doc_id",
        F.coalesce("lex_rank", F.lit(0)).cast("int").alias("lex_rank"),
        F.coalesce("ann_rank", F.lit(0)).cast("int").alias("ann_rank"),
    )
    rrf = F.round(
        F.when(
            F.col("lex_rank") > 0, 1.0 / (F.lit(rrf_k) + F.col("lex_rank"))
        ).otherwise(F.lit(0.0))
        + F.when(
            F.col("ann_rank") > 0, 1.0 / (F.lit(rrf_k) + F.col("ann_rank"))
        ).otherwise(F.lit(0.0)),
        6,
    )
    scored = fused.withColumn("rrf", rrf)
    top = scored.orderBy(F.desc("rrf"), F.asc("doc_id")).limit(k)
    wr = Window.orderBy(F.desc("rrf"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(wr).cast("int"))


# ---------------------------------------------------------------------------
# BM25F — fielded BM25 (Zaragoza, Craswell, Taylor, Saria & Robertson,
# CIKM'04 "Microsoft Cambridge at TREC-13", the "simple BM25F"): per-field
# term frequencies are length-normalized and weight-combined into ONE
# pseudo-frequency BEFORE the k1 saturation, so a term hit in a short
# weighted field (title) is worth more than the same hit diluted in the
# body — structurally different from scoring fields separately and adding
# (which double-saturates). Fields here: title (the engine's extractTitle
# contract — <title> inner text, else first line) and body (the full
# worthy-token stream, same tokenizer as the postings pipeline).
# ---------------------------------------------------------------------------

BM25F_W_TITLE = 2.0
BM25F_W_BODY = 1.0
BM25F_B_TITLE = 0.75
BM25F_B_BODY = 0.75


def search_bm25f(
    docs: DataFrame,
    terms: list[str],
    doc_id_col: str = "doc_id",
    content_col: str = "text",
    k1: float = BM25_K1,
    w_title: float = BM25F_W_TITLE,
    w_body: float = BM25F_W_BODY,
    b_title: float = BM25F_B_TITLE,
    b_body: float = BM25F_B_BODY,
) -> DataFrame:
    """(doc_id, score): simple BM25F over {title, body} for a bag of query
    terms.

      tf~(t,d)  = w_title*tf_title/B_title + w_body*tf_body/B_body
      B_f       = (1 - b_f) + b_f * len_f(d)/avgl_f
      score(d)  = sum_t idf_bm25(t) * tf~ / (k1 + tf~)

    idf_bm25 is the same ln((N-df+0.5)/(df+0.5)+1) the BM25 path uses, with
    df = docs containing t in ANY field. Plan shape (scale audit): both
    field token arrays are ONE map-side projection per doc (tokenize +
    worthy list-filter — zero shuffle); the query-term IN filter runs
    fused right after each explode, so only query-term tokens ever reach
    the per-field tf groupBy (shuffle keyed by (doc, term), cardinality
    <= |terms| x docs-hit); field tfs meet in a co-partitioned full-outer
    join; per-doc field lengths join doc-keyed; the corpus aggregates
    (N, avgl_title, avgl_body) are one 1-row broadcast. At index-serving
    scale the per-field tf frame is precomputed exactly like the postings
    table — this function IS that build restricted to the query terms.
    DuckDB twin: oracle.bm25f_sql (identical literals, field exprs and
    fold shapes; 6dp-rounded at the comparison boundary)."""
    from ..functions import text as T

    tlist = [t for t in terms if t]
    d = docs.select(
        F.col(doc_id_col).cast("string").alias("doc_id"),
        F.filter(
            T.tokens_col(F.col(content_col)),
            lambda x: (x != "") & T.is_worth_col(x),
        ).alias("_body"),
        F.filter(
            T.tokens_col(T.title_col(F.col(content_col))),
            lambda x: (x != "") & T.is_worth_col(x),
        ).alias("_title"),
    )
    lens = d.select(
        "doc_id",
        F.size("_body").cast("double").alias("len_b"),
        F.size("_title").cast("double").alias("len_t"),
    )
    corpus = lens.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg("len_b").alias("avgl_b"),
        F.avg("len_t").alias("avgl_t"),
    )

    # ONE field-tagged token stream -> ONE (doc, term) shuffle with
    # conditional partial sums: both field tfs come out of a single
    # tokenize pass and a single exchange (two separate explodes would
    # tokenize the corpus twice and meet in a full-outer join).
    tagged = d.select(
        "doc_id",
        F.explode(
            F.concat(
                F.transform(
                    "_body",
                    lambda x: F.struct(
                        F.lit("b").alias("f"), x.alias("term")
                    ),
                ),
                F.transform(
                    "_title",
                    lambda x: F.struct(
                        F.lit("t").alias("f"), x.alias("term")
                    ),
                ),
            )
        ).alias("ft"),
    ).select("doc_id", F.col("ft.f").alias("f"), F.col("ft.term").alias("term"))
    tf = (
        tagged.where(F.col("term").isin(tlist))
        .groupBy("doc_id", "term")
        .agg(
            F.sum(F.when(F.col("f") == "b", 1.0).otherwise(0.0)).alias("tf_b"),
            F.sum(F.when(F.col("f") == "t", 1.0).otherwise(0.0)).alias("tf_t"),
        )
    )
    df_per_term = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df")
    )
    scored = (
        tf.join(lens, "doc_id")
        .crossJoin(F.broadcast(corpus))
        .join(F.broadcast(df_per_term), "term")
    )
    b_t = F.lit(1.0 - b_title) + F.lit(b_title) * F.when(
        F.col("avgl_t") > 0.0, F.col("len_t") / F.col("avgl_t")
    ).otherwise(F.lit(1.0))
    b_b = F.lit(1.0 - b_body) + F.lit(b_body) * F.when(
        F.col("avgl_b") > 0.0, F.col("len_b") / F.col("avgl_b")
    ).otherwise(F.lit(1.0))
    pseudo = F.lit(w_title) * F.col("tf_t") / b_t + F.lit(w_body) * F.col(
        "tf_b"
    ) / b_b
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    contrib = idf * pseudo / (F.lit(k1) + pseudo)
    return (
        scored.select("doc_id", contrib.alias("_c"))
        .groupBy("doc_id")
        .agg(F.round(F.sum("_c"), 6).alias("score"))
        .where(F.col("score") > 0.0)
    )


def search_proximity(
    postings: DataFrame,
    term_stats: DataFrame,
    w1: str,
    w2: str,
    slop: int = 4,
    k: int = 20,
) -> DataFrame:
    """(doc_id, min_gap, score): sloppy-phrase retrieval — docs where
    both terms occur within ``slop`` token positions (unordered window),
    scored tf-idf with a closeness boost 1 + 1/(1+min_gap) — the
    Lucene PhraseQuery~slop shape with the reciprocal-distance weight
    of its SloppyPhraseScorer. Extends the exact-adjacency phrase boost
    (Q8, engine.search) to bounded-distance matching.

    Plan: two single-term postings lookups (partition-prunable against
    the term segments, like Q4) joined on doc_id; the min position gap
    is a pure HOF — flatten(transform x transform) + array_min, O(tf1 x
    tf2) per doc with NO explode, so the only exchange is the doc_id
    equi-join of two term-sized posting lists. 6dp-rounded score before
    the (score desc, doc_id asc) rank; DuckDB twin =
    oracle.proximity_sql (identical gap/boost arithmetic)."""
    hits = (
        postings.where(
            F.col("term").isin([w1, w2]) & (F.col("normalized_tf") > 0)
        )
        .join(term_stats.select("term", "idf"), "term")
        .select(
            "doc_id",
            "term",
            (F.col("normalized_tf") * F.col("idf")).alias("contrib"),
            "positions",
        )
    )
    h1 = hits.where(F.col("term") == w1).select(
        "doc_id", F.col("contrib").alias("c1"), F.col("positions").alias("p1")
    )
    h2 = hits.where(F.col("term") == w2).select(
        "doc_id", F.col("contrib").alias("c2"), F.col("positions").alias("p2")
    )
    gaps = F.flatten(
        F.transform(
            F.col("p1"),
            lambda p: F.transform(F.col("p2"), lambda q: F.abs(q - p)),
        )
    )
    j = h1.join(h2, "doc_id").select(
        "doc_id",
        (F.col("c1") + F.col("c2")).alias("csum"),
        F.array_min(gaps).alias("min_gap"),
    )
    scored = j.where(F.col("min_gap") <= slop).select(
        "doc_id",
        F.col("min_gap").cast("int").alias("min_gap"),
        F.round(
            F.col("csum")
            * (F.lit(1.0) + F.lit(1.0) / (F.lit(1.0) + F.col("min_gap").cast("double"))),
            6,
        ).alias("score"),
    )
    top = scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    w = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w).cast("int"))


def search_facets(
    postings: DataFrame,
    term_stats: DataFrame,
    docs: DataFrame,
    terms: list[str],
    facet_cols: tuple[str, ...] = ("lang", "source"),
    doc_id_col: str = "doc_id",
) -> DataFrame:
    """(facet, value, n_docs, best_score): facet aggregations over the
    match set — the Elasticsearch aggregations-alongside-hits shape.
    Docs matching ANY query term are tf-idf scored (per-doc sum of
    normalized_tf x idf over matched terms), joined to their metadata,
    and counted per (facet column, value) with the best score per
    bucket.

    Plan: the postings lookup and per-doc sum are the Q4/Q5 shape; ONE
    broadcast-sized join against the doc metadata (project only the
    facet columns — column pruning keeps the scan narrow), then one
    explode(array(struct...)) over the |facet_cols| labels and ONE
    groupBy — facet keys are low-cardinality so the aggregate is
    map-side-partial dominated. Keep ``terms`` to <= 2 for the
    cross-engine gate: IEEE addition is commutative but not
    associative, so 3+ contributions per doc would make the per-doc sum
    order-sensitive between engines."""
    hits = (
        postings.where(
            F.col("term").isin(list(terms)) & (F.col("normalized_tf") > 0)
        )
        .join(term_stats.select("term", "idf"), "term")
        .groupBy("doc_id")
        .agg(F.sum(F.col("normalized_tf") * F.col("idf")).alias("score"))
    )
    meta = docs.select(
        F.col(doc_id_col).cast("string").alias("doc_id"),
        *[F.col(c).cast("string").alias(c) for c in facet_cols],
    )
    m = hits.join(meta, "doc_id")
    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(c).alias("facet"), F.col(c).alias("value")
                )
                for c in facet_cols
            ]
        )
    ).alias("fv")
    return (
        m.select("doc_id", "score", pairs)
        .select("doc_id", "score", "fv.facet", "fv.value")
        .groupBy("facet", "value")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_docs"),
            F.round(F.max("score"), 6).alias("best_score"),
        )
    )


# ---------------------------------------------------------------------------
# RM3 pseudo-relevance feedback (Lavrenko & Croft SIGIR'01 relevance
# models; the RM3 interpolation from Abdul-Jaleel et al., TREC'04 UMass
# report) — the standard "free" recall boost for bag-of-words retrieval:
# run the query, mine expansion terms from the top feedback documents'
# term distributions weighted by their retrieval scores, re-score with
# the expanded query. The reference's Q3 related-terms expansion is a
# dictionary lookup; this is the principled corpus-statistics version.
# ---------------------------------------------------------------------------


def search_rm3(
    spark: SparkSession,
    index: SearchIndex,
    terms: list[str],
    k: int = 10,
    fb_docs: int = 10,
    fb_terms: int = 5,
    beta: float = 0.6,
) -> DataFrame:
    """(doc_id, score, rank): BM25 over ``terms`` expanded with RM3-style
    pseudo-relevance feedback.

    Chain (two bounded jobs):
      1. first-pass BM25; feedback set = top ``fb_docs`` by
         (6dp-rounded score desc, doc_id asc). Expansion-term weight
         w(t) = sum over feedback docs d of (tf(t,d)/doc_len(d)) *
         (s6(d)/sum_fb s6) — the doc's term distribution weighted by its
         normalized ROUNDED retrieval score (rounding first makes the
         feedback arithmetic cross-engine deterministic). Stop words and
         original query terms are excluded; top ``fb_terms`` by
         (6dp-rounded w desc, term asc) survive.
      2. second pass: score'(d) = BM25(d; terms) + beta * sum_t wn(t) *
         BM25_t(d), wn = w/sum(w) over the selected terms; 6dp-rounded,
         rank ties doc_id asc.

    Scale shape: the feedback-doc term mining joins postings against the
    ``fb_docs``-row broadcast (at 100 TB route it through the forward
    index / pruned provider instead — build_forward_index exists); the
    expansion terms come back as a bounded ``fb_terms``-row collect
    (same k-row discipline as every top-k), so the second pass runs
    through lookup_postings partition-pruned on ~|terms|+fb_terms
    terms. DuckDB twin: oracle.rm3_sql, identical arithmetic and
    rounding points."""
    avgdl = index.avgdl or 1.0

    def bm25_contrib(p: DataFrame) -> DataFrame:
        denom = F.col("tf") + BM25_K1 * (
            1.0 - BM25_B + BM25_B * F.col("doc_len") / F.lit(avgdl)
        )
        out = p
        if "idf_bm25" not in p.columns:
            out = out.join(
                F.broadcast(index.term_stats.select("term", "idf_bm25")),
                "term",
            )
        return out.select(
            "term",
            "doc_id",
            (
                F.col("idf_bm25") * F.col("tf") * (BM25_K1 + 1.0) / denom
            ).alias("contrib"),
        )

    first = (
        bm25_contrib(index.lookup_postings(sorted(set(terms))))
        .groupBy("doc_id")
        .agg(F.round(F.sum("contrib"), 6).alias("s6"))
    )
    fb = first.orderBy(F.desc("s6"), F.asc("doc_id")).limit(fb_docs)
    tot = fb.agg(F.sum("s6").alias("tot"))
    cand = (
        index.postings.join(F.broadcast(fb), "doc_id")
        .where(
            ~F.col("term").isin(list(terms))
            & ~F.col("term").isin(sorted(STOP_WORDS))
        )
        .crossJoin(F.broadcast(tot))
        .groupBy("term")
        .agg(
            F.sum(
                F.col("tf").cast("double")
                / F.col("doc_len")
                * F.col("s6")
                / F.col("tot")
            ).alias("w")
        )
    )
    exp_rows = (
        cand.orderBy(F.desc(F.round("w", 6)), F.asc("term"))
        .limit(fb_terms)
        .collect()
    )  # bounded: fb_terms rows
    wsum = sum(r["w"] for r in exp_rows) or 1.0
    exp_df = spark.createDataFrame(
        [(r["term"], r["w"] / wsum) for r in exp_rows],
        "term string, wn double",
    )
    orig = bm25_contrib(
        index.lookup_postings(sorted(set(terms)))
    ).select("doc_id", "contrib")
    expn = (
        bm25_contrib(
            index.lookup_postings(sorted(r["term"] for r in exp_rows))
        )
        .join(F.broadcast(exp_df), "term")
        .select(
            "doc_id",
            (F.lit(beta) * F.col("wn") * F.col("contrib")).alias("contrib"),
        )
    )
    agg = (
        orig.unionByName(expn)
        .groupBy("doc_id")
        .agg(F.round(F.sum("contrib"), 6).alias("score"))
    )
    top = agg.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
    wr = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(wr).cast("int"))


def explain_bm25(
    spark: SparkSession, index: SearchIndex, query_text: str
) -> DataFrame:
    """Lucene-``explain()``-style score breakdown: one row per
    (doc_id, term) with every input to the BM25 contribution — tf,
    doc_len, idf_bm25 — the contribution itself, and the doc's total
    score. The debugging surface the reference exposes only as opaque
    ranked output (SearchEngine.java returns scores, never why).

    Terms are used stem-fixpoint as given (no expansion — explain shows
    the scorer, not the query rewriter; run expand_terms separately to
    audit the rewrite). Plan: one pruned postings lookup + broadcast
    term-stats join + a per-doc window sum (bounded by query length per
    doc). All numeric outputs 6dp-rounded in-engine so the breakdown is
    hash-stable across engines.
    """
    terms = tokenize_query(query_text)
    if not terms:
        return spark.createDataFrame(
            [],
            "doc_id string, term string, tf double, doc_len double, "
            "idf_bm25 double, contrib double, score double",
        )
    avgdl = index.avgdl or 1.0
    base = index.lookup_postings(sorted(set(terms)))
    if "idf_bm25" not in base.columns:
        base = base.join(
            F.broadcast(index.term_stats.select("term", "idf_bm25")), "term"
        )
    tf = F.col("tf").cast("double")
    dl = F.col("doc_len").cast("double")
    denom = tf + BM25_K1 * (1.0 - BM25_B + BM25_B * dl / F.lit(avgdl))
    per_term = base.select(
        "doc_id",
        "term",
        tf.alias("tf"),
        dl.alias("doc_len"),
        F.round("idf_bm25", 6).alias("idf_bm25"),
        F.round(
            F.col("idf_bm25") * tf * (BM25_K1 + 1.0) / denom, 6
        ).alias("contrib"),
    )
    wd = Window.partitionBy("doc_id")
    return per_term.withColumn(
        "score", F.round(F.sum("contrib").over(wd), 6)
    )
