"""Block-max WAND top-k over compressed segments (north-star query path).

Classic WAND (Broder et al. 2003) pivot selection with per-term exact upper
bounds, plus the Block-Max refinement (Ding & Suel 2011): per-block max
scores let the cursor (a) skip whole blocks without decoding when advancing
and (b) reject a pivot whose block-level upper-bound sum cannot beat the
current k-th score. Blocks are delta-gap+varint encoded (index/codec.py)
and decoded lazily one block at a time.

Deterministic total order: (score desc, docnum asc) — SURVEY §4 item 5.
"""

from __future__ import annotations

import heapq

import numpy as np

from ..query.engine import BM25_B, BM25_K1
from .codec import decode_docnums, varint_decode

INF = np.iinfo(np.int64).max


class TermCursor:
    """Cursor over one term's posting blocks with lazy per-block decode."""

    __slots__ = (
        "idf_bm25", "avgdl", "blocks", "bi", "docs", "scores", "pi",
        "max_score", "decoded_blocks",
    )

    def __init__(self, seg_row: dict, avgdl: float):
        self.idf_bm25 = float(seg_row["idf_bm25"])
        self.avgdl = avgdl
        self.blocks = seg_row["blocks"]
        self.max_score = max(b["max_score"] for b in self.blocks)
        self.bi = 0
        self.docs: np.ndarray | None = None
        self.scores: np.ndarray | None = None
        self.pi = 0
        self.decoded_blocks = 0
        self._load_block()

    def _load_block(self) -> None:
        b = self.blocks[self.bi]
        self.docs = decode_docnums(bytes(b["docs"])).astype(np.int64)
        tfs = varint_decode(bytes(b["tfs"])).astype(np.float64)
        dls = varint_decode(bytes(b["dls"])).astype(np.float64)
        self.scores = (
            self.idf_bm25
            * tfs
            * (BM25_K1 + 1.0)
            / (tfs + BM25_K1 * (1.0 - BM25_B + BM25_B * dls / self.avgdl))
        )
        self.pi = 0
        self.decoded_blocks += 1

    def cur_doc(self) -> int:
        if self.docs is None:
            return INF
        return int(self.docs[self.pi])

    def cur_score(self) -> float:
        return float(self.scores[self.pi])

    def cur_block_max(self) -> float:
        return float(self.blocks[self.bi]["max_score"]) if self.docs is not None else 0.0

    def advance_to(self, target: int) -> None:
        """Move to the first posting with docnum >= target; skips whole
        blocks via metadata without decoding them."""
        if self.docs is None and self.bi >= len(self.blocks):
            return
        skipped = False
        while self.bi < len(self.blocks) and self.blocks[self.bi]["last_docnum"] < target:
            self.bi += 1
            skipped = True
        if self.bi >= len(self.blocks):
            self.docs = None
            return
        if skipped or self.docs is None:
            self._load_block()
        # last_docnum >= target guarantees a hit in this block
        self.pi = int(np.searchsorted(self.docs, target, side="left"))

    def advance_one(self) -> None:
        self.pi += 1
        if self.pi >= len(self.docs):
            self.bi += 1
            if self.bi >= len(self.blocks):
                self.docs = None
            else:
                self._load_block()


def wand_topk(seg_rows: list[dict], avgdl: float, k: int) -> list[tuple[int, float]]:
    """Top-k (docnum, bm25_score) over the given term segment rows.

    Exact w.r.t. brute-force scoring with the (score desc, docnum asc)
    order; block-max pruning only skips work, never results.
    """
    cursors = [TermCursor(r, avgdl) for r in seg_rows if r["blocks"]]
    if not cursors:
        return []
    # min-heap of (score, -docnum): root = currently-worst kept result
    heap: list[tuple[float, int]] = []

    def threshold() -> float:
        return heap[0][0] if len(heap) >= k else -1.0

    while True:
        live = [c for c in cursors if c.cur_doc() != INF]
        if not live:
            break
        live.sort(key=lambda c: c.cur_doc())
        # pivot: first prefix whose UB sum beats the threshold
        # strict > is safe for exact ties: pivots are scored in strictly
        # increasing docnum order, so a later candidate whose score exactly
        # equals the k-th score has a LARGER docnum than every equal-score
        # heap entry and loses the (score desc, docnum asc) tie-break
        # anyway — admitting it would only add wasted scoring work
        # (regression-tested by test_wand_exact_under_score_ties, which
        # quantizes every score into exact-tie groups).
        ub, pivot = 0.0, -1
        for i, c in enumerate(live):
            ub += c.max_score
            if ub > threshold():
                pivot = i
                break
        if pivot < 0:
            break
        pivot_doc = live[pivot].cur_doc()
        if live[0].cur_doc() == pivot_doc:
            # block-max shallow check before scoring
            bub = sum(
                c.cur_block_max() for c in live if c.cur_doc() == pivot_doc
            ) + sum(c.max_score for c in live[:pivot] if c.cur_doc() != pivot_doc)
            if bub > threshold() or len(heap) < k:
                score = 0.0
                for c in live:
                    if c.cur_doc() == pivot_doc:
                        score += c.cur_score()
                item = (score, -pivot_doc)
                if len(heap) < k:
                    heapq.heappush(heap, item)
                elif item > heap[0]:
                    heapq.heapreplace(heap, item)
            for c in live:
                if c.cur_doc() == pivot_doc:
                    c.advance_one()
        else:
            live[0].advance_to(pivot_doc)

    out = sorted(heap, key=lambda t: (-t[0], -t[1]))
    return [(-nd, s) for s, nd in out]


def distributed_topk(
    spark,
    seg_df,
    avgdl: float,
    k: int,
    n_ranges: int = 8,
    max_docnum: int | None = None,
):
    """Executor-side BM25 top-k over pruned compressed segments for ONE
    query — thin wrapper over distributed_topk_batch (a constant
    query_id); see that function for the plan shape, the block-max
    pruning rule, and the exactness argument.

    Returns [(docnum, score)] == bruteforce_topk/wand_topk output order
    (score desc, docnum asc).
    """
    import pyspark.sql.functions as F

    tagged = seg_df.select(
        F.lit("q").alias("query_id"), "term", "idf_bm25", "blocks"
    )
    return distributed_topk_batch(
        spark, tagged, avgdl, k, n_ranges=n_ranges, max_docnum=max_docnum
    ).get("q", [])


def distributed_topk_batch(
    spark,
    tagged_seg_df,
    avgdl: float,
    k: int,
    n_ranges: int = 8,
    max_docnum: int | None = None,
):
    """Executor-side BM25 top-k for a BATCH of queries in ONE Spark job —
    the driver never touches posting bytes (round-2 wand_topk collected
    every block to the driver; acceptable under the 20k/5k per-term caps,
    but this keeps the per-query data path on executors entirely), and
    batching amortizes the per-job Python-stage floor (~0.35 s/job
    measured on this host for a trivial 1-task mapInArrow job) across the
    whole query set — the serving shape a query frontend uses at scale.

    tagged_seg_df: (query_id string, term string, idf_bm25 double,
    blocks array<struct<last_docnum, max_score, docs, tfs, dls>>) — one
    row per (query, term); build it with
    segments.read_segments_for_queries (one partition-pruned scan for the
    union of terms + a broadcast join on the tiny query->term map).

    Plan shape (sizes are the batch's union of compressed lists):
      1. first_docnum of block i = last_docnum of block i-1 + 1 (blocks
         are consecutive chunks of a docnum-sorted list), computed
         MAP-SIDE with an indexed transform over the blocks array — no
         window, no extra shuffle — then explode.
      2. assign each block to every doc-range it overlaps (sequence +
         explode — blocks stay ENCODED; shuffle volume = compressed
         bytes).
      3. repartition by (query_id, range_id): each docnum's full set of
         per-term contributions for a query lands in exactly one
         partition (straddling blocks are masked to the range inside the
         kernel), so per-(query, partition) vectorized BM25 accumulation
         + a local top-k is exact.
      4. collect of <= queries x n_ranges x k (docnum, score) rows and a
         driver-side per-query merge (tiny, no posting bytes).
    The only shuffle is the (query, range) repartition. Scales by raising
    n_ranges with corpus size: per-task work is (batch posting bytes) /
    (queries x n_ranges).

    Executor-side block-max pruning (round-4; Ding & Suel 2011 adapted to
    the sharded setting) — exact, zero extra jobs, per query:
      threshold: for one term, distinct blocks hold distinct docs, and a
      block's max_score is an ACHIEVED single-term score of some doc in
      it, which lower-bounds that doc's total score. So the k-th largest
      block max_score WITHIN a term certifies k distinct docs with total
      score >= it => it is a valid lower bound on the query's true k-th
      best score. Computed map-side per (query, term) row (sort of the
      block-max array), shipped on every exploded row; each partition
      takes the max over the rows it sees for that query (any subset max
      is still a valid bound).
      rejection: a block B (term t, span S = B's docnum span clipped to
      its range) is skipped when
        max_score(B) + sum over other terms t' of
            max(max_score of t' blocks overlapping S, default 0)  <  tau
      (strictly) — every doc in S then has total score < tau <= true
      k-th, so it cannot appear in the top-k; any block containing a
      true top-k doc has UB >= that doc's score >= k-th >= tau and is
      never skipped; and a partially-accumulated pruned doc is covered by
      some skipped block, so its true score (hence its partial sum) is
      strictly below tau <= k-th and cannot displace (tests: differential
      vs bruteforce_topk under exact score ties, and a structural
      hopeless-block assertion).

    Returns {query_id: [(docnum, score)]} with each list in
    (score desc, docnum asc) order, == bruteforce_topk per query.
    """
    import pyspark.sql.functions as F

    if max_docnum is None:
        row = tagged_seg_df.agg(
            F.max(F.expr("blocks[size(blocks) - 1].last_docnum")).alias("m")
        ).collect()[0]
        if row["m"] is None:
            return {}
        max_docnum = int(row["m"])
    range_size = max(1, (max_docnum + n_ranges) // n_ranges)

    with_first = tagged_seg_df.select(
        "query_id",
        "term",
        "idf_bm25",
        # k-th largest block max_score of THIS (query, term) (null when
        # the term has < k blocks — then it certifies nothing); CASE
        # guards the subscript under ANSI mode
        F.expr(
            f"CASE WHEN size(blocks) >= {k} THEN "
            f"sort_array(transform(blocks, b -> b.max_score), false)[{k - 1}] "
            "ELSE CAST(NULL AS DOUBLE) END"
        ).alias("term_kth"),
        F.expr(
            "transform(blocks, (b, i) -> struct("
            "CASE WHEN i = 0 THEN CAST(0 AS BIGINT) "
            "ELSE blocks[i - 1].last_docnum + 1 END AS first_docnum, "
            "b.last_docnum AS last_docnum, b.max_score AS max_score, "
            "b.docs AS docs, b.tfs AS tfs, b.dls AS dls))"
        ).alias("blocks"),
    )
    b = with_first.select(
        "query_id", "term", "idf_bm25", "term_kth", F.explode("blocks").alias("block")
    )
    sharded = (
        b.withColumn(
            "range_id",
            F.explode(
                F.sequence(
                    (F.col("block.first_docnum") / range_size).cast("int"),
                    (F.col("block.last_docnum") / range_size).cast("int"),
                )
            ),
        )
        .select(
            "query_id",
            "range_id",
            "term",
            "idf_bm25",
            "term_kth",
            F.col("block.first_docnum").alias("first_docnum"),
            F.col("block.last_docnum").alias("last_docnum"),
            F.col("block.max_score").alias("max_score"),
            F.col("block.docs").alias("docs"),
            F.col("block.tfs").alias("tfs"),
            F.col("block.dls").alias("dls"),
        )
    )

    def _score_partition(batch_iter):
        import pyarrow as pa

        from .codec import decode_docnums, varint_decode

        # Stream batches, grouping per query as they arrive. The pruning
        # pass needs every (query, range) row's METADATA up front (tau is
        # a max over the query's term_kth; the cross-term UB reads other
        # terms' clipped spans), but it does NOT need the compressed
        # posting blobs as Python objects: those stay as Arrow scalars
        # (zero-copy views into the batch buffers) and are materialized
        # per ROW only when a row survives pruning — pruned rows never
        # leave Arrow memory.
        byq: dict = {}
        meta_cols = (
            "query_id", "range_id", "term", "idf_bm25", "term_kth",
            "first_docnum", "last_docnum", "max_score",
        )
        for batch in batch_iter:
            cols = {n: batch.column(n) for n in meta_cols}
            bdocs = batch.column("docs")
            btfs = batch.column("tfs")
            bdls = batch.column("dls")
            for i in range(batch.num_rows):
                r = {n: cols[n][i].as_py() for n in meta_cols}
                r["_docs"] = bdocs[i]
                r["_tfs"] = btfs[i]
                r["_dls"] = bdls[i]
                byq.setdefault(r["query_id"], []).append(r)
        if not byq:
            return
        out_q: list = []
        out_d: list = []
        out_s: list = []
        for qid, qrows in byq.items():
            tau = max(
                (r["term_kth"] for r in qrows if r["term_kth"] is not None),
                default=None,
            )
            # per-(range, term) clipped block spans, for the cross-term UB
            spans: dict = {}
            if tau is not None:
                for r in qrows:
                    lo = r["range_id"] * range_size
                    s_lo = max(r["first_docnum"], lo)
                    s_hi = min(r["last_docnum"], lo + range_size - 1)
                    spans.setdefault((r["range_id"], r["term"]), []).append(
                        (s_lo, s_hi, r["max_score"])
                    )
            doc_chunks, score_chunks = [], []
            for r in qrows:
                lo = r["range_id"] * range_size
                hi = lo + range_size
                if tau is not None:
                    s_lo = max(r["first_docnum"], lo)
                    s_hi = min(r["last_docnum"], hi - 1)
                    ub = r["max_score"]
                    for (rid, t), lst in spans.items():
                        if rid != r["range_id"] or t == r["term"]:
                            continue
                        best = 0.0
                        for a, z, ms in lst:
                            if a <= s_hi and z >= s_lo and ms > best:
                                best = ms
                        ub += best
                    if ub < tau:
                        continue  # no doc in this span can reach the top-k
                docs = decode_docnums(r["_docs"].as_py()).astype(np.int64)
                mask = (docs >= lo) & (docs < hi)
                if not mask.any():
                    continue
                tfs = varint_decode(r["_tfs"].as_py()).astype(np.float64)[mask]
                dls = varint_decode(r["_dls"].as_py()).astype(np.float64)[mask]
                scores = (
                    r["idf_bm25"]
                    * tfs
                    * (BM25_K1 + 1.0)
                    / (tfs + BM25_K1 * (1.0 - BM25_B + BM25_B * dls / avgdl))
                )
                doc_chunks.append(docs[mask])
                score_chunks.append(scores)
            if not doc_chunks:
                continue
            alldocs = np.concatenate(doc_chunks)
            allscores = np.concatenate(score_chunks)
            uniq, inv = np.unique(alldocs, return_inverse=True)
            acc = np.zeros(len(uniq), dtype=np.float64)
            np.add.at(acc, inv, allscores)
            # local top-k, deterministic (score desc, docnum asc)
            order = np.lexsort((uniq, -acc))[:k]
            out_q.extend([qid] * len(order))
            out_d.extend(uniq[order].tolist())
            out_s.extend(acc[order].tolist())
        if not out_q:
            return
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(out_q, type=pa.string()),
                pa.array(out_d, type=pa.int64()),
                pa.array(out_s, type=pa.float64()),
            ],
            names=["query_id", "docnum", "score"],
        )

    collected = (
        sharded.repartition(n_ranges, "query_id", "range_id")
        .mapInArrow(
            _score_partition, schema="query_id string, docnum long, score double"
        )
        .collect()
    )
    merged: dict = {}
    for r in collected:
        merged.setdefault(r["query_id"], []).append(
            (int(r["docnum"]), float(r["score"]))
        )
    return {
        qid: sorted(rows, key=lambda t: (-t[1], t[0]))[:k]
        for qid, rows in merged.items()
    }


def bruteforce_topk(seg_rows: list[dict], avgdl: float, k: int) -> list[tuple[int, float]]:
    """Reference implementation for differential testing: decode everything,
    accumulate, sort."""
    acc: dict[int, float] = {}
    for r in seg_rows:
        idf = float(r["idf_bm25"])
        for b in r["blocks"]:
            docs = decode_docnums(bytes(b["docs"])).astype(np.int64)
            tfs = varint_decode(bytes(b["tfs"])).astype(np.float64)
            dls = varint_decode(bytes(b["dls"])).astype(np.float64)
            scores = (
                idf * tfs * (BM25_K1 + 1.0)
                / (tfs + BM25_K1 * (1.0 - BM25_B + BM25_B * dls / avgdl))
            )
            for d, s in zip(docs.tolist(), scores.tolist()):
                acc[d] = acc.get(d, 0.0) + s
    ranked = sorted(acc.items(), key=lambda t: (-t[1], t[0]))[:k]
    return [(d, s) for d, s in ranked]
