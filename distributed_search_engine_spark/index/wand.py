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
    """Executor-side BM25 top-k over pruned compressed segments — the
    driver never touches posting bytes (round-2 wand_topk collected every
    block to the driver; acceptable under the 20k/5k per-term caps, but
    this removes the driver from the per-query data path entirely).

    Plan shape (all sizes are per-QUERY, i.e. q terms' compressed lists):
      1. first_docnum of block i = last_docnum of block i-1 + 1 (blocks
         are consecutive chunks of a docnum-sorted list), computed
         MAP-SIDE with an indexed transform over the blocks array — no
         window, no extra shuffle — then posexplode.
      2. assign each block to every doc-range it overlaps (sequence +
         explode — blocks stay ENCODED; shuffle volume = compressed bytes).
      3. repartition by range_id: each docnum's full set of per-term
         contributions lands in exactly one partition (straddling blocks
         are masked to the range inside the kernel), so per-partition
         vectorized BM25 accumulation + a local top-k heap is exact.
      4. global TakeOrderedAndProject merge of the <= n_ranges x k rows.
    The only shuffles are the range repartition and the final k-row merge.

    Returns [(docnum, score)] == bruteforce_topk/wand_topk output order
    (score desc, docnum asc). Scales by raising n_ranges with corpus size:
    per-task work is (query posting bytes) / n_ranges.
    """
    import pyspark.sql.functions as F

    if max_docnum is None:
        row = seg_df.agg(
            F.max(F.expr("blocks[size(blocks) - 1].last_docnum")).alias("m")
        ).collect()[0]
        if row["m"] is None:
            return []
        max_docnum = int(row["m"])
    range_size = max(1, (max_docnum + n_ranges) // n_ranges)

    with_first = seg_df.select(
        "idf_bm25",
        F.expr(
            "transform(blocks, (b, i) -> struct("
            "CASE WHEN i = 0 THEN CAST(0 AS BIGINT) "
            "ELSE blocks[i - 1].last_docnum + 1 END AS first_docnum, "
            "b.last_docnum AS last_docnum, "
            "b.docs AS docs, b.tfs AS tfs, b.dls AS dls))"
        ).alias("blocks"),
    )
    b = with_first.select("idf_bm25", F.explode("blocks").alias("block"))
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
            "range_id",
            "idf_bm25",
            F.col("block.docs").alias("docs"),
            F.col("block.tfs").alias("tfs"),
            F.col("block.dls").alias("dls"),
        )
    )

    def _score_partition(batch_iter):
        import pyarrow as pa

        from .codec import decode_docnums, varint_decode

        doc_chunks, score_chunks = [], []
        for batch in batch_iter:
            for r in batch.to_pylist():
                docs = decode_docnums(bytes(r["docs"])).astype(np.int64)
                lo = r["range_id"] * range_size
                hi = lo + range_size
                mask = (docs >= lo) & (docs < hi)
                if not mask.any():
                    continue
                tfs = varint_decode(bytes(r["tfs"])).astype(np.float64)[mask]
                dls = varint_decode(bytes(r["dls"])).astype(np.float64)[mask]
                scores = (
                    r["idf_bm25"]
                    * tfs
                    * (BM25_K1 + 1.0)
                    / (tfs + BM25_K1 * (1.0 - BM25_B + BM25_B * dls / avgdl))
                )
                doc_chunks.append(docs[mask])
                score_chunks.append(scores)
        if not doc_chunks:
            return
        alldocs = np.concatenate(doc_chunks)
        allscores = np.concatenate(score_chunks)
        uniq, inv = np.unique(alldocs, return_inverse=True)
        acc = np.zeros(len(uniq), dtype=np.float64)
        np.add.at(acc, inv, allscores)
        # local top-k, deterministic (score desc, docnum asc)
        order = np.lexsort((uniq, -acc))[:k]
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(uniq[order], type=pa.int64()),
                pa.array(acc[order], type=pa.float64()),
            ],
            names=["docnum", "score"],
        )

    out = (
        sharded.repartition(n_ranges, "range_id")
        .mapInArrow(_score_partition, schema="docnum long, score double")
        .orderBy(F.desc("score"), F.asc("docnum"))
        .limit(k)
    )
    return [(int(r["docnum"]), float(r["score"])) for r in out.collect()]


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
