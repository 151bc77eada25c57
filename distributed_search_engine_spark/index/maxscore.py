"""MaxScore top-k over compressed segments — the Turtle & Flood (1995)
document-at-a-time pruning strategy, the industry-standard alternative
to WAND (Lucene's default dynamic-pruning scorer). Same exactness
contract as :func:`wand.wand_topk`: identical results to brute-force
under the deterministic (score desc, docnum asc) order; pruning only
skips work.

Strategy: sort terms by their exact score upper bound ascending. Once
the running k-th score θ exceeds the prefix-sum UB of the cheapest
terms, those terms become NON-ESSENTIAL — no document matching only
them can enter the top-k, so candidate docs are drawn from the
ESSENTIAL lists alone; non-essential lists are only probed (a skip-
capable ``advance_to``) for docs already selected, with early exit as
soon as partial score + remaining UB ≤ θ. The essential boundary is
re-derived every round as θ grows, so long queries degrade gracefully:
rare high-impact terms stay essential, stopword-grade terms collapse
into probe-only lists almost immediately.

WAND vs MaxScore trade-off (why both exist here): WAND re-sorts live
cursors by docnum every pivot round (cost ~q·log q per candidate, finer
pruning); MaxScore keeps a static term order and pays only a min-scan
over essential cursors (coarser pruning, much lower bookkeeping). For
the short queries of the reference query set and the block-decode cost
profile of these segments, the winner is an empirical question —
``bench.py`` runs both over the same segments (see the
query_bm25_maxscore_* stages) and the gate pins both to the same
oracle hashes.

100-TB shape: identical to WAND's — this kernel runs per (query,
docnum-range) inside ``wand.distributed_topk_batch``'s mapInArrow
stage; the strategy only changes which blocks get decoded, never the
plan. ``distributed_topk_batch(..., strategy="maxscore")`` selects it.
"""

from __future__ import annotations

import heapq

from .wand import INF, TermCursor


def maxscore_topk(
    seg_rows: list[dict], avgdl: float, k: int
) -> list[tuple[int, float]]:
    """Top-k (docnum, bm25_score) — exact vs bruteforce_topk/wand_topk.

    Strict-> admission is safe for exact score ties for the same reason
    as in wand_topk: candidates are produced in strictly increasing
    docnum order, so an equal-score later candidate loses the
    (score desc, docnum asc) tie-break to every equal-score heap entry.
    """
    cursors = [TermCursor(r, avgdl) for r in seg_rows if r["blocks"]]
    if not cursors:
        return []
    cursors.sort(key=lambda c: c.max_score)
    n = len(cursors)
    # prefix[i] = sum of max_score for cursors[0..i] (ascending order)
    prefix = []
    s = 0.0
    for c in cursors:
        s += c.max_score
        prefix.append(s)

    heap: list[tuple[float, int]] = []  # (score, -docnum)

    def threshold() -> float:
        return heap[0][0] if len(heap) >= k else -1.0

    while True:
        theta = threshold()
        # essential boundary: first index e whose prefix UB beats θ;
        # cursors[0..e-1] are probe-only. θ==-1 keeps everything
        # essential until the heap fills — no doc is missed early.
        e = 0
        while e < n and prefix[e] <= theta:
            e += 1
        if e >= n:
            break  # total UB ≤ θ: nothing left can enter the top-k
        doc = INF
        for c in cursors[e:]:
            d = c.cur_doc()
            if d < doc:
                doc = d
        if doc == INF:
            break
        score = 0.0
        for c in cursors[e:]:
            if c.cur_doc() == doc:
                score += c.cur_score()
        # probe non-essential lists, richest first, early-exiting the
        # moment even full hits on the rest cannot reach θ
        for i in range(e - 1, -1, -1):
            if score + prefix[i] <= theta:
                break
            c = cursors[i]
            c.advance_to(doc)
            if c.cur_doc() == doc:
                score += c.cur_score()
        item = (score, -doc)
        if len(heap) < k:
            heapq.heappush(heap, item)
        elif item > heap[0]:
            heapq.heapreplace(heap, item)
        for c in cursors[e:]:
            if c.cur_doc() == doc:
                c.advance_one()

    out = sorted(heap, key=lambda t: (-t[0], -t[1]))
    return [(-nd, s) for s, nd in out]
