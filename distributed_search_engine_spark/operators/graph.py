"""Connected components over an undirected pair graph — the final stage of
a corpus-scale dedup pipeline (near-dup PAIRS -> transitive CLUSTERS ->
one canonical keeper per cluster).

The reference stops at pairwise content dedup at crawl time
(jobs/Crawler.java:1091-1105, exact-hash only); transitive closure over
NEAR-dup pairs is the missing piece any 100 TB training-data run needs:
near-duplication is not transitive pairwise (A~B, B~C but A!~C), so
keeper selection must operate on connected components of the pair graph
or the kept set depends on evaluation order.

Two kernels, both pure DataFrame ops:

- ``cc_propagate(edges, iterations)``: fixed-iteration min-label
  propagation. After k rounds every node holds the minimum node id within
  k hops; converged when iterations >= component diameter. Deterministic
  for ANY iteration count, hence SQL-unrollable — the DuckDB oracle twin
  (oracle.cc_propagate_sql) mirrors it round for round. One shuffle per
  round (join on node + groupBy min); map-side partial min absorbs
  high-degree skew.

- ``connected_components(edges)``: alternating large-star / small-star
  (Kiveris, Lattanzi, Mirrokni, Rastogi, Vassilvitskii — "Connected
  Components in MapReduce and Beyond", SoCC'14). Converges in
  O(log^2 n) rounds regardless of diameter — the 100 TB path: a
  propagation kernel needs diameter rounds (a 10^6-long chain of
  near-dups would need 10^6 shuffles), large-star/small-star collapses
  it in ~40. Per round: one symmetrize + groupBy-min + join. Lineage is
  cut every round via localCheckpoint, mirroring the PageRank loop
  discipline (operators/pagerank.py) — each round references the prior
  frame several times, so an uncut plan grows exponentially.

Scale notes: edges are persisted per round and unpersisted after the
next round materializes (two live edge sets max). Convergence is a
checksum comparison (count + sum of xxhash64(u,v)) — two scalar aggs,
no driver-side edge materialization ever. Star operations only shrink
or redirect edges, so the working set is bounded by the input edge
count; the final state (a star per component) is O(#non-root nodes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _sym(edges: DataFrame) -> DataFrame:
    """Both directions of every edge, self-loops dropped. Input columns
    (u, v)."""
    fwd = edges.select("u", "v")
    rev = edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    return fwd.unionByName(rev).where(F.col("u") != F.col("v")).distinct()


def nodes_of(edges: DataFrame) -> DataFrame:
    """Distinct node set of an (u, v) edge list."""
    return (
        edges.select(F.col("u").alias("node"))
        .unionByName(edges.select(F.col("v").alias("node")))
        .distinct()
    )


def cc_propagate(
    edges: DataFrame, iterations: int, node_col: str = "node"
) -> DataFrame:
    """Fixed-iteration min-label propagation -> (node, component).

    label_0(n) = n; label_{k+1}(n) = min(label_k(n), min over neighbors m
    of label_k(m)). Exactly ``iterations`` rounds — deterministic whether
    or not converged, so the DuckDB oracle can unroll it. Use
    connected_components() when the diameter is unknown.
    """
    sym = _sym(edges).localCheckpoint(eager=False)
    labels = nodes_of(edges).select(
        F.col("node"), F.col("node").alias("label")
    )
    for _ in range(iterations):
        msgs = sym.join(
            labels.withColumnRenamed("node", "u"), "u"
        ).select(F.col("v").alias("node"), "label")
        labels = (
            labels.unionByName(msgs)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            # each round references the previous labels twice; cut the
            # lineage or the logical plan doubles per round (the same
            # pathology the star kernel's loop guards against)
            .localCheckpoint(eager=False)
        )
    return labels.select(
        F.col("node").alias(node_col), F.col("label").alias("component")
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(Γ(u) ∪ {u}).

    Symmetrizes internally (the paper's map phase emits (u,v) AND (v,u))
    so it composes with small-star's directed output across rounds.
    """
    sym = _sym(edges)
    mins = sym.groupBy("u").agg(F.min("v").alias("mv"))
    mins = mins.select("u", F.least("u", "mv").alias("m"))
    # no trailing .distinct(): the output feeds exactly one consumer —
    # small-star's orientation distinct — which dedups anyway; the
    # back-to-back distinct exchanges were redundant (one full shuffle
    # per round). Duplicate (v, m) rows (same target reached via two
    # centers) are bounded by the input edge count.
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient edges large->small; connect every member of Γ(u) ∪ {u} to
    the minimum."""
    oriented = (
        edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    mins = oriented.groupBy("u").agg(F.min("v").alias("m"))
    members = (
        oriented.join(mins, "u")
        .select(F.col("v").alias("node"), "m")
        .unionByName(mins.select(F.col("u").alias("node"), "m"))
    )
    return (
        members.where(F.col("node") != F.col("m"))
        .select(F.col("node").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _checksum(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count(F.lit(1)).alias("c"),
        # bit_xor: order-independent, overflow-free under ANSI mode
        # (edge sets are distinct, so xor-cancellation can't collide
        # two different sets that also share a count)
        F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["c"]), int(row["h"])


def connected_components(
    edges: DataFrame,
    node_col: str = "node",
    max_rounds: int = 50,
) -> DataFrame:
    """(node, component) for every node of the undirected (u, v) edge
    list; component = min node id of the connected component.

    Alternating large-star/small-star until the edge set is stable
    (checksum-equal two rounds running) — O(log^2 n) rounds, so a
    corpus-scale pair graph with million-hop chains still converges in
    tens of shuffles. Raises if ``max_rounds`` alternations don't
    converge (50 covers n ~ 2^25 components chains with margin; real
    dedup graphs converge in < 10).
    """
    all_nodes = nodes_of(edges).persist()
    # canonical orientation (large -> small, distinct): the same form
    # small-star emits, so round-over-round checksums are comparable
    cur = (
        edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .where(F.col("u") != F.col("v"))
        .distinct()
        .persist()
    )
    held: list[DataFrame] = [all_nodes, cur]  # everything persisted/checkpointed
    try:
        prev_sig = _checksum(cur)
        last: DataFrame | None = None
        for rnd in range(1, max_rounds + 1):
            # localCheckpoint EVERY round: each alternation references the
            # previous round's frame several times (symmetrize + two
            # neighborhood joins), so an un-truncated lineage grows the
            # logical plan exponentially and Catalyst analysis time blows
            # up by round ~4 (measured). The checkpointed edge set is
            # bounded by the input edge count, O(log^2 n) rounds.
            nxt = _small_star(_large_star(cur)).localCheckpoint(eager=True)
            held.append(nxt)
            sig = _checksum(nxt)
            if last is not None:
                last.unpersist()
                held.remove(last)
            last, cur = cur, nxt
            if sig == prev_sig:
                break
            prev_sig = sig
        else:
            raise RuntimeError(
                f"connected_components did not converge in {max_rounds} rounds"
            )
        # at the fixed point every edge is (member, component-min): the
        # star. Materialize the (small) label frame eagerly so every
        # intermediate cache can be released before returning.
        labels = (
            all_nodes.join(
                cur.withColumnRenamed("u", "node"), "node", "left"
            )
            .select(
                F.col("node").alias(node_col),
                F.coalesce("v", "node").alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        return labels
    finally:
        for df in held:
            df.unpersist()


def components_from_pairs(
    pairs: DataFrame, a_col: str = "doc_a", b_col: str = "doc_b",
    iterations: int | None = None,
) -> DataFrame:
    """(doc_id, component) from a near-dup pair list. With ``iterations``
    uses the SQL-unrollable fixed-iteration propagation kernel; without,
    the convergence-checked star algorithm."""
    edges = pairs.select(
        F.col(a_col).alias("u"), F.col(b_col).alias("v")
    )
    if iterations is not None:
        return cc_propagate(edges, iterations, node_col="doc_id")
    return connected_components(edges, node_col="doc_id")


def dedup_keep_canonical(
    docs: DataFrame,
    pairs: DataFrame,
    doc_id_col: str = "doc_id",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    iterations: int | None = None,
) -> DataFrame:
    """Rows of ``docs`` that survive transitive near-dup dedup: for each
    connected component of the pair graph keep only the minimum doc id;
    docs in no pair pass through untouched.

    One broadcast-or-shuffle anti-join against the (small) set of
    non-canonical members — never a join against the pair list itself,
    whose transitivity gaps would make the kept set order-dependent.
    """
    comp = components_from_pairs(pairs, a_col, b_col, iterations=iterations)
    losers = comp.where(F.col("doc_id") != F.col("component")).select(
        # pair ids are often strings (hash-keyed pipelines) while the doc
        # table keys are longs: cast to the doc table's dtype so the
        # anti-join is an equi-join, not a both-sides-to-double coercion
        F.col("doc_id").cast(docs.schema[doc_id_col].dataType).alias(doc_id_col)
    )
    return docs.join(losers, doc_id_col, "left_anti")
