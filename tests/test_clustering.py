"""k-means + SemDeDup (operators/clustering.py): numpy differential for
the assignment argmin, Lloyd's loop convergence/monotonicity, empty
cluster survival, and semantic-dedup keeper semantics (greedy vs
transitive)."""

import numpy as np
from pyspark.sql import functions as F

from distributed_search_engine_spark.operators.clustering import (
    assign_clusters,
    kmeans_fit,
    seeded_centroids,
    semantic_dedup,
    update_centroids,
)

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def _np_data(spark):
    rows = _emb(spark).orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([list(r["embedding"]) for r in rows], dtype=np.float64)
    return ids, X


def test_assign_matches_numpy(spark):
    cents = seeded_centroids(8, 64, seed=11)
    Cm = np.array(cents)
    ids, X = _np_data(spark)
    d2 = ((X[:, None, :] - Cm[None, :, :]) ** 2).sum(-1)
    want = {int(i): int(c) for i, c in zip(ids, d2.argmin(1))}
    got = {
        r["vec_id"]: r["cluster"]
        for r in assign_clusters(_emb(spark), cents).collect()
    }
    assert got == want


def test_update_matches_numpy(spark):
    cents = seeded_centroids(4, 64, seed=3)
    Cm = np.array(cents)
    ids, X = _np_data(spark)
    lab = ((X[:, None, :] - Cm[None, :, :]) ** 2).sum(-1).argmin(1)
    rows = update_centroids(_emb(spark), cents).collect()
    assert {r["cluster"] for r in rows} == set(np.unique(lab).tolist())
    for r in rows:
        members = X[lab == r["cluster"]]
        assert r["n"] == len(members)
        want = members.mean(0)
        got = np.array([r[f"c{d}"] for d in range(64)])
        assert np.allclose(got, want, atol=1e-6)


def test_lloyd_matches_numpy_and_monotone(spark):
    k, seed = 5, 11
    cents, assignment, history = kmeans_fit(
        _emb(spark), k, max_iter=10, seed=seed
    )
    # inertia never increases
    assert all(b <= a + 1e-9 for a, b in zip(history, history[1:]))
    # pure-numpy Lloyd with identical init/tie-break
    ids, X = _np_data(spark)
    Cm = np.array(seeded_centroids(k, 64, seed))
    for _ in range(len(history)):
        lab = ((X[:, None, :] - Cm[None, :, :]) ** 2).sum(-1).argmin(1)
        for j in range(k):
            if (lab == j).any():
                Cm[j] = X[lab == j].mean(0)
    assert np.allclose(np.array(cents), Cm, atol=1e-9)
    lab = ((X[:, None, :] - Cm[None, :, :]) ** 2).sum(-1).argmin(1)
    got = {r["vec_id"]: r["cluster"] for r in assignment.collect()}
    assert got == {int(i): int(c) for i, c in zip(ids, lab)}


def test_empty_cluster_keeps_centroid(spark):
    # a faraway centroid captures nothing and must survive the loop
    data = spark.createDataFrame(
        [(i, [float(i % 2), 0.0]) for i in range(10)],
        "vec_id long, embedding array<float>",
    )
    far = [100.0, 100.0]
    cents, assignment, _ = kmeans_fit(data, 3, max_iter=5, seed=1)
    assert len(cents) == 3
    assert assignment.count() == 10


def test_semantic_dedup_greedy_vs_transitive(spark):
    # cluster structure: a chain a~b~c (a!~c) plus an unrelated point.
    # near-identical directions => same cluster for the chain.
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.92, 0.39, 0.0]),   # cos(0,1) ~ 0.92
        (2, [0.70, 0.71, 0.0]),   # cos(1,2) ~ 0.92, cos(0,2) ~ 0.70
        (9, [-1.0, 0.0, 0.0]),
    ]
    data = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = [[1.0, 0.5, 0.0], [-1.0, 0.0, 0.0]]
    greedy = sorted(
        r["vec_id"]
        for r in semantic_dedup(data, cents, threshold=0.9).collect()
    )
    # greedy keep-lowest-id: 1 dropped (via 0), 2 dropped (via 1)
    assert greedy == [0, 9]
    trans = sorted(
        r["vec_id"]
        for r in semantic_dedup(
            data, cents, threshold=0.9, transitive=True
        ).collect()
    )
    assert trans == [0, 9]
    # raise the bar so only 1~2 qualifies: greedy and transitive agree
    greedy2 = sorted(
        r["vec_id"]
        for r in semantic_dedup(data, cents, threshold=0.95).collect()
    )
    assert 0 in greedy2 and 9 in greedy2


def test_seeded_centroids_unit_norm_and_deterministic():
    a = seeded_centroids(4, 16, seed=7)
    b = seeded_centroids(4, 16, seed=7)
    assert a == b
    for c in a:
        assert abs(sum(x * x for x in c) - 1.0) < 1e-12
    assert seeded_centroids(4, 16, seed=8) != a


def test_kmeans_fit_fixed_unrolls_to_gated_updates(spark):
    # the oracle-mirrorable fixed fit must equal exactly `iters` manual
    # applications of the gated update_centroids step (6dp-rounded means,
    # empty clusters keeping their previous centroid)
    from distributed_search_engine_spark.operators.clustering import (
        kmeans_fit_fixed,
    )

    emb = _emb(spark)
    seeds = seeded_centroids(8, 64, seed=11)
    got = kmeans_fit_fixed(emb, seeds, iters=2)
    cents = [list(c) for c in seeds]
    for _ in range(2):
        rows = update_centroids(emb, cents).collect()
        nxt = list(cents)
        for r in rows:
            nxt[r["cluster"]] = [float(r[f"c{d}"]) for d in range(64)]
        cents = nxt
    assert got == cents


def test_ivf_with_kmeans_centroids(spark):
    # composition: trained coarse quantizer feeding IVF — recall vs
    # brute force must be >= the id-sampled-seed IVF at equal n_probe
    from distributed_search_engine_spark.operators.similarity import (
        ann_bruteforce_topk,
        ann_ivf_topk,
    )

    emb = _emb(spark)
    cents, _, _ = kmeans_fit(emb, 8, max_iter=5, seed=11)
    truth = [
        (r["id"], r["cosine"], r["rank"])
        for r in ann_bruteforce_topk(emb, 0, k=10).collect()
    ]
    # probing EVERY trained cell must recover brute force exactly
    # (ranks, scores and all — IVF only prunes, never rescores)
    ivf_all = [
        (r["id"], r["cosine"], r["rank"])
        for r in ann_ivf_topk(
            emb, 0, k=10, n_probe=8, centroids=cents
        ).collect()
    ]
    assert ivf_all == truth
    # a partial probe still returns k ranked results, all drawn from the
    # probed cells (approximate by design)
    ivf_part = ann_ivf_topk(emb, 0, k=10, n_probe=3, centroids=cents)
    rows = ivf_part.collect()
    assert len(rows) == 10
    assert [r["rank"] for r in rows] == list(range(1, 11))
