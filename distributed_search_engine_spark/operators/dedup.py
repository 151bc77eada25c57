"""Deduplication operators for large-scale training-data pipelines.

All shuffles are keyed to spread load (content hash, shingle, band key);
candidate generation never goes O(N^2) — pairs come from equi-joins on
shingles / band buckets, which is the LSH scale path. Exact verification
(jaccard) runs only on candidate pairs.

Operators:
  exact_dedup          — sha256(content) group, keep min doc_id
  shingles             — word n-gram shingles via window lead (JVM-side)
  minhash_signatures   — H min-hashes per doc (md5-derived, engine-portable)
  lsh_candidate_pairs  — banding -> bucket join -> distinct pairs
  jaccard_pairs        — exact n-gram jaccard for candidate (or all) pairs
  simhash              — 32-bit majority-vote fingerprint + hamming pairs
  embedding_neardup    — cosine-similar pairs over an embedding column
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_SHINGLE_N = 3
DEFAULT_MINHASHES = 16
DEFAULT_BANDS = 4
SIMHASH_BITS = 32
HASH_MOD = 1_000_000_007


def exact_dedup(docs: DataFrame, doc_id_col: str = "doc_id", content_col: str = "text") -> DataFrame:
    """(content_sha, keep_doc_id, n_dupes): one row per distinct content;
    keep = min doc_id. One shuffle on the hash — no skew (sha is uniform)."""
    return (
        docs.select(
            F.sha2(F.col(content_col), 256).alias("content_sha"),
            F.col(doc_id_col).cast("string").alias("doc_id"),
        )
        .groupBy("content_sha")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).cast("int").alias("n_dupes"),
        )
    )


def _tokens(docs: DataFrame, doc_id_col: str, content_col: str) -> DataFrame:
    from ..functions import text as T

    toks = docs.select(
        F.col(doc_id_col).cast("string").alias("doc_id"),
        F.posexplode(T.tokens_col(F.col(content_col))).alias("pos0", "tok"),
    )
    return toks.select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")


def shingles(
    docs: DataFrame,
    n: int = DEFAULT_SHINGLE_N,
    doc_id_col: str = "doc_id",
    content_col: str = "text",
) -> DataFrame:
    """(doc_id, shingle): distinct word n-grams, built with window lead()
    so the same SQL shape works in the DuckDB oracle."""
    t = _tokens(docs, doc_id_col, content_col)
    w = Window.partitionBy("doc_id").orderBy("pos")
    cols = [F.col("tok")] + [F.lead("tok", i).over(w) for i in range(1, n)]
    sh = t.select("doc_id", F.concat_ws(" ", *cols).alias("shingle"), *[
        F.lead("tok", i).over(w).alias(f"_l{i}") for i in range(1, n)
    ])
    sh = sh.where(F.col(f"_l{n-1}").isNotNull()).select("doc_id", "shingle")
    return sh.distinct()


def minhash_signatures(
    shingles_df: DataFrame, n_hashes: int = DEFAULT_MINHASHES
) -> DataFrame:
    """(doc_id, mh_0..mh_{H-1}): per-doc min over md5('<h>:'||shingle).

    String-min over md5 hex is engine-portable (identical in Spark and
    DuckDB) and uniform. At scale this is one groupBy(doc_id) with map-side
    partial min aggregation."""
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{h}:"), F.col("shingle")))).alias(f"mh_{h}")
        for h in range(n_hashes)
    ]
    return shingles_df.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(
    signatures: DataFrame,
    n_hashes: int = DEFAULT_MINHASHES,
    bands: int = DEFAULT_BANDS,
) -> DataFrame:
    """(doc_a, doc_b) candidate pairs sharing at least one LSH band.

    rows_per_band = n_hashes / bands; band key = concat of that band's
    min-hashes. Bucket join on (band_id, band_key) — the only shuffle —
    then distinct pairs with doc_a < doc_b."""
    rows_per_band = n_hashes // bands
    band_cols = []
    for b in range(bands):
        key = F.concat_ws(
            "|", *[F.col(f"mh_{b * rows_per_band + i}") for i in range(rows_per_band)]
        )
        band_cols.append(F.struct(F.lit(b).alias("band_id"), key.alias("band_key")))
    banded = signatures.select(
        "doc_id", F.explode(F.array(*band_cols)).alias("band")
    ).select("doc_id", "band.band_id", "band.band_key")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def jaccard_pairs(
    shingles_df: DataFrame,
    threshold: float = 0.0,
    candidates: DataFrame | None = None,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """(doc_a, doc_b, jaccard): exact n-gram jaccard.

    Scale path (``candidates`` given — the LSH pipeline): common-shingle
    counts come from two doc-keyed equi-joins against the candidate pair
    list, so work is O(|candidates| x shingles-per-doc) — the shingle
    self-join (quadratic inside any hot-shingle bucket) never runs.

    Unrestricted path (candidates=None): exact verification kernel via the
    shingle self-join; ``max_shingle_df`` drops shingles appearing in more
    than K docs first (boilerplate shingles dominate hot buckets and carry
    ~no similarity signal — standard MinHash-pipeline hygiene; changes
    jaccard slightly, so it is opt-in and off for oracle-gated runs).

    |A ∪ B| = |A| + |B| - common; sizes always use the FULL shingle sets.
    """
    sizes = shingles_df.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    if candidates is not None:
        a = shingles_df.select(F.col("doc_id").alias("doc_a"), "shingle")
        b = shingles_df.select(
            F.col("doc_id").alias("_doc_b"), F.col("shingle").alias("_shingle_b")
        )
        common = (
            candidates.select("doc_a", "doc_b")
            .join(a, "doc_a")
            .join(
                b,
                (F.col("doc_b") == F.col("_doc_b"))
                & (F.col("shingle") == F.col("_shingle_b")),
            )
            .groupBy("doc_a", "doc_b")
            .agg(F.count(F.lit(1)).alias("common"))
        )
    else:
        joinable = shingles_df
        if max_shingle_df is not None:
            hot = (
                shingles_df.groupBy("shingle")
                .agg(F.count(F.lit(1)).alias("_df"))
                .where(F.col("_df") > max_shingle_df)
                .select("shingle")
            )
            joinable = shingles_df.join(F.broadcast(hot), "shingle", "left_anti")
        a = joinable.alias("a")
        b = joinable.alias("b")
        common = (
            a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
            .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
            .agg(F.count(F.lit(1)).alias("common"))
        )
    out = (
        common.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sza"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "szb"), "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (F.col("common") / (F.col("sza") + F.col("szb") - F.col("common"))).alias("jaccard"),
        )
    )
    return out.where(F.col("jaccard") >= threshold)


def simhash(docs: DataFrame, doc_id_col: str = "doc_id", content_col: str = "text") -> DataFrame:
    """(doc_id, simhash): 32-bit majority-vote fingerprint over tokens
    (with multiplicity). Bit b of token = bit (b%4) of hex nibble
    (b//4 + 1) of md5(token) — portable to the SQL oracle via instr().

    Physical shape: explode tokens x 32 bit-ids (sequence+explode), one
    groupBy (doc_id, bit) with partial agg, one groupBy(doc_id)."""
    t = _tokens(docs, doc_id_col, content_col).select(
        "doc_id", F.md5(F.col("tok")).alias("h")
    )
    bits = t.select(
        "doc_id", "h", F.explode(F.sequence(F.lit(0), F.lit(SIMHASH_BITS - 1))).alias("b")
    )
    nibble = F.col("h").substr((F.col("b") / 4).cast("int") + 1, F.lit(1))
    nibval = (F.instr(F.lit("0123456789abcdef"), nibble) - 1).alias("nv")
    per_bit = (
        bits.select("doc_id", "b", nibval)
        .select(
            "doc_id",
            "b",
            F.when(
                F.expr("shiftright(nv, CAST(b % 4 AS INT)) % 2") == 1, 1
            ).otherwise(-1).alias("v"),
        )
        .groupBy("doc_id", "b")
        .agg(F.sum("v").alias("s"))
    )
    return per_bit.groupBy("doc_id").agg(
        F.sum(
            F.when(
                F.col("s") > 0,
                F.expr("shiftleft(CAST(1 AS BIGINT), CAST(b AS INT))"),
            ).otherwise(F.lit(0).cast("long"))
        ).alias("simhash")
    )


def simhash_pairs(
    sim: DataFrame, max_hamming: int = 3, exact: bool = False
) -> DataFrame:
    """(doc_a, doc_b, hamming) with hamming <= max_hamming.

    Scale path (default): band the fingerprint into max_hamming + 1 bit
    chunks. Pigeonhole: any pair within hamming <= max_hamming agrees on at
    least one full chunk, so the (chunk_id, chunk_value) equi-join is a
    RECALL-COMPLETE candidate generator — output is identical to the
    all-pairs kernel, but the only shuffles are the chunk-key join and the
    final pair distinct. (Chunk values of near-empty docs can hot-spot one
    bucket; the exact hamming filter runs inside the join, so a hot bucket
    costs time, never correctness.)

    ``exact=True`` runs the O(N^2) theta-join verification kernel (tiny
    inputs / differential tests only).
    """
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    if exact:
        a, b = sim.alias("a"), sim.alias("b")
        return (
            a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                ham.alias("hamming"),
            )
            .where(F.col("hamming") <= max_hamming)
        )
    n_chunks = max_hamming + 1
    w = SIMHASH_BITS // n_chunks
    chunks = []
    for c in range(n_chunks):
        width = w if c < n_chunks - 1 else SIMHASH_BITS - w * (n_chunks - 1)
        mask = (1 << width) - 1
        val = F.expr(f"shiftright(simhash, {c * w}) & {mask}")
        chunks.append(
            F.struct(F.lit(c).alias("chunk_id"), val.alias("chunk_val"))
        )
    banded = sim.select(
        "doc_id", "simhash", F.explode(F.array(*chunks)).alias("ch")
    ).select("doc_id", "simhash", "ch.chunk_id", "ch.chunk_val")
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk_id") == F.col("b.chunk_id"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            ham.alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


NEARDUP_BANDS = 4
NEARDUP_PLANES = 8


def _vec_pairs_cosine(v: DataFrame, pairs: DataFrame) -> DataFrame:
    """Attach exact cosine to (id_a, id_b) pairs; float64 sequential fold,
    same accumulation order as the SQL oracle."""
    va = v.select(F.col("id").alias("id_a"), F.col("v").alias("va"))
    vb = v.select(F.col("id").alias("id_b"), F.col("v").alias("vb"))
    dot = F.aggregate(
        F.zip_with(F.col("va"), F.col("vb"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(
        F.aggregate(F.col(c), F.lit(0.0), lambda acc, x: acc + x * x)
    )
    return (
        pairs.join(va, "id_a")
        .join(vb, "id_b")
        .select("id_a", "id_b", (dot / (norm("va") * norm("vb"))).alias("cosine"))
    )


def embedding_neardup(
    emb: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_dims: int = 64,
    n_bands: int = NEARDUP_BANDS,
    n_planes: int = NEARDUP_PLANES,
    exact: bool = False,
) -> DataFrame:
    """(id_a, id_b, cosine) pairs with cosine >= threshold.

    Scale path (default): multi-band sign-projection LSH. Band b buckets
    every vector by the sign pattern of n_planes deterministic hyperplanes
    (similarity.plane_weight, planes b*n_planes..), candidates = pairs
    sharing any band's full bucket (equi-join on (band, bucket) — the only
    pair-generating shuffle), exact cosine computed on candidates only.
    Sign-LSH recall is < 1 by design (rises with n_bands, falls with
    n_planes; candidates shrink ~2^-n_planes per band) — the oracle twin
    (oracle.embedding_neardup_lsh_sql) applies the IDENTICAL banding, and
    the all-pairs kernel below (exact=True) is the differential baseline.

    ``exact=True``: O(N^2) theta join — correct on anything, affordable on
    nothing big."""
    v = emb.select(
        F.col(id_col).cast("long").alias("id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    if exact:
        a, b = v.alias("a"), v.alias("b")
        pairs = a.join(b, F.col("a.id") < F.col("b.id")).select(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
    else:
        from .similarity import _bucket_expr

        band_structs = [
            F.struct(
                F.lit(b).alias("band_id"),
                _bucket_expr(
                    F.col("v"), n_dims, n_planes, plane_offset=b * n_planes
                ).alias("bucket"),
            )
            for b in range(n_bands)
        ]
        banded = v.select(
            "id", F.explode(F.array(*band_structs)).alias("bb")
        ).select("id", "bb.band_id", "bb.bucket")
        a, b = banded.alias("a"), banded.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.id") < F.col("b.id")),
            )
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .distinct()
        )
    return _vec_pairs_cosine(v, pairs).where(F.col("cosine") >= threshold)
