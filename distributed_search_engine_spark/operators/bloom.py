"""Bloom-filter join pruning — the runtime-filter pattern: build a
compact bitmap over the build side's join keys, broadcast it as plan
literals, and pre-filter the (huge) probe side map-side BEFORE the
shuffle join. At 100 TB this is the difference between shuffling every
probe row and shuffling only the ~|build|/|probe| fraction that can
match (plus a bounded false-positive tail).

Spark's own runtime filters (`spark.sql.optimizer.runtimeFilter.*`) do
this opportunistically; this operator makes it explicit and
deterministic, with two hash families: 'portable' derives ALL k bit
positions from ONE md5 digest per key (8-hex-char slices — the same
one-digest trick as the MinHash affine family), and the DuckDB oracle
mirrors the slice arithmetic exactly so membership semantics are
hash-gated, false positives and all; 'fast' is ONE JVM-native xxhash64
per key expanded by Kirsch-Mitzenmacher double hashing — cheaper in
CPU terms than md5+conv (matters when the probe scan is CPU-bound) but
not SQL-twinnable. Measured on this host the two families are within
noise of each other once the bitmap access is O(1) — the dominant cost
was never the hash but the bitmap representation (see bloom_prune).

Sizing: false-positive rate ~ (1 - e^(-k*n/m))^k; the defaults
(m=65536 bits, k=4) hold ~4k keys at <2% fp. Scale m with the build
cardinality — the bitmap rides the plan as ONE m/8-byte binary
literal probed byte-at-a-time (O(1) in m per row), so tens of
millions of bits are fine; past that a real deployment would move the
bitmap into a broadcast variable (same semantics). k_hashes <= 4 for
'portable' because an md5 digest yields four disjoint 8-hex slices.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _slice_pos(digest: Column, h: int, m_bits: int) -> Column:
    """Bit position h: hex chars [1+8h, 8+8h] of the md5 digest as a
    long, mod m_bits. Oracle twin:
    ('0x' || substr(md5(key), 1 + 8*h, 8))::bigint % m_bits."""
    return F.pmod(
        F.conv(F.substring(digest, 1 + 8 * h, 8), 16, 10).cast("long"),
        F.lit(m_bits),
    )


def _base_hash(key: Column, family: str) -> Column:
    """ONE base hash per key — projected as its own column by every
    caller so it runs once per row (CollapseProject refuses to inline a
    non-cheap alias referenced k times, the same contract
    minhash_signatures relies on).

    'portable': the md5 hex digest — cross-engine deterministic, what
    every hash gate pins (DuckDB mirrors the slice arithmetic exactly);
    k <= 4 (a digest has four disjoint 8-hex slices).

    'fast': JVM-native xxhash64 — the production family for
    corpus-scale probes (~10x cheaper per row than md5+conv), NOT
    SQL-twinnable (DuckDB has no xxhash64), which is exactly why
    'portable' exists."""
    if family == "portable":
        return F.md5(key.cast("string"))
    if family == "fast":
        return F.xxhash64(key)
    raise ValueError(f"unknown hash family {family!r}")


def _positions(base: Column, m_bits: int, k_hashes: int, family: str) -> list[Column]:
    """The k bit positions from the base-hash column.

    'portable': disjoint 8-hex slices of the digest.
    'fast': Kirsch-Mitzenmacher double hashing — pos_i = (h1 + i*h2)
    mod m with h1 = upper 32 bits, h2 = lower 32 bits | 1 (odd, so the
    stride cycles all of m). Same false-positive asymptotics as k
    independent hashes (Kirsch & Mitzenmacher, ESA'06)."""
    if family == "portable":
        return [_slice_pos(base, h, m_bits) for h in range(k_hashes)]
    h1 = F.shiftrightunsigned(base, 32)
    h2 = base.bitwiseAND(F.lit(0xFFFFFFFF)).bitwiseOR(F.lit(1))
    return [F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)) for i in range(k_hashes)]


def build_bloom(
    keys: DataFrame,
    key_col: str,
    m_bits: int = 1 << 16,
    k_hashes: int = 4,
    hash_family: str = "portable",
) -> bytes:
    """Bitmap bytes (m_bits/8, bit i of byte j = position j*8+i).
    Fully distributed: one base hash per key (see _positions), explode
    the k positions, fold bits into 64-bit words with a map-side-partial
    bit_or aggregate — the driver collects at most m_bits/64
    (word, bits) rows, never the raw positions — then serializes the
    words little-endian."""
    if hash_family == "portable" and not 1 <= k_hashes <= 4:
        raise ValueError(f"portable k_hashes must be in 1..4, got {k_hashes}")
    word_rows = (
        # NULL keys can never equi-join, so the exact join this filter
        # accelerates would drop them — drop them here too (a NULL key
        # would otherwise yield a NULL position and crash the fold)
        keys.where(F.col(key_col).isNotNull())
        .select(_base_hash(F.col(key_col), hash_family).alias("_b"))
        .select(
            F.explode(
                F.array(*_positions(F.col("_b"), m_bits, k_hashes, hash_family))
            ).alias("pos")
        )
        .groupBy((F.col("pos") / 64).cast("int").alias("w"))
        .agg(
            F.bit_or(
                F.expr("shiftleft(1L, cast(pos % 64 as int))")
            ).alias("bits")
        )
        .collect()
    )
    buf = bytearray(m_bits // 8)
    for r in word_rows:
        w = int(r["w"])
        # shiftleft yields the signed-int64 word; mask back to unsigned
        # for the byte serialization (bit layout is what matters)
        buf[w * 8 : w * 8 + 8] = (int(r["bits"]) & ((1 << 64) - 1)).to_bytes(
            8, "little"
        )
    return bytes(buf)


def bloom_prune(
    probe: DataFrame,
    key_col: str,
    bitmap: bytes,
    m_bits: int = 1 << 16,
    k_hashes: int = 4,
    hash_family: str = "portable",
) -> DataFrame:
    """Rows of ``probe`` whose key passes the Bloom membership test —
    a pure map-side filter, whole-stage codegen, ONE base hash per row;
    contains every true match plus deterministic false positives.
    Follow with the exact join; the shuffle then carries only survivors.

    The bitmap rides the plan as ONE BinaryType literal and every probe
    reads a single byte via substring — O(1) in m_bits per row. (The
    previous array<long>-literal representation was measured at ~90 s
    for 8M probes at m=2^23 vs ~6 s for this byte form: per-row access
    cost grew with the literal array size.)"""
    if hash_family == "portable" and not 1 <= k_hashes <= 4:
        raise ValueError(f"portable k_hashes must be in 1..4, got {k_hashes}")
    if len(bitmap) != m_bits // 8:
        raise ValueError(
            f"bitmap has {len(bitmap)} bytes, expected {m_bits // 8} for m_bits={m_bits}"
        )
    bm = F.lit(bytes(bitmap))
    out = probe.select(
        "*", _base_hash(F.col(key_col), hash_family).alias("_b")
    ).select(
        "*",
        bm.alias("_bm"),
        *[
            p.alias(f"_p{h}")
            for h, p in enumerate(
                _positions(F.col("_b"), m_bits, k_hashes, hash_family)
            )
        ],
    )
    cond = None
    for h in range(k_hashes):
        c = F.expr(
            f"((conv(hex(substring(_bm, cast(_p{h} / 8 as int) + 1, 1)), 16, 10)"
            f" >> cast(_p{h} % 8 as int)) & 1) = 1"
        )
        cond = c if cond is None else (cond & c)
    return out.where(cond).drop(
        "_bm", "_b", *[f"_p{h}" for h in range(k_hashes)]
    )
