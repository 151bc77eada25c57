"""Bloom-filter join pruning — the runtime-filter pattern: build a
compact bitmap over the build side's join keys, broadcast it as plan
literals, and pre-filter the (huge) probe side map-side BEFORE the
shuffle join. At 100 TB this is the difference between shuffling every
probe row and shuffling only the ~|build|/|probe| fraction that can
match (plus a bounded false-positive tail).

Spark's own runtime filters (`spark.sql.optimizer.runtimeFilter.*`) do
this opportunistically; this operator makes it explicit, portable and
deterministic: positions come from md5 (same arithmetic in the DuckDB
oracle — membership semantics are hash-gated, false positives and all).

Sizing: false-positive rate ~ (1 - e^(-k*n/m))^k; the defaults
(m=65536 bits, k=4) hold ~4k keys at <2% fp. Scale m with the build
cardinality — the bitmap is m/64 longs folded into the plan, so keep
m <= a few million bits (a real deployment would move larger bitmaps
into a broadcast variable; same semantics).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_bucket


def _pos(key: Column, h: int, m_bits: int) -> Column:
    """Deterministic bit position for hash h — md5-prefix arithmetic,
    identical in the SQL oracle."""
    return md5_bucket(key, m_bits, salt=f"{h}:")


def build_bloom(
    keys: DataFrame,
    key_col: str,
    m_bits: int = 1 << 16,
    k_hashes: int = 4,
) -> list[int]:
    """Bitmap words (m_bits/64 longs) over the distinct keys. The
    distributed part is one explode+distinct over positions (bounded by
    m_bits rows); the driver folds them into longs."""
    pos_rows = (
        # NULL keys can never equi-join, so the exact join this filter
        # accelerates would drop them — drop them here too (a NULL key
        # would otherwise yield a NULL position and crash the fold)
        keys.where(F.col(key_col).isNotNull())
        .select(
            F.explode(
                F.array(
                    *[_pos(F.col(key_col), h, m_bits) for h in range(k_hashes)]
                )
            ).alias("pos")
        )
        .distinct()
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in pos_rows:
        p = int(r["pos"])
        words[p // 64] |= 1 << (p % 64)
    # signed-int64 representation (bit 63 set would overflow LongType);
    # the arithmetic >> in the membership check sign-extends, but the
    # & 1 mask after shifting still reads the original bit
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_prune(
    probe: DataFrame,
    key_col: str,
    bitmap: list[int],
    m_bits: int = 1 << 16,
    k_hashes: int = 4,
) -> DataFrame:
    """Rows of ``probe`` whose key passes the Bloom membership test —
    a pure map-side filter (constant bitmap array in the plan, whole-
    stage codegen); contains every true match plus deterministic false
    positives. Follow with the exact join; the shuffle then carries
    only survivors."""
    # ONE ArrayType literal (not CreateArray over m/64 child literals —
    # at m=2^20+ that expression tree dominates plan/codegen time; a
    # single literal keeps the plan O(1) nodes no matter the bitmap size)
    bm = F.lit([int(w) for w in bitmap]).cast("array<long>")
    out = probe.withColumn("_bm", bm)
    cond = None
    for h in range(k_hashes):
        out = out.withColumn(f"_p{h}", _pos(F.col(key_col), h, m_bits))
        c = F.expr(
            f"((_bm[cast(_p{h} / 64 as int)] >> cast(_p{h} % 64 as int)) & 1) = 1"
        )
        cond = c if cond is None else (cond & c)
    return out.where(cond).drop(
        "_bm", *[f"_p{h}" for h in range(k_hashes)]
    )
