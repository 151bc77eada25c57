"""Skew-mitigated equi-join (salting) — the manual fix for the one
pathology AQE's skew handling can't always save: a shuffle join where
a handful of hot keys put most of the fact table into a few reducer
tasks.

``salted_join`` replicates each dim row ``n_salts`` times (dim side is
the SMALL side — replication cost is n_salts x |dim|) and gives every
fact row a deterministic salt in [0, n_salts); the join key becomes
(key, salt), so a hot key's rows spread over ``n_salts`` reducers
instead of one. The output is ROW-IDENTICAL to the plain equi-join —
which is exactly what the oracle checks (the DuckDB twin is the plain
join): salting is a physical rewrite, not a semantic one.

The salt is md5-derived from a row identity column (deterministic,
reproducible) rather than rand() — same rows, same placement, every
run and both engines.

The index build's hot/cold salted caps (operators/postings.apply_caps)
use the same idea for aggregation; this operator is the join-side
form, applied to any fact ⋈ dim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_bucket


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    fact_id_col: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """fact ⋈ dim on ``key`` with ``n_salts``-way salting. Supported
    ``how``: inner / left. Row-identical to fact.join(dim, key, how)."""
    if how not in ("inner", "left"):
        raise ValueError(f"unsupported how={how!r}")
    # coalesce: a NULL row id must still land in SOME salt bucket, or
    # the (key, salt) join would drop/null-extend rows the plain join
    # keyed only on `key` would match — breaking the row-identity
    # contract
    salt = F.coalesce(
        md5_bucket(F.col(fact_id_col), n_salts, salt="salt:"), F.lit(0)
    ).cast("int")
    f = fact.withColumn("_salt", salt)
    d = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(s) for s in range(n_salts)]))
    )
    return f.join(d, [key, "_salt"], how).drop("_salt")

