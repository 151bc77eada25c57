"""Local mimic of the driver's correctness gate: run every queries() entry
on Spark at sf0.01, run the matching oracle_sql() in DuckDB on the same
parquet, and compare row count, schema (column names), and an
order-insensitive value hash.

Usage: python tools/check_oracle.py [sf_dir] [query_name ...]
(query names restrict the run to those entries — fast iteration)
"""

from __future__ import annotations

import hashlib
import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    df = canon(df)
    h = hashlib.sha256()
    for c in df.columns:
        col = df[c]
        if col.dtype.kind == "f":
            col = col.round(6)
        h.update(repr(list(col)).encode())
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    # the stemmed-postings oracle materializes its (term, stem) map from
    # this dir (it must see the same vocabulary as the gate tables)
    import os

    os.environ.setdefault("SPARK_GRAFT_ORACLE_SF_DIR", sf_dir)
    import __spark_entry__ as E
    from distributed_search_engine_spark.session import get_spark

    spark = get_spark("oracle-check", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, osql = E.queries(), E.oracle_sql()
    only = set(sys.argv[2:])
    if only:
        unknown = only - set(qs)
        if unknown:
            print(f"unknown query name(s): {sorted(unknown)}")
            return 2  # a typo must not print ALL OK over zero queries
        qs = {k: v for k, v in qs.items() if k in only}
    failures = 0
    for name, fn in qs.items():
        sdf = fn(spark, sf_dir).toPandas()
        if name not in osql:
            print(f"  {name:28s} rows={len(sdf):7d}  (rows-only, no oracle)")
            continue
        odf = con.execute(osql[name]).df()
        ok_rows = len(sdf) == len(odf)
        ok_cols = sorted(sdf.columns) == sorted(odf.columns)
        ok_hash = ok_rows and ok_cols and value_hash(sdf) == value_hash(odf)
        status = "OK " if (ok_rows and ok_cols and ok_hash) else "FAIL"
        print(
            f"  {name:28s} rows={len(sdf):7d}/{len(odf):7d} cols={'='.join(map(str,[ok_cols]))} hash={'MATCH' if ok_hash else 'DIFF'}  {status}"
        )
        if status == "FAIL":
            failures += 1
            a, b = canon(sdf), canon(odf)
            if ok_rows and ok_cols:
                for c in a.columns:
                    if not a[c].equals(b[c]):
                        diff = a[c] != b[c]
                        print(f"    first diffs in column {c}:")
                        print(pd.DataFrame({"spark": a[c][diff], "duck": b[c][diff]}).head(5))
            else:
                print(f"    spark cols: {list(sdf.columns)}  oracle cols: {list(odf.columns)}")
    # entry smoke (skipped on filtered runs)
    if not only:
        res = E.entry(spark)
        n = res.count()
        print(f"  entry() -> {n} rows, schema: {res.columns}")
    print("ALL OK" if failures == 0 else f"{failures} FAILURES")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
