"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB, compare row count, column
names, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

# Runnable as `python tools/check_oracle.py` from anywhere: Python puts
# tools/ (the script dir) on sys.path, not the repo root the package
# imports need.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # Stringify for an order-insensitive comparison at FULL precision —
    # the round-5 lesson: a %.9g normalization here passed two queries the
    # driver's bit-exact hash failed (a 1e-6-level last-digit split on a
    # 1e6-magnitude value, and an int64-vs-float64 dtype split). repr() of
    # a float round-trips exactly, so any value divergence the driver can
    # see, this gate sees.
    out = pd.DataFrame()
    for c in df.columns:
        col = df[c]
        if col.dtype.kind == "f":
            out[c] = col.map(
                lambda v: "NULL" if pd.isna(v) else repr(float(v))
            )
        else:
            out[c] = col.map(lambda v: "NULL" if v is None or v != v else str(v))
    return out.sort_values(list(out.columns)).reset_index(drop=True)


def _kinds(df: pd.DataFrame) -> dict:
    # Dtype *kind* per column (u folded into i): an integer column on one
    # side and a float on the other stringifies "123" vs "123.0" in the
    # driver's hash — fail it here, before the driver does.
    return {
        c: ("i" if df[c].dtype.kind == "u" else df[c].dtype.kind)
        for c in df.columns
    }


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    from slipstream_async_spark.plans.catalog import oracle_sql, queries
    from slipstream_async_spark.session import get_spark

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings".split()
    ):
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs, oracles = queries(), oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_df = fn(spark, sf_dir).toPandas()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            continue
        if name not in oracles:
            print(f"weak  {name}: rows={len(spark_df)} (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            duck_df = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            continue
        s, d = _normalize(spark_df), _normalize(duck_df)
        sk, dk = _kinds(spark_df), _kinds(duck_df)
        if list(s.columns) != list(d.columns):
            failures.append(name)
            print(f"FAIL  {name}: columns {list(s.columns)} != {list(d.columns)}")
        elif sk != dk:
            failures.append(name)
            diff = {c: (sk.get(c), dk.get(c)) for c in sk if sk.get(c) != dk.get(c)}
            print(f"FAIL  {name}: dtype kinds differ (spark, duck): {diff}")
        elif len(s) != len(d):
            failures.append(name)
            print(f"FAIL  {name}: rows {len(s)} != {len(d)}")
        elif len(s) == 0:
            # columns + dtype kinds already matched; two empty frames are
            # equal (frame.equals() sees residual empty-column dtype
            # details — ns- vs us-resolution timestamps — the driver's
            # value hash cannot)
            print(f"ok    {name}: rows=0 [{time.time()-t0:.1f}s]")
        elif not s.equals(d):
            failures.append(name)
            neq = (s != d).any(axis=1)
            print(f"FAIL  {name}: {int(neq.sum())}/{len(s)} rows differ; first:")
            idx = neq[neq].index[:3]
            for i in idx:
                print(f"   spark: {s.loc[i].to_dict()}")
                print(f"   duck : {d.loc[i].to_dict()}")
        else:
            print(f"ok    {name}: rows={len(s)} [{time.time()-t0:.1f}s]")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
