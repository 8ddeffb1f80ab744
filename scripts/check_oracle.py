"""Local stand-in for the driver's correctness gate: run every queries() entry
and compare against its oracle_sql() via DuckDB (row count + sorted-column
schema + order-insensitive value hash).

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> str:
    import hashlib

    return hashlib.md5(
        pd.util.hash_pandas_object(canon(df), index=False).values.tobytes()
    ).hexdigest()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, ".")
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    sqls = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            ours = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"[FAIL] {name}: pipeline raised {type(e).__name__}: {e}")
            failures += 1
            continue
        if name not in sqls:
            print(f"[rows] {name}: {len(ours)} rows, cols={sorted(ours.columns)}")
            continue
        theirs = con.execute(sqls[name]).fetchdf()
        ok_rows = len(ours) == len(theirs)
        ok_schema = sorted(map(str, ours.columns)) == sorted(map(str, theirs.columns))
        ok_vals = ok_rows and ok_schema and value_hash(ours) == value_hash(theirs)
        status = "OK" if (ok_rows and ok_schema and ok_vals) else "FAIL"
        if status == "FAIL":
            failures += 1
            print(f"[FAIL] {name}: rows {len(ours)}/{len(theirs)} schema_ok={ok_schema} "
                  f"vals_ok={ok_vals}")
            if ok_rows and ok_schema:
                a, b = canon(ours), canon(theirs)
                neq = (a != b) & ~(a.isna() & b.isna())
                bad = neq.any(axis=1)
                print(a[bad].head(3))
                print(b[bad].head(3))
        else:
            print(f"[OK]   {name}: {len(ours)} rows")
    print("failures:", failures)
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
