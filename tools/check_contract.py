"""Local mimic of the driver's correctness gate: run every queries() entry
at the given sf, run its oracle_sql() in DuckDB over the same parquet
tables, compare row-count + schema + order-insensitive values.

Usage: python tools/check_contract.py [sf_dir]
"""

from __future__ import annotations

import sys
import time
import traceback

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return pd.DataFrame(res)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), ignore_index=True)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

    import ray

    ray.init(
        address="local", num_cpus=8, include_dashboard=False,
        ignore_reinit_error=True, logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        t0 = time.perf_counter()
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception:
            print(f"[ERR ] {name}: query raised")
            traceback.print_exc()
            failures += 1
            continue
        dt = time.perf_counter() - t0
        if name not in oracles:
            print(f"[ROWS] {name}: {len(mine)} rows ({dt:.1f}s, rows-only)")
            continue
        try:
            theirs = canon(con.execute(oracles[name]).fetchdf())
        except Exception:
            print(f"[ERR ] {name}: oracle SQL raised")
            traceback.print_exc()
            failures += 1
            continue
        ok_rows = len(mine) == len(theirs)
        ok_schema = list(mine.columns) == list(theirs.columns)
        ok_vals = False
        if ok_rows and ok_schema:
            try:
                a = mine.astype(str).to_numpy()
                b = theirs.astype(str).to_numpy()
                ok_vals = (a == b).all()
            except Exception:
                ok_vals = False
        status = "OK  " if (ok_rows and ok_schema and ok_vals) else "FAIL"
        if status == "FAIL":
            failures += 1
            print(f"[{status}] {name}: rows {len(mine)}/{len(theirs)} "
                  f"schema {list(mine.columns)} vs {list(theirs.columns)} "
                  f"({dt:.1f}s)")
            if ok_rows and ok_schema:
                neq = (mine.astype(str) != theirs.astype(str)).any(axis=1)
                print("  first diffs (mine vs oracle):")
                print(pd.concat([mine[neq].head(3), theirs[neq].head(3)]))
        else:
            print(f"[{status}] {name}: {len(mine)} rows ({dt:.1f}s)")

    # entry() smoke
    try:
        e = to_pandas(entrymod.entry())
        print(f"[OK  ] entry(): {len(e)} rows, cols {list(e.columns)}")
    except Exception:
        print("[ERR ] entry() raised")
        traceback.print_exc()
        failures += 1

    ray.shutdown()
    print(f"\n{failures} failures")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
