"""Driver-mimic: run every queries() entry and compare to oracle_sql()
via DuckDB (row count + schema names + order-insensitive values).

Usage: python scripts/check_contract.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(9) + 0.0  # normalize -0.0
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    only = None
    argv = list(sys.argv[1:])
    if "--only" in argv:
        i = argv.index("--only")
        only = argv[i + 1]
        del argv[i:i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, sqls = e.queries(), e.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and not any(
            tok in name for tok in only.split(",") if tok
        ):
            continue
        t0 = time.perf_counter()
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as ex:
            print(f"[FAIL] {name}: query raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        dt = time.perf_counter() - t0
        if name not in sqls:
            print(f"[rows-only] {name}: {len(mine)} rows {dt:.1f}s")
            continue
        try:
            oracle = canon(con.execute(sqls[name]).df())
        except Exception as ex:
            print(f"[FAIL] {name}: oracle SQL raised {ex}")
            failures += 1
            continue
        ok_schema = list(mine.columns) == list(oracle.columns)
        ok_rows = len(mine) == len(oracle)
        ok_vals = ok_schema and ok_rows and mine.equals(oracle)
        if not ok_vals and ok_schema and ok_rows:
            # allow float ulp slop for diagnosis
            close = True
            for c in mine.columns:
                a, b = mine[c], oracle[c]
                if pd.api.types.is_float_dtype(a):
                    if not np.allclose(a, b, rtol=0, atol=1e-8, equal_nan=True):
                        close = False
                elif not a.equals(b):
                    close = False
            if close:
                print(f"[WARN] {name}: equal within 1e-8 but not exact")
                continue
        if ok_vals:
            print(f"[ok] {name}: {len(mine)} rows {dt:.1f}s")
        else:
            failures += 1
            print(f"[FAIL] {name}: schema_ok={ok_schema} rows {len(mine)} vs "
                  f"{len(oracle)}")
            if ok_schema:
                merged = mine.merge(oracle, how="outer", indicator=True)
                diff = merged[merged._merge != "both"]
                print(diff.head(8).to_string())
    print("failures:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    code = main()
    ray.shutdown()
    sys.exit(code)
