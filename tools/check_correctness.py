"""Driver-mimicking correctness check: run each __ray_entry__ query and its
DuckDB oracle side-by-side, compare row count + column names + order-
insensitive values. Usage: python tools/check_correctness.py [sf_dir] [names...]
"""

from __future__ import annotations

import glob
import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res.reset_index(drop=True)
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == np.float32:
            df[c] = df[c].astype(np.float64)
        elif str(df[c].dtype) in ("int32", "uint32", "int16", "uint64"):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as E

    con = duckdb.connect()
    for f in glob.glob(f"{sf_dir}/*.parquet"):
        name = os.path.splitext(os.path.basename(f))[0]
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

    qs = E.queries()
    oracles = E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as ex:
            print(f"FAIL {name}: ray error: {type(ex).__name__}: {ex}")
            failures.append(name)
            continue
        dt = time.perf_counter() - t0
        if name not in oracles:
            print(f"ok   {name}: rows-only, {len(got)} rows ({dt:.1f}s)")
            continue
        try:
            exp = canon(con.execute(oracles[name]).fetchdf())
        except Exception as ex:
            print(f"FAIL {name}: oracle error: {ex}")
            failures.append(name)
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)} ({dt:.1f}s)")
            failures.append(name)
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: cols {list(got.columns)} vs {list(exp.columns)}")
            failures.append(name)
            continue
        eq = got.equals(exp)
        if not eq:
            # locate first mismatch for debugging
            bad = None
            for c in got.columns:
                a, b = got[c], exp[c]
                if a.dtype.kind == "f":
                    neq = ~np.isclose(a.to_numpy(), b.to_numpy(), rtol=0, atol=0, equal_nan=True)
                else:
                    neq = a.ne(b).to_numpy()
                if neq.any():
                    i = int(np.argmax(neq))
                    bad = (c, i, a.iloc[i], b.iloc[i])
                    break
            print(f"FAIL {name}: value mismatch {bad} (dtypes got={dict(got.dtypes)} exp={dict(exp.dtypes)})")
            failures.append(name)
            continue
        print(f"PASS {name}: {len(got)} rows ({dt:.1f}s)")
    ray.shutdown()
    print(f"\n{len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
