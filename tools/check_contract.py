"""Local simulation of the driver's correctness gate: run every
``queries()`` entry at a given sf and compare against ``oracle_sql()`` via
DuckDB (row count + column names + order-insensitive value comparison).

Usage: python tools/check_contract.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd
import ray

sys.path.insert(0, "/root/repo")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res):
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def dtype_kind(s: pd.Series) -> str:
    """Coarse dtype class for driver-hash compatibility: the driver hashes
    raw values, so an int64 engine column vs a float64 oracle column (e.g.
    DuckDB HUGEINT sums) hash-mismatches even when values are equal."""
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    return "object"


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(9)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    n_pass = n_fail = n_weak = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got_raw = to_pandas(fn(sf_dir))
            got = canon(got_raw)
        except Exception as e:
            print(f"FAIL {name}: query raised {type(e).__name__}: {e}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"weak {name}: rows={len(got)} cols={list(got.columns)}")
            n_weak += 1
            continue
        try:
            exp_raw = con.sql(oracles[name]).df()
            exp = canon(exp_raw)
        except Exception as e:
            print(f"FAIL {name}: oracle raised {e}")
            n_fail += 1
            continue
        ok_rows = len(got) == len(exp)
        ok_cols = list(got.columns) == list(exp.columns)
        if ok_cols:
            # driver-hash faithfulness: dtype classes must match exactly
            bad = [
                (c, dtype_kind(got_raw[c]), dtype_kind(exp_raw[c]))
                for c in got.columns
                if dtype_kind(got_raw[c]) != dtype_kind(exp_raw[c])
            ]
            if bad:
                print(f"FAIL {name}: driver-hash dtype mismatch {bad}")
                n_fail += 1
                continue
        ok_vals = False
        if ok_rows and ok_cols:
            try:
                pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                              check_exact=False, rtol=1e-7)
                ok_vals = True
            except AssertionError as e:
                ok_vals = False
                detail = str(e).splitlines()[0]
        if ok_rows and ok_cols and ok_vals:
            print(f"PASS {name}: rows={len(got)}")
            n_pass += 1
        else:
            print(
                f"FAIL {name}: rows {len(got)} vs {len(exp)}, cols {list(got.columns)}"
                f" vs {list(exp.columns)}"
                + ("" if ok_rows and ok_cols else "")
                + (f" valdiff: {detail}" if ok_rows and ok_cols and not ok_vals else "")
            )
            n_fail += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_weak} weak (rows-only)")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
