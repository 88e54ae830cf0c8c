"""Local stand-in for the driver's correctness gate.

Runs each __ray_entry__.queries() callable at sf0.01 and compares against
oracle_sql() via DuckDB (row count, column names, order-insensitive values).

Usage: python tools/check_correctness.py [--sf-dir DIR] [names...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = "/root/testdata/sf0.01"
    for a in sys.argv[1:]:
        if a.startswith("--sf-dir="):
            sf_dir = a.split("=", 1)[1]

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, log_to_driver=False)

    import __ray_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    names = args or list(qs)

    con = duckdb.connect()
    for t in ("region nation customer supplier part orders lineitem events "
              "documents embeddings").split():
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = 0
    for name in names:
        fn = qs[name]
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as ex:
            print(f"FAIL {name}: ray side raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(mine)} rows, cols={list(mine.columns)}")
            continue
        try:
            theirs = canon(con.execute(oracles[name]).df())
        except Exception as ex:
            print(f"FAIL {name}: oracle raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        if list(mine.columns) != list(theirs.columns):
            print(f"FAIL {name}: columns {list(mine.columns)} vs {list(theirs.columns)}")
            failures += 1
            continue
        if len(mine) != len(theirs):
            print(f"FAIL {name}: rows {len(mine)} vs {len(theirs)}")
            failures += 1
            continue
        try:
            pd.testing.assert_frame_equal(mine, theirs, check_dtype=False,
                                          check_exact=False, rtol=1e-9)
            print(f"OK   {name}: {len(mine)} rows")
        except AssertionError as ex:
            print(f"FAIL {name}: values differ\n{str(ex)[:500]}")
            failures += 1
    ray.shutdown()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
