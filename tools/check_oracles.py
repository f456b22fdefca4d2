"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry and its ``oracle_sql()`` twin on the same
sf dir and compares row count, column names and an order-insensitive
value comparison (sorted rows).  Usage::

    python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(result):
    import pandas as pd
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def normalize(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    # unify numeric dtypes for comparison
    for c in df.columns:
        if str(df[c].dtype).lower().startswith(("int", "uint")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype).lower().startswith("float"):
            df[c] = df[c].round(9)
    return df


def main() -> int:
    import duckdb
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry_mod

    qs = entry_mod.queries()
    sqls = entry_mod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"create view {t} as select * from '{path}'")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            ours = normalize(to_pandas(fn(sf_dir)))
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: query raised {type(exc).__name__}: {exc}")
            failures.append(name)
            continue
        if name not in sqls:
            print(f"ROWS  {name}: {len(ours)} rows (no oracle — rows-only check)")
            continue
        try:
            theirs = normalize(con.execute(sqls[name]).fetchdf())
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: oracle raised {type(exc).__name__}: {exc}")
            failures.append(name)
            continue
        if list(ours.columns) != list(theirs.columns):
            print(f"FAIL  {name}: columns {list(ours.columns)} vs {list(theirs.columns)}")
            failures.append(name)
            continue
        if len(ours) != len(theirs):
            print(f"FAIL  {name}: rows {len(ours)} vs {len(theirs)}")
            failures.append(name)
            continue
        eq = ours.equals(theirs)
        if not eq:
            # tolerate dtype mismatches by value compare
            try:
                eq = (ours.astype(str).values == theirs.astype(str).values).all()
            except Exception:
                eq = False
        if eq:
            print(f"OK    {name}: {len(ours)} rows")
        else:
            diff = (ours.astype(str).values != theirs.astype(str).values).any(axis=1)
            idx = diff.nonzero()[0][:3] if hasattr(diff, "nonzero") else []
            print(f"FAIL  {name}: value mismatch; first diffs:")
            for i in idx:
                print("  ours  :", ours.iloc[i].to_dict())
                print("  oracle:", theirs.iloc[i].to_dict())
            failures.append(name)

    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
