"""Driver-mimicking harness: run every queries() entry at a given sf and
compare against oracle_sql() via DuckDB (row-count + schema + order-
insensitive value hash).  Usage:

    python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import numpy as np
import pandas as pd


TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    try:
        import ray.data

        if isinstance(result, ray.data.Dataset):
            return result.to_pandas()
    except ImportError:
        pass
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("float"):
            df[c] = np.round(df[c].astype(np.float64), 9)
        if str(df[c].dtype) in ("int32", "uint32", "int16", "uint64"):
            df[c] = df[c].astype(np.int64)
        if str(df[c].dtype) == "bool":
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def value_hash(df: pd.DataFrame) -> int:
    return int(pd.util.hash_pandas_object(canon(df), index=False).sum())


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False,
            logging_level="ERROR",
        )
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as mod

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = mod.queries()
    oracles = mod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            res = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            failures.append(name)
            continue
        dt = time.perf_counter() - t0
        if name not in oracles:
            print(f"ok    {name}: rows={len(res)} cols={list(res.columns)} "
                  f"[rows-only] ({dt:.1f}s)")
            continue
        try:
            ora = canon(con.sql(oracles[name]).df())
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL raised {e}")
            failures.append(name)
            continue
        problems = []
        if len(res) != len(ora):
            problems.append(f"rowcount {len(res)} != {len(ora)}")
        if list(res.columns) != list(ora.columns):
            problems.append(f"schema {list(res.columns)} != {list(ora.columns)}")
        elif [str(d) for d in res.dtypes] != [str(d) for d in ora.dtypes]:
            problems.append(
                f"dtypes {[str(d) for d in res.dtypes]} != {[str(d) for d in ora.dtypes]}"
            )
        if not problems and value_hash(res) != value_hash(ora):
            problems.append("value-hash mismatch")
            diff = res.compare(ora) if res.shape == ora.shape else None
            if diff is not None and len(diff):
                problems.append(f"first diffs:\n{diff.head(5)}")
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            failures.append(name)
        else:
            print(f"MATCH {name}: rows={len(res)} ({dt:.1f}s)")
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    code = main()
    import ray

    ray.shutdown()
    sys.exit(code)
