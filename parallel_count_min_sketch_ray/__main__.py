"""Job entrypoint: ``python -m parallel_count_min_sketch_ray <query>``.

This is the ``ray job submit`` surface the north rule names — on a real
cluster the submission is

    ray job submit --working-dir . -- \
        python -m parallel_count_min_sketch_ray token_totals \
        --sf-dir /data/corpus --output /data/out/token_totals

Inside a submitted job ``RAY_ADDRESS`` points at the cluster, so the
guarded ``ray.init`` below connects to it; standalone it starts a local
session.  This module is a CLI entry point and therefore OWNS its Ray
session (the library and ``__ray_entry__.py`` never call ``ray.init`` —
the driver contract).

Output: small pandas/Arrow results land in one parquet file; Dataset
results stream through ``Dataset.write_parquet`` (partitioned, never
driver-materialized).  The last stdout line is one JSON object with the
query name, row count, output path and wall seconds — the same
machine-parseable convention as ``bench.py``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(
        prog="python -m parallel_count_min_sketch_ray",
        description="Run one library pipeline as a Ray job.",
    )
    p.add_argument(
        "query",
        nargs="?",
        help="query name from the driver surface (see --list), or 'entry' "
        "for the flagship pipeline",
    )
    p.add_argument(
        "--sf-dir",
        default=os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.001"),
        help="input table directory (parquet per table)",
    )
    p.add_argument(
        "--output",
        default=None,
        help="output path: a parquet file/directory; omit for a stdout "
        "row-count-only run",
    )
    p.add_argument(
        "--list", action="store_true", help="print available query names"
    )
    args = p.parse_args(argv)

    from parallel_count_min_sketch_ray import entry as em

    if args.list:
        for name in em.queries():
            print(name)
        return 0
    if not args.query:
        p.error("query name required (or --list)")

    import ray

    if not ray.is_initialized():
        ray.init(
            address=os.environ.get("RAY_ADDRESS", "local"),
            include_dashboard=False,
            ignore_reinit_error=True,
        )

    t0 = time.perf_counter()
    if args.query == "entry":
        # the flagship runs on its fixed driver-contract corpus — report
        # THAT path, not a --sf-dir the pipeline did not read
        args.sf_dir = "/root/testdata/sf0.001"
        result = em.entry()
    else:
        qs = em.queries()
        if args.query not in qs:
            print(f"unknown query {args.query!r}; try --list", file=sys.stderr)
            return 2
        result = qs[args.query](args.sf_dir)

    import pandas as pd
    import pyarrow as pa

    import ray.data

    out_path = args.output
    if isinstance(result, ray.data.Dataset):
        if out_path:
            # materialize once so the write and the count share ONE
            # execution (a lazy Dataset would re-run the whole plan for
            # the second consumption); blocks stay in the object store,
            # never on the driver
            result = result.materialize()
            result.write_parquet(out_path)
        n_rows = result.count()
    else:
        if isinstance(result, pa.Table):
            result = result.to_pandas()
        assert isinstance(result, pd.DataFrame), type(result)
        n_rows = len(result)
        if out_path:
            if not out_path.endswith(".parquet"):
                os.makedirs(out_path, exist_ok=True)
                out_path = os.path.join(out_path, "part-0.parquet")
            result.to_parquet(out_path, index=False)

    wall = round(time.perf_counter() - t0, 3)
    print(
        json.dumps(
            {
                "query": args.query,
                "rows": int(n_rows),
                "output": out_path,
                "sf_dir": args.sf_dir,
                "wall_sec": wall,
            }
        )
    )
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
