#!/usr/bin/env python
"""Speedup / efficiency table over every BENCH scaling record — the
analogue of the reference's ``benchmark_metrics.py`` (speedup T1/Tp and
efficiency S/P per config, ``/root/reference/benchmark_metrics.py:61-173``)
and the tabulators ``scripts/plot_efficiency.py`` / ``scalabililty.py``.

Reads the pair-record JSONs (``scaling_*.json`` with cpus_lo/cpus_hi)
and the one-epoch multi-level records (``scaling_one_epoch_*.json``),
prints one markdown table sorted by record name.  No Ray, no network —
pure file munging, runnable any time:

    python tools/speedup_table.py [BENCH_DIR]
"""

from __future__ import annotations

import glob
import json
import os
import sys


def pair_rows(d: dict, name: str) -> list[tuple]:
    lo, hi = d["cpus_lo"], d["cpus_hi"]
    t_lo, t_hi = d[f"sec_{lo}"], d[f"sec_{hi}"]
    rows = [
        (name, f"{lo}→{hi}", t_lo, t_hi, t_lo / t_hi,
         (t_lo / t_hi) / (hi / lo), "median"),
    ]
    if f"best_sec_{lo}" in d and f"best_sec_{hi}" in d:
        b_lo, b_hi = d[f"best_sec_{lo}"], d[f"best_sec_{hi}"]
        rows.append(
            (name, f"{lo}→{hi}", b_lo, b_hi, b_lo / b_hi,
             (b_lo / b_hi) / (hi / lo), "best-rep")
        )
    return rows


def one_epoch_rows(d: dict, name: str) -> list[tuple]:
    legs = {int(k): v for k, v in d.get("legs", {}).items()}
    levels = sorted(legs)
    rows = []
    for lo, hi in zip(levels[:-1], levels[1:]):
        for pick, label in (
            (lambda leg: leg["wall_sec"], "median"),
            (lambda leg: min(leg["all_runs_sec"]), "min"),
        ):
            t_lo, t_hi = pick(legs[lo]), pick(legs[hi])
            rows.append(
                (name, f"{lo}→{hi}", t_lo, t_hi, t_lo / t_hi,
                 (t_lo / t_hi) / (hi / lo), label)
            )
    return rows


def main() -> None:
    bench_dir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH"
    )
    rows: list[tuple] = []
    for path in sorted(glob.glob(os.path.join(bench_dir, "scaling*.json"))):
        name = os.path.basename(path).replace("scaling_", "").replace(
            ".json", ""
        )
        try:
            d = json.load(open(path))
        except json.JSONDecodeError:
            continue
        if "cpus_lo" in d:
            rows.extend(pair_rows(d, name))
        elif "legs" in d:
            rows.extend(one_epoch_rows(d, name))
    print("| record | CPUs | T_lo (s) | T_hi (s) | speedup | efficiency | estimator |")
    print("|---|---|---|---|---|---|---|")
    for r in rows:
        print(
            f"| {r[0]} | {r[1]} | {r[2]:.2f} | {r[3]:.2f} "
            f"| {r[4]:.2f}× | {r[5]:.3f} | {r[6]} |"
        )


if __name__ == "__main__":
    main()
