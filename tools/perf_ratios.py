"""Epoch-normalized per-query perf guard (VERDICT r4 "Next round" #5).

Every round's BENCH comparison has been muddied by host-wide epoch
drift (this VM's page-fault path degrades whole sessions at a time —
see BASELINE.md).  A slow epoch scales the CMS headline and the query
suite TOGETHER, so the ratio

    query_sec / same-run CMS-headline median_sec

is epoch-invariant: it only moves when a query genuinely regressed (or
improved) relative to the rest of the code.  ``bench.py`` now embeds
these ratios in every full record (``query_ratios``); this tool diffs
two records and flags queries whose ratio drifted by more than the
threshold.

Usage:

    python tools/perf_ratios.py CURRENT.json BASELINE.json [threshold]

Defaults: CURRENT = BENCH/bench_last_full.json, BASELINE = the newest
other bench_full_*.json containing ratios (or computable ones),
threshold = 2.0.  Exits 1 if any query regressed past the threshold.
Queries faster than MIN_SEC in BOTH runs are skipped (sub-headline
noise cannot produce a meaningful ratio).
"""

from __future__ import annotations

import glob
import json
import os
import sys

MIN_SEC = 0.25  # below this in both runs the ratio is timer noise


def load_ratios(path: str) -> tuple[dict[str, float], dict[str, float], float]:
    """(ratios, raw seconds, headline sec) from a bench full record;
    ratios are recomputed from queries/headline when the record
    predates the query_ratios field."""
    with open(path) as f:
        rec = json.load(f)
    headline = float(rec["headline"]["wall_sec"])
    qs = {k: float(v) for k, v in rec.get("queries", {}).items() if v >= 0}
    ratios = rec.get("query_ratios") or {
        k: round(v / headline, 3) for k, v in qs.items()
    }
    return ratios, qs, headline


def compare(
    current: str, baseline: str, threshold: float = 2.0
) -> dict:
    cur_r, cur_s, cur_h = load_ratios(current)
    base_r, base_s, base_h = load_ratios(baseline)
    flagged, improved = [], []
    for name in sorted(set(cur_r) & set(base_r)):
        if cur_s.get(name, 0.0) < MIN_SEC and base_s.get(name, 0.0) < MIN_SEC:
            continue
        if base_r[name] <= 0:
            continue
        drift = cur_r[name] / base_r[name]
        row = {
            "query": name,
            "ratio_now": cur_r[name],
            "ratio_base": base_r[name],
            "drift": round(drift, 2),
            "sec_now": cur_s.get(name),
            "sec_base": base_s.get(name),
        }
        if drift > threshold:
            flagged.append(row)
        elif drift < 1.0 / threshold:
            improved.append(row)
    flagged.sort(key=lambda r: -r["drift"])
    improved.sort(key=lambda r: r["drift"])
    return {
        "current": current,
        "baseline": baseline,
        "headline_sec": {"current": cur_h, "baseline": base_h},
        "threshold": threshold,
        "compared": len(set(cur_r) & set(base_r)),
        "regressed": flagged,
        "improved": improved,
    }


def _default_baseline(current: str) -> str | None:
    bench_dir = os.path.join(os.path.dirname(os.path.abspath(current)))
    cands = sorted(
        glob.glob(os.path.join(bench_dir, "bench_full_*.json")),
        key=os.path.getmtime,
        reverse=True,
    )
    for c in cands:
        if os.path.abspath(c) != os.path.abspath(current):
            try:
                load_ratios(c)
                return c
            except (KeyError, ValueError, json.JSONDecodeError):
                continue
    return None


def main() -> int:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    current = args[0] if args else os.path.join(repo, "BENCH", "bench_last_full.json")
    baseline = args[1] if len(args) > 1 else _default_baseline(current)
    threshold = float(args[2]) if len(args) > 2 else 2.0
    if baseline is None:
        print(json.dumps({"error": "no baseline record with ratios found"}))
        return 2
    report = compare(current, baseline, threshold)
    print(json.dumps(report, indent=1))
    return 1 if report["regressed"] else 0


if __name__ == "__main__":
    raise SystemExit(main())
