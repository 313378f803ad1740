#!/usr/bin/env python
"""Merge ≥2 same-fingerprint BENCH_DETAIL runs into BENCH_REFERENCE.json
(VERDICT r11 #4): the committed cross-check reference was ONE run picked
from same-code sessions that measured 127.4/149.0/136.1s — the host's
documented ±15% idle oscillation rides straight into every 2× band. A
per-row median across ≥3 same-fingerprint runs is a tighter, fairer
expectation; ``bench.load_committed_detail`` prefers the merged file.

Usage:
    python -m scripts.bench_reference run1.json run2.json run3.json \
        [-o BENCH_REFERENCE.json]

Every input must carry the SAME ``code_fingerprint`` and ``sf`` (the
whole point is same-code medians). A row's value from a run that
stamped it ``suspect`` is excluded from that row's median — a suspect
value is by definition not a clean same-code measurement.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys


def merge(runs: list[dict]) -> dict:
    if len(runs) < 2:
        raise SystemExit("need >=2 runs to merge a reference")
    fps = {r.get("code_fingerprint") for r in runs}
    if len(fps) != 1 or None in fps:
        raise SystemExit(f"code_fingerprint mismatch across runs: {fps}")
    sfs = {r.get("sf") for r in runs}
    if len(sfs) != 1:
        raise SystemExit(f"sf mismatch across runs: {sfs}")
    # same-parallelism medians only: a local[32] run and a local[8] run
    # of identical code are different workload shapes, and the merged
    # medians must carry the cpu count so bench.crosscheck_eligible can
    # refuse to compare across core counts
    cpu_set = {r.get("cpus") for r in runs}
    if len(cpu_set) != 1:
        raise SystemExit(f"cpus mismatch across runs: {cpu_set}")
    cpus = cpu_set.pop()
    values: dict[str, list[float]] = {}
    for r in runs:
        bad = set(r.get("suspect", []))
        for name, v in r.get("queries", {}).items():
            if name in bad or not isinstance(v, (int, float)):
                continue
            values.setdefault(name, []).append(float(v))
    queries = {
        name: round(statistics.median(vs), 3) for name, vs in values.items()
    }
    out = {
        "code_fingerprint": fps.pop(),
        "sf": sfs.pop(),
        "n_reference_runs": len(runs),
        "queries": queries,
        # per-row sample counts: a row absent (or suspect) in some runs
        # is visible here instead of silently medianing fewer samples
        "row_samples": {name: len(vs) for name, vs in values.items()},
    }
    if cpus is not None:
        out["cpus"] = cpus
    return out


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("runs", nargs="+", help="BENCH_DETAIL-shaped json files")
    ap.add_argument("-o", "--out", default="BENCH_REFERENCE.json")
    args = ap.parse_args(argv)
    runs = []
    for p in args.runs:
        with open(p) as f:
            runs.append(json.load(f))
    ref = merge(runs)
    with open(args.out, "w") as f:
        json.dump(ref, f, indent=1, sort_keys=True)
    print(
        f"# merged {ref['n_reference_runs']} runs -> {args.out} "
        f"({len(ref['queries'])} rows, sf {ref['sf']})",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
