"""Normalize two bench artifacts against their calibration rows (r7).

The host's deliverable throughput drifts within a day (measured r6:
identical idle-guest suites at 144.8s and 187.9s three hours apart), so
absolute per-query seconds are not comparable across rounds. Since r7
every bench run carries two FIXED-WORK rows (``calibration_fixed_work``
at suite start, ``..._end`` at suite end: a constant 30M-row
hash → agg → sort with no table reads and no Python workers); the ratio
of those rows between two runs estimates the host-drift factor, and
dividing run B's per-query numbers by it puts both runs on run A's
clock.

Run:  python scripts/bench_normalize.py BENCH_A.json BENCH_B.json [N]

Accepts either artifact shape (``BENCH_r{N}.json`` with the headline
"queries" dict, or ``BENCH_DETAIL.json`` with the full dict). Prints
the N (default 15) largest normalized slowdowns B-vs-A among shared
query rows — what remains after the host factor is removed is the
signal worth investigating. Rows missing a counterpart, composites,
calibration rows, and the ingest/cold rows (medianized but still the
noisiest work in the suite) are listed separately, not ranked.
"""

from __future__ import annotations

import json
import sys

# informational rows whose round-over-round deltas are expected and
# documented (build costs, composites) — reported, never ranked
_UNRANKED_PREFIXES = (
    "calibration_",
    "pipeline_",
    "lsh_index_",
    "doc_index_",
    "text_index_build",
    "text_index_append",
)
_UNRANKED_SUFFIXES = ("_cold",)


def _load(path: str) -> dict[str, float]:
    blob = json.load(open(path))
    # three shapes: driver BENCH_r{N}.json wraps the stdout line under
    # "parsed"; bench.py's own line / BENCH_DETAIL.json carry "queries"
    # at top level; a bare queries dict also works
    if isinstance(blob.get("parsed"), dict):
        blob = blob["parsed"]
    q = blob.get("queries", blob)
    return {k: float(v) for k, v in q.items() if isinstance(v, (int, float))}


def _ranked(name: str) -> bool:
    return not (
        name.startswith(_UNRANKED_PREFIXES) or name.endswith(_UNRANKED_SUFFIXES)
    )


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    a, b = _load(sys.argv[1]), _load(sys.argv[2])
    top_n = int(sys.argv[3]) if len(sys.argv) > 3 else 15

    cal_a = a.get("calibration_fixed_work")
    cal_b = b.get("calibration_fixed_work")
    if not cal_a or not cal_b:
        print(
            "WARNING: calibration_fixed_work missing from one side "
            "(pre-r7 artifact?) — reporting RAW ratios, host drift NOT "
            "removed"
        )
        factor = 1.0
    else:
        # prefer the midpoint of start/end when both runs carry the end
        # twin: within-run drift means neither endpoint alone is the
        # whole run's clock
        if "calibration_fixed_work_end" in a and "calibration_fixed_work_end" in b:
            cal_a = (cal_a + a["calibration_fixed_work_end"]) / 2
            cal_b = (cal_b + b["calibration_fixed_work_end"]) / 2
        factor = cal_b / cal_a
        print(
            f"host-drift factor (B/A, fixed work): {factor:.3f}  "
            f"[cal A {cal_a:.3f}s, B {cal_b:.3f}s]"
        )

    shared = sorted(set(a) & set(b))
    rows = []
    for name in shared:
        if not _ranked(name) or a[name] <= 0:
            continue
        norm_b = b[name] / factor
        rows.append((norm_b / a[name], name, a[name], b[name], norm_b))
    rows.sort(reverse=True)

    print(f"\ntop {top_n} normalized slowdowns (B÷factor vs A), {len(rows)} ranked rows:")
    print(f"{'query':<42} {'A s':>8} {'B s':>8} {'B norm':>8} {'ratio':>7}")
    for ratio, name, ta, tb, tn in rows[:top_n]:
        print(f"{name:<42} {ta:>8.3f} {tb:>8.3f} {tn:>8.3f} {ratio:>7.2f}")

    unranked = [n for n in shared if not _ranked(n)]
    if unranked:
        print("\nunranked (builds/composites/calibration — compare by hand):")
        for name in unranked:
            print(f"  {name}: A {a[name]:.3f}s  B {b[name]:.3f}s")
    only_a = sorted(set(a) - set(b))
    only_b = sorted(set(b) - set(a))
    if only_a:
        print(f"\nonly in A ({len(only_a)}): {', '.join(only_a[:10])}...")
    if only_b:
        print(f"only in B ({len(only_b)}): {', '.join(only_b[:10])}...")
    return 0


if __name__ == "__main__":
    sys.exit(main())
