"""Capture .explain('formatted') for registry queries into plans/<round>/.

The output round directory defaults to r13; override with $PLANS_ROUND.

Usage:
    python scripts/capture_plans.py before [name ...]
    python scripts/capture_plans.py after  [name ...]

With no names, captures every registry query. Streaming queries EXECUTE
their bounded replay when the query fn is called; their returned
DataFrame is a memory-sink scan, so the captured plan records the sink
read — the optimization evidence for those rows is the bench timing plus
the streaming config described in OPTIMIZATION_r12.md. For plan-shape
analysis the script also appends a one-line summary (Exchange count,
join strategies, Python-eval nodes) to plans/<round>/_summary_<tag>.tsv.
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_ROOT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("PLANS_ROUND", "r13"),
)


def plan_summary(plan: str) -> dict:
    return {
        "exchanges": len(re.findall(r"\bExchange\b", plan)),
        "bhj": len(re.findall(r"\bBroadcastHashJoin\b", plan)),
        "smj": len(re.findall(r"\bSortMergeJoin\b", plan)),
        "shj": len(re.findall(r"\bShuffledHashJoin\b", plan)),
        "batch_py": len(re.findall(r"\bBatchEvalPython\b", plan)),
        "arrow_py": len(
            re.findall(r"\bArrowEvalPython\b|\bMapInPandas\b|\bMapInArrow\b", plan)
        ),
        "sorts": len(re.findall(r"\bSort\b", plan)),
        "window": len(re.findall(r"\bWindow\b", plan)),
    }


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:]

    from hours_api_clickup_spark.plans.registry import QUERIES
    from hours_api_clickup_spark.session import get_spark

    spark = get_spark(app_name=f"capture_plans_{tag}")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT_ROOT, exist_ok=True)

    todo = names or list(QUERIES)
    rows = []
    for name in todo:
        spec = QUERIES.get(name)
        if spec is None:
            print(f"!! unknown query {name}", file=sys.stderr)
            continue
        t0 = time.time()
        try:
            df = spec.fn(spark, SF_DIR)
            import contextlib
            import io

            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
        except Exception as ex:  # capture what we can, keep going
            print(f"!! {name}: {ex!r}", file=sys.stderr)
            continue
        with open(os.path.join(OUT_ROOT, f"{name}_{tag}.txt"), "w") as f:
            f.write(plan)
        s = plan_summary(plan)
        rows.append((name, s))
        print(
            f"# {name}: ex={s['exchanges']} bhj={s['bhj']} smj={s['smj']} "
            f"py={s['batch_py']}+{s['arrow_py']} ({time.time()-t0:.1f}s)",
            file=sys.stderr,
        )
    with open(os.path.join(OUT_ROOT, f"_summary_{tag}.tsv"), "w") as f:
        f.write(
            "name\texchanges\tbhj\tsmj\tshj\tbatch_py\tarrow_py\tsorts\twindow\n"
        )
        for name, s in rows:
            f.write(
                f"{name}\t{s['exchanges']}\t{s['bhj']}\t{s['smj']}\t"
                f"{s['shj']}\t{s['batch_py']}\t{s['arrow_py']}\t{s['sorts']}\t"
                f"{s['window']}\n"
            )
    spark.stop()


if __name__ == "__main__":
    main()
