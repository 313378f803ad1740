"""Delete economics for the near-dup signature index (r7).

The takedown path's claims, measured at sf0.1 (5k docs — the LAYOUT is
what scales, not these counts):
- delete cost vs batch size: flat-ish (one marker batch; zero sig/bands
  I/O — the file listing is asserted bit-identical in tests)
- append latency vs live tombstone count: flat (the filter is a
  broadcast anti-join over the bands scan the append already does)
- compact cost: O(corpus), once per maintenance cadence, after which
  appends pay nothing again

Run:  python scripts/neardup_delete_scaling.py  (markdown table to
stdout; paste into COVERAGE.md)
``--quick`` drops to the 0 / ~5% tombstone points — the form bench.py
calls every round so the flat-delete claim stays continuously measured
(verdict r7 #8).
"""

from __future__ import annotations

import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hours_api_clickup_spark.datapipe.dedup import (  # noqa: E402
    doc_neardup_index_append,
    doc_neardup_index_compact,
    doc_neardup_index_delete,
    doc_neardup_index_write,
)
from hours_api_clickup_spark.plans.registry import load_table  # noqa: E402
from hours_api_clickup_spark.session import get_spark  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


LEVELS = (("0", None), ("~5%", 19), ("~25%", (5, 9, 13, 17, 19)))


def run(spark, levels=LEVELS, base: str = BASE, n_runs: int = N_RUNS):
    """Measure delete/append/compact wall time at each tombstone level
    with a caller-owned session; returns (label, n_del, t_del,
    t_append, t_compact) rows."""
    docs = load_table(spark, base, "documents")
    corpus = docs.filter(F.col("doc_id") % 20 >= 4)  # 80%

    rows = []
    for label, mod in levels:
        work = tempfile.mkdtemp(prefix="nd_del_scale_")
        path = work + "/idx"
        doc_neardup_index_write(corpus, "doc_id", "text", path)
        t_del = 0.0
        n_del = 0
        if mod is not None:
            mods = mod if isinstance(mod, tuple) else (mod,)
            doomed = corpus.filter(
                (F.col("doc_id") % 20).isin(list(mods))
            ).select("doc_id")
            n_del = doomed.count()
            t0 = time.perf_counter()
            doc_neardup_index_delete(spark, path, doomed)
            t_del = time.perf_counter() - t0

        def append_once(i: int) -> float:
            batch = docs.filter(F.col("doc_id") % 20 == i)
            t0 = time.perf_counter()
            doc_neardup_index_append(batch, path, "doc_id", "text").count()
            return time.perf_counter() - t0

        # disjoint fresh slices per run (the append contract)
        t_append = statistics.median(
            append_once(i) for i in range(min(n_runs, 3))
        )
        t0 = time.perf_counter()
        doc_neardup_index_compact(spark, path)
        t_compact = time.perf_counter() - t0
        import shutil

        shutil.rmtree(work, ignore_errors=True)  # review r8: bench hygiene
        rows.append((label, n_del, t_del, t_append, t_compact))
        print(
            f"# {label}: del={t_del:.2f}s append={t_append:.2f}s "
            f"compact={t_compact:.2f}s",
            file=sys.stderr,
        )

    return rows


def main(argv=None) -> None:
    argv = sys.argv[1:] if argv is None else argv
    quick = "--quick" in argv
    spark = get_spark(app_name="neardup-delete-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    rows = run(spark, levels=LEVELS[:2] if quick else LEVELS)
    print(
        f"| tombstoned | deleted docs | delete wall | batch append "
        f"(median of {min(N_RUNS, 3)}) | compact |"
    )
    print("|---|---|---|---|---|")
    for label, n_del, t_del, t_append, t_compact in rows:
        print(
            f"| {label} | {n_del:,} | {t_del:.2f} s | {t_append:.2f} s "
            f"| {t_compact:.2f} s |"
        )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main() or 0)
