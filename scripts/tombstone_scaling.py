"""Tombstone economics for the persisted LSH index (VERDICT r5 #7).

Measures, at sf0.1 (5k vectors; layout identical at any corpus size):
- delete cost vs batch size (should be flat-ish: one marker file)
- probe latency vs live tombstone count (should be flat: the filter is
  a broadcast of the delete set over the partition-pruned candidates)

Run:  python scripts/tombstone_scaling.py  (markdown table to stdout;
paste into COVERAGE.md)
"""

from __future__ import annotations

import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from hours_api_clickup_spark.datapipe.similarity import (  # noqa: E402
    lsh_index_delete,
    lsh_index_read,
    lsh_index_write,
    lsh_probe_topk,
)
from hours_api_clickup_spark.plans.registry import load_table  # noqa: E402
from hours_api_clickup_spark.session import get_spark  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def main() -> None:
    spark = get_spark(app_name="tombstone-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, BASE, "embeddings")
    n = emb.count()
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]]

    rows = []
    for frac_label, n_del in (("0", 0), ("2%", n // 50), ("10%", n // 10), ("30%", 3 * n // 10)):
        path = tempfile.mkdtemp(prefix="tomb_scale_") + "/emb"
        lsh_index_write(emb, "embedding", "vec_id", path, dim=64)
        t_del = 0.0
        if n_del:
            doomed = [
                r["vec_id"]
                for r in emb.filter(F.col("vec_id") % (n // n_del) == 1)
                .select("vec_id")
                .limit(n_del)
                .collect()
            ]
            t0 = time.perf_counter()
            lsh_index_delete(spark, path, doomed, seq=1)
            t_del = time.perf_counter() - t0
        reader = lsh_index_read(spark, path)
        lsh_probe_topk(spark, reader, qv, k=10, exclude_id=0).collect()  # warm
        t_probe = statistics.median(
            _timed(lambda: lsh_probe_topk(spark, reader, qv, k=10, exclude_id=0).collect())
            for _ in range(N_RUNS)
        )
        rows.append((frac_label, n_del, t_del, t_probe))
        print(f"# {frac_label}: del={t_del:.2f}s probe={t_probe:.2f}s", file=sys.stderr)
        # bench-hygiene convention (ann_probe/neardup_delete scaling):
        # drop this level's index so repeated manual runs don't
        # accumulate dead copies in /tmp
        shutil.rmtree(os.path.dirname(path), ignore_errors=True)

    print("| tombstoned | deleted ids | delete wall | probe (median of %d) |" % N_RUNS)
    print("|---|---|---|---|")
    for label, n_del, t_del, t_probe in rows:
        print(f"| {label} | {n_del:,} | {t_del:.2f} s | {t_probe:.2f} s |")


def _timed(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
