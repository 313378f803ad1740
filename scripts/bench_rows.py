"""Time individual bench rows exactly the way bench.py does (median of
N noop-sink runs in a warm session) without paying for the whole suite.

Usage: python scripts/bench_rows.py q1 q2 ...   [N_RUNS via env]

Mirrors bench.py's session, warm-up, and cache-consumer warm pass so a
row's number here is comparable to its BENCH_REFERENCE median.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

CACHE_CONSUMERS = {
    "dedup_minhash_lsh",
    "dedup_cluster_lsh",
    "dedup_corpus_manifest",
    "neardup_degree_histogram",
    "knn_lsh_probe",
    "knn_lsh_probe_tombstone",
    "knn_ivf_probe",
    "knn_ivf_probe_tombstone",
    "knn_ivfpq_probe",
    "text_index_term_probe",
    "text_index_phrase_probe",
    "text_index_tombstone_probe",
}


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("usage: bench_rows.py query [query ...]", file=sys.stderr)
        sys.exit(2)

    from hours_api_clickup_spark.plans.registry import QUERIES
    from hours_api_clickup_spark.session import get_spark

    spark = get_spark(app_name="bench_rows")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()

    def _warm(batches):
        import numpy  # noqa: F401

        for pdf in batches:
            yield pdf

    spark.range(256).repartition(32).mapInPandas(_warm, "id long").write.format(
        "noop"
    ).mode("overwrite").save()

    def run_once(name: str) -> float:
        fn = QUERIES[name].fn
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    for name in names:
        if name not in QUERIES:
            print(f"!! unknown {name}", file=sys.stderr)
            continue
        if name in CACHE_CONSUMERS:
            run_once(name)  # untimed cache warm, as bench.py does
        med = statistics.median(run_once(name) for _ in range(N_RUNS))
        print(f"{name}\t{med:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
