"""Time the text-index ingest rows (build/append/probe/scan) exactly the
way bench.py does, in isolation — the 90k/100k corpus, same medians —
so a code change's effect on those rows is measurable without the suite.

Usage: python scripts/textindex_bench.py [build append probe scan]
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
INGEST_RUNS = min(N_RUNS, 3)


def main() -> None:
    which = set(sys.argv[1:]) or {"build", "append", "probe", "scan"}

    from pyspark.sql import functions as F

    from hours_api_clickup_spark.datapipe.textindex import (
        index_term_topk,
        inverted_index_append,
        inverted_index_read,
        inverted_index_write,
        tokenize,
    )
    from hours_api_clickup_spark.plans.registry import load_table
    from hours_api_clickup_spark.plans.registry_datapipe import _index_tmp
    from hours_api_clickup_spark.session import get_spark

    spark = get_spark(app_name="textindex_bench")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    REP_T = 20
    bigdocs = (
        docs.crossJoin(
            F.broadcast(spark.range(REP_T).withColumnRenamed("id", "rep"))
        )
        .select(
            (F.col("doc_id") * REP_T + F.col("rep")).alias("doc_id"),
            "text",
        )
        .localCheckpoint()
    )
    t_corpus = bigdocs.filter(F.col("doc_id") % 10 != 0)
    t_batch = bigdocs.filter(F.col("doc_id") % 10 == 0)
    tidx = _index_tmp("tib_textidx_", SF_DIR, "idx")

    if "build" in which:

        def _build_once() -> float:
            t0 = time.perf_counter()
            inverted_index_write(t_corpus, "text", "doc_id", tidx)
            return time.perf_counter() - t0

        samples = [_build_once() for _ in range(INGEST_RUNS)]
        print(
            f"text_index_build_90k: median {statistics.median(samples):.3f}s "
            f"samples {[round(s, 3) for s in samples]}"
        )

    if "append" in which:

        def _append_once(seq: int) -> float:
            t0 = time.perf_counter()
            inverted_index_append(t_batch, "text", "doc_id", tidx, seq=seq)
            return time.perf_counter() - t0

        samples = [_append_once(1 + i) for i in range(INGEST_RUNS)]
        print(
            f"text_index_append_batch: median {statistics.median(samples):.3f}s "
            f"samples {[round(s, 3) for s in samples]}"
        )

    if "probe" in which:
        reader = inverted_index_read(spark, tidx)

        def _probe_once() -> float:
            t0 = time.perf_counter()
            index_term_topk(spark, reader, ["merge", "vector"], k=10).collect()
            return time.perf_counter() - t0

        _probe_once()
        samples = [_probe_once() for _ in range(N_RUNS)]
        print(
            f"text_index_term_probe_100k: median "
            f"{statistics.median(samples):.3f}s "
            f"samples {[round(s, 3) for s in samples]}"
        )

    if "scan" in which:

        def _scan_once() -> float:
            # single filter pass — mirrors bench.py's r12 form
            t0 = time.perf_counter()
            toks = tokenize("text")
            (
                bigdocs.select(
                    "doc_id",
                    F.size(
                        F.filter(
                            toks, lambda x: (x == "merge") | (x == "vector")
                        )
                    ).cast("bigint").alias("score"),
                )
                .filter(F.col("score") > 0)
                .orderBy(F.col("score").desc(), F.col("doc_id").asc())
                .limit(10)
                .collect()
            )
            return time.perf_counter() - t0

        samples = [_scan_once() for _ in range(N_RUNS)]
        print(
            f"text_scan_term_topk_100k: median "
            f"{statistics.median(samples):.3f}s "
            f"samples {[round(s, 3) for s in samples]}"
        )


if __name__ == "__main__":
    main()
