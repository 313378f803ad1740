"""Probe latency vs corpus size for the persisted indexes (r7).

The 100 TB claim for the index family is that QUERY cost is governed by
the index layout, not the corpus: an LSH probe reads tables·(planes+1)
signature partitions and a text-index term probe reads the query terms'
buckets, whatever the corpus size; an IVF probe reads nprobe clusters,
each ~corpus/n_clusters — the one probe with a linear component, kept
honest here. This script measures it instead of asserting it: the sf0.1
embeddings (2k vectors) and documents (5k docs) are replicated 1×/4×/
16×/64× (ids re-keyed, vectors perturbed so signatures spread, text
verbatim), each scale gets a fresh index build, and the same probe runs
as a median of 5 warm runs.

Run:  python scripts/ann_probe_scaling.py   (markdown table to stdout;
paste into COVERAGE.md)
``--quick`` drops to scales (1, 8) / 3 runs — the form bench.py calls
EVERY round so the flat-probe claim stays continuously measured
(verdict r7 #8).
"""

from __future__ import annotations

import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALES = (1, 4, 16, 64)


def run(
    spark,
    scales=SCALES,
    n_runs: int = 5,
    sf_dir: str = SF_DIR,
    include_ivf: bool = True,
):
    """Measure probe latency at each corpus scale with a caller-owned
    session; returns (rep, n_vec, n_doc, t_lsh, t_ivf, t_txt) rows
    (t_ivf is None when include_ivf=False — bench.py skips the probe
    with the documented linear component to stay cheap)."""
    from pyspark.sql import functions as F

    from hours_api_clickup_spark.datapipe.similarity import (
        ivf_index_write,
        ivf_probe_topk,
        lsh_index_write,
        lsh_probe_topk,
        lsh_index_read,
        seed_centroids,
    )
    from hours_api_clickup_spark.datapipe.textindex import (
        index_term_topk,
        inverted_index_read,
        inverted_index_write,
    )
    from hours_api_clickup_spark.plans.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    qv = [
        float(x) for x in emb.filter(F.col("vec_id") == 0).head()["embedding"]
    ]

    def replicate_emb(rep: int):
        if rep == 1:
            return emb
        return (
            emb.crossJoin(
                F.broadcast(spark.range(rep).withColumnRenamed("id", "rep"))
            )
            .select(
                (F.col("vec_id") * rep + F.col("rep")).alias("vec_id"),
                F.transform(
                    "embedding",
                    lambda x: x + F.col("rep").cast("float") * F.lit(0.0001),
                )
                .cast("array<float>")
                .alias("embedding"),
            )
            .localCheckpoint()
        )

    def replicate_docs(rep: int):
        if rep == 1:
            return docs
        return (
            docs.crossJoin(
                F.broadcast(spark.range(rep).withColumnRenamed("id", "rep"))
            )
            .select(
                (F.col("doc_id") * rep + F.col("rep")).alias("doc_id"), "text"
            )
            .localCheckpoint()
        )

    def median5(fn) -> float:
        fn()  # untimed first read (partition listing + footers)
        vals = []
        for _ in range(n_runs):
            t0 = time.perf_counter()
            fn()
            vals.append(time.perf_counter() - t0)
        return statistics.median(vals)

    rows = []
    for rep in scales:
        e = replicate_emb(rep)
        d = replicate_docs(rep)
        n_vec = e.count()
        n_doc = d.count()
        base = tempfile.mkdtemp(prefix=f"probe_scale_{rep}x_")

        lsh = f"{base}/lsh"
        lsh_index_write(e, "embedding", "vec_id", lsh, dim=64)
        reader = lsh_index_read(spark, lsh)
        t_lsh = median5(
            lambda: lsh_probe_topk(spark, reader, qv, k=10, exclude_id=0).collect()
        )

        t_ivf = None
        if include_ivf:
            ivf = f"{base}/ivf"
            cents = seed_centroids(e, "embedding", "vec_id", n_clusters=16)
            ivf_index_write(e, "embedding", "vec_id", ivf, cents)
            t_ivf = median5(
                lambda: ivf_probe_topk(
                    spark, ivf, "embedding", "vec_id", qv, cents, k=10,
                    nprobe=4, exclude_id=0,
                ).collect()
            )

        txt = f"{base}/txt"
        inverted_index_write(d, "text", "doc_id", txt)
        treader = inverted_index_read(spark, txt)
        t_txt = median5(
            lambda: index_term_topk(
                spark, treader, ["merge", "vector"], k=10
            ).collect()
        )

        rows.append((rep, n_vec, n_doc, t_lsh, t_ivf, t_txt))
        # drop this scale's index copies before the next build — inside
        # bench.py the session keeps running and leaked dirs would grow
        # /tmp by several index copies per round (review r8) — and
        # unpersist the replicated frames' localCheckpoint blocks: the
        # rmtree covers disk only, and the cached replicas would
        # otherwise accumulate in executor storage memory across every
        # bench round of the long-lived session, pressuring the very
        # drift-sensitive timings this script measures (ADVICE r8)
        import shutil

        shutil.rmtree(base, ignore_errors=True)
        for frame in (e, d):
            if frame is emb or frame is docs:
                continue  # rep==1 reuses the un-checkpointed base table
            try:
                frame._jdf.queryExecution().analyzed().rdd().unpersist(False)
            except Exception:
                pass  # retention is memory pressure, never correctness
        ivf_msg = f"{t_ivf:.3f}s" if t_ivf is not None else "skipped"
        print(
            f"# {rep}x: {n_vec} vecs / {n_doc} docs — lsh {t_lsh:.3f}s, "
            f"ivf {ivf_msg}, text {t_txt:.3f}s",
            file=sys.stderr,
        )
    return rows


def main(argv=None) -> int:
    from hours_api_clickup_spark.session import get_spark

    argv = sys.argv[1:] if argv is None else argv
    quick = "--quick" in argv
    spark = get_spark(app_name="ann-probe-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    rows = run(
        spark,
        scales=(1, 8) if quick else SCALES,
        n_runs=3 if quick else 5,
    )
    print("| corpus | vectors | docs | LSH probe | IVF probe (nprobe=4/16) | text term probe |")
    print("|---|---|---|---|---|---|")
    for rep, nv, nd, tl, ti, tt in rows:
        ti_s = f"{ti:.3f} s" if ti is not None else "—"
        print(
            f"| x{rep} | {nv:,} | {nd:,} | {tl:.3f} s | {ti_s} | {tt:.3f} s |"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
