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


def main() -> int:
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
    from hours_api_clickup_spark.session import get_spark

    spark = get_spark(app_name="ann-probe-scaling")
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, SF_DIR, "embeddings")
    docs = load_table(spark, SF_DIR, "documents")
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
        for _ in range(5):
            t0 = time.perf_counter()
            fn()
            vals.append(time.perf_counter() - t0)
        return statistics.median(vals)

    rows = []
    for rep in SCALES:
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
        print(
            f"# {rep}x: {n_vec} vecs / {n_doc} docs — lsh {t_lsh:.3f}s, "
            f"ivf {t_ivf:.3f}s, text {t_txt:.3f}s",
            file=sys.stderr,
        )

    print("| corpus | vectors | docs | LSH probe | IVF probe (nprobe=4/16) | text term probe |")
    print("|---|---|---|---|---|---|")
    for rep, nv, nd, tl, ti, tt in rows:
        print(
            f"| x{rep} | {nv:,} | {nd:,} | {tl:.3f} s | {ti:.3f} s | {tt:.3f} s |"
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
