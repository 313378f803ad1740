"""Scaling curve for the 7-stage curation composite (VERDICT r4 #4).

Replicates the sf0.1 ``documents`` table 2x/5x/10x (fresh doc_ids per
replica; text kept verbatim so every gram/shingle shuffles — replication
scales the dominant shuffle volumes linearly, which is exactly the
quantity under test; the near-dup stages see replica clusters, the
conservative heavy-bucket case) and times the same 7-query unit
``bench.py`` reports as ``pipeline_curation_composite``.  Other tables
are symlinked unmodified.  Output: one wall-time row per scale plus the
fitted log-log exponent — ~1.0 means the composite is linear in corpus
size; a super-linear stage would show up here before it shows up at
100 TB.

Run:  python scripts/curation_scaling.py   (writes a markdown table to
stdout; paste into COVERAGE.md)
"""

from __future__ import annotations

import math
import os
import statistics
import sys
import tempfile
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hours_api_clickup_spark.plans.registry import QUERIES, TABLE_NAMES
from hours_api_clickup_spark.session import get_spark

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALES = (1, 2, 5, 10)
CURATION = (
    "url_canonical_dedup",
    "gopher_quality_filter",
    "dedup_span_ngram",
    "dedup_corpus_manifest",
    "dedup_cross_corpus",
    "decontaminate_corpus",
    "dataset_split_assign",
)
N_RUNS = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))


def make_scaled_dir(root: str, scale: int) -> str:
    d = os.path.join(root, f"x{scale}")
    os.makedirs(d, exist_ok=True)
    for t in TABLE_NAMES:
        src = os.path.join(BASE, f"{t}.parquet")
        if t == "documents" or not os.path.exists(src):
            continue
        os.symlink(src, os.path.join(d, f"{t}.parquet"))
    con = duckdb.connect()
    con.execute(
        f"""
        COPY (
            SELECT doc_id + r.k * (SELECT MAX(doc_id) + 1 FROM
                       read_parquet('{BASE}/documents.parquet')) AS doc_id,
                   text, lang, source, n_chars
            FROM read_parquet('{BASE}/documents.parquet')
            CROSS JOIN (SELECT UNNEST(RANGE({scale})) AS k) r
        ) TO '{d}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    return d


def main() -> None:
    spark = get_spark(app_name="curation-scaling")
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(f"{BASE}/region.parquet").count()

    rows = []
    with tempfile.TemporaryDirectory() as root:
        for scale in SCALES:
            d = make_scaled_dir(root, scale)

            def unit() -> float:
                t0 = time.perf_counter()
                for name in CURATION:
                    df = QUERIES[name].fn(spark, d)
                    df.write.format("noop").mode("overwrite").save()
                return time.perf_counter() - t0

            med = statistics.median(unit() for _ in range(N_RUNS))
            rows.append((scale, med))
            print(f"# x{scale}: {med:.2f}s", file=sys.stderr)

    # least-squares slope in log-log space = scaling exponent
    xs = [math.log(s) for s, _ in rows]
    ys = [math.log(t) for _, t in rows]
    mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
    slope = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
        (x - mx) ** 2 for x in xs
    )

    print("| docs scale | rows | composite wall (median of %d) |" % N_RUNS)
    print("|---|---|---|")
    con = duckdb.connect()
    n0 = con.execute(
        f"SELECT COUNT(*) FROM read_parquet('{BASE}/documents.parquet')"
    ).fetchone()[0]
    con.close()
    for scale, med in rows:
        print(f"| x{scale} | {n0 * scale:,} | {med:.2f} s |")
    print(f"\nfitted log-log exponent: **{slope:.2f}**")


if __name__ == "__main__":
    main()
