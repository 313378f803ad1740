"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk``: exact cosine top-k. Distributed TakeOrdered —
  each partition keeps its local top-k, the driver merges k·p rows.
  The correctness baseline at any scale where a full scan is acceptable.
- ``lsh_bucketed_topk``: random-hyperplane LSH scale path. Signatures
  come from deterministic pseudo-random hyperplanes (hash-derived ±1
  components), candidates share the query's bucket under ≥1 of several
  signature tables; exact cosine re-ranks candidates.
- ``embedding_near_dup_pairs``: all-pairs cosine ≥ threshold (bounded
  O(n²) verifier; pairs at scale should go through the LSH buckets).

Vector math is higher-order Catalyst (zip_with + aggregate over doubles)
— JVM-side, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_PLANES = 8  # bits per signature table
DEFAULT_TABLES = 6  # signature tables (OR across tables)
DEFAULT_PROBE_RADIUS = 1  # accept buckets within this hamming of the query


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_sim(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def brute_force_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec: list[float],
    k: int = 10,
    exclude_id=None,
) -> DataFrame:
    """Exact cosine top-k against a literal query vector.

    orderBy+limit compiles to TakeOrderedAndProject: per-partition heap
    top-k then a k·num_partitions driver merge — no global sort shuffle.
    """
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = df.select(
        _c(id_col).alias("nbr_id"),
        cosine_sim(_c(vec_col), q).alias("score"),
    )
    if exclude_id is not None:
        scored = scored.filter(F.col("nbr_id") != exclude_id)
    return scored.orderBy(F.col("score").desc(), F.col("nbr_id").asc()).limit(k)


def _hyperplane_sign(vec: Column, table: int, plane: int) -> Column:
    """sign(Σ_d vec[d] · h(table, plane, d)) with h ∈ {−1, +1} derived from
    xxhash64 — a deterministic pseudo-random hyperplane with no stored
    model, reproducible on every executor from plan literals."""
    proj = F.aggregate(
        F.zip_with(
            vec,
            F.sequence(F.lit(0), F.size(vec) - 1),
            lambda x, d: x.cast("double")
            * F.when(
                F.xxhash64(F.lit(table), F.lit(plane), d).bitwiseAND(F.lit(1)) == 1,
                1.0,
            ).otherwise(-1.0),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return F.when(proj >= 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))


def lsh_signature(vec: Column, table: int, planes: int = DEFAULT_PLANES) -> Column:
    """``planes``-bit random-hyperplane signature for one table."""
    bits = [
        F.shiftleft(_hyperplane_sign(vec, table, p), p) for p in range(planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out.bitwiseOR(b)
    return out


def add_lsh_signatures(
    df: DataFrame,
    vec_col: str,
    planes: int = DEFAULT_PLANES,
    tables: int = DEFAULT_TABLES,
) -> DataFrame:
    """Append one signature column per table (sig_0 .. sig_{T-1}).
    At 100 TB, persist these with the corpus (computed once at ingest)
    and bucket/partition the table by sig_0 for locality."""
    out = df
    for t in range(tables):
        out = out.withColumn(f"sig_{t}", lsh_signature(_c(vec_col), t, planes))
    return out


def lsh_bucketed_topk(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    query_vec: list[float],
    k: int = 10,
    planes: int = DEFAULT_PLANES,
    tables: int = DEFAULT_TABLES,
    probe_radius: int = DEFAULT_PROBE_RADIUS,
    exclude_id=None,
) -> DataFrame:
    """Approximate top-k: candidates fall in a bucket within
    ``probe_radius`` hamming bits of the query's bucket in ≥1 signature
    table (multiprobe LSH); exact cosine re-ranks the candidates.

    Scale shape: signatures are cheap plan-literal expressions persisted
    at ingest; multiprobe enumerates planes+1 bucket keys per table
    (radius 1), so with the corpus bucketed by signature this is a
    handful of point lookups, not a scan. The popcount filter below is
    the same predicate in scan form.
    """
    sigs = add_lsh_signatures(df, vec_col, planes, tables)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    q_sig_rows = (
        sigs.sparkSession.range(1)
        .select(
            *[
                lsh_signature(q, t, planes).alias(f"qsig_{t}")
                for t in range(tables)
            ]
        )
        .collect()[0]
    )
    cond = F.lit(False)
    for t in range(tables):
        qsig = int(q_sig_rows[f"qsig_{t}"])
        cond = cond | (
            F.bit_count(F.col(f"sig_{t}").bitwiseXOR(F.lit(qsig)))
            <= probe_radius
        )
    cand = sigs.filter(cond)
    scored = cand.select(
        _c(id_col).alias("nbr_id"),
        cosine_sim(_c(vec_col), q).alias("score"),
    )
    if exclude_id is not None:
        scored = scored.filter(F.col("nbr_id") != exclude_id)
    return scored.orderBy(F.col("score").desc(), F.col("nbr_id").asc()).limit(k)


def embedding_near_dup_pairs(
    df: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.45,
) -> DataFrame:
    """All-pairs cosine ≥ threshold (id_a < id_b). Bounded O(n²) form;
    the scale path buckets by LSH signature first (same verification)."""
    base = df.select(_c(id_col).alias("did"), _c(vec_col).alias("v"))
    a = base.alias("a")
    b = base.alias("b")
    return (
        a.join(b, F.col("a.did") < F.col("b.did"))
        .select(
            F.col("a.did").alias("id_a"),
            F.col("b.did").alias("id_b"),
            cosine_sim(F.col("a.v"), F.col("b.v")).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
