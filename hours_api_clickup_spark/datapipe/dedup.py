"""Deduplication families for corpus curation at scale.

Algorithms follow the published formulations: MinHash resemblance
sketches (Broder, "On the resemblance and containment of documents",
SEQUENCES 1997) with banded LSH (Indyk & Motwani, STOC 1998; the
banding analysis as in Leskovec/Rajaraman/Ullman, Mining of Massive
Datasets ch. 3), and SimHash (Charikar, "Similarity estimation
techniques from rounding algorithms", STOC 2002) with the chunk-block
hamming search of Manku et al., "Detecting near-duplicates for web
crawling", WWW 2007.

- exact: hash-groupBy (one shuffle on the content hash)
- n-gram Jaccard: char-shingle set similarity; the exact pairwise form is
  O(n²) and only for bounded inputs / candidate verification — the scale
  path is MinHash+LSH
- MinHash+LSH: shingles → K minhashes → B bands → bucket join →
  candidate pairs → exact-Jaccard verification. Shuffle cost is the
  band-bucket groupBy (K·B small constants), never n².
- SimHash: 64-bit near-dup signature; candidates via 16-bit chunk
  blocking (pairs with hamming ≤ 3 must share ≥ 1 of 4 chunks).

All deterministic: hashing is Spark's xxhash64 with seeds baked into the
plan as literals, so reruns produce identical candidate sets. No UDFs —
everything is higher-order Catalyst expressions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SHINGLE_K = 5
DEFAULT_NUM_HASHES = 64
DEFAULT_BANDS = 16  # 16 bands × 4 rows each


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def spread(df: DataFrame, factor: int = 1) -> DataFrame:
    """Round-robin repartition to all cores. Small parquet inputs arrive
    as one partition; CPU-heavy per-row work (shingling, hashing,
    signatures) must be fanned out or it runs single-threaded. On a real
    cluster the scan already yields many partitions and this is a cheap
    near-no-op rebalance."""
    n = df.sparkSession.sparkContext.defaultParallelism * factor
    return df.repartition(n)


# ---------------------------------------------------------------------------
# Exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Exact dedup by content hash: one surviving (min-id) row per distinct
    content, with the duplicate count. Single hash shuffle on the digest."""
    return df.groupBy(F.md5(_c(content_col)).alias("content_md5")).agg(
        F.min(id_col).alias("keep_id"),
        F.count("*").alias("n_copies"),
    )


# ---------------------------------------------------------------------------
# Shingles + Jaccard
# ---------------------------------------------------------------------------


def char_shingles(col: Column | str, k: int = DEFAULT_SHINGLE_K) -> Column:
    """Distinct character k-grams (empty array when the text is shorter
    than k). Dynamic-offset substring inside a higher-order transform."""
    c = _c(col)
    grams = F.transform(
        F.sequence(F.lit(0), F.length(c) - k),
        lambda i: F.substring(c, i + 1, F.lit(k)),
    )
    return F.when(F.length(c) >= k, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def jaccard_sim(a: Column, b: Column) -> Column:
    """Jaccard similarity of two array columns (set semantics)."""
    inter = F.size(F.array_intersect(a, b))
    union = F.size(F.array_union(a, b))
    return inter.cast("double") / F.greatest(union, F.lit(1)).cast("double")


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = DEFAULT_SHINGLE_K,
    threshold: float = 0.7,
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard above ``threshold`` (id_a < id_b).

    O(n²) — correct but only for bounded inputs (verification, small
    corpora). At scale use ``minhash_lsh_pairs``, which verifies its
    candidates with this same jaccard_sim and therefore returns a subset
    of this result with LSH-bounded recall.
    """
    sh = spread(df).select(
        _c(id_col).alias("did"), char_shingles(text_col, k).alias("sh")
    )
    a = sh.alias("a")
    b = sh.alias("b")
    j = jaccard_sim(F.col("a.sh"), F.col("b.sh"))
    return (
        a.join(b, F.col("a.did") < F.col("b.did"))
        .select(
            F.col("a.did").alias("id_a"),
            F.col("b.did").alias("id_b"),
            j.alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------


def minhash_signature(
    shingles: Column, num_hashes: int = DEFAULT_NUM_HASHES
) -> Column:
    """K-permutation MinHash signature as a single column expression:
    per seed s, min over shingles of xxhash64(xxhash64(shingle), s).
    Empty shingle sets get a per-seed sentinel so they only ever collide
    with other empties.

    Note: higher-order functions evaluate interpreted (outside codegen);
    fine for per-row use, but the bulk path in minhash_lsh_pairs uses the
    explode+groupBy form below, which stays in whole-stage codegen."""
    base = F.transform(shingles, lambda sh: F.xxhash64(sh))
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda s: F.coalesce(
            F.array_min(F.transform(base, lambda h: F.xxhash64(h, s))),
            F.lit(2**62) + s,
        ),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = DEFAULT_SHINGLE_K,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    threshold: float = 0.7,
) -> DataFrame:
    """Near-dup pairs via MinHash+LSH, verified with exact Jaccard.

    Plan shape (the scale path — every stage codegen'd, no interpreted
    higher-order functions in the bulk flow):
      1. scan → shingles → explode → one xxhash64 per shingle
      2. groupBy(doc) with K min-aggregates (map-side partial agg: the
         shuffle carries K longs per doc, not the shingles)
      3. B band-bucket hashes → explode → self-join on (band, bucket):
         shuffle keyed on the bucket, so cost is Σ bucket² not n²
      4. candidate pairs → join shingle sets back by id → exact-Jaccard
         verification (precision 1.0 by construction)

    Recall follows the LSH S-curve 1-(1-j^r)^b, r = num_hashes/bands.
    Docs with no shingles (len < k) never band — they have no near-dups
    above any sane threshold; exact dedup handles identical empties.
    """
    rows_per_band = num_hashes // bands
    texts = spread(df).select(_c(id_col).alias("did"), _c(text_col).alias("txt"))

    # Gram stream without materializing shingle arrays: explode the
    # offset sequence, substring, hash — stays in whole-stage codegen
    # (array-lambda HOFs run interpreted and were ~5× slower here).
    # Duplicate grams are fine: min() over a multiset == min() over its
    # set, so MinHash needs no distinct.
    grams = (
        texts.filter(F.length("txt") >= k)
        .select("did", "txt", F.explode(F.sequence(F.lit(0), F.length("txt") - k)).alias("i"))
        .select("did", F.xxhash64(F.substring(F.col("txt"), F.col("i") + 1, F.lit(k))).alias("h"))
    )
    # ONE shuffle computes both the K-minhash signature and the distinct
    # gram-hash set. The set serves exact-Jaccard verification later:
    # Jaccard over 64-bit gram hashes equals Jaccard over the grams
    # themselves up to a ~n²/2⁶⁴ collision probability, and compares
    # long arrays JVM-side instead of rebuilding string shingles.
    min_aggs = [
        F.min(F.xxhash64(F.col("h"), F.lit(s))).alias(f"m{s}")
        for s in range(num_hashes)
    ]
    sig = grams.groupBy("did").agg(
        *min_aggs, F.collect_set("h").alias("gset")
    ).localCheckpoint(eager=False)

    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(
                *[F.col(f"m{b * rows_per_band + j}") for j in range(rows_per_band)]
            ).alias("bucket"),
        )
        for b in range(bands)
    ]
    banded = sig.select(
        "did", F.explode(F.array(*band_structs)).alias("bb")
    ).select("did", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.did") < F.col("b.did")),
        )
        .select(F.col("a.did").alias("id_a"), F.col("b.did").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )

    # Sketch prefilter before the (heavier) exact verification: the
    # fraction of matching minhash components is an unbiased Jaccard
    # estimator; a generous margin keeps true-positives. With K=64 and
    # j ≥ 0.7, P(estimate < 0.5) < 3e-4 — while the mass of low-j bucket
    # collisions is discarded without ever shipping their gram sets.
    est_margin = 0.2
    sig_arr = sig.select(
        "did", F.array(*[F.col(f"m{s}") for s in range(num_hashes)]).alias("sa")
    )
    est = F.aggregate(
        F.zip_with(
            F.col("sa_a"), F.col("sa_b"),
            lambda x, y: F.when(x == y, 1).otherwise(0),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    ) / F.lit(float(num_hashes))
    cand_est = (
        cand.join(sig_arr.select(F.col("did").alias("id_a"), F.col("sa").alias("sa_a")), "id_a")
        .join(sig_arr.select(F.col("did").alias("id_b"), F.col("sa").alias("sa_b")), "id_b")
        .filter(est >= threshold - est_margin)
        .select("id_a", "id_b")
    )

    gs_a = sig.select(F.col("did").alias("id_a"), F.col("gset").alias("gs_a"))
    gs_b = sig.select(F.col("did").alias("id_b"), F.col("gset").alias("gs_b"))
    return (
        cand_est.join(gs_a, "id_a")
        .join(gs_b, "id_b")
        .select(
            "id_a",
            "id_b",
            jaccard_sim(F.col("gs_a"), F.col("gs_b")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def simhash64(toks: Column) -> Column:
    """64-bit SimHash over a token array: bit i of the signature is the
    sign of Σ_tokens (±1 per bit i of xxhash64(token)).

    The per-bit loop is unrolled in Python (shift amounts must be plan
    literals); the result is one wide codegen'd expression — a single
    pass over the tokens, no shuffle."""
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    sig = F.lit(0).cast("long")
    for i in range(64):
        bit_sum = F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h, i=i: acc
            + F.when(
                F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1),
        )
        bit = F.when(bit_sum > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = sig.bitwiseOR(F.shiftleft(bit, i))
    return sig


def simhash_signatures(df: DataFrame, id_col: str, toks_col: Column) -> DataFrame:
    """SimHash via explode + groupBy — the scale path for long documents.

    One shuffle keyed on the doc id; 64 conditional-sum aggregates run
    map-side (partial aggregation), so the shuffle carries 64 longs per
    doc, not the tokens. Token-less docs get signature 0 via the
    left join back."""
    ids = df.select(_c(id_col).alias("did"))
    tok = spread(df).select(
        _c(id_col).alias("did"), F.explode(toks_col).alias("tok")
    ).withColumn("h", F.xxhash64("tok"))
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
        ).alias(f"b{i}")
        for i in range(64)
    ]
    sums = tok.groupBy("did").agg(*aggs)
    sig = F.lit(0).cast("long")
    for i in range(64):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = sig.bitwiseOR(F.shiftleft(bit, i))
    signed = sums.select("did", sig.alias("sig"))
    return ids.join(signed, "did", "left").select(
        "did", F.coalesce(F.col("sig"), F.lit(0).cast("long")).alias("sig")
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    toks_col: Column,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup candidate pairs with hamming(simhash) ≤ max_hamming.

    Blocking: split the 64-bit signature into 4 × 16-bit chunks; by
    pigeonhole, any pair within hamming ≤ 3 shares at least one exact
    chunk → join on (chunk_idx, chunk_value) instead of n². Verified by
    exact popcount on the full signature. (For max_hamming > 3 the chunk
    block is a recall-lossy prefilter — near-dups still share chunks
    with high probability.)
    """
    sig = simhash_signatures(df, id_col, toks_col)
    chunked = sig.select(
        "did",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("chunk_idx"),
                        F.shiftright(F.col("sig"), i * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("chunk_val"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("ch"),
    ).select(
        "did",
        "sig",
        F.col("ch.chunk_idx").alias("chunk_idx"),
        F.col("ch.chunk_val").alias("chunk_val"),
    )
    a = chunked.alias("a")
    b = chunked.alias("b")
    ham = F.bit_count(F.col("a.sig").bitwiseXOR(F.col("b.sig")))
    return (
        a.join(
            b,
            (F.col("a.chunk_idx") == F.col("b.chunk_idx"))
            & (F.col("a.chunk_val") == F.col("b.chunk_val"))
            & (F.col("a.did") < F.col("b.did")),
        )
        .select(
            F.col("a.did").alias("id_a"),
            F.col("b.did").alias("id_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["id_a", "id_b"])
    )
