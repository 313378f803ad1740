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

All deterministic AND engine-portable: every hash is pure int64
arithmetic (an unrolled polynomial over character codes for fixed-k
grams, the first 32 bits of md5 for variable-length tokens, and affine
``(a·h+b) mod 2³¹`` permutations whose constants are Python-generated
literals baked into the plan). DuckDB reproduces the full pipeline
bit-for-bit — the generated oracles live in ``minhash_lsh_oracle_sql``
and ``simhash_oracle_sql``, so the driver's hash-match gate covers the
LSH families end-to-end, not just rows-only. No UDFs; the bulk paths
stay in whole-stage codegen.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hours_api_clickup_spark.functions.hashing import md5_hash32, md5_hash32_sql

DEFAULT_SHINGLE_K = 5
DEFAULT_NUM_HASHES = 64
DEFAULT_BANDS = 16  # 16 bands × 4 rows each

# --- engine-portable integer hash family ----------------------------------
# All arithmetic is bounded to stay inside int64 under ANSI mode:
#   gram hash        < 2^31;  ·131 + 255            < 2^39
#   affine a·h + b   : a < 2^31, h < 2^32  → product < 2^63
#   band Horner      : acc < 2^31, ·KNUTH_A(<2^32)  < 2^63
M31 = 2**31
HALF31 = 2**30
GRAM_BASE = 131
KNUTH_A = 2654435761  # ⌊2^32/φ⌋, same multiplier as datapipe.sampling
MINHASH_SALT = 0x5BD1E995
SIMHASH_SALT = 0x9E3779B9


def affine_constants(n: int, salt: int) -> list[tuple[int, int]]:
    """``n`` deterministic affine pairs (a odd, b) mod 2³¹ from a fixed
    64-bit LCG (Knuth MMIX constants). Runs only in Python at plan-build
    time — both the Spark plan and the DuckDB oracle see the same plain
    integer literals, which is what makes the hash family engine-neutral.
    """
    out = []
    x = (2 * salt + 1) % 2**63
    for _ in range(n):
        x = (x * 6364136223846793005 + 1442695040888963407) % 2**64
        a = ((x >> 16) % M31) | 1
        x = (x * 6364136223846793005 + 1442695040888963407) % 2**64
        b = (x >> 16) % M31
        out.append((a, b))
    return out


def portable_gram_hash(txt: Column, i: Column, k: int) -> Column:
    """Polynomial hash mod 2³¹ of the k characters of ``txt`` starting at
    0-based offset ``i`` — unrolled (k is a plan literal), so the whole
    thing is codegen'd builtins with no interpreted lambdas."""
    h = F.lit(0).cast("long")
    for j in range(k):
        ch = F.ascii(F.substring(txt, i + F.lit(j + 1), F.lit(1)))
        h = F.pmod(h * F.lit(GRAM_BASE) + ch, F.lit(M31))
    return h


def gram_hash_sql(text_expr: str, i_expr: str, k: int) -> str:
    """DuckDB twin of ``portable_gram_hash`` (same unrolled arithmetic)."""
    h = "CAST(0 AS BIGINT)"
    for j in range(k):
        ch = f"ascii(substring({text_expr}, {i_expr} + {j + 1}, 1))"
        h = f"(({h} * {GRAM_BASE} + {ch}) % {M31})"
    return h


def _min_matches(threshold: float, num_hashes: int) -> int:
    """The sketch prefilter's integer cutoff — matching minhash
    components ≥ ceil((threshold − margin)·K). ONE definition: the
    Spark prefilter, the DuckDB oracle, and both persisted-index paths
    must stay bit-identical or the hash-match gate / the
    incremental-≡-batch property silently diverge (review r8: four
    copies of this formula)."""
    est_margin = 0.2
    return max(0, math.ceil((threshold - est_margin) * num_hashes - 1e-9))


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


def portable_shingle_hash(sh: Column) -> Column:
    """Polynomial hash mod 2³¹ of a standalone shingle STRING — exactly
    ``portable_gram_hash`` evaluated over txt[i:i+k]'s characters, so a
    per-row signature is component-comparable with the bulk path and
    the persisted doc index. Interpreted HOF: per-row use only."""
    return F.aggregate(
        F.sequence(F.lit(1), F.length(sh)),
        F.lit(0).cast("long"),
        lambda h, j: F.pmod(
            h * F.lit(GRAM_BASE) + F.ascii(F.substring(sh, j, F.lit(1))),
            F.lit(M31),
        ),
    )


def minhash_signature(
    shingles: Column, num_hashes: int = DEFAULT_NUM_HASHES
) -> Column:
    """K-permutation MinHash signature as a single column expression:
    per permutation s, min over shingles of
    (a_s·portable_shingle_hash(sh)+b_s) mod 2³¹ — the SAME hash family
    and constants as ``_sig_frame``, so these signatures are
    component-comparable with ``minhash_lsh_pairs`` and the persisted
    doc index (review r8: the md5_hash32 family this used before made
    per-row signatures silently incomparable — ~0/64 components matched
    even for identical text, killing the ≥min-matches prefilter;
    parity is now pinned by test). Empty shingle sets get a
    per-permutation sentinel (≥ 2³¹, outside the hash range) so they
    only ever collide with other empties.

    Note: higher-order functions evaluate interpreted (outside codegen);
    fine for per-row use, but the bulk path in minhash_lsh_pairs uses the
    explode+groupBy form below, which stays in whole-stage codegen."""
    consts = affine_constants(num_hashes, MINHASH_SALT)
    base = F.transform(shingles, lambda sh: portable_shingle_hash(sh))

    def _perm_min(a: int, b: int) -> Column:
        # factory closure, NOT default-arg capture: PySpark counts a
        # lambda's defaults as HOF parameters, so the old
        # ``lambda h, a=a, b=b`` form was an invalid 3-arg transform
        # lambda — the function failed on FIRST USE (review r8: it had
        # no internal caller and no test, so nothing caught it)
        return F.array_min(
            F.transform(base, lambda h: F.pmod(h * a + b, F.lit(M31)))
        )

    mins = [
        F.coalesce(_perm_min(a, b), F.lit(M31 + s))
        for s, (a, b) in enumerate(consts)
    ]
    return F.array(*mins)


def _sign_batches(k: int, num_hashes: int, mode: str, vdim_cols):
    """Factory for the Arrow-batched numpy signer shared by
    ``_sig_frame`` / ``_sig_frame_thin`` / ``_gset_frame``.

    Same integer algebra as the exploded-gram Catalyst form it replaced
    (``portable_gram_hash`` + per-permutation pmod mins). r12 made it a
    per-document numpy pass (29.7 s task time → ~1 s at sf0.1); r13
    (VERDICT r12 #8, guide §4.2) folds the per-document Python loop
    into ONE flat segmented pass per Arrow batch: code points of every
    doc concatenate into one array, the k-pass rolling polynomial runs
    once over gather indices, per-doc sorted-unique gram sets come from
    one lexsort + boundary mask, and the K minhash mins are K
    ``np.minimum.reduceat`` passes over the flat unique-gram array. The
    only remaining per-doc work is the utf-32 encode of each string.
    Output leaves as Arrow — the gset column is built directly from the
    flat values + offsets (``pa.ListArray.from_arrays``), never as
    per-row Python lists (the old ``tolist()`` materialized millions of
    Python ints per batch).

    ``mode``: 'full' → m0..m{K-1} + gset; 'thin' → mins only;
    'gset' → gset only. Gram sets come out sorted-unique — every
    consumer treats them as sets (array_intersect/union, the DuckDB
    list-set oracle), exactly as with collect_set's arbitrary order.
    """
    import numpy as np

    consts = affine_constants(num_hashes, MINHASH_SALT)
    A = np.array([c[0] for c in consts], dtype=np.int64)
    B = np.array([c[1] for c in consts], dtype=np.int64)

    def sign(batches):
        import numpy as np
        import pyarrow as pa

        for rb in batches:
            dids = rb.column(rb.schema.get_field_index("did"))
            txts = rb.column(rb.schema.get_field_index("txt")).to_pylist()
            # per-doc: only the utf-32 decode; everything after is flat
            keep_idx, code_chunks, n_grams = [], [], []
            for i, txt in enumerate(txts):
                if txt is None or len(txt) < k:
                    # same row-universe as the exploded form: docs with
                    # no gram produce no signature row
                    continue
                keep_idx.append(i)
                code_chunks.append(
                    np.frombuffer(txt.encode("utf-32-le"), dtype=np.uint32)
                )
                n_grams.append(len(txt) - k + 1)
            if not keep_idx:
                continue
            codes = np.concatenate(code_chunks).astype(np.int64)
            n_grams = np.asarray(n_grams, dtype=np.int64)
            doc_code_starts = np.concatenate(
                ([0], np.cumsum([len(c) for c in code_chunks])[:-1])
            ).astype(np.int64)
            total = int(n_grams.sum())
            # flat gram positions: doc i contributes code offsets
            # [start_i, start_i + n_i)
            gram_doc = np.repeat(np.arange(len(keep_idx)), n_grams)
            gram_starts = np.concatenate(([0], np.cumsum(n_grams)[:-1]))
            pos = (
                np.arange(total, dtype=np.int64)
                - np.repeat(gram_starts, n_grams)
                + np.repeat(doc_code_starts, n_grams)
            )
            h = np.zeros(total, dtype=np.int64)
            for j in range(k):
                h = (h * GRAM_BASE + codes[pos + j]) % M31
            # per-doc sorted unique: lexsort by (doc, hash), keep rows
            # where either key changes
            order = np.lexsort((h, gram_doc))
            hs, ds = h[order], gram_doc[order]
            first = np.empty(total, dtype=bool)
            first[0] = True
            first[1:] = (hs[1:] != hs[:-1]) | (ds[1:] != ds[:-1])
            uniq = hs[first]
            uniq_doc = ds[first]
            uniq_counts = np.bincount(uniq_doc, minlength=len(keep_idx))
            uniq_starts = np.concatenate(([0], np.cumsum(uniq_counts)[:-1]))
            out_cols: dict[str, pa.Array] = {
                "did": dids.take(pa.array(keep_idx, type=pa.int32()))
            }
            if mode != "gset":
                for s in range(num_hashes):
                    v = (uniq * A[s] + B[s]) % M31
                    out_cols[f"m{s}"] = pa.array(
                        np.minimum.reduceat(v, uniq_starts), type=pa.int64()
                    )
            if mode != "thin":
                offsets = np.concatenate(([0], np.cumsum(uniq_counts)))
                out_cols["gset"] = pa.ListArray.from_arrays(
                    pa.array(offsets, type=pa.int32()),
                    pa.array(uniq, type=pa.int64()),
                )
            yield pa.RecordBatch.from_pydict(out_cols)

    return sign


def _sign_schema(texts: DataFrame, num_hashes: int, mode: str):
    from pyspark.sql.types import (
        ArrayType,
        LongType,
        StructField,
        StructType,
    )

    fields = [StructField("did", texts.schema["did"].dataType)]
    if mode != "gset":
        fields += [StructField(f"m{s}", LongType()) for s in range(num_hashes)]
    if mode != "thin":
        fields += [StructField("gset", ArrayType(LongType()))]
    return StructType(fields)


def _sign_texts(
    texts: DataFrame, k: int, num_hashes: int, mode: str
) -> DataFrame:
    """Run the vectorized signer over a prepared (did, txt) frame."""
    return texts.mapInArrow(
        _sign_batches(k, num_hashes, mode, None),
        schema=_sign_schema(texts, num_hashes, mode),
    )


def _signed(
    df: DataFrame, id_col: str, text_col: str, k: int, num_hashes: int, mode: str
) -> DataFrame:
    texts = spread(df).select(_c(id_col).alias("did"), _c(text_col).alias("txt"))
    return _sign_texts(texts, k, num_hashes, mode)


def _sig_frame(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    num_hashes: int,
) -> DataFrame:
    """(did, m0..m{K-1}, gset): the shingle→minhash reduction shared by
    the one-shot pair query and the persisted doc index — one Arrow-
    batched numpy pass (``_sign_batches``), no gram explode, no signing
    shuffle at all (the old exploded form needed the groupBy exchange)."""
    return _signed(df, id_col, text_col, k, num_hashes, "full")


def _gram_rows(texts: DataFrame, k: int) -> DataFrame:
    """(did, h) gram-hash rows from a (did, txt) frame — offsets
    exploded, no shingle strings materialized."""
    return (
        texts.filter(F.length("txt") >= k)
        .select(
            "did",
            "txt",
            F.explode(F.sequence(F.lit(0), F.length("txt") - k)).alias("i"),
        )
        .select("did", portable_gram_hash(F.col("txt"), F.col("i"), k).alias("h"))
    )


def _sig_frame_thin(
    df: DataFrame, id_col: str, text_col: str, k: int, num_hashes: int
) -> DataFrame:
    """``_sig_frame`` without the gram-set column — K longs per doc.
    The rejoin verification path (``minhash_lsh_pairs(rejoin_grams=
    True)``) uses this and re-derives gram sets for CANDIDATE docs
    only."""
    return _signed(df, id_col, text_col, k, num_hashes, "thin")




def _band_frame(sig: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """(did, band, bucket) rows from a signature frame: Horner fold of
    each band's minhashes mod 2³¹ — portable integer algebra."""
    rows_per_band = num_hashes // bands

    def band_bucket(cols: list[Column]) -> Column:
        acc = F.lit(0).cast("long")
        for m in cols:
            acc = F.pmod(acc * F.lit(KNUTH_A) + m, F.lit(M31))
        return acc

    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            band_bucket(
                [F.col(f"m{b * rows_per_band + j}") for j in range(rows_per_band)]
            ).alias("bucket"),
        )
        for b in range(bands)
    ]
    return sig.select(
        "did", F.explode(F.array(*band_structs)).alias("bb")
    ).select("did", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = DEFAULT_SHINGLE_K,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    threshold: float = 0.7,
    rejoin_grams: bool = False,
) -> DataFrame:
    """Near-dup pairs via MinHash+LSH, verified with exact Jaccard.

    Plan shape (the scale path — every stage codegen'd, no interpreted
    higher-order functions in the bulk flow):
      1. scan → shingles → explode → one polynomial gram hash per shingle
      2. groupBy(doc) with K min-aggregates + collect_set of gram
         hashes (map-side partial agg; the shuffle carries K longs plus
         the distinct gram-hash set per doc — a measured trade, see the
         inline comment below)
      3. B band-bucket hashes → explode → self-join on (band, bucket):
         shuffle keyed on the bucket, so cost is Σ bucket² not n²
      4. candidate pairs → join shingle sets back by id → exact-Jaccard
         verification (precision 1.0 by construction)

    Recall follows the LSH S-curve 1-(1-j^r)^b, r = num_hashes/bands.
    Docs with no shingles (len < k) never band — they have no near-dups
    above any sane threshold; exact dedup handles identical empties.

    Hashing is the engine-portable int64 family (module header):
    ``minhash_lsh_oracle_sql`` generates a DuckDB query that reproduces
    this exact output, including the banding and the sketch prefilter.
    """
    # ONE shuffle computes both the K-minhash signature and the distinct
    # gram-hash set (_sig_frame: explode-offset grams + K min-aggregates,
    # all codegen'd — array-lambda HOFs run interpreted and were ~5×
    # slower here; duplicate grams are fine since min over a multiset ==
    # min over its set). Shipping collect_set(h) through this shuffle is
    # a measured trade (O(distinct-grams) longs per doc ≈ doc length·8 B
    # — roughly the text itself): it funds exact-Jaccard verification
    # without a second join back to the corpus, and compares long arrays
    # JVM-side instead of rebuilding string shingles. Jaccard over gram
    # hashes equals Jaccard over the grams up to a ~len²/2³¹ collision
    # probability — and is the same in the oracle, which uses the same
    # hashes. (Re-joining gram sets only for post-prefilter candidates
    # would shrink this shuffle but re-scan + re-shingle the corpus; at
    # sf0.1 the one-shuffle form benches faster.)
    #
    # ``rejoin_grams=True`` flips that trade for LARGE corpora (VERDICT
    # r10 #4): the signing shuffle carries only the K minhash longs per
    # doc (~0.5 KB vs the text-sized gram set — at the 1M-doc soak the
    # shipped form pushed ≈25 GB of gram rows through one shuffle +
    # checkpoint), and gram sets are re-derived by ONE extra corpus
    # scan semi-joined to the post-prefilter candidate ids — O(corpus)
    # scan but O(candidates) shuffle. Output is IDENTICAL (same gram
    # hashes, same Jaccard, same oracle); only the physical plan moves.
    # build_corpus flips it automatically past NEAR_DEDUP_REJOIN_MIN_DOCS.
    if rejoin_grams:
        sig = _sig_frame_thin(
            df, id_col, text_col, k, num_hashes
        ).localCheckpoint(eager=False)
    else:
        sig = _sig_frame(df, id_col, text_col, k, num_hashes).localCheckpoint(
            eager=False
        )
    banded = _band_frame(sig, num_hashes, bands)

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

    if not rejoin_grams:
        return _verified_pairs(sig, cand, num_hashes, threshold)
    return _rejoin_verified_pairs(
        df, id_col, text_col, k, sig, cand, num_hashes, threshold
    )


def _rejoin_verified_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int,
    sig: DataFrame,
    cand: DataFrame,
    num_hashes: int,
    threshold: float,
) -> DataFrame:
    """The ``rejoin_grams`` verification tail shared by the one-corpus
    and cross-corpus pair queries: sketch-prefilter on the thin
    signature frame, then re-derive gram sets for candidate docs only
    (one corpus scan semi-joined to the candidate ids)."""
    # checkpoint the prefiltered pairs: consumed twice (candidate-id
    # seed + the verify join) and cheap (two ids per row)
    cand_est = _sketch_prefilter(sig, cand, num_hashes, threshold).localCheckpoint(
        eager=False
    )
    cand_ids = (
        cand_est.select(F.col("id_a").alias("did"))
        .unionByName(cand_est.select(F.col("id_b").alias("did")))
        .distinct()
    )
    texts = spread(df).select(
        _c(id_col).alias("did"), _c(text_col).alias("txt")
    )
    gsets = _sign_texts(
        texts.join(cand_ids, "did", "left_semi"), k, DEFAULT_NUM_HASHES, "gset"
    )
    return _jaccard_verify(cand_est, gsets, threshold)


def _verified_pairs(
    sig: DataFrame, cand: DataFrame, num_hashes: int, threshold: float
) -> DataFrame:
    """Sketch prefilter + exact-Jaccard verification of candidate
    (id_a, id_b) pairs against the signature frame — shared by the
    one-corpus and cross-corpus pair queries.

    Sketch prefilter before the (heavier) exact verification: the
    fraction of matching minhash components is an unbiased Jaccard
    estimator; a generous margin keeps true-positives. With K=64 and
    j ≥ 0.7, P(estimate < 0.5) < 3e-4 — while the mass of low-j bucket
    collisions is discarded without ever shipping their gram sets.
    The cutoff is an integer count of matching components (never a
    float compare), so the oracle reproduces it exactly."""
    return _jaccard_verify(
        _sketch_prefilter(sig, cand, num_hashes, threshold),
        sig.select("did", "gset"),
        threshold,
    )


def _sketch_prefilter(
    sig: DataFrame, cand: DataFrame, num_hashes: int, threshold: float
) -> DataFrame:
    """Minhash-component match-count prefilter over candidate pairs —
    the first half of ``_verified_pairs`` (docstring there)."""
    min_matches = _min_matches(threshold, num_hashes)
    sig_arr = sig.select(
        "did", F.array(*[F.col(f"m{s}") for s in range(num_hashes)]).alias("sa")
    )
    matches = F.aggregate(
        F.zip_with(
            F.col("sa_a"), F.col("sa_b"),
            lambda x, y: F.when(x == y, 1).otherwise(0),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return (
        cand.join(sig_arr.select(F.col("did").alias("id_a"), F.col("sa").alias("sa_a")), "id_a")
        .join(sig_arr.select(F.col("did").alias("id_b"), F.col("sa").alias("sa_b")), "id_b")
        .filter(matches >= F.lit(min_matches))
        .select("id_a", "id_b")
    )


def _jaccard_verify(
    cand_est: DataFrame, gset_frame: DataFrame, threshold: float
) -> DataFrame:
    """Exact-Jaccard verification of prefiltered pairs against a
    (did, gset) frame — the second half of ``_verified_pairs``."""
    gs_a = gset_frame.select(F.col("did").alias("id_a"), F.col("gset").alias("gs_a"))
    gs_b = gset_frame.select(F.col("did").alias("id_b"), F.col("gset").alias("gs_b"))
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


def minhash_cross_corpus_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bench_pred,
    k: int = DEFAULT_SHINGLE_K,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    threshold: float = 0.7,
    rejoin_grams: bool = False,
) -> DataFrame:
    """Near-dup pairs ACROSS a corpus boundary only — the train-vs-
    held-out form of MinHash dedup (Lee et al. ACL 2022 §4: benchmark
    contamination removed as near-duplication, not just exact n-gram
    overlap). ``bench_pred`` maps the id column to the benchmark-side
    predicate; output rows are (id_a = train doc, id_b = benchmark
    doc, jaccard ≥ threshold).

    Same signature/banding machinery as ``minhash_lsh_pairs`` (one
    shuffle signs both sides together), but the candidate join
    requires OPPOSITE sides, so within-side bucket collisions — the
    bulk of a self-joined corpus — never become candidates, never hit
    the sketch prefilter, never fetch gram sets. At 100 TB train × a
    fixed benchmark set this makes the pair join's probe side the
    benchmark's banded rows (tiny), broadcastable by the planner.

    ``rejoin_grams`` as on ``minhash_lsh_pairs`` — here the candidate
    set is train×benchmark only, so the rejoined gram scan touches a
    vanishing doc fraction while the signing shuffle drops from
    corpus-sized to 64 longs/doc."""
    if rejoin_grams:
        sig = _sig_frame_thin(
            df, id_col, text_col, k, num_hashes
        ).localCheckpoint(eager=False)
    else:
        sig = _sig_frame(df, id_col, text_col, k, num_hashes).localCheckpoint(
            eager=False
        )
    banded = _band_frame(sig, num_hashes, bands)
    a = banded.filter(~bench_pred(F.col("did"))).alias("a")
    b = banded.filter(bench_pred(F.col("did"))).alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket")),
        )
        .select(F.col("a.did").alias("id_a"), F.col("b.did").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    if not rejoin_grams:
        return _verified_pairs(sig, cand, num_hashes, threshold)
    return _rejoin_verified_pairs(
        df, id_col, text_col, k, sig, cand, num_hashes, threshold
    )


def _minhash_oracle_ctes(
    table: str,
    id_col: str,
    text_col: str,
    k: int,
    num_hashes: int,
    bands: int,
    threshold: float,
) -> str:
    """Shared CTE chain (ends in ``kept``) for the MinHash oracles."""
    rows_per_band = num_hashes // bands
    consts = affine_constants(num_hashes, MINHASH_SALT)
    min_matches = _min_matches(threshold, num_hashes)

    gh = gram_hash_sql(text_col, "i", k)
    min_exprs = ",\n           ".join(
        f"MIN((h * {a} + {b}) % {M31}) AS m{s}" for s, (a, b) in enumerate(consts)
    )

    def bucket_expr(b: int) -> str:
        acc = "CAST(0 AS BIGINT)"
        for j in range(rows_per_band):
            acc = f"(({acc} * {KNUTH_A} + m{b * rows_per_band + j}) % {M31})"
        return acc

    banded = "\n        UNION ALL ".join(
        f"SELECT did, {b} AS band, {bucket_expr(b)} AS bucket FROM sig"
        for b in range(bands)
    )
    match_sum = " + ".join(
        f"(CASE WHEN sa.m{s} = sb.m{s} THEN 1 ELSE 0 END)" for s in range(num_hashes)
    )
    return f"""g AS (
        SELECT {id_col} AS did,
               unnest(list_transform(range(0, length({text_col}) - {k - 1}),
                                     i -> {gh})) AS h
        FROM {table}
        WHERE length({text_col}) >= {k}
    ),
    sig AS (
        SELECT did,
           {min_exprs},
           list_distinct(list(h)) AS gset
        FROM g GROUP BY did
    ),
    banded AS (
        {banded}
    ),
    cand AS (
        SELECT DISTINCT a.did AS id_a, b.did AS id_b
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.bucket = b.bucket AND a.did < b.did
    ),
    kept AS (
        SELECT cand.id_a, cand.id_b,
               sa.gset AS gs_a, sb.gset AS gs_b
        FROM cand
        JOIN sig sa ON sa.did = cand.id_a
        JOIN sig sb ON sb.did = cand.id_b
        WHERE {match_sum} >= {min_matches}
    ),
    jpairs AS (
        SELECT id_a, id_b, jaccard FROM (
            SELECT id_a, id_b,
                   CAST(len(list_intersect(gs_a, gs_b)) AS DOUBLE)
                       / greatest(len(list_distinct(list_concat(gs_a, gs_b))), 1)
                       AS jaccard
            FROM kept
        ) WHERE jaccard >= {threshold}
    )"""


def minhash_lsh_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = DEFAULT_SHINGLE_K,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    threshold: float = 0.7,
) -> str:
    """DuckDB SQL reproducing ``minhash_lsh_pairs`` bit-for-bit: same
    gram hashes, same affine permutations, same Horner band buckets,
    same integer prefilter cutoff, same exact-Jaccard verification over
    the same distinct gram-hash sets. Generated (not handwritten) so the
    constants can never drift from the Spark plan."""
    ctes = _minhash_oracle_ctes(
        table, id_col, text_col, k, num_hashes, bands, threshold
    )
    return f"""
    WITH {ctes}
    SELECT id_a, id_b, jaccard FROM jpairs
    """


def minhash_cluster_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = DEFAULT_SHINGLE_K,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    threshold: float = 0.7,
) -> str:
    """DuckDB SQL for the LSH-fed duplicate-cluster pipeline: the exact
    ``minhash_lsh_pairs`` edge set (CTE chain above), then a recursive
    reachability closure with min-label components and min-id survivors
    — the oracle twin of ``resolve_dup_clusters`` over LSH candidates."""
    ctes = _minhash_oracle_ctes(
        table, id_col, text_col, k, num_hashes, bands, threshold
    )
    return f"""
    WITH RECURSIVE {ctes},
    sym AS (
        SELECT id_a AS u, id_b AS v FROM jpairs
        UNION ALL
        SELECT id_b, id_a FROM jpairs
    ),
    reach(node, lbl) AS (
        SELECT {id_col}, {id_col} FROM {table}
        UNION
        SELECT s.v, r.lbl FROM reach r JOIN sym s ON s.u = r.node
    )
    SELECT node AS {id_col},
           CAST(MIN(lbl) AS BIGINT) AS cluster_id,
           MIN(lbl) = node AS is_survivor
    FROM reach
    GROUP BY node
    """


def minhash_corpus_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = DEFAULT_SHINGLE_K,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    threshold: float = 0.7,
) -> str:
    """DuckDB SQL for the deduplicated-corpus manifest: one row per
    SURVIVING document (min-id of its near-dup cluster) with the number
    of corpus rows it absorbs — the end product of the dedup family."""
    ctes = _minhash_oracle_ctes(
        table, id_col, text_col, k, num_hashes, bands, threshold
    )
    return f"""
    WITH RECURSIVE {ctes},
    sym AS (
        SELECT id_a AS u, id_b AS v FROM jpairs
        UNION ALL
        SELECT id_b, id_a FROM jpairs
    ),
    reach(node, lbl) AS (
        SELECT {id_col}, {id_col} FROM {table}
        UNION
        SELECT s.v, r.lbl FROM reach r JOIN sym s ON s.u = r.node
    ),
    cl AS (SELECT node, MIN(lbl) AS cluster_id FROM reach GROUP BY node)
    SELECT CAST(cluster_id AS BIGINT) AS {id_col},
           COUNT(*) AS n_members
    FROM cl GROUP BY cluster_id
    """


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


def _simhash_bit_sql(i: int) -> str:
    """Portable per-bit predicate as SQL text: bit i of the token's
    md5-derived 64 bits, taken as two 32-bit words (hex chars 1-8 and
    9-16). ``(w div 2^s) % 2`` is shift-and-mask spelled in arithmetic
    both engines share (words are non-negative). This is the textbook
    SimHash bit source (Charikar 2002; Manku et al. 2007 use the
    fingerprint's own bits) — r2's per-bit affine transforms cost 64
    multiply+mod per token and tripled plan-build time for no recall
    benefit."""
    return f"(w{i // 32} div {1 << (i % 32)}) % 2 = 1"


def _md5_word_col(m: Column, lo: int) -> Column:
    """Column twin of ``hashing.md5_word_sql``: hex chars [lo, lo+8) of
    an md5 hex string as a 32-bit word in a long (Catalyst subexpression
    elimination computes the md5 once across both words)."""
    out = F.lit(0).cast("long")
    for j in range(8):
        a = F.ascii(F.substring(m, F.lit(lo + j), F.lit(1)))
        out = out * 16 + (a - F.when(a >= 97, F.lit(87)).otherwise(F.lit(48)))
    return out


def simhash64(toks: Column) -> Column:
    """64-bit SimHash over a token array: bit i of the signature is the
    sign of Σ_tokens (±1 per bit i of the token's md5-derived 64 bits).

    Convenience single-expression form (one projection, no shuffle) for
    short token arrays; ``simhash_signatures`` is the scale path and
    computes the identical value."""
    words = F.transform(
        toks,
        lambda t: F.struct(
            _md5_word_col(F.md5(t), 1).alias("w0"),
            _md5_word_col(F.md5(t), 9).alias("w1"),
        ),
    )
    def _bit_acc(w: str, s: int):
        return lambda acc, st: acc + F.when(
            F.shiftright(st[w], s).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    sig = F.lit(0).cast("long")
    for i in range(64):
        bit_sum = F.aggregate(words, F.lit(0), _bit_acc(f"w{i // 32}", i % 32))
        bit = F.when(bit_sum > 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        sig = sig.bitwiseOR(F.shiftleft(bit, i))
    return sig


def simhash_signatures(df: DataFrame, id_col: str, toks_col: Column) -> DataFrame:
    """SimHash via explode + groupBy — the scale path for long documents.

    One shuffle keyed on the doc id; 64 conditional-sum aggregates run
    map-side (partial aggregation), so the shuffle carries 64 longs per
    doc, not the tokens. Token-less docs get signature 0 via the left
    join back.

    The per-token cost is one md5 + two 8-hex-char word parses + 64
    shift-and-mask tests (r2 ran 64 affine multiply+mods instead —
    measured 1.9× slower end-to-end). The whole pipeline below is built
    from SQL text via ``F.expr``/``selectExpr``: the r2 Column-by-Column
    construction made ~10⁴ Py4J round-trips and cost ~1.5 s of
    driver-side plan build per run at any data size — pure fixed
    overhead a 100 TB plan pays identically."""
    ids = df.select(_c(id_col).alias("did"))
    from hours_api_clickup_spark.functions.hashing import md5_word_sql

    tok = (
        spread(df)
        .select(_c(id_col).alias("did"), F.explode(toks_col).alias("tok"))
        .withColumn("m", F.md5("tok"))
        .selectExpr(
            "did",
            f"{md5_word_sql('m', 1)} AS w0",
            f"{md5_word_sql('m', 9)} AS w1",
        )
    )
    # (Measured: pre-folding duplicate tokens into (did, h) counts and
    # weighting the bit sums by the count is algebraically identical but
    # benched SLOWER here — the extra shuffle outweighs the saved hash
    # evaluations unless the corpus has a heavy Zipfian dup factor.)
    aggs = [
        F.expr(f"sum(CASE WHEN {_simhash_bit_sql(i)} THEN 1 ELSE -1 END)").alias(
            f"b{i}"
        )
        for i in range(64)
    ]
    sums = tok.groupBy("did").agg(*aggs)
    sig_sql = " | ".join(
        f"shiftleft(CASE WHEN b{i} > 0 THEN 1L ELSE 0L END, {i})"
        for i in range(64)
    )
    signed = sums.selectExpr("did", f"({sig_sql}) AS sig")
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
    # Deliberately NOT pinned: the self-join's build side is broadcast
    # (computed once), so a localCheckpoint of the signatures saves only
    # the probe side's recompute — measured at ≤5% of the query (the
    # signature aggregation is cheap next to the join) — while pinning
    # executor storage per call. The historic 8× run-to-run spread on
    # this row is cold-start + host windows, not plan instability
    # (steady-state re-measured at ~1.7s, identical with and without
    # the pin).
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


def simhash_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> str:
    """DuckDB SQL reproducing ``simhash_pairs`` over whitespace tokens
    (``textstats.tokens`` semantics) bit-for-bit.

    DuckDB never materializes the 64-bit signature (1<<63 would overflow
    BIGINT): it works on the 64 individual sign bits — the 16-bit chunk
    values for blocking and a 64-term inequality sum for the hamming
    distance are algebraically identical to Spark's shift/bit_count form.
    Token-less docs contribute all-zero bits (the COALESCE), matching
    Spark's left-join signature 0. Bit i comes from the token's own
    md5-derived 64 bits (two parsed 32-bit words) — same definition as
    ``_simhash_bit_sql``; ``// 2^s % 2`` here ≡ ``div 2^s % 2`` there on
    the non-negative words."""
    from hours_api_clickup_spark.functions.hashing import md5_word_sql

    w0, w1 = md5_word_sql("m", 1), md5_word_sql("m", 9)
    bit_sums = ",\n           ".join(
        f"SUM(CASE WHEN (w{i // 32} // {1 << (i % 32)}) % 2 = 1"
        f" THEN 1 ELSE -1 END) AS s{i}"
        for i in range(64)
    )
    sig_bits = ",\n           ".join(
        f"CASE WHEN COALESCE(s{i}, 0) > 0 THEN 1 ELSE 0 END AS t{i}"
        for i in range(64)
    )
    chunk_rows = "\n        UNION ALL ".join(
        "SELECT did, {ci} AS ci, ({cv}) AS cv FROM sb".format(
            ci=c,
            cv=" + ".join(f"t{c * 16 + j} * {1 << j}" for j in range(16)),
        )
        for c in range(4)
    )
    ham = " + ".join(
        f"(CASE WHEN sa.t{i} <> sbb.t{i} THEN 1 ELSE 0 END)" for i in range(64)
    )
    return f"""
    WITH ids AS (SELECT {id_col} AS did FROM {table}),
    tok AS (
        SELECT {id_col} AS did,
               unnest(CASE WHEN length(trim({text_col})) > 0
                           THEN regexp_split_to_array(trim({text_col}), '[ \\t\\n\\x0B\\f\\r]+')
                           ELSE [] END) AS t
        FROM {table}
    ),
    th AS (
        SELECT did, {w0} AS w0, {w1} AS w1
        FROM (SELECT did, md5(t) AS m FROM tok)
    ),
    bsum AS (
        SELECT did,
           {bit_sums}
        FROM th GROUP BY did
    ),
    sb AS (
        SELECT ids.did,
           {sig_bits}
        FROM ids LEFT JOIN bsum ON bsum.did = ids.did
    ),
    ch AS (
        {chunk_rows}
    ),
    cand AS (
        SELECT DISTINCT a.did AS id_a, b.did AS id_b
        FROM ch a JOIN ch b
          ON a.ci = b.ci AND a.cv = b.cv AND a.did < b.did
    )
    SELECT id_a, id_b, hamming FROM (
        SELECT cand.id_a, cand.id_b, CAST({ham} AS INT) AS hamming
        FROM cand
        JOIN sb sa ON sa.did = cand.id_a
        JOIN sb sbb ON sbb.did = cand.id_b
    ) WHERE hamming <= {max_hamming}
    """


# ---------------------------------------------------------------------------
# Duplicated-span detection (exact substring dedup at token granularity)
# ---------------------------------------------------------------------------


def duplicated_spans(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    min_count: int = 2,
) -> DataFrame:
    """Maximal duplicated token spans — the token-granular form of the
    suffix-array substring dedup of Lee et al., "Deduplicating Training
    Data Makes Language Models Better" (ACL 2022): any ``k``-token
    window whose exact text occurs ≥ ``min_count`` times anywhere in
    the corpus (other documents OR elsewhere in the same document) is a
    duplicated gram; runs of overlapping/adjacent duplicated grams merge
    into one maximal span per document. Downstream curation cuts the
    spans (or drops docs whose spans cover too much — compose with
    ``repetition_stats``).

    Output: one row per (doc, maximal span): ``start_tok``/``end_tok``
    (1-based inclusive token positions), ``n_dup_grams``, ``span_len``.

    Scale shape (instead of the paper's monolithic suffix array, which
    has no distributed form): one explode of k-gram positions, the gram
    text immediately folded to an int64 md5 hash so the corpus-wide
    shuffle carries (did, i, gh) rows only — never gram strings; one
    count aggregation on gh (map-side combining); a semi-join back
    (AQE may broadcast the duplicated-gram set when small); span
    assembly is the sessionize trick (lag → flag → running sum) — both
    windows and the final agg share ONE hash shuffle on the doc id.
    Positions within a doc are unique, so every window order is total —
    deterministic. Pure codegen + md5; DuckDB replays it bit-for-bit
    (``duplicated_spans_oracle_sql``).
    """
    from pyspark.sql import Window

    from hours_api_clickup_spark.datapipe.textstats import tokens

    did = _c(id_col).alias("did")
    grams = (
        spread(df)
        .select(did, tokens(text_col).alias("tk"))
        .filter(F.size("tk") >= k)
        .select(
            "did",
            F.explode(F.sequence(F.lit(1), F.size("tk") - (k - 1))).alias("i"),
            "tk",
        )
        .select(
            "did",
            "i",
            md5_hash32(
                F.concat_ws(
                    " ", *[F.element_at("tk", F.col("i") + j) for j in range(k)]
                )
            ).alias("gh"),
        )
        # materialize once: BOTH the dup-count aggregation and the
        # semi-join probe read this frame — without the checkpoint the
        # corpus is re-scanned, re-tokenized and re-hashed a second
        # time, doubling the operator's dominant cost (review r8; same
        # reason minhash_lsh_pairs checkpoints sig)
        .localCheckpoint()
    )
    dup = (
        grams.groupBy("gh")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") >= min_count)
        .select("gh")
    )
    hits = grams.join(dup, "gh", "left_semi")
    w = Window.partitionBy("did").orderBy("i")
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # grams at positions p and i (p < i) overlap or touch iff i - p <= k
    new_span = F.when(F.col("i") - F.lag("i").over(w) <= k, 0).otherwise(1)
    spans = hits.withColumn(
        "span_id", F.sum(new_span).over(w_run) - F.lit(1)
    )
    return (
        spans.groupBy(F.col("did").alias(id_col), "span_id")
        .agg(
            F.min("i").cast("long").alias("start_tok"),
            (F.max("i") + F.lit(k - 1)).cast("long").alias("end_tok"),
            F.count("*").alias("n_dup_grams"),
        )
        .withColumn(
            "span_len", F.col("end_tok") - F.col("start_tok") + F.lit(1)
        )
    )


def duplicated_spans_oracle_sql(
    table: str, id_col: str, text_col: str, k: int = 5, min_count: int = 2
) -> str:
    """DuckDB twin of ``duplicated_spans``: same tokenization class,
    same md5-int32 gram hash, same merge rule, same window algebra."""
    gh = md5_hash32_sql(f"md5(array_to_string(t[i:i + {k - 1}], ' '))")
    return f"""
    WITH d AS (
        SELECT {id_col} AS did,
               CASE WHEN length(trim({text_col})) > 0
                    THEN string_split_regex(trim({text_col}), '[ \\t\\n\\x0B\\f\\r]+')
                    ELSE [] END AS t
        FROM {table}
    ),
    g AS (
        SELECT did, i, {gh} AS gh
        FROM (SELECT did, unnest(range(1, len(t) - {k - 2})) AS i, t
              FROM d WHERE len(t) >= {k})
    ),
    dup AS (SELECT gh FROM g GROUP BY gh HAVING COUNT(*) >= {min_count}),
    h AS (SELECT g.did, g.i FROM g JOIN dup USING (gh)),
    s AS (
        SELECT did, i,
               CASE WHEN i - lag(i) OVER (PARTITION BY did ORDER BY i) <= {k}
                    THEN 0 ELSE 1 END AS ns
        FROM h
    ),
    sp AS (
        SELECT did, i,
               CAST(SUM(ns) OVER (PARTITION BY did ORDER BY i
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) - 1
                   AS span_id
        FROM s
    )
    SELECT did AS {id_col}, span_id,
           CAST(MIN(i) AS BIGINT) AS start_tok,
           CAST(MAX(i) + {k - 1} AS BIGINT) AS end_tok,
           COUNT(*) AS n_dup_grams,
           CAST(MAX(i) + {k - 1} - MIN(i) + 1 AS BIGINT) AS span_len
    FROM sp GROUP BY did, span_id
    """


# ---------------------------------------------------------------------------
# Persisted document near-dup index: incremental MinHash+LSH at ingest.
# The one-shot `minhash_lsh_pairs` re-shingles the whole corpus per run;
# at 100 TB the corpus is signed ONCE and each arriving batch is checked
# against (and folded into) the persisted signatures — the document-side
# twin of the LSM vector index (`lsh_index_append`).
# ---------------------------------------------------------------------------


_REBUILD_MARKER = "__rebuild_commit"


def _doc_index_recover(spark, path: str) -> None:
    """Joint crash recovery for the sig+bands tier PAIR — every doc-index
    entry point calls this before touching either tier (ADVICE r8).

    First the per-tier mid-swap rollback (``_fs_recover_swap``), then:
    if a rebuild's commit marker survives, roll the rebuild FORWARD.
    The marker is created only after BOTH staged tiers are completely
    written, so finishing whichever swaps remain (idempotent, same
    bands-then-sig order as the write) can never publish a partial
    tier — and the mixed-generation window the two sequential swaps
    used to leave (new bands, old sig: a crash there made a
    doc-removing rebuild violate "did in sig ⇒ complete index entry")
    is closed: readers now see either the old generation or the new,
    never a mix. A staged dir WITHOUT the marker is an abandoned write
    (crash before commit) — left alone; the next rebuild/compact
    overwrites it.

    Recovery is itself MAINTENANCE and runs under the maintenance
    lease (ADVICE r9 high, the ivfpq twin): the commit marker exists
    during every LIVE rebuild's commit window, not only after a crash,
    so an unleased append/probe rolling it forward would interleave
    destructive renames with the live holder's own commit sequence. A
    thread already holding the lease recovers directly; otherwise,
    when recovery work is actually pending, claim the lease
    non-blocking and SKIP on refusal."""
    from hours_api_clickup_spark.datapipe.similarity import (
        MaintenanceLeaseHeld,
        _fs_exists,
        _lease_held_by_this_thread,
        _maintenance_lease,
        _recovery_gen,
        _recovery_mark_clean,
        _recovery_verdict_cached,
    )

    if _lease_held_by_this_thread(path):
        _doc_index_recover_unlocked(spark, path)
        return
    if _recovery_verdict_cached(spark, path):
        return  # proven clean this session, no lease claim since
    gen = _recovery_gen(path)  # snapshot BEFORE the probes (TOCTOU)
    if not (
        _fs_exists(spark, f"{path}/sig__old")
        or _fs_exists(spark, f"{path}/bands__old")
        or _fs_exists(spark, f"{path}/{_REBUILD_MARKER}")
    ):
        # clean: cache the verdict so the session's next probe skips
        # the three exists() rounds (VERDICT r10 #3); any lease claim
        # on this path invalidates it — including one that landed
        # DURING the probes (the gen snapshot refuses the stale mark)
        _recovery_mark_clean(spark, path, gen)
        return
    # the full leased section (not a bare claim): heartbeat + token-
    # fenced release, same as the ivfpq twin (review r10)
    try:
        with _maintenance_lease(spark, path, "doc_index_recover"):
            _doc_index_recover_unlocked(spark, path)
    except MaintenanceLeaseHeld:
        return  # a live maintainer owns this path's commit/recovery


def _read_doc_tier(spark, path: str, tier: str) -> DataFrame:
    """Doc-index live-tier read with the cached-recovery fallback —
    ``similarity._read_tier_with_recovery`` bound to this family's
    joint recovery (rationale there, review r11)."""
    from hours_api_clickup_spark.datapipe.similarity import (
        _read_tier_with_recovery,
    )

    return _read_tier_with_recovery(spark, path, tier, _doc_index_recover)


def _doc_index_recover_unlocked(spark, path: str) -> None:
    """``_doc_index_recover`` body for the thread that owns maintenance
    on ``path`` (holds the lease, or just claimed it for recovery)."""
    from hours_api_clickup_spark.datapipe.similarity import (
        _fs_delete,
        _fs_exists,
        _fs_recover_swap,
        _fs_swap_dir,
    )

    _fs_recover_swap(spark, f"{path}/sig")
    _fs_recover_swap(spark, f"{path}/bands")
    if not _fs_exists(spark, f"{path}/{_REBUILD_MARKER}"):
        return
    for tier in ("bands", "sig"):
        staged = f"{path}/{tier}__staged"
        if _fs_exists(spark, staged):
            _fs_swap_dir(spark, f"{path}/{tier}", staged)
    _fs_delete(spark, f"{path}/{_REBUILD_MARKER}")


def doc_neardup_index_write(
    df: DataFrame,
    id_col: str,
    text_col: str,
    path: str,
    k: int = DEFAULT_SHINGLE_K,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
) -> None:
    """Materialize the corpus signatures: ``{path}/sig`` holds
    (did, sa minhash-array, gset gram-hash set) — everything candidate
    prefilter + exact-Jaccard verification need, so the TEXT column is
    never read again; ``{path}/bands`` holds the narrow
    (did, band, bucket) rows the candidate join scans, sorted by
    (band, bucket) for row-group pruning. One signing pass total.

    A rebuild is maintenance: it runs under the single-maintainer
    LEASE (a rebuild racing a compact or the streaming ingest refuses
    loudly instead of silently discarding in-flight batches). Unlike
    the ANN families there is no stale-tier refusal — this family's
    tombstones are did-keyed takedown markers that DELIBERATELY
    survive rebuilds (takedown-wins until a compact consumes them; a
    post-compact re-ingest is the intentional resurrect path)."""
    from hours_api_clickup_spark.datapipe.similarity import (
        _maintenance_lease,
    )

    with _maintenance_lease(
        df.sparkSession, path, "doc_neardup_index_write"
    ):
        _doc_neardup_index_write_unlocked(
            df, id_col, text_col, path, k, num_hashes, bands
        )


def _doc_neardup_index_write_unlocked(
    df: DataFrame,
    id_col: str,
    text_col: str,
    path: str,
    k: int = DEFAULT_SHINGLE_K,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
) -> None:
    """``doc_neardup_index_write`` body for callers already inside a
    leased maintenance section (the streaming ingest's bootstrap)."""
    from hours_api_clickup_spark.datapipe.similarity import (
        _fs_delete,
        _fs_swap_dir,
        _fs_touch,
    )

    spark = df.sparkSession
    _doc_index_recover(spark, path)
    sig = _sig_frame(df, id_col, text_col, k, num_hashes).localCheckpoint()
    # staged + swapped, BANDS COMMITTED BEFORE SIG (review r8): the old
    # in-place overwrite destroyed the live index at job start (a
    # mid-rebuild crash left markers pointing at nothing), and writing
    # sig first inverted the module's commit ordering — "did present in
    # sig" must imply a COMPLETE index entry (the streaming bootstrap
    # probes sig existence, and append/pairs_for_ids read bands), so a
    # crash between the writes wedged the ingest stream permanently.
    # The commit marker (ADVICE r8) makes the two swaps ONE transaction:
    # created only after both staged tiers are complete, deleted after
    # both swaps — a crash between the swaps used to leave mixed
    # generations (new bands, old sig); now _doc_index_recover rolls the
    # rebuild forward from the marker.
    sig_staged, bands_staged = f"{path}/sig__staged", f"{path}/bands__staged"
    sig.select(
        "did",
        F.array(*[F.col(f"m{s}") for s in range(num_hashes)]).alias("sa"),
        "gset",
    ).repartitionByRange(8, "did").sortWithinPartitions("did").write.mode(
        "overwrite"
    ).parquet(sig_staged)
    _band_frame(sig, num_hashes, bands).sortWithinPartitions(
        "band", "bucket"
    ).write.mode("overwrite").parquet(bands_staged)
    _fs_touch(spark, f"{path}/{_REBUILD_MARKER}")
    _fs_swap_dir(spark, f"{path}/bands", bands_staged)
    _fs_swap_dir(spark, f"{path}/sig", sig_staged)
    _fs_delete(spark, f"{path}/{_REBUILD_MARKER}")


def doc_neardup_index_append(
    batch: DataFrame,
    path: str,
    id_col: str,
    text_col: str,
    k: int = DEFAULT_SHINGLE_K,
    num_hashes: int = DEFAULT_NUM_HASHES,
    bands: int = DEFAULT_BANDS,
    threshold: float = 0.7,
) -> DataFrame:
    """Fold a batch of NEW documents into the persisted index and
    return every near-dup pair the batch introduces — (batch × corpus)
    and (batch × batch), exact-Jaccard verified, (id_a < id_b)
    normalized. Corpus × corpus pairs are unchanged by construction, so
    incremental-append pair sets sum to exactly the one-shot
    ``minhash_lsh_pairs`` of the union (property-tested).

    Scale shape: only the BATCH is shingled (O(batch) text read); its
    band rows are BROADCAST against the persisted bands scan, so the
    corpus side never shuffles — and the corpus bytes touched are the
    narrow (did, band, bucket) rows plus sig/gset rows of candidate
    dids only (semi-join pruned), never the corpus text. Precondition:
    batch ids are new (the standard ingest contract; re-ingest goes
    through a rebuild, as with the vector-index compaction cadence).
    """
    spark = batch.sparkSession
    # roll back a crashed compact's half-finished swap — and roll a
    # crashed rebuild's joint publish forward — before reading (the
    # _fs_swap_dir contract: every reader/writer entry point recovers
    # first — review r7, ADVICE r8)
    _doc_index_recover(spark, path)
    min_matches = _min_matches(threshold, num_hashes)

    bsig = _sig_frame(batch, id_col, text_col, k, num_hashes).localCheckpoint()
    # bband / bsig_arr are cheap projections OF the bsig checkpoint —
    # re-deriving them per consumer re-reads the checkpointed RDD, never
    # the signer or the (growing) index files, so their own eager
    # checkpoints bought nothing but two synchronous jobs per append
    # (r13; the bench row is ~12 sequential job barriers at sf0.1).
    bband = _band_frame(bsig, num_hashes, bands)
    bsig_arr = bsig.select(
        "did",
        F.array(*[F.col(f"m{s}") for s in range(num_hashes)]).alias("sa"),
        "gset",
    )

    old_bands = _read_doc_tier(spark, path, "bands")
    tomb = _doc_tombstones(spark, path)
    if tomb is not None:
        # tombstoned documents stop producing candidates — the delete
        # path's read-side contract (their band rows are still on disk
        # until doc_neardup_index_compact folds them out)
        old_bands = old_bands.join(F.broadcast(tomb), "did", "left_anti")
    # batch bands broadcast → the corpus bands scan stays map-side
    cross = (
        old_bands.join(
            F.broadcast(bband.select(
                F.col("did").alias("bdid"), "band", "bucket"
            )),
            ["band", "bucket"],
        )
        .select(
            F.least(F.col("did"), F.col("bdid")).alias("id_a"),
            F.greatest(F.col("did"), F.col("bdid")).alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    a = bband.alias("a")
    b = bband.alias("b")
    self_pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.did") < F.col("b.did")),
        )
        .select(F.col("a.did").alias("id_a"), F.col("b.did").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    cand = cross.unionByName(self_pairs).dropDuplicates(["id_a", "id_b"])

    verified = _verify_candidate_pairs(
        spark, path, cand, bsig_arr, min_matches, threshold
    )
    # Append order is load-bearing for crash recovery (review r6):
    # bands FIRST, sig LAST, so "did present in {path}/sig" implies its
    # append completed — the redelivery guard in
    # streaming/ann_ingest.py keys on sig dids. A crash between the two
    # leaves orphan band rows, which are harmless: bands feed candidate
    # generation only, and candidates are dropDuplicates-ed.
    bband.sortWithinPartitions("band", "bucket").write.mode("append").parquet(
        f"{path}/bands"
    )
    bsig_arr.write.mode("append").parquet(f"{path}/sig")
    return verified


def _verify_candidate_pairs(
    spark,
    path: str,
    cand: DataFrame,
    extra: DataFrame | None,
    min_matches: int,
    threshold: float,
) -> DataFrame:
    """Two-stage verification of candidate (id_a, id_b) pairs against
    the persisted signature index, same structure as the one-shot form —
    bucket collisions on repetitive corpora yield tens of thousands of
    candidates for a 10% batch, and fetching their gram sets directly
    would stream the index's heavy bytes. Stage 1 joins only the narrow
    ``sa`` arrays (column-pruned sig scan, 64 longs/row) and applies the
    integer match-count prefilter; stage 2 fetches gram sets for the
    surviving pairs ONLY, via a bounded IN pushdown onto the did-sorted
    sig files (row-group pruned). ``extra`` carries (did, sa, gset)
    rows not yet in the index (an arriving batch); None when every
    candidate id is already indexed. Returns the verified pairs,
    localCheckpointed (so the caller may grow the index files without
    the plan re-reading them)."""
    old_sig = _read_doc_tier(spark, path, "sig")
    all_sa = old_sig.select("did", "sa")
    if extra is not None:
        all_sa = all_sa.unionByName(extra.select("did", "sa"))
    matches = F.aggregate(
        F.zip_with(
            F.col("sa_a"), F.col("sa_b"),
            lambda x, y: F.when(x == y, 1).otherwise(0),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    survivors = (
        cand.join(
            all_sa.select(F.col("did").alias("id_a"), F.col("sa").alias("sa_a")),
            "id_a",
        )
        .join(
            all_sa.select(F.col("did").alias("id_b"), F.col("sa").alias("sa_b")),
            "id_b",
        )
        .filter(matches >= F.lit(min_matches))
        .select("id_a", "id_b")
        .localCheckpoint()
    )
    # Gram fetch for surviving ids only. Normal corpora: the survivor-id
    # set is small (batch size x near-dup rate), so an IN list pushed
    # into the did-sorted sig files skips whole row groups of heavy gset
    # bytes. The driver materialization is bounded BEFORE collecting
    # (count first, cap 200k); an adversarial all-duplicates corpus
    # falls back to a distributed semi-join — same semantics, no
    # candidate-dependent collect on any path (VERDICT r3 #4).
    surv_id_df = (
        survivors.select(F.explode(F.array("id_a", "id_b")).alias("did"))
        .dropDuplicates()
    )
    gsets = _read_doc_tier(spark, path, "sig").select("did", "gset")
    # one bounded collect instead of count-then-collect (two jobs →
    # one, r13): limit(cap+1) returns every row when under the cap, and
    # the overflow fallback recomputes the id set from the survivors
    # checkpoint (the rare adversarial all-duplicates path)
    surv_head = surv_id_df.limit(200_001).collect()
    if len(surv_head) <= 200_000:
        surv_ids = [r[0] for r in surv_head]
        gsets = gsets.filter(F.col("did").isin(surv_ids))
    else:
        gsets = gsets.join(surv_id_df, "did", "semi")
    if extra is not None:
        gsets = gsets.unionByName(extra.select("did", "gset"))
    return (
        survivors.join(
            gsets.select(F.col("did").alias("id_a"), F.col("gset").alias("gs_a")),
            "id_a",
        )
        .join(
            gsets.select(F.col("did").alias("id_b"), F.col("gset").alias("gs_b")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            jaccard_sim(F.col("gs_a"), F.col("gs_b")).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
        .localCheckpoint()  # pin before the index files grow
    )


def doc_neardup_index_pairs_for_ids(
    spark,
    path: str,
    ids: DataFrame,
    num_hashes: int = DEFAULT_NUM_HASHES,
    threshold: float = 0.7,
) -> DataFrame:
    """Every verified near-dup pair touching the given ALREADY-INDEXED
    ids, recomputed from the index alone (no document text needed):
    their band rows broadcast against the bands scan for candidates,
    then the shared two-stage verification. This is the recovery path
    for a crashed streaming ingest attempt — the batch's index append
    completed (its dids are in ``{path}/sig``) but the pairs write did
    not (review r6); see streaming/ann_ingest.py."""
    # roll back a crashed compact's swap / forward a crashed rebuild's
    # joint publish first (review r7, ADVICE r8)
    _doc_index_recover(spark, path)
    min_matches = _min_matches(threshold, num_hashes)
    bands = _read_doc_tier(spark, path, "bands")
    tomb = _doc_tombstones(spark, path)
    if tomb is not None:
        bands = bands.join(F.broadcast(tomb), "did", "left_anti")
    mine = bands.join(
        F.broadcast(ids.select(F.col(ids.columns[0]).alias("did"))), "did"
    ).select(F.col("did").alias("bdid"), "band", "bucket")
    cand = (
        bands.join(F.broadcast(mine), ["band", "bucket"])
        .filter(F.col("did") != F.col("bdid"))
        .select(
            F.least(F.col("did"), F.col("bdid")).alias("id_a"),
            F.greatest(F.col("did"), F.col("bdid")).alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    return _verify_candidate_pairs(
        spark, path, cand, None, min_matches, threshold
    )


def _doc_tombstones(spark, path: str):
    """(did) rows tombstoned out of this index, or None when the marker
    dir is absent (the fast path — zero extra work for indexes that
    never saw a delete)."""
    from hours_api_clickup_spark.datapipe.similarity import _fs_exists

    tomb_path = f"{path}/tombstones"
    if not _fs_exists(spark, tomb_path):
        return None
    return spark.read.parquet(tomb_path).select("did").dropDuplicates()


def doc_neardup_index_delete(spark, path: str, doc_ids) -> None:
    """Tombstone delete for the document near-dup signature index — the
    takedown path (a removed/retracted document must stop producing
    candidates and pairs): one tiny (did) marker batch appended under
    ``{path}/tombstones``; NO sig or bands file is read or rewritten.
    Every read path (``doc_neardup_index_append`` candidate generation,
    ``doc_neardup_index_pairs_for_ids``) applies the broadcast
    anti-filter; ``doc_neardup_index_compact`` folds the deletes in
    physically and drops the marker dir. Completes the delete story
    across all five persisted index families (LSH / IVF / IVFPQ /
    inverted text / near-dup signatures).

    Unlike the seq-versioned vector/text tombstones, sig rows carry no
    version: re-ingest of a deleted id goes through a rebuild — the
    index's standing re-ingest contract (``doc_neardup_index_append``
    precondition) — so markers are plain did keys, no LSM resurrection
    semantics. ``doc_ids`` is a list/iterable or a DataFrame of ids
    (distributed marker write, no driver collect)."""
    from hours_api_clickup_spark.datapipe.similarity import _write_tombstones

    if not isinstance(doc_ids, DataFrame):
        doc_ids = list(doc_ids)
        if not doc_ids:
            return
    _write_tombstones(spark, f"{path}/tombstones", "did", doc_ids, 0)


def doc_neardup_index_compact(spark, path: str) -> None:
    """Fold tombstones physically: rewrite ``sig`` and ``bands`` minus
    the tombstoned dids — staged + swapped like every compactor here
    (an in-place overwrite deletes the live dir at job start, so a
    mid-compact crash would destroy the index) — then drop exactly the
    marker FILES the rewrite consumed: a delete landing while the
    O(corpus) rewrite runs appends a new marker file the end-of-compact
    drop must not erase (review r7), so the drop is bounded to the
    snapshot listing and the dir survives if new markers arrived.
    O(corpus), run on the compaction cadence. No tombstones (or an
    index that was never written): no-op. After a compact, re-ingesting
    a previously deleted id resurrects it — BEFORE a compact, markers
    persist across rebuilds, so a takedown survives index maintenance.

    Maintenance contract (shared with every index compactor here):
    single writer — lease-enforced (VERDICT r8 #2): a compact racing an
    ingest batch that crashed between its sig write and its done-marker
    could fold the batch's dids out of sig and make the redelivery
    guard re-classify them as fresh; the lease turns that race into a
    loud ``MaintenanceLeaseHeld``."""
    from hours_api_clickup_spark.datapipe.similarity import (
        _fs_drop_consumed,
        _fs_exists,
        _fs_snapshot_files,
        _fs_swap_dir,
        _maintenance_lease,
    )

    with _maintenance_lease(spark, path, "doc_neardup_index_compact"):
        _doc_index_recover(spark, path)
        if not _fs_exists(spark, f"{path}/sig"):
            return  # delete-before-build: markers stay until an index exists
        if not _fs_exists(spark, f"{path}/tombstones"):
            return
        # snapshot the marker FILES first and fold EXACTLY those: a
        # marker landing after this listing is neither folded nor
        # deleted — it simply survives into the next compact
        fs, tomb_dir, consumed = _fs_snapshot_files(
            spark, f"{path}/tombstones"
        )
        if not consumed:
            return
        tomb = (
            spark.read.parquet(*[str(p) for p in consumed])
            .select("did")
            .dropDuplicates()
            .localCheckpoint(eager=True)  # read once, reused twice
        )
        live_sig = _read_doc_tier(spark, path, "sig").join(
            F.broadcast(tomb), "did", "left_anti"
        )
        staged = f"{path}/sig__staged"
        live_sig.repartitionByRange(8, "did").sortWithinPartitions(
            "did"
        ).write.mode("overwrite").parquet(staged)
        _fs_swap_dir(spark, f"{path}/sig", staged)
        live_bands = _read_doc_tier(spark, path, "bands").join(
            F.broadcast(tomb), "did", "left_anti"
        )
        staged = f"{path}/bands__staged"
        live_bands.sortWithinPartitions("band", "bucket").write.mode(
            "overwrite"
        ).parquet(staged)
        _fs_swap_dir(spark, f"{path}/bands", staged)
        # delete exactly the consumed markers, then a NON-recursive dir
        # drop that refuses a non-empty dir — a marker committed at ANY
        # point after the snapshot survives for the next compact. The
        # list-then-recursive-delete form this replaces had a TOCTOU
        # window that erased such a marker: a lost takedown (ADVICE r7).
        _fs_drop_consumed(fs, tomb_dir, consumed)
