"""Corpus-curation operators a training-data pipeline runs between raw
ingest and tokenization: repetition-based quality filtering (Gopher-style
ratios), benchmark n-gram decontamination, deterministic epoch shuffling
into training shards, and PII scan/redaction.

All formulas are engine-portable (plain integer/string algebra both
Spark and DuckDB evaluate identically), so every operator here carries a
full hash-match oracle in plans/registry.py — the same discipline as the
dedup/sampling families.

Scale notes per operator live on the functions; the common theme is that
nothing is all-pairs and nothing is per-row Python: repetition stats are
explode + two map-side-combining aggregations keyed by document,
decontamination is a broadcast semi-join against the (small) benchmark
gram set, epoch shuffle partitions by (epoch, shard) so window state
never concentrates, and PII scanning is a pure projection.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hours_api_clickup_spark.datapipe.dedup import spread
from hours_api_clickup_spark.datapipe.sampling import KNUTH_A, _MOD_31, _MOD_32
from hours_api_clickup_spark.datapipe.textstats import tokens

GOLDEN = 0x9E3779B9

# Gopher-style repetition thresholds (Rae et al. 2021 use top-2-gram
# char fraction 0.20 and dup-2-gram fraction 0.60 family; our corpus is
# token-based single-line text, so the analogous token-level cuts).
TOP_TOKEN_FRAC_MAX = 0.20
DUP_BIGRAM_FRAC_MAX = 0.60

# Dialect-portable PII patterns: character classes + bounded repetition
# only, identical semantics in Java regex (Spark) and RE2 (DuckDB).
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+[0-9]{1,2}-[0-9]{3}-[0-9]{4}"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


# ---------------------------------------------------------------------------
# Repetition / quality filtering
# ---------------------------------------------------------------------------


def _tagged_gram_counts(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """The shared tagged-gram count stream of ``repetition_stats`` and
    ``gopher_quality_filter`` (ONE definition — the two carried
    drift-prone copies until review r6): per document, counts of tagged
    (n, gram) pairs with n=1 unigrams, n=2 bigrams, and an n=0 sentinel.

    ONE scan, ONE exchange, ONE Generate (optimization r12): the
    previous three-branch union re-scanned and re-tokenized the corpus
    per branch — AQE's runtime stage cache could not deduplicate them
    because the branches canonicalize differently (measured: 3 scans +
    3 round-robin exchanges, 1.8× the wall of this form at sf0.1,
    identical output rows). The tagged grams are now built as one
    concatenated array per document (unigram structs + guarded bigram
    structs + the n=0 sentinel) and exploded once; at 100 TB this is
    the difference between one corpus pass and three. The sentinel
    guarantees every document survives the aggregation, so no join back
    to the corpus is ever needed to restore zero-token docs."""
    base = spread(df).select(
        _c(id_col).alias("did"), tokens(text_col).alias("tk")
    )
    uni = F.transform(
        F.col("tk"), lambda x: F.struct(F.lit(1).alias("n"), x.alias("g"))
    )
    # sequence(1, size-1) is DESCENDING for size < 2 (sequence(1,0) =
    # [1,0]) — the when-guard replaces the old branch's size>=2 filter
    bi = F.when(
        F.size("tk") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("tk") - 1),
            lambda i: F.struct(
                F.lit(2).alias("n"),
                F.concat(
                    F.element_at("tk", i),
                    F.lit(" "),
                    F.element_at("tk", i + 1),
                ).alias("g"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<n:int,g:string>>"))
    sentinel = F.array(F.struct(F.lit(0).alias("n"), F.lit("").alias("g")))
    grams = base.select(
        "did", F.explode(F.concat(uni, bi, sentinel)).alias("t")
    ).select("did", F.col("t.n").alias("n"), F.col("t.g").alias("g"))
    return grams.groupBy("did", "n", "g").agg(F.count("*").alias("c"))


def repetition_stats(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Gopher-style repetition metrics per document: the fraction of
    tokens taken by the single most frequent token, the duplicate-token
    fraction, and the duplicate-2-gram fraction, plus the keep/drop flag
    at the standard thresholds.

    Plan shape (the scale path): one scan, one explode of tagged
    (unigram|bigram) grams, then groupBy(doc, n, gram) → groupBy(doc) —
    both aggregations partial (map-side combine), both keyed by the
    document id so skew is bounded by document length, never by corpus
    size. No all-pairs stage, no Python. Mirrors the quality-filter pass
    of Gopher/MassiveText (Rae et al. 2021, §A1.1).
    """
    counts = _tagged_gram_counts(df, id_col, text_col)
    per_n = counts.groupBy("did").agg(
        F.sum(F.when(F.col("n") == 1, F.col("c"))).alias("tot1"),
        F.count(F.when(F.col("n") == 1, True)).alias("dis1"),
        F.max(F.when(F.col("n") == 1, F.col("c"))).alias("top1"),
        F.sum(F.when(F.col("n") == 2, F.col("c"))).alias("tot2"),
        F.count(F.when(F.col("n") == 2, True)).alias("dis2"),
    )
    top_frac = F.col("top1").cast("double") / F.col("tot1").cast("double")
    dup_tok = (F.col("tot1") - F.col("dis1")).cast("double") / F.col(
        "tot1"
    ).cast("double")
    dup_bi = F.when(
        F.col("tot2") > 0,
        (F.col("tot2") - F.col("dis2")).cast("double")
        / F.col("tot2").cast("double"),
    ).otherwise(F.lit(0.0))
    # Zero-token docs have null tot1 (only the sentinel row): degenerate
    # (drop) entries, no corpus join needed.
    return per_n.select(
        F.col("did").alias(id_col),
        F.coalesce("tot1", F.lit(0)).alias("n_tokens"),
        F.coalesce(top_frac, F.lit(0.0)).alias("top_token_frac"),
        F.coalesce(dup_tok, F.lit(0.0)).alias("dup_token_frac"),
        F.coalesce(dup_bi, F.lit(0.0)).alias("dup_bigram_frac"),
        F.coalesce(
            (top_frac <= TOP_TOKEN_FRAC_MAX) & (dup_bi <= DUP_BIGRAM_FRAC_MAX),
            F.lit(False),
        ).alias("keep"),
    )


def repetition_oracle_sql(table: str, id_col: str, text_col: str) -> str:
    """DuckDB twin of ``repetition_stats`` (same grams, same algebra)."""
    return f"""
    WITH d AS (
        SELECT {id_col} AS did,
               CASE WHEN length(trim({text_col})) > 0
                    THEN string_split_regex(trim({text_col}), '[ \\t\\n\\x0B\\f\\r]+')
                    ELSE [] END AS t
        FROM {table}
    ),
    grams AS (
        SELECT did, 1 AS n, unnest(t) AS g FROM d
        UNION ALL
        SELECT did, 2 AS n,
               unnest(list_transform(range(1, len(t)),
                                     i -> t[i] || ' ' || t[i + 1])) AS g
        FROM d WHERE len(t) >= 2
    ),
    counts AS (
        SELECT did, n, g, COUNT(*) AS c FROM grams GROUP BY did, n, g
    ),
    per_n AS (
        SELECT did,
               SUM(CASE WHEN n = 1 THEN c END) AS tot1,
               COUNT(CASE WHEN n = 1 THEN TRUE END) AS dis1,
               MAX(CASE WHEN n = 1 THEN c END) AS top1,
               SUM(CASE WHEN n = 2 THEN c END) AS tot2,
               COUNT(CASE WHEN n = 2 THEN TRUE END) AS dis2
        FROM counts GROUP BY did
    ),
    stats AS (
        SELECT did,
               CAST(tot1 AS BIGINT) AS n_tokens,
               CAST(top1 AS DOUBLE) / CAST(tot1 AS DOUBLE) AS top_token_frac,
               CAST(tot1 - dis1 AS DOUBLE) / CAST(tot1 AS DOUBLE)
                   AS dup_token_frac,
               CASE WHEN tot2 > 0
                    THEN CAST(tot2 - dis2 AS DOUBLE) / CAST(tot2 AS DOUBLE)
                    ELSE 0.0 END AS dup_bigram_frac
        FROM per_n
    )
    SELECT b.{id_col},
           COALESCE(s.n_tokens, 0) AS n_tokens,
           COALESCE(s.top_token_frac, 0.0) AS top_token_frac,
           COALESCE(s.dup_token_frac, 0.0) AS dup_token_frac,
           COALESCE(s.dup_bigram_frac, 0.0) AS dup_bigram_frac,
           COALESCE(s.top_token_frac <= {TOP_TOKEN_FRAC_MAX}
                    AND s.dup_bigram_frac <= {DUP_BIGRAM_FRAC_MAX},
                    FALSE) AS keep
    FROM {table} b LEFT JOIN stats s ON b.{id_col} = s.did
    """


# ---------------------------------------------------------------------------
# Benchmark n-gram decontamination
# ---------------------------------------------------------------------------


def _token_ngrams(toks: Column, n: int) -> Column:
    """Space-joined n-token grams (empty array when < n tokens)."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - (n - 1)),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def _bench_gram_set(benchmark: DataFrame, text_col: str, n: int) -> DataFrame:
    """Distinct ``n``-gram set of the benchmark side, one column ``g``."""
    return benchmark.select(
        F.explode(_token_ngrams(tokens(text_col), n)).alias("g")
    ).distinct()


def _corpus_gram_stream(
    corpus: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(``did``, ``g``) rows for the CORPUS side. Stays codegen'd
    (explode of the offset sequence + unrolled concat — ``n`` is a plan
    literal); the interpreted array-slice HOF is reserved for the small
    benchmark side. ONE implementation shared by ``decontaminate`` and
    ``decontaminate_bloom`` (deferred r8 refactor): the two passes
    promise bit-identical output, and a duplicated gram builder is
    exactly the drift pattern that hid r8's string-key split bug."""
    did = _c(id_col).alias("did")
    return (
        spread(corpus)
        .select(did, tokens(text_col).alias("tk"))
        .filter(F.size("tk") >= n)
        .select(
            "did",
            F.explode(F.sequence(F.lit(1), F.size("tk") - (n - 1))).alias("i"),
            "tk",
        )
        .select(
            "did",
            F.concat_ws(
                " ", *[F.element_at("tk", F.col("i") + j) for j in range(n)]
            ).alias("g"),
        )
    )


def _gram_hits_report(
    corpus: DataFrame, hits: DataFrame, id_col: str
) -> DataFrame:
    """One row per corpus doc: hit count + contaminated flag."""
    did = _c(id_col).alias("did")
    return (
        corpus.select(did)
        .join(hits, "did", "left")
        .select(
            F.col("did").alias(id_col),
            F.coalesce("n_hit_grams", F.lit(0)).alias("n_hit_grams"),
            (F.coalesce("n_hit_grams", F.lit(0)) > 0).alias("contaminated"),
        )
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
) -> DataFrame:
    """Flag corpus documents sharing any ``n``-token gram with a
    benchmark/eval set — the standard exact-substring decontamination
    pass (GPT-3 used 13-gram, PaLM 8-gram overlap) run before training.

    Returns one row per corpus document: ``n_hit_grams`` (gram
    occurrences found in the benchmark set) and ``contaminated``.

    Scale shape: the benchmark gram set is tiny relative to the corpus
    (eval suites are MBs; the corpus is TBs) — it is deduplicated and
    BROADCAST, so the corpus side streams through a map-side semi-join
    with no shuffle of corpus grams at all; the only shuffle is the
    per-document count aggregation, keyed by doc id. Plan-gated in
    tests/test_plan_shapes.py.
    """
    bench_grams = _bench_gram_set(benchmark, text_col, n)
    corpus_grams = _corpus_gram_stream(corpus, id_col, text_col, n)
    hits = (
        corpus_grams.join(F.broadcast(bench_grams), "g", "left_semi")
        .groupBy("did")
        .agg(F.count("*").alias("n_hit_grams"))
    )
    return _gram_hits_report(corpus, hits, id_col)


def decontaminate_bloom(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 8,
    m_bits: int = 1 << 16,
    k_hashes: int = 2,
) -> DataFrame:
    """``decontaminate`` for benchmark sets too large to broadcast as an
    exact gram set: a Bloom-filter prefilter built from PURE relational
    ops, then exact verification of the (tiny) surviving gram stream.
    Output is bit-identical to ``decontaminate`` — a Bloom filter has no
    false negatives and the exact verify removes the false positives —
    so the same DuckDB oracle hash-matches both.

    Construction (no UDFs, no driver state): benchmark grams hash to
    ``k_hashes`` positions in an ``m_bits`` space; positions bit-pack
    into (hash_idx, bucket, word) rows via groupBy + bit_or — the whole
    filter is ≤ k·m/64 rows REGARDLESS of benchmark size, which is the
    point: the broadcast is fixed-size where ``decontaminate``'s gram
    set grows with the benchmark. Corpus grams then stream map-side
    through k broadcast-joined bit tests; survivors (true hits + the
    controlled false-positive trickle) meet the benchmark gram set in a
    plain shuffled semi-join — small ⋈ large, no broadcast needed.
    fp rate ≈ (1 - e^{-k·G/m})^k; defaults give <1% at G=10⁴ grams.
    """
    # pinned once: the k bloom-word builds AND the exact verify all
    # read this frame, and ReuseExchange is an optimization, not a
    # guarantee — in the large-benchmark regime this operator
    # exists for, k+1 redundant explode+distinct passes over the
    # benchmark are real money (review r8)
    bench_grams = _bench_gram_set(benchmark, text_col, n).localCheckpoint()
    words_per_hash = []
    for j in range(k_hashes):
        pos = f"pmod(xxhash64(g, {j}), {m_bits})"
        words_per_hash.append(
            bench_grams.selectExpr(
                f"CAST({pos} / 64 AS LONG) AS bucket",
                # SQL shiftleft (the Python wrapper only takes literal
                # shift amounts)
                f"shiftleft(1L, CAST({pos} % 64 AS INT)) AS bit",
            )
            .groupBy("bucket")
            .agg(F.bit_or("bit").alias("word"))
        )

    cand = _corpus_gram_stream(corpus, id_col, text_col, n)
    for j, words in enumerate(words_per_hash):
        pos = F.pmod(F.xxhash64(F.col("g"), F.lit(j)), F.lit(m_bits))
        cand = (
            cand.withColumn("__bk", (pos / 64).cast("long"))
            .withColumn("__bit", (pos % 64).cast("int"))
            .join(
                F.broadcast(words.withColumnRenamed("bucket", "__bk")), "__bk"
            )
            .filter(F.expr("(shiftright(word, __bit) & 1) = 1"))
            .drop("__bk", "__bit", "word")
        )
    hits = (
        # exact verify: survivors are few, so this is a small ⋈ large
        # shuffled semi-join — deliberately NOT broadcast
        cand.join(bench_grams, "g", "left_semi")
        .groupBy("did")
        .agg(F.count("*").alias("n_hit_grams"))
    )
    return _gram_hits_report(corpus, hits, id_col)


def decontaminate_oracle_sql(
    table: str, id_col: str, text_col: str, bench_pred: str, n: int = 8
) -> str:
    """DuckDB twin of ``decontaminate`` with the benchmark slice defined
    by ``bench_pred`` (a boolean SQL expression over ``table``)."""
    return f"""
    WITH d AS (
        SELECT {id_col} AS did, ({bench_pred}) AS is_bench,
               CASE WHEN length(trim({text_col})) > 0
                    THEN string_split_regex(trim({text_col}), '[ \\t\\n\\x0B\\f\\r]+')
                    ELSE [] END AS t
        FROM {table}
    ),
    grams AS (
        SELECT did, is_bench,
               unnest(list_transform(range(1, len(t) - {n - 2}),
                                     i -> array_to_string(t[i:i + {n - 1}], ' '))) AS g
        FROM d WHERE len(t) >= {n}
    ),
    bench_set AS (SELECT DISTINCT g FROM grams WHERE is_bench),
    hits AS (
        SELECT c.did, COUNT(*) AS n_hit_grams
        FROM grams c JOIN bench_set b USING (g)
        WHERE NOT c.is_bench
        GROUP BY c.did
    )
    SELECT d.did AS {id_col},
           COALESCE(h.n_hit_grams, 0) AS n_hit_grams,
           COALESCE(h.n_hit_grams, 0) > 0 AS contaminated
    FROM d LEFT JOIN hits h USING (did)
    WHERE NOT d.is_bench
    """


def decontaminate_embeddings(
    corpus: DataFrame,
    benchmark: DataFrame,
    vec_col: str,
    id_col: str,
    threshold: float = 0.6,
) -> DataFrame:
    """Embedding-space decontamination: flag corpus vectors with cosine
    ≥ ``threshold`` to ANY benchmark/eval vector — the semantic
    complement of the exact n-gram ``decontaminate`` pass (catches
    paraphrased eval leakage that exact substring matching misses).

    Returns one row per corpus vector: ``n_bench_hits`` (benchmark
    vectors above the threshold) and ``contaminated``.

    Scale shape: eval sets are tiny relative to the corpus, so the
    benchmark matrix is collected once (bounded driver action — the same
    trade as the IVF centroid sample) and closed over by an Arrow-batched
    pandas UDF: one (batch × bench) GEMM per batch, corpus streamed, no
    shuffle at all. The n-gram pass broadcasts a gram set; this pass
    broadcasts a float matrix — same topology.
    """
    from pyspark.sql.functions import pandas_udf

    rows = benchmark.select(_c(vec_col).alias("v")).filter(
        _c(vec_col).isNotNull()
    ).collect()
    if not rows:
        # empty eval slice: nothing can contaminate — np.stack([]) would
        # crash the driver instead (review r8)
        return spread(corpus).select(
            _c(id_col).alias(id_col),
            F.lit(0).cast("long").alias("n_bench_hits"),
            F.lit(False).alias("contaminated"),
        )
    bm = np.stack([np.asarray(r["v"], dtype=np.float64) for r in rows])
    bm = bm / np.maximum(np.linalg.norm(bm, axis=1, keepdims=True), 1e-12)
    thr = float(threshold)

    @pandas_udf("long")
    def _hits(v: pd.Series) -> pd.Series:
        m = np.stack([np.asarray(x, dtype=np.float64) for x in v.values])
        m = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        return pd.Series(((m @ bm.T) >= thr).sum(axis=1).astype("int64"))

    return spread(corpus).select(
        _c(id_col).alias(id_col),
        _hits(_c(vec_col)).alias("n_bench_hits"),
    ).withColumn("contaminated", F.col("n_bench_hits") > 0)


def decontaminate_embeddings_oracle_sql(
    table: str,
    id_col: str,
    vec_col: str,
    n_bench: int,
    threshold: float = 0.6,
) -> str:
    """DuckDB twin of ``decontaminate_embeddings`` with the benchmark
    defined as the ``n_bench`` vectors of smallest Knuth-hash(id) — the
    same deterministic sample rule as ``similarity.seed_centroids``."""
    hash_order = f"(({id_col} % {2**31}) * {KNUTH_A}) % {2**32}, {id_col}"
    return f"""
    WITH bench AS (
        SELECT {id_col} AS bid, {vec_col}::DOUBLE[] AS bv
        FROM {table} ORDER BY {hash_order} LIMIT {n_bench}
    ),
    hits AS (
        SELECT e.{id_col} AS did, COUNT(*) AS n_bench_hits
        FROM {table} e CROSS JOIN bench b
        WHERE list_cosine_similarity(e.{vec_col}::DOUBLE[], b.bv) >= {threshold}
          AND e.{id_col} NOT IN (SELECT bid FROM bench)
        GROUP BY e.{id_col}
    )
    SELECT e.{id_col},
           COALESCE(h.n_bench_hits, 0) AS n_bench_hits,
           COALESCE(h.n_bench_hits, 0) > 0 AS contaminated
    FROM {table} e LEFT JOIN hits h ON h.did = e.{id_col}
    WHERE e.{id_col} NOT IN (SELECT bid FROM bench)
    """


def normalize_text(col: Column | str) -> Column:
    """Canonicalize text for normalized dedup: lowercase, strip
    punctuation to spaces, collapse whitespace runs, trim. Catches the
    trivially-reformatted duplicates (case, spacing, punctuation) that
    byte-exact dedup misses and near-dup thresholds over-kill. Pure
    codegen'd projection. Whitespace is an EXPLICIT character class, not
    ``\\s``: Java regex counts vertical tab (\\x0B) in ``\\s`` but RE2
    does not, so ``\\s`` normalizes differently in Spark vs the DuckDB
    oracle on text containing VT (ADVICE r2)."""
    c = F.lower(_c(col))
    c = F.regexp_replace(c, r"[^a-z0-9 \t\n\x0B\f\r]", " ")
    c = F.regexp_replace(c, r"[ \t\n\x0B\f\r]+", " ")
    return F.trim(c)


def normalized_exact_dedup(
    df: DataFrame, content_col: str, id_col: str
) -> DataFrame:
    """Exact dedup over the CANONICALIZED content: one surviving
    (min-id) row per distinct normalized text, with the absorbed-copy
    count. Same single digest-keyed shuffle as ``dedup.exact_dedup`` —
    normalization adds zero shuffles."""
    norm = normalize_text(content_col)
    return df.groupBy(F.md5(norm).alias("norm_md5")).agg(
        F.min(id_col).alias("keep_id"),
        F.count("*").alias("n_copies"),
    )


def normalized_dedup_oracle_sql(table: str, id_col: str, text_col: str) -> str:
    """DuckDB twin of ``normalized_exact_dedup`` (same canonicalization,
    same digest grouping)."""
    # explicit whitespace class, same bytes as normalize_text (Java \s
    # includes \x0B, RE2 \s does not — ADVICE r2)
    norm = (
        f"trim(regexp_replace(regexp_replace(lower({text_col}),"
        f" '[^a-z0-9 \\t\\n\\x0B\\f\\r]', ' ', 'g'),"
        f" '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))"
    )
    return f"""
    SELECT md5({norm}) AS norm_md5,
           MIN({id_col}) AS keep_id,
           COUNT(*) AS n_copies
    FROM {table}
    GROUP BY 1
    """


# ---------------------------------------------------------------------------
# Deterministic epoch shuffle → training shards
# ---------------------------------------------------------------------------


def epoch_shuffle(
    df: DataFrame,
    id_col: str,
    epochs: int = 2,
    n_shards: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Deterministic per-epoch global shuffle into training shards: each
    epoch draws a fresh pseudo-random order (seeded hash of the id), the
    order is range-split into ``n_shards`` shards by hash value, and
    rows are numbered within their shard. A training job reads shard
    files in (epoch, shard, pos) order and sees a reproducible shuffle
    with no RNG state anywhere.

    Scale shape: the hash is a projection; the only exchange is the
    window partitioned by (epoch, shard) — parallelism scales with the
    shard count (pick n_shards ≈ output files, thousands at 100 TB), and
    no stage ever sees a global ordering. This deliberately avoids the
    single-partition global row_number trap (cf. datapipe/packing.py,
    which solves the global variant with a two-phase prefix sum when a
    total order is genuinely required).

    Hash algebra matches datapipe/sampling.py's seeded two-round
    multiplicative bucket, with the epoch folded into the salt — pure
    int64, engine-portable.
    """
    from pyspark.sql import Window

    did = _c(id_col)
    epoch = F.explode(F.array(*[F.lit(e) for e in range(epochs)])).alias("epoch")
    base = df.select(did.alias("did"), epoch)
    reduced = F.pmod(F.col("did").cast("long"), F.lit(_MOD_31))
    salt = F.pmod((F.lit(seed) + F.col("epoch")) * F.lit(GOLDEN), F.lit(_MOD_31))
    premix = F.pmod(reduced + salt, F.lit(_MOD_31))
    two_round = F.pmod(
        F.pmod(premix * F.lit(KNUTH_A), F.lit(_MOD_31)) * F.lit(KNUTH_A),
        F.lit(_MOD_32),
    )
    hashed = base.select("did", "epoch", two_round.alias("h"))
    w = Window.partitionBy("epoch", F.pmod(F.col("h"), F.lit(n_shards))).orderBy(
        "h", "did"
    )
    return hashed.select(
        F.col("did").alias(id_col),
        "epoch",
        F.pmod(F.col("h"), F.lit(n_shards)).cast("int").alias("shard"),
        F.row_number().over(w).alias("pos"),
    )


def epoch_shuffle_oracle_sql(
    table: str, id_col: str, epochs: int = 2, n_shards: int = 8, seed: int = 7
) -> str:
    """DuckDB twin of ``epoch_shuffle`` (same hash, same window)."""
    return f"""
    WITH base AS (
        SELECT {id_col} AS did, e.epoch
        FROM {table} CROSS JOIN (
            SELECT unnest(range({epochs})) AS epoch) e
    ),
    hashed AS (
        SELECT did, epoch,
               ((((did % {_MOD_31} + ({seed} + epoch) * {GOLDEN} % {_MOD_31})
                  % {_MOD_31}) * {KNUTH_A} % {_MOD_31}) * {KNUTH_A})
                 % {_MOD_32} AS h
        FROM base
    )
    SELECT did AS {id_col},
           CAST(epoch AS INT) AS epoch,
           CAST(h % {n_shards} AS INT) AS shard,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY epoch, h % {n_shards} ORDER BY h, did
           ) AS INT) AS pos
    FROM hashed
    """


# ---------------------------------------------------------------------------
# PII scan / redaction
# ---------------------------------------------------------------------------


def synthesize_pii(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Deterministically inject synthetic PII spans into a text column
    (the sandbox corpus contains none). Same role as
    ``multimodal.synthesize_media``: stands in for real-world raw text
    so the scan/redaction path is exercised end-to-end."""
    did = _c(id_col)
    email = F.when(
        did % 7 == 0,
        F.concat(F.lit(" contact user"), did, F.lit("@mail.example.com")),
    ).otherwise(F.lit(""))
    phone = F.when(
        did % 11 == 0,
        F.concat(F.lit(" tel +1-555-"), F.lpad(F.pmod(did, 10000), 4, "0")),
    ).otherwise(F.lit(""))
    return df.withColumn(text_col, F.concat(_c(text_col), email, phone))


def pii_scan(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Count and redact email/phone spans: pure projection (regex
    builtins, JVM-side, zero shuffles at any scale). Redacted text is
    returned as an md5 digest so the wide string never leaves the scan
    in the verification query; production would keep the redacted column.
    """
    c = _c(text_col)
    redacted = F.regexp_replace(
        F.regexp_replace(c, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return df.select(
        _c(id_col).alias(id_col),
        F.regexp_count(c, F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count(c, F.lit(PHONE_RE)).alias("n_phones"),
        (
            (F.regexp_count(c, F.lit(EMAIL_RE)) > 0)
            | (F.regexp_count(c, F.lit(PHONE_RE)) > 0)
        ).alias("has_pii"),
        F.md5(redacted).alias("redacted_md5"),
    )


def pii_oracle_sql(table: str, id_col: str, text_col: str) -> str:
    """DuckDB twin of ``synthesize_pii`` + ``pii_scan``. RE2 and Java
    regex agree on these patterns (character classes + bounded reps)."""
    injected = (
        f"{text_col} || "
        f"CASE WHEN {id_col} % 7 = 0 THEN ' contact user' || {id_col} "
        f"|| '@mail.example.com' ELSE '' END || "
        f"CASE WHEN {id_col} % 11 = 0 THEN ' tel +1-555-' "
        f"|| lpad(CAST({id_col} % 10000 AS VARCHAR), 4, '0') ELSE '' END"
    )
    return f"""
    WITH t AS (SELECT {id_col}, {injected} AS txt FROM {table})
    SELECT {id_col},
           CAST(len(regexp_extract_all(txt, '{EMAIL_RE}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(txt, '{PHONE_RE}')) AS INT) AS n_phones,
           len(regexp_extract_all(txt, '{EMAIL_RE}')) > 0
               OR len(regexp_extract_all(txt, '{PHONE_RE}')) > 0 AS has_pii,
           md5(regexp_replace(regexp_replace(txt, '{EMAIL_RE}', '<EMAIL>', 'g'),
                              '{PHONE_RE}', '<PHONE>', 'g')) AS redacted_md5
    FROM t
    """


# ---------------------------------------------------------------------------
# Fixed-size document chunking (tokenizer-prep / RAG windows)
# ---------------------------------------------------------------------------


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Split documents into fixed-size token windows with overlap — the
    standard pre-tokenization chunking for context-window training and
    RAG indexing. One output row per (doc, chunk) with the chunk's token
    count and content digest (the digest keeps the verification surface
    narrow; production would carry the chunk text).

    stride = chunk_tokens - overlap; a document yields
    max(1, ceil((len - overlap) / stride)) chunks, so every token is
    covered and consecutive chunks share exactly ``overlap`` tokens
    (the final chunk may be shorter). Zero-token docs yield no rows.

    Scale shape: explode of the chunk-index sequence + array slice —
    pure codegen projection, no shuffle at all; chunking a 100 TB corpus
    is a single map pass.
    """
    stride = chunk_tokens - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than chunk_tokens")
    base = spread(df).select(
        _c(id_col).alias("did"), tokens(text_col).alias("tk")
    )
    n_chunks = F.greatest(
        F.lit(1),
        F.floor((F.size("tk") - overlap + stride - 1) / F.lit(stride)).cast("int"),
    )
    chunks = (
        base.filter(F.size("tk") > 0)
        .select("did", "tk", F.explode(F.sequence(F.lit(1), n_chunks)).alias("c"))
        .select(
            "did",
            "tk",
            F.col("c"),
            ((F.col("c") - 1) * stride + 1).alias("start"),
        )
    )
    piece = F.slice(F.col("tk"), F.col("start"), chunk_tokens)
    return chunks.select(
        F.col("did").alias(id_col),
        (F.col("c") - 1).cast("int").alias("chunk_id"),
        F.size(piece).alias("n_chunk_tokens"),
        F.md5(F.array_join(piece, " ")).alias("chunk_md5"),
    )


def chunk_oracle_sql(
    table: str,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> str:
    """DuckDB twin of ``chunk_documents`` (lists are 1-indexed and slice
    bounds are inclusive, mirroring Spark's slice semantics)."""
    stride = chunk_tokens - overlap
    return f"""
    WITH d AS (
        SELECT {id_col} AS did,
               CASE WHEN length(trim({text_col})) > 0
                    THEN string_split_regex(trim({text_col}), '[ \\t\\n\\x0B\\f\\r]+')
                    ELSE [] END AS tk
        FROM {table}
    ),
    c AS (
        SELECT did, tk,
               unnest(range(1, greatest(
                   1, (len(tk) - {overlap} + {stride} - 1) // {stride}) + 1)) AS c
        FROM d WHERE len(tk) > 0
    ),
    s AS (
        SELECT did, tk, c, (c - 1) * {stride} + 1 AS start FROM c
    )
    SELECT did AS {id_col},
           CAST(c - 1 AS INT) AS chunk_id,
           CAST(len(tk[start:start + {chunk_tokens} - 1]) AS INT)
               AS n_chunk_tokens,
           md5(array_to_string(tk[start:start + {chunk_tokens} - 1], ' '))
               AS chunk_md5
    FROM s
    """


# ---------------------------------------------------------------------------
# Composite Gopher quality filter (the end-product keep/drop decision)
# ---------------------------------------------------------------------------

GOPHER_MIN_TOKENS = 30
GOPHER_MAX_TOKENS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MIN_STOPWORD_HITS = 2
GOPHER_STOPWORDS = ("the", "a", "and", "of", "to", "in", "is")


def gopher_quality_filter(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """The full Gopher/MassiveText document-quality gate (Rae et al.
    2021, §A1.1) as ONE decision per document: length bounds, mean word
    length band, minimum stop-word evidence, and the repetition caps of
    ``repetition_stats`` — each rule reported separately plus the final
    ``keep``. This is the row a curation pipeline actually writes; the
    per-metric queries are its diagnostics.

    Plan shape: identical to ``repetition_stats`` (whose gram stream it
    extends) — one explode of tagged grams, two map-side-combining
    aggregations keyed by doc id, the extra stats (token-length sum,
    stop-word hits) riding the SAME unigram pass; still zero joins
    against the corpus and no Python.
    """
    counts = _tagged_gram_counts(df, id_col, text_col)
    is_stop = F.col("g").isin(*GOPHER_STOPWORDS)
    per_n = counts.groupBy("did").agg(
        F.sum(F.when(F.col("n") == 1, F.col("c"))).alias("tot1"),
        F.count(F.when(F.col("n") == 1, True)).alias("dis1"),
        F.max(F.when(F.col("n") == 1, F.col("c"))).alias("top1"),
        F.sum(
            F.when(F.col("n") == 1, F.col("c") * F.length("g"))
        ).alias("lensum"),
        F.sum(F.when((F.col("n") == 1) & is_stop, F.col("c"))).alias("stop1"),
        F.sum(F.when(F.col("n") == 2, F.col("c"))).alias("tot2"),
        F.count(F.when(F.col("n") == 2, True)).alias("dis2"),
    )
    n_tokens = F.coalesce("tot1", F.lit(0))
    mean_len = F.when(
        F.col("tot1") > 0,
        F.col("lensum").cast("double") / F.col("tot1").cast("double"),
    ).otherwise(F.lit(0.0))
    stops = F.coalesce("stop1", F.lit(0))
    top_frac = F.coalesce(
        F.col("top1").cast("double") / F.col("tot1").cast("double"), F.lit(0.0)
    )
    dup_bi = F.coalesce(
        F.when(
            F.col("tot2") > 0,
            (F.col("tot2") - F.col("dis2")).cast("double")
            / F.col("tot2").cast("double"),
        ),
        F.lit(0.0),
    )
    ok_length = n_tokens.between(GOPHER_MIN_TOKENS, GOPHER_MAX_TOKENS)
    ok_word_len = mean_len.between(
        GOPHER_MIN_MEAN_WORD_LEN, GOPHER_MAX_MEAN_WORD_LEN
    )
    ok_stopwords = stops >= GOPHER_MIN_STOPWORD_HITS
    ok_repetition = (top_frac <= TOP_TOKEN_FRAC_MAX) & (
        dup_bi <= DUP_BIGRAM_FRAC_MAX
    )
    return per_n.select(
        F.col("did").alias(id_col),
        n_tokens.alias("n_tokens"),
        mean_len.alias("mean_word_len"),
        stops.alias("n_stopword_tokens"),
        top_frac.alias("top_token_frac"),
        dup_bi.alias("dup_bigram_frac"),
        ok_length.alias("ok_length"),
        ok_word_len.alias("ok_word_len"),
        ok_stopwords.alias("ok_stopwords"),
        ok_repetition.alias("ok_repetition"),
        (ok_length & ok_word_len & ok_stopwords & ok_repetition).alias("keep"),
    )


def gopher_oracle_sql(table: str, id_col: str, text_col: str) -> str:
    """DuckDB twin of ``gopher_quality_filter`` — same gram stream,
    same aggregates, same rule thresholds."""
    stop_list = ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS)
    return f"""
    WITH d AS (
        SELECT {id_col} AS did,
               CASE WHEN length(trim({text_col})) > 0
                    THEN string_split_regex(trim({text_col}), '[ \\t\\n\\x0B\\f\\r]+')
                    ELSE [] END AS t
        FROM {table}
    ),
    grams AS (
        SELECT did, 1 AS n, unnest(t) AS g FROM d
        UNION ALL
        SELECT did, 2 AS n,
               unnest(list_transform(range(1, len(t)),
                                     i -> t[i] || ' ' || t[i + 1])) AS g
        FROM d WHERE len(t) >= 2
        UNION ALL
        SELECT did, 0 AS n, '' AS g FROM d
    ),
    counts AS (
        SELECT did, n, g, COUNT(*) AS c FROM grams GROUP BY did, n, g
    ),
    per_n AS (
        SELECT did,
               SUM(CASE WHEN n = 1 THEN c END) AS tot1,
               COUNT(CASE WHEN n = 1 THEN TRUE END) AS dis1,
               MAX(CASE WHEN n = 1 THEN c END) AS top1,
               SUM(CASE WHEN n = 1 THEN c * length(g) END) AS lensum,
               SUM(CASE WHEN n = 1 AND g IN ({stop_list}) THEN c END) AS stop1,
               SUM(CASE WHEN n = 2 THEN c END) AS tot2,
               COUNT(CASE WHEN n = 2 THEN TRUE END) AS dis2
        FROM counts GROUP BY did
    ),
    s AS (
        SELECT did,
               CAST(COALESCE(tot1, 0) AS BIGINT) AS n_tokens,
               CASE WHEN tot1 > 0
                    THEN CAST(lensum AS DOUBLE) / CAST(tot1 AS DOUBLE)
                    ELSE 0.0 END AS mean_word_len,
               CAST(COALESCE(stop1, 0) AS BIGINT) AS n_stopword_tokens,
               COALESCE(CAST(top1 AS DOUBLE) / CAST(tot1 AS DOUBLE), 0.0)
                   AS top_token_frac,
               COALESCE(CASE WHEN tot2 > 0
                             THEN CAST(tot2 - dis2 AS DOUBLE)
                                  / CAST(tot2 AS DOUBLE) END, 0.0)
                   AS dup_bigram_frac
        FROM per_n
    )
    SELECT did AS {id_col}, n_tokens, mean_word_len, n_stopword_tokens,
           top_token_frac, dup_bigram_frac,
           n_tokens BETWEEN {GOPHER_MIN_TOKENS} AND {GOPHER_MAX_TOKENS}
               AS ok_length,
           mean_word_len BETWEEN {GOPHER_MIN_MEAN_WORD_LEN}
               AND {GOPHER_MAX_MEAN_WORD_LEN} AS ok_word_len,
           n_stopword_tokens >= {GOPHER_MIN_STOPWORD_HITS} AS ok_stopwords,
           (top_token_frac <= {TOP_TOKEN_FRAC_MAX}
            AND dup_bigram_frac <= {DUP_BIGRAM_FRAC_MAX}) AS ok_repetition,
           (n_tokens BETWEEN {GOPHER_MIN_TOKENS} AND {GOPHER_MAX_TOKENS})
           AND (mean_word_len BETWEEN {GOPHER_MIN_MEAN_WORD_LEN}
                AND {GOPHER_MAX_MEAN_WORD_LEN})
           AND n_stopword_tokens >= {GOPHER_MIN_STOPWORD_HITS}
           AND (top_token_frac <= {TOP_TOKEN_FRAC_MAX}
                AND dup_bigram_frac <= {DUP_BIGRAM_FRAC_MAX}) AS keep
    FROM s
    """


# ---------------------------------------------------------------------------
# URL/domain curation: per-domain caps
# ---------------------------------------------------------------------------

DOMAINS = (
    "news.example.org",
    "blog.example.io",
    "docs.example.net",
    "mega.example.com",  # the hot domain: ids with pmod >= 3 all land here
)


def synthesize_urls(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministically attach a source URL column (the sandbox corpus
    has none) with a deliberately SKEWED domain mix — most ids land on
    one hot domain, the regime per-domain caps exist for."""
    did = _c(id_col)
    idx = F.least(F.pmod(did, F.lit(8)), F.lit(3))  # 5/8 of ids → hot
    domain = F.element_at(
        F.array(*[F.lit(d) for d in DOMAINS]), (idx + 1).cast("int")
    )
    return df.withColumn(
        "url", F.concat(F.lit("https://"), domain, F.lit("/doc/"), did)
    )


def extract_domain(url: Column | str) -> Column:
    """Registrable host of an URL (scheme://host/...), '' when absent."""
    return F.regexp_extract(_c(url), r"^[a-z]+://([^/]+)/", 1)


def cap_per_domain(
    df: DataFrame, url_col: str, id_col: str, n: int = 20
) -> DataFrame:
    """Common-Crawl-style per-domain document cap: keep at most ``n``
    documents per registrable domain, chosen by the deterministic Knuth
    id hash (a reproducible uniform sample of the domain, not "first n
    crawled" — crawl order is biased). The standard counter to domain
    skew in web corpora (C4/CCNet keep per-host quotas).

    Scale shape: rank-within-domain is a ranking window, so Spark's
    WindowGroupLimit keeps ≤ n rows per domain PER PARTITION before the
    single domain-key shuffle — the hot domain contributes n rows per
    input partition, never its full row count (plan-gated).
    """
    from hours_api_clickup_spark.datapipe.sampling import hash_bucket
    from pyspark.sql import Window

    did = _c(id_col)
    # THE module hash, not a local copy (deferred r8 refactor): the
    # seed=0 form is the exact expression this function used to inline,
    # so the oracle SQL below stays bit-identical — and any future fix
    # to hash_bucket (like r8's string-key one) reaches this stage too
    bucket = hash_bucket(did)
    domain = extract_domain(url_col).alias("domain")
    w = Window.partitionBy("domain").orderBy(F.col("__b").asc(), did.asc())
    return (
        df.select(did.alias(id_col), domain, bucket.alias("__b"))
        .withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n)
        .select(id_col, "domain")
    )


def cap_per_domain_oracle_sql(
    table: str, id_col: str, n: int = 20
) -> str:
    """DuckDB twin: same synthesized URLs, same hash order, same cap."""
    from hours_api_clickup_spark.datapipe.sampling import KNUTH_A, _MOD_31, _MOD_32

    domains = ", ".join(f"'{d}'" for d in DOMAINS)
    return f"""
    WITH u AS (
        SELECT {id_col},
               'https://' || [{domains}][LEAST({id_col} % 8, 3) + 1]
                   || '/doc/' || {id_col} AS url
        FROM {table}
    ),
    d AS (
        SELECT {id_col},
               regexp_extract(url, '^[a-z]+://([^/]+)/', 1) AS domain,
               (({id_col} % {_MOD_31}) * {KNUTH_A}) % {_MOD_32} AS b
        FROM u
    ),
    r AS (
        SELECT {id_col}, domain,
               row_number() OVER (PARTITION BY domain ORDER BY b, {id_col})
                   AS rk
        FROM d
    )
    SELECT {id_col}, domain FROM r WHERE rk <= {n}
    """


def synthesize_messy_urls(df: DataFrame, id_col: str) -> DataFrame:
    """Deterministic 'crawled URL' column with the real-world mess URL
    dedup exists for: four variants per canonical page (id div 4) —
    www + mixed-case host, http + trailing slash, tracking query
    params (utm_*/ref) around a real param, and a #fragment. Variants
    0/1/3 canonicalize identically; variant 2 keeps its non-tracking
    ?id= param and stays distinct."""
    did = _c(id_col)
    # shiftright = exact integer div-4 for the non-negative ids this
    # synthesizer takes; the old float-divide-then-cast rounded ids
    # beyond 2^53 before the cast while the oracle's // stayed exact
    # (review r8)
    page = F.shiftright(did.cast("long"), 2)
    dom = F.pmod(page, F.lit(5)).cast("string")
    p = page.cast("string")
    variant = F.pmod(did, F.lit(4)).cast("int")
    url = (
        F.when(
            variant == 0,
            F.concat(
                F.lit("https://www.Example"), dom, F.lit(".com/page/"), p
            ),
        )
        .when(
            variant == 1,
            F.concat(
                F.lit("http://example"), dom, F.lit(".com/page/"), p,
                F.lit("/"),
            ),
        )
        .when(
            variant == 2,
            F.concat(
                F.lit("https://EXAMPLE"), dom, F.lit(".com/page/"), p,
                F.lit("?utm_source=feed&ref=rss&id="),
                F.pmod(did, F.lit(7)).cast("string"),
            ),
        )
        .otherwise(
            F.concat(
                F.lit("https://example"), dom, F.lit(".com/page/"), p,
                F.lit("#section-2"),
            )
        )
    )
    return df.withColumn("url", url)


def canonicalize_url(url: Column | str) -> Column:
    """C4/CCNet-style URL canonicalization, pure codegen string ops:
    strip scheme and #fragment, lowercase the host and drop a leading
    www., drop tracking query params (utm_*, ref) but KEEP meaningful
    ones, strip the trailing slash. Dialect note: regexes avoid
    backslash classes ('[.]' not '\\.') so the oracle's standard-SQL
    strings read identically — Spark processes \\ escapes in string
    literals, DuckDB does not."""
    nofrag = F.regexp_replace(
        F.regexp_replace(_c(url), "^[a-zA-Z]+://", ""), "#.*$", ""
    )
    qpos = F.instr(nofrag, "?")
    path_part = F.when(
        qpos > 0, F.substring(nofrag, F.lit(1), qpos - 1)
    ).otherwise(nofrag)
    query_part = F.when(qpos > 0, F.substr(nofrag, qpos + 1)).otherwise(
        F.lit("")
    )
    kept = F.array_join(
        F.filter(
            F.split(query_part, "&"),
            lambda x: (
                ~(x.startswith("utm_") | x.startswith("ref=")) & (x != "")
            ),
        ),
        "&",
    )
    host = F.regexp_replace(
        F.lower(F.regexp_extract(path_part, "^([^/]+)", 1)), "^www[.]", ""
    )
    rest = F.regexp_replace(
        F.regexp_replace(path_part, "^[^/]+", ""), "/$", ""
    )
    return F.concat(
        host,
        rest,
        F.when(kept != "", F.concat(F.lit("?"), kept)).otherwise(F.lit("")),
    )


def url_canonical_dedup_oracle_sql(
    table: str = "documents", id_col: str = "doc_id"
) -> str:
    """DuckDB twin of synthesize_messy_urls → canonicalize_url →
    min-id dedup (generated so the synthesis constants cannot drift)."""
    return f"""
    WITH u AS (
        SELECT {id_col} AS did,
            CASE CAST({id_col} % 4 AS INT)
              WHEN 0 THEN concat('https://www.Example',
                   CAST(({id_col} // 4) % 5 AS VARCHAR), '.com/page/',
                   CAST({id_col} // 4 AS VARCHAR))
              WHEN 1 THEN concat('http://example',
                   CAST(({id_col} // 4) % 5 AS VARCHAR), '.com/page/',
                   CAST({id_col} // 4 AS VARCHAR), '/')
              WHEN 2 THEN concat('https://EXAMPLE',
                   CAST(({id_col} // 4) % 5 AS VARCHAR), '.com/page/',
                   CAST({id_col} // 4 AS VARCHAR),
                   '?utm_source=feed&ref=rss&id=',
                   CAST({id_col} % 7 AS VARCHAR))
              ELSE concat('https://example',
                   CAST(({id_col} // 4) % 5 AS VARCHAR), '.com/page/',
                   CAST({id_col} // 4 AS VARCHAR), '#section-2')
            END AS url
        FROM {table}
    ),
    c AS (
        SELECT did,
            regexp_replace(regexp_replace(url, '^[a-zA-Z]+://', ''),
                           '#.*$', '') AS nofrag
        FROM u
    ),
    p AS (
        SELECT did,
            CASE WHEN instr(nofrag, '?') > 0
                 THEN substring(nofrag, 1, instr(nofrag, '?') - 1)
                 ELSE nofrag END AS path_part,
            CASE WHEN instr(nofrag, '?') > 0
                 THEN substring(nofrag, instr(nofrag, '?') + 1)
                 ELSE '' END AS query_part
        FROM c
    ),
    q AS (
        SELECT did, path_part,
            array_to_string(list_filter(string_split(query_part, '&'),
                x -> NOT (x LIKE 'utm\\_%' ESCAPE '\\' OR x LIKE 'ref=%') AND x != ''),
                '&') AS kept_query
        FROM p
    ),
    canon AS (
        SELECT did,
            concat(
                regexp_replace(
                    lower(regexp_extract(path_part, '^([^/]+)', 1)),
                    '^www[.]', ''),
                regexp_replace(regexp_replace(path_part, '^[^/]+', ''),
                               '/$', ''),
                CASE WHEN kept_query != ''
                     THEN concat('?', kept_query) ELSE '' END
            ) AS canonical_url
        FROM q
    )
    SELECT canonical_url, MIN(did) AS {id_col}, COUNT(*) AS n_dups
    FROM canon GROUP BY canonical_url
    """
