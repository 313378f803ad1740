"""Text analysis operators: tokenization, quality scoring, language ID,
document fingerprinting. All pure Catalyst expressions (JVM-side,
whole-stage codegen) — a 100 TB corpus pass is scan + project with zero
shuffles and zero Python.

Formulas are deliberately engine-portable (see plans/registry.py) so the
DuckDB oracle reproduces them bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from hours_api_clickup_spark.functions.hashing import rolling_fingerprint

# Marker stopwords per language for the n-gram/stopword-heuristic
# language identifier. Order = tie-break priority.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is"),
    "de": ("der", "die", "das", "und", "ist", "nicht"),
    "fr": ("le", "la", "les", "et", "est", "une"),
    "es": ("el", "los", "las", "y", "es", "una"),
}

STOPWORDS = LANG_MARKERS["en"]

# BPE-ish pre-tokenizer: alpha runs, digit runs, single punctuation.
BPE_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 \t\n\x0B\f\r]"
PUNCT_CLASS = r"[.!?,;:]"
NON_ALPHA_CLASS = r"[^a-zA-Z]"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(col: Column | str) -> Column:
    """Whitespace tokens of trimmed text (empty array for blank text).

    The split class is spelled out instead of ``\\s`` because Java regex
    counts vertical tab (\\x0B) in ``\\s`` while RE2 (the DuckDB oracle)
    does not — an implicit class would tokenize VT-bearing text
    differently per engine (ADVICE r2)."""
    t = F.trim(_c(col))
    return F.when(F.length(t) > 0, F.split(t, r"[ \t\n\x0B\f\r]+")).otherwise(
        F.array().cast("array<string>")
    )


def bpe_token_count(col: Column | str) -> Column:
    """Count of BPE-ish pre-tokens (regex extraction, JVM-side)."""
    return F.size(F.regexp_extract_all(_c(col), F.lit(BPE_PATTERN), 0))


def stopword_ratio(toks: Column, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return hits.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def punct_ratio(col: Column | str) -> Column:
    c = _c(col)
    removed = F.length(c) - F.length(F.regexp_replace(c, PUNCT_CLASS, ""))
    return removed.cast("double") / F.greatest(F.length(c), F.lit(1)).cast("double")


def alpha_ratio(col: Column | str) -> Column:
    c = _c(col)
    kept = F.length(F.regexp_replace(c, NON_ALPHA_CLASS, ""))
    return kept.cast("double") / F.greatest(F.length(c), F.lit(1)).cast("double")


def avg_token_len(toks: Column) -> Column:
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t)),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return total.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def quality_score(col: Column | str) -> Column:
    """Composite [0,1] quality heuristic: favors mid-length documents with
    alphabetic content, a sane stopword rate, and low punctuation noise.
    Pure double arithmetic — deterministic and oracle-portable."""
    c = _c(col)
    toks = tokens(c)
    len_score = F.least(F.length(c).cast("double") / F.lit(500.0), F.lit(1.0))
    return (
        F.lit(0.25) * len_score
        + F.lit(0.25) * alpha_ratio(c)
        + F.lit(0.25) * F.least(stopword_ratio(toks) * 4.0, F.lit(1.0))
        + F.lit(0.25) * (F.lit(1.0) - F.least(punct_ratio(c) * 10.0, F.lit(1.0)))
    )


def language_hits(toks: Column, lang: str) -> Column:
    return F.size(F.filter(toks, lambda t: t.isin(*LANG_MARKERS[lang])))


def predict_language(col: Column | str) -> Column:
    """Stopword-marker language ID. Highest hit count wins; ties resolve
    in LANG_MARKERS order; zero hits everywhere → 'und'."""
    toks = tokens(_c(col))
    hits = {lang: language_hits(toks, lang) for lang in LANG_MARKERS}
    langs = list(LANG_MARKERS)
    expr = F.lit("und")
    # build CASE from lowest priority upward so earlier langs win ties
    for lang in reversed(langs):
        cond = hits[lang] > 0
        for other in langs:
            if langs.index(other) < langs.index(lang):
                cond = cond & (hits[lang] > hits[other])
            elif other != lang:
                cond = cond & (hits[lang] >= hits[other])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def text_profile(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append the full text-analysis column family in one projection."""
    c = F.col(text_col)
    toks = tokens(c)
    return df.select(
        "*",
        F.length(c).alias("prof_n_chars"),
        F.size(toks).alias("prof_n_tokens"),
        bpe_token_count(c).alias("prof_n_bpe_tokens"),
        avg_token_len(toks).alias("prof_avg_token_len"),
        stopword_ratio(toks).alias("prof_stopword_ratio"),
        punct_ratio(c).alias("prof_punct_ratio"),
        alpha_ratio(c).alias("prof_alpha_ratio"),
        quality_score(c).alias("prof_quality"),
        predict_language(c).alias("prof_lang"),
        rolling_fingerprint(c).alias("prof_fingerprint"),
        F.md5(c).alias("prof_md5"),
    )


def vocab_topk(
    df: DataFrame, id_col: str, text_col: str, k: int = 100
) -> DataFrame:
    """Corpus vocabulary head: the k most frequent tokens with their
    total occurrence count and document frequency — the first step of
    any tokenizer/vocab build and the standard corpus sanity report.

    Scale shape: explode tokens → groupBy(doc, token) partial counts →
    groupBy(token) — both aggregations map-side combining; the final
    top-k is a TakeOrderedAndProject (per-partition heap + tiny driver
    merge), never a global sort. Ties broken by token for determinism.
    """
    from hours_api_clickup_spark.datapipe.dedup import spread

    toks = spread(df).select(
        F.col(id_col).alias("did"), F.explode(tokens(text_col)).alias("tok")
    )
    per_doc = toks.groupBy("tok", "did").agg(F.count("*").alias("c"))
    return (
        per_doc.groupBy("tok")
        .agg(
            F.sum("c").alias("n_occurrences"),
            F.count("*").alias("n_docs"),
        )
        .orderBy(F.col("n_occurrences").desc(), F.col("tok").asc())
        .limit(k)
    )


def oov_rate(
    df: DataFrame, id_col: str, text_col: str, vocab_k: int = 100
) -> DataFrame:
    """Per-document out-of-vocabulary rate against the corpus top-k
    vocabulary — the standard pre-tokenizer coverage report (decides
    vocab size before a BPE train; rising OOV flags corpus drift).

    Scale shape: the vocabulary head is vocabulary-sized (k rows) and
    BROADCAST; the corpus streams through explode → per-(doc, token)
    counts, which are materialized ONCE and feed BOTH the vocabulary
    head and the per-doc stats (optimization r12 — previously the
    corpus was exploded twice, once inside vocab_topk and once for the
    stats; one pass now does both, identical counts). Zero-token docs
    report rate 0.0 via the left join back to ids (degenerate rows, no
    second corpus scan of text).
    """
    from hours_api_clickup_spark.datapipe.dedup import spread

    toks = spread(df).select(
        F.col(id_col).alias("did"), F.explode(tokens(text_col)).alias("tok")
    )
    pd_counts = (
        toks.groupBy("tok", "did")
        .agg(F.count("*").alias("c"))
        .localCheckpoint(eager=True)
    )
    # same head as vocab_topk: order by total occurrences desc, token asc
    vocab = (
        pd_counts.groupBy("tok")
        .agg(F.sum("c").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), F.col("tok").asc())
        .limit(vocab_k)
        .select("tok")
    )
    stats = (
        pd_counts.join(
            F.broadcast(vocab.withColumn("__in_vocab", F.lit(1))),
            "tok",
            "left",
        )
        .groupBy("did")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.sum(
                F.when(F.col("__in_vocab").isNull(), F.col("c")).otherwise(0)
            ).alias("n_oov"),
        )
    )
    return (
        df.select(F.col(id_col).alias("did"))
        .join(stats, "did", "left")
        .select(
            F.col("did").alias(id_col),
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce("n_oov", F.lit(0)).alias("n_oov"),
            F.coalesce(
                F.col("n_oov").cast("double") / F.col("n_tokens").cast("double"),
                F.lit(0.0),
            ).alias("oov_rate"),
        )
    )


def oov_rate_oracle_sql(
    table: str, id_col: str, text_col: str, vocab_k: int = 100
) -> str:
    """DuckDB twin of ``oov_rate`` (same vocabulary head, same counts)."""
    return f"""
    WITH toks AS (
        SELECT {id_col} AS did,
               unnest(CASE WHEN length(trim({text_col})) > 0
                           THEN string_split_regex(trim({text_col}), '[ \\t\\n\\x0B\\f\\r]+')
                           ELSE [] END) AS tok
        FROM {table}
    ),
    pd AS (SELECT tok, did, COUNT(*) AS c FROM toks GROUP BY tok, did),
    vocab AS (
        SELECT tok FROM (
            SELECT tok, SUM(c) AS n FROM pd GROUP BY tok
            ORDER BY n DESC, tok LIMIT {vocab_k}
        )
    ),
    stats AS (
        SELECT did,
               COUNT(*) AS n_tokens,
               SUM(CASE WHEN v.tok IS NULL THEN 1 ELSE 0 END) AS n_oov
        FROM toks LEFT JOIN vocab v USING (tok)
        GROUP BY did
    )
    SELECT b.{id_col},
           CAST(COALESCE(s.n_tokens, 0) AS BIGINT) AS n_tokens,
           CAST(COALESCE(s.n_oov, 0) AS BIGINT) AS n_oov,
           COALESCE(CAST(s.n_oov AS DOUBLE) / CAST(s.n_tokens AS DOUBLE), 0.0)
               AS oov_rate
    FROM {table} b LEFT JOIN stats s ON s.did = b.{id_col}
    """


def tfidf_topk(
    df: DataFrame, id_col: str, text_col: str, k: int = 5
) -> DataFrame:
    """Top-k characteristic tokens per document by TF-IDF.

    The score is the linear-idf variant tf · N / df (not tf · ln(N/df)):
    IEEE multiplication and division are correctly rounded, so the score
    is bit-identical in any engine, whereas ``ln`` is only 1-ulp-accurate
    and differs between JVM Math.log and C libm — the ln variant cannot
    be hash-match verified. Monotone in df for fixed tf either way, so
    rankings agree except across (tf, df) crossovers.

    Scale shape: explode → groupBy(doc, token) tf [partial agg] →
    groupBy(token) df [partial agg, vocabulary-sized result] → broadcast
    the corpus doc count (one-row agg, no driver action) → join tf with
    df on token (vocabulary join, AQE-broadcast when the vocab is
    small) → per-doc top-k window, which compiles to WindowGroupLimit
    (rank pushdown) so each partition keeps only k rows per doc before
    the shuffle. Ties break toward the lexicographically smaller token.
    """
    from hours_api_clickup_spark.datapipe.dedup import spread

    from pyspark.sql import Window

    toks = spread(df).select(
        F.col(id_col).alias("did"), F.explode(tokens(text_col)).alias("tok")
    )
    # materialize tf ONCE (optimization r12): tf feeds both the scored
    # join and dfreq — without the checkpoint the explode+aggregate
    # subtree executes twice (AQE's stage cache reused only one of the
    # duplicated exchanges at runtime; measured two corpus passes).
    # At 100 TB tf is the (doc, term) matrix a TF-IDF job materializes
    # anyway; recomputing it per consumer is the costlier trade.
    tf = (
        toks.groupBy("did", "tok")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=True)
    )
    dfreq = tf.groupBy("tok").agg(F.count("*").alias("df"))
    n_docs = df.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfreq, "tok")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.col("tf").cast("double")
            * F.col("n_docs").cast("double")
            / F.col("df").cast("double"),
        )
    )
    w = Window.partitionBy("did").orderBy(
        F.col("tfidf").desc(), F.col("tok").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            F.col("did").alias(id_col),
            "tok",
            "tf",
            "df",
            "tfidf",
            F.col("rn").cast("long").alias("rn"),
        )
    )


def tfidf_topk_oracle_sql(
    table: str, id_col: str, text_col: str, k: int = 5
) -> str:
    """DuckDB twin of ``tfidf_topk`` (same tokens, same linear-idf
    arithmetic, same tie-break)."""
    return f"""
    WITH toks AS (
        SELECT {id_col} AS did,
               unnest(CASE WHEN length(trim({text_col})) > 0
                           THEN string_split_regex(trim({text_col}), '[ \\t\\n\\x0B\\f\\r]+')
                           ELSE [] END) AS tok
        FROM {table}
    ),
    tf AS (SELECT did, tok, COUNT(*) AS tf FROM toks GROUP BY did, tok),
    dfreq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
    nd AS (SELECT COUNT(*) AS n_docs FROM {table}),
    scored AS (
        SELECT tf.did, tf.tok,
               CAST(tf.tf AS BIGINT) AS tf,
               CAST(dfreq.df AS BIGINT) AS df,
               CAST(tf.tf AS DOUBLE) * CAST(nd.n_docs AS DOUBLE)
                   / CAST(dfreq.df AS DOUBLE) AS tfidf
        FROM tf JOIN dfreq USING (tok), nd
    )
    SELECT {id_col}, tok, tf, df, tfidf, rn FROM (
        SELECT did AS {id_col}, tok, tf, df, tfidf,
               CAST(row_number() OVER (
                   PARTITION BY did ORDER BY tfidf DESC, tok
               ) AS BIGINT) AS rn
        FROM scored
    ) WHERE rn <= {k}
    """


def bpe_merge_pairs(
    df: DataFrame, id_col: str, text_col: str, k: int = 20
) -> DataFrame:
    """One iteration of BPE merge-candidate counting at corpus scale
    (Sennrich, Haddow & Birch 2016, "Neural Machine Translation of Rare
    Words with Subword Units" §3.2): the top-k most frequent adjacent
    symbol pairs, weighted by word frequency.

    The scale move is the order of operations: reduce the corpus to the
    (word, frequency) VOCABULARY first — one map-side-combining groupBy
    — and only then explode each distinct word into its |w|−1 adjacent
    pairs. Pair counting is O(vocab · word-length), independent of how
    many times each word repeats across 100 TB; the naive
    pairs-from-every-token form explodes the corpus itself. Iterating
    the full BPE training loop replays this query on the re-segmented
    vocab (driver loop, one job per merge — the standard distributed
    formulation).

    Returns (pair, n_occurrences, n_words), top-k by (count desc,
    pair) — deterministic cut, TakeOrderedAndProject plan."""
    words = (
        df.select(F.explode(tokens(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("wc"))
        .filter(F.length("w") >= 2)
    )
    pairs = words.select(
        "w",
        "wc",
        F.explode(F.expr("sequence(1, length(w) - 1)")).alias("i"),
    ).select("w", "wc", F.expr("substring(w, i, 2)").alias("pair"))
    return (
        pairs.groupBy("pair")
        .agg(
            F.sum("wc").cast("long").alias("n_occurrences"),
            F.countDistinct("w").alias("n_words"),
        )
        .orderBy(F.col("n_occurrences").desc(), F.col("pair").asc())
        .limit(k)
    )


def bpe_merge_pairs_oracle_sql(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 20,
) -> str:
    """DuckDB twin of ``bpe_merge_pairs`` (same explicit whitespace
    class, same vocab-first reduction, same deterministic cut)."""
    return f"""
    WITH toks AS (
        SELECT unnest(string_split_regex(trim({text_col}), '[ \\t\\n\\x0B\\f\\r]+')) AS w
        FROM {table} WHERE length(trim({text_col})) > 0
    ),
    words AS (
        SELECT w, COUNT(*) AS wc FROM toks WHERE length(w) >= 2 GROUP BY w
    ),
    pairs AS (
        SELECT substr(w, i, 2) AS pair, w, wc FROM (
            SELECT w, wc, unnest(range(1, length(w))) AS i FROM words
        )
    )
    SELECT pair,
           CAST(SUM(wc) AS BIGINT) AS n_occurrences,
           COUNT(DISTINCT w) AS n_words
    FROM pairs GROUP BY pair
    ORDER BY n_occurrences DESC, pair
    LIMIT {k}
    """


def corpus_drift_topk(
    df_a: DataFrame,
    df_b: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 20,
) -> DataFrame:
    """Distribution drift between two corpus snapshots: each token's
    unigram probability in snapshot A and B and the absolute difference
    — its contribution to the total-variation distance — top-k by
    drift. The monitor a training-data pipeline runs between crawl
    snapshots before retraining (a rising drift head = the corpus mix
    changed; compare doc_oov_rate, which flags NEW tokens only).

    Scale shape: per side, one explode + one map-side-combining
    groupBy(token) — O(corpus) with one shuffle each; the side totals
    are single-row aggregates collected to the driver (two bounded
    scalar collects) and embedded as literals, so probabilities need no
    join or global window; the union vocab is one full-outer join on
    token; the cut is TakeOrderedAndProject. Hash-match determinism:
    probabilities and drift use only IEEE division/subtraction/abs of
    identical inputs — no transcendentals (ln-based KL/JS would NOT
    hash-match across engines; TV carries the same signal for a
    monitor's purposes and stays engine-exact).
    """
    from hours_api_clickup_spark.datapipe.dedup import spread

    def side_counts(df: DataFrame, alias: str) -> DataFrame:
        return (
            spread(df)
            .select(F.explode(tokens(text_col)).alias("token"))
            .groupBy("token")
            .agg(F.count("*").alias(alias))
        )

    # vocabulary-sized: materialize each side ONCE (optimization r12) —
    # the scalar-total .head() and the full-outer join below used to
    # re-execute the whole explode+aggregate subtree per consumer
    # (2 corpus passes per side; at 100 TB the checkpoint is a
    # vocab-sized spill, the recompute is a corpus scan)
    ca = side_counts(df_a, "cnt_a").localCheckpoint(eager=True)
    cb = side_counts(df_b, "cnt_b").localCheckpoint(eager=True)
    tot_a = float(ca.agg(F.sum("cnt_a")).head()[0] or 0)
    tot_b = float(cb.agg(F.sum("cnt_b")).head()[0] or 0)
    if tot_a == 0.0 or tot_b == 0.0:
        # An empty (or zero-token) snapshot would make cnt/0.0 yield
        # NaN/Infinity rows that sort to the top-k silently (advice r6);
        # fail loudly like add_lsh_signatures does on empty input.
        raise ValueError(
            "corpus_drift_topk: a snapshot has zero tokens "
            f"(tot_a={tot_a:.0f}, tot_b={tot_b:.0f}) — drift is undefined"
        )
    joined = ca.join(cb, "token", "full_outer").select(
        "token",
        F.coalesce("cnt_a", F.lit(0)).cast("bigint").alias("cnt_a"),
        F.coalesce("cnt_b", F.lit(0)).cast("bigint").alias("cnt_b"),
    )
    p_a = F.col("cnt_a").cast("double") / F.lit(tot_a)
    p_b = F.col("cnt_b").cast("double") / F.lit(tot_b)
    return (
        joined.select(
            "token",
            "cnt_a",
            "cnt_b",
            p_a.alias("p_a"),
            p_b.alias("p_b"),
            F.abs(p_a - p_b).alias("drift"),
        )
        .orderBy(F.col("drift").desc(), F.col("token").asc())
        .limit(k)
    )
