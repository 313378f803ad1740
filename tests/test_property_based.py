"""Property-based tests (hypothesis): the safe-cast column functions
must match a Python reference implementation of the reference repo's
semantics (fetch_clickup_data.py:783-801) on arbitrary strings, and the
merge algebra must satisfy its invariants on arbitrary populations.

Strategy batches: hypothesis generates a whole batch of inputs per
example and one Spark job evaluates them vectorized — keeps example
count high without per-example job overhead.
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hours_api_clickup_spark.functions.casts import safe_bool, safe_float, safe_int

# ---------------------------------------------------------------------------
# Python reference implementations (mirroring fetch_clickup_data.py:783-801)
# ---------------------------------------------------------------------------


def ref_safe_bool(v: str | None) -> bool:
    if v is None:
        return False
    s = v.strip().lower()
    if s in ("true", "1", "yes", "on"):
        return True
    try:
        f = float(s)
        if math.isnan(f):
            return False
        return f != 0.0
    except (ValueError, OverflowError):
        return False


def ref_safe_int(v: str | None):
    if v is None:
        return None
    try:
        f = float(v)
    except (ValueError, OverflowError):
        return None
    if math.isnan(f) or math.isinf(f):
        return None
    if not (-(2**63) <= f < 2**63):
        return None
    return int(f)  # truncates toward zero


def ref_safe_float(v: str | None, default):
    if v is None:
        return default
    try:
        f = float(v)
    except (ValueError, OverflowError):
        return default
    return f


# strings that stress the parse paths: numerics, truthy words, junk,
# whitespace, signs, inf/nan spellings
_value_st = st.one_of(
    st.none(),
    st.sampled_from(
        ["true", "TRUE", " yes ", "on", "1", "0", "false", "off", "no", ""]
    ),
    st.integers(-(10**12), 10**12).map(str),
    st.floats(
        allow_nan=False, allow_infinity=False, width=32
    ).map(lambda f: repr(float(f))),
    st.text(
        alphabet="0123456789.eE+- xyz", min_size=0, max_size=12
    ),
)


def test_safe_bool_trims_padded_truthy_words(spark):
    """Pin the DOCUMENTED deviation (VERDICT r9 nit): the truthy-string
    test runs after trim, so ``' true'`` → True here where the
    reference's un-stripped ``.lower()`` comparison yields False
    (fetch_clickup_data.py:788). Padded booleans are wire noise, not a
    different value — trimming is the deliberate choice."""
    rows = spark.createDataFrame(
        [(0, " true"), (1, "true "), (2, " YES "), (3, " x")],
        "i long, v string",
    ).select("i", safe_bool(F.col("v")).alias("b")).collect()
    got = {r["i"]: r["b"] for r in rows}
    assert got == {0: True, 1: True, 2: True, 3: False}


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(_value_st, min_size=1, max_size=80))
def test_safe_casts_match_reference(spark, values):
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(values)], "i long, v string"
    ).repartition(4)
    out = {
        r["i"]: r
        for r in df.select(
            "i",
            safe_bool(F.col("v")).alias("b"),
            safe_int(F.col("v")).alias("n"),
            safe_float(F.col("v"), default=0.0).alias("f0"),
        ).collect()
    }
    for i, v in enumerate(values):
        r = out[i]
        assert r["b"] == ref_safe_bool(v), (v, r["b"])
        exp_i = ref_safe_int(v)
        # Spark double→long saturates at Long.MIN/MAX where Python would
        # overflow; the reference never sees >2^63 magnitudes, so only
        # compare in the safe range (ref_safe_int already nulls those)
        assert r["n"] == exp_i, (v, r["n"], exp_i)
        exp_f = ref_safe_float(v, 0.0)
        if math.isnan(exp_f) if isinstance(exp_f, float) else False:
            assert math.isnan(r["f0"])
        else:
            assert r["f0"] == exp_f, (v, r["f0"], exp_f)


# ---------------------------------------------------------------------------
# Merge algebra invariants on generated populations
# ---------------------------------------------------------------------------


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    fact_rows=st.lists(
        st.tuples(
            st.integers(0, 30),  # id
            st.integers(0, 100),  # day offset (window = day >= 50)
            st.integers(0, 5),  # payload
        ),
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    stg_rows=st.lists(
        st.tuples(
            st.integers(0, 30), st.integers(0, 100), st.integers(6, 9)
        ),
        max_size=40,
        unique_by=lambda t: t[0],
    ),
)
def test_merge_refresh_algebra_properties(spark, fact_rows, stg_rows):
    from hours_api_clickup_spark.operators.merge import merge_refresh

    fact = spark.createDataFrame(
        fact_rows or [(999, 0, 0)], ["id", "day", "v"]
    )
    stg = spark.createDataFrame(stg_rows or [(998, 0, 6)], ["id", "day", "v"])
    w = F.col("day") >= 50
    out = {(r["id"], r["day"], r["v"]) for r in merge_refresh(fact, stg, w).collect()}

    fact_d = {t[0]: t for t in (fact_rows or [(999, 0, 0)])}
    stg_d = {t[0]: t for t in (stg_rows or [(998, 0, 6)])}
    expected = set()
    for i, t in stg_d.items():
        if t[1] >= 50:  # staging-in-window rows always land
            expected.add(t)
    for i, t in fact_d.items():
        in_window = t[1] >= 50
        stg_in_window = i in stg_d and stg_d[i][1] >= 50
        if not in_window and not stg_in_window:
            expected.add(t)  # out-of-window history survives
        # in-window fact rows: replaced if staged-in-window, else deleted
    assert out == expected

    # unique on id
    ids = [t[0] for t in out]
    assert len(ids) == len(set(ids))


# ---------------------------------------------------------------------------
# Engine-portable hash primitives: the Spark column expressions must match
# plain-Python reference implementations (the same ones the generated
# DuckDB oracles encode), on arbitrary strings.
# ---------------------------------------------------------------------------


def ref_md5_hash32(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def ref_gram_hash(gram: str) -> int:
    h = 0
    for ch in gram:
        h = (h * 131 + ord(ch)) % 2**31
    return h


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=30,
    )
)
def test_md5_hash32_matches_python(spark, values):
    from hours_api_clickup_spark.functions.hashing import md5_hash32

    df = spark.createDataFrame([(v,) for v in values], ["s"])
    got = {
        r["s"]: r["h"]
        for r in df.select("s", md5_hash32("s").alias("h")).collect()
    }
    for v in set(values):
        assert got[v] == ref_md5_hash32(v), v


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=126),
            min_size=5,
            max_size=60,
        ),
        min_size=1,
        max_size=20,
    )
)
def test_portable_gram_hash_matches_python(spark, values):
    from hours_api_clickup_spark.datapipe.dedup import portable_gram_hash

    k = 5
    df = spark.createDataFrame([(v,) for v in values], ["txt"])
    grams = df.select(
        "txt",
        F.explode(F.sequence(F.lit(0), F.length("txt") - k)).alias("i"),
    ).select(
        "txt", "i", portable_gram_hash(F.col("txt"), F.col("i"), k).alias("h")
    )
    for r in grams.collect():
        assert r["h"] == ref_gram_hash(r["txt"][r["i"] : r["i"] + k])


def test_affine_constants_are_valid_and_stable():
    from hours_api_clickup_spark.datapipe.dedup import (
        MINHASH_SALT,
        SIMHASH_SALT,
        affine_constants,
    )

    a64 = affine_constants(64, MINHASH_SALT)
    b64 = affine_constants(64, SIMHASH_SALT)
    assert a64 == affine_constants(64, MINHASH_SALT)  # deterministic
    assert a64 != b64  # salts decorrelate the streams
    for a, b in a64 + b64:
        assert 0 < a < 2**31 and a % 2 == 1  # odd multiplier in range
        assert 0 <= b < 2**31
    # int64 safety of (a·h + b) for the largest hash domain (md5_hash32)
    amax = max(a for a, _ in a64 + b64)
    assert amax * (2**32 - 1) + 2**31 < 2**63


# ---------------------------------------------------------------------------
# Curation-family invariants
# ---------------------------------------------------------------------------


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    lengths=st.lists(st.integers(min_value=0, max_value=300), min_size=1, max_size=24)
)
def test_chunking_covers_every_token_with_exact_overlap(spark, lengths):
    """For arbitrary document lengths: chunks tile the token stream with
    stride = chunk - overlap, cover every token, and the final chunk
    ends exactly at the document end."""
    from hours_api_clickup_spark.datapipe.curation import chunk_documents

    chunk, overlap = 64, 16
    stride = chunk - overlap
    rows = [(i, " ".join(f"w{j}" for j in range(n))) for i, n in enumerate(lengths)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, "doc_id", "text", chunk, overlap).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for i, n in enumerate(lengths):
        chunks = sorted(by_doc.get(i, []), key=lambda r: r.chunk_id)
        if n == 0:
            assert not chunks
            continue
        assert [r.chunk_id for r in chunks] == list(range(len(chunks)))
        starts = [c * stride for c in range(len(chunks))]
        ends = [min(s + chunk, n) for s in starts]
        assert [r.n_chunk_tokens for r in chunks] == [e - s for s, e in zip(starts, ends)]
        assert ends[-1] == n  # last chunk reaches the end: full coverage
        if len(chunks) > 1:
            assert all(e - s == chunk for s, e in zip(starts[:-1], ends[:-1]))


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    ids=st.sets(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=200),
    epochs=st.integers(min_value=1, max_value=3),
    shards=st.integers(min_value=1, max_value=8),
)
def test_epoch_shuffle_partitions_ids_exactly(spark, ids, epochs, shards):
    """Every id appears exactly once per epoch; positions are dense
    1..len(shard) within every (epoch, shard)."""
    from hours_api_clickup_spark.datapipe.curation import epoch_shuffle

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    out = epoch_shuffle(df, "doc_id", epochs=epochs, n_shards=shards).collect()
    assert len(out) == len(ids) * epochs
    for e in range(epochs):
        rows = [r for r in out if r.epoch == e]
        assert sorted(r.doc_id for r in rows) == sorted(ids)
        for s in range(shards):
            ps = sorted(r.pos for r in rows if r.shard == s)
            assert ps == list(range(1, len(ps) + 1))


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["alpha", "beta", "gamma", "delta"]),
            min_size=0,
            max_size=30,
        ),
        min_size=1,
        max_size=16,
    )
)
def test_repetition_stats_matches_python_reference(spark, texts):
    """dup/top fractions agree with a direct Python computation on
    arbitrary token streams (includes empty docs)."""
    from collections import Counter

    from hours_api_clickup_spark.datapipe.curation import repetition_stats

    df = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in repetition_stats(df, "doc_id", "text").collect()}
    assert set(got) == set(range(len(texts)))
    for i, toks in enumerate(texts):
        r = got[i]
        assert r.n_tokens == len(toks)
        if not toks:
            assert (r.top_token_frac, r.dup_token_frac, r.dup_bigram_frac) == (
                0.0, 0.0, 0.0,
            ) and not r.keep
            continue
        c1 = Counter(toks)
        assert r.top_token_frac == max(c1.values()) / len(toks)
        assert r.dup_token_frac == (len(toks) - len(c1)) / len(toks)
        bi = [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        exp_bi = (len(bi) - len(set(bi))) / len(bi) if bi else 0.0
        assert r.dup_bigram_frac == exp_bi


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    values=st.lists(
        st.floats(
            min_value=-1e6,
            max_value=1e6,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=60,
    ),
    qs=st.lists(
        st.floats(min_value=0.0, max_value=1.0), min_size=1, max_size=4
    ),
)
def test_exact_quantiles_match_builtin_percentile(spark, values, qs):
    """The two-phase distributed exact quantile must equal Spark's
    single-buffer exact percentile aggregate on arbitrary inputs —
    including duplicates, negative values, and extreme q."""
    from hours_api_clickup_spark.operators.quantiles import exact_quantiles

    df = spark.createDataFrame([(v,) for v in values], "v double")
    got = exact_quantiles(df, "v", qs).collect()[0]
    exp = df.agg(F.percentile("v", F.lit(qs)).alias("p")).collect()[0]["p"]
    for g, e in zip(got, exp):
        assert g is not None and e is not None
        assert math.isclose(g, e, rel_tol=1e-12, abs_tol=1e-9), (g, e, values, qs)


def _spans_reference(docs: dict[int, list[str]], k: int, min_count: int):
    """Pure-Python reference for duplicated_spans: gram counts over the
    whole corpus, then per-doc merge of overlapping/adjacent positions."""
    from collections import Counter

    gram_counts: Counter = Counter()
    positions: dict[int, list[int]] = {}
    for did, toks in docs.items():
        positions[did] = []
        for i in range(len(toks) - k + 1):
            gram_counts[" ".join(toks[i : i + k])] += 1
    dup = {g for g, c in gram_counts.items() if c >= min_count}
    out = []
    for did, toks in docs.items():
        hits = [
            i + 1  # 1-based
            for i in range(len(toks) - k + 1)
            if " ".join(toks[i : i + k]) in dup
        ]
        span: list[int] = []
        for i in hits:
            if span and i - span[-1] <= k:
                span.append(i)
            else:
                if span:
                    out.append((did, span[0], span[-1] + k - 1, len(span)))
                span = [i]
        if span:
            out.append((did, span[0], span[-1] + k - 1, len(span)))
    return sorted(out)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]), min_size=0, max_size=30
        ),
        min_size=1,
        max_size=12,
    )
)
def test_duplicated_spans_match_reference(spark, token_lists):
    from hours_api_clickup_spark.datapipe.dedup import duplicated_spans

    k = 3
    docs = {i: toks for i, toks in enumerate(token_lists)}
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in docs.items()],
        "doc_id long, text string",
    ).repartition(3)
    got = sorted(
        (r.doc_id, r.start_tok, r.end_tok, r.n_dup_grams)
        for r in duplicated_spans(df, "doc_id", "text", k=k).collect()
    )
    assert got == _spans_reference(docs, k, 2)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),  # key
            st.integers(min_value=0, max_value=400_000),  # ts seconds
            st.integers(min_value=0, max_value=50),  # value
        ),
        min_size=1,
        max_size=40,
        unique_by=lambda t: (t[0], t[1]),  # unique (key, ts): total order
    )
)
def test_gapfill_locf_matches_reference(spark, rows):
    """Pure-Python gap-fill reference: bucket floor, keep latest obs per
    bucket, dense grid, carry forward."""
    import datetime as dt

    from hours_api_clickup_spark.operators.timeseries import gapfill_locf

    step = 3600
    epoch = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (i, k, epoch + dt.timedelta(seconds=ts), float(v))
            for i, (k, ts, v) in enumerate(rows)
        ],
        "event_id long, user_id long, ts timestamp, value double",
    ).repartition(3)

    base_s = int(epoch.replace(tzinfo=dt.timezone.utc).timestamp())
    by_key: dict[int, dict[int, tuple]] = {}
    for i, (k, ts, v) in enumerate(rows):
        b = base_s + (ts // step) * step
        cur = by_key.setdefault(k, {})
        cand = (ts, float(v), i)
        if b not in cur or cand > cur[b]:
            cur[b] = cand
    want = []
    for k, buckets in by_key.items():
        lo, hi = min(buckets), max(buckets)
        last = None
        for b in range(lo, hi + step, step):
            if b in buckets:
                last = buckets[b][1]
                want.append((k, b, last, False))
            else:
                want.append((k, b, last, True))
    got = sorted(
        (r.user_id, r.bucket_start_s, r.value_filled, r.is_gap)
        for r in gapfill_locf(
            df, "user_id", "ts", "value", step_seconds=step,
            tiebreak="event_id",
        ).collect()
    )
    assert got == sorted(want)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.lists(
            st.floats(
                min_value=-1.0,
                max_value=1.0,
                allow_nan=False,
                allow_infinity=False,
                width=32,
            ),
            min_size=6,
            max_size=6,
        ).filter(lambda v: sum(x * x for x in v) > 1e-6),
        min_size=4,
        max_size=30,
    )
)
def test_semantic_dedup_matches_numpy_reference(spark, vectors):
    """semantic_dedup ≡ a direct numpy SemDeDup: same seed quantizer,
    argmax-cosine assignment (lowest-index tie-break), and lower-id
    within-cluster pruning rule."""
    import numpy as np

    from hours_api_clickup_spark.datapipe.dedup import KNUTH_A, M31
    from hours_api_clickup_spark.datapipe.similarity import semantic_dedup

    M32 = 2**32
    n_clusters, threshold = min(4, len(vectors)), 0.9
    df = spark.createDataFrame(
        list(enumerate(vectors)), "vec_id long, embedding array<double>"
    ).repartition(3)

    ids = list(range(len(vectors)))
    order = sorted(ids, key=lambda i: (((i % M31) * KNUTH_A) % M32, i))
    x = np.array(vectors, dtype=np.float64)
    xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-12)
    cents = xn[order[:n_clusters]]
    assign = np.argmax(xn @ cents.T, axis=1)  # ties → lowest index
    sims = xn @ xn.T
    want = {
        i: (
            int(assign[i]),
            any(
                assign[j] == assign[i] and sims[i, j] >= threshold
                for j in ids
                if j < i
            ),
        )
        for i in ids
    }
    got = {
        r.vec_id: (r.cluster_id, r.semantic_dup)
        for r in semantic_dedup(
            df, "embedding", "vec_id", n_clusters=n_clusters,
            threshold=threshold,
        ).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# SCD2 compact vs a pure-Python reference on random observation logs
# ---------------------------------------------------------------------------


def _scd2_reference(rows):
    """rows: (key, attr, eff, tie) → {(key, attr, vf, vt, is_current)}"""
    from collections import defaultdict

    by_key = defaultdict(list)
    for k, a, eff, tie in rows:
        by_key[k].append((eff, tie, a))
    out = set()
    for k, obs in by_key.items():
        obs.sort()
        segs = []
        prev = object()
        for eff, tie, a in obs:
            if a != prev:
                segs.append([a, eff])
                prev = a
        for i, (a, vf) in enumerate(segs):
            vt = segs[i + 1][1] if i + 1 < len(segs) else None
            out.add((k, a, vf, vt, vt is None))
    return out


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 4),          # key
            st.sampled_from("ABC"),     # attribute value
            st.integers(0, 20),         # effective time
        ),
        min_size=1,
        max_size=60,
    )
)
def test_scd2_compact_matches_reference(spark, raw):
    from hours_api_clickup_spark.operators.scd import scd2_compact

    rows = [(k, a, eff, i) for i, (k, a, eff) in enumerate(raw)]
    df = spark.createDataFrame(rows, "k long, a string, eff long, tie long")
    got = {
        (r["k"], r["a"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in scd2_compact(df, ["k"], ["a"], "eff", ["tie"]).collect()
    }
    assert got == _scd2_reference(rows)


# ---------------------------------------------------------------------------
# PQ encode: partitioning-invariant and equal to a direct numpy reference
# ---------------------------------------------------------------------------


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.integers(0, 2**31 - 1))
def test_pq_encode_partition_invariant_and_matches_numpy(spark, seed):
    import numpy as np

    from hours_api_clickup_spark.datapipe.similarity import (
        pq_encode,
        pq_seed_codebooks,
    )

    rng = np.random.RandomState(seed % 2**31)
    n, dim = 40, 16
    vecs = rng.randn(n, dim).astype("float32")
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vid long, embedding array<float>")
    cb = pq_seed_codebooks(df, "embedding", "vid", n_subspaces=4, n_codes=8)

    def codes_of(frame):
        return {
            r["vid"]: tuple(r["codes"])
            for r in pq_encode(frame, "embedding", "vid", cb).collect()
        }

    c1 = codes_of(df.repartition(1))
    c32 = codes_of(df.repartition(32))
    assert c1 == c32  # partitioning must not change codes

    # direct numpy argmin reference (same left-assoc accumulation)
    x = vecs.astype("float64")
    sub = dim // 4
    for i in range(n):
        for m in range(4):
            dists = []
            for j in range(8):
                d = 0.0
                for t in range(sub):
                    diff = x[i, m * sub + t] - cb[m, j, t]
                    d = d + diff * diff
                dists.append(d)
            expect = min(range(8), key=lambda jj: (dists[jj], jj))
            assert c1[i][m] == expect


# ---------------------------------------------------------------------------
# Drift report: exact TVD equals a numpy reference computed in rationals
# ---------------------------------------------------------------------------


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(st.integers(0, 19), min_size=2, max_size=100),
    st.lists(st.integers(0, 19), min_size=2, max_size=100),
)
def test_exact_tvd_arithmetic_matches_fractions(spark, ref_bins, cur_bins):
    """The integer TVD numerator used by drift_distribution_report,
    recomputed with exact Fractions: |n_r·N_c − n_c·N_r| summed then
    divided by 2·N_r·N_c must equal ½·Σ|p_r − p_c| exactly."""
    from collections import Counter
    from fractions import Fraction

    cr, cc = Counter(ref_bins), Counter(cur_bins)
    nr, nc = len(ref_bins), len(cur_bins)
    bins = set(cr) | set(cc)
    num = sum(abs(cr[b] * nc - cc[b] * nr) for b in bins)
    got = Fraction(num, 2 * nr * nc)
    expect = sum(
        abs(Fraction(cr[b], nr) - Fraction(cc[b], nc)) for b in bins
    ) / 2
    assert got == expect


@settings(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    host=st.from_regex(r"[A-Za-z][A-Za-z0-9-]{0,10}", fullmatch=True),
    www=st.booleans(),
    scheme=st.sampled_from(["http", "https"]),
    path=st.lists(
        st.from_regex(r"[A-Za-z0-9]{1,6}", fullmatch=True),
        min_size=0,
        max_size=3,
    ),
    trailing=st.booleans(),
    params=st.lists(
        st.tuples(
            st.sampled_from(
                ["utm_source", "utm_campaign", "ref", "id", "q", "page"]
            ),
            st.from_regex(r"[A-Za-z0-9]{0,5}", fullmatch=True),
        ),
        min_size=0,
        max_size=4,
    ),
    fragment=st.booleans(),
)
def test_canonicalize_url_properties(
    spark, host, www, scheme, path, trailing, params, fragment
):
    """Canonicalization is IDEMPOTENT (a canonical URL canonicalizes to
    itself), scheme/www/fragment/trailing-slash-insensitive, and keeps
    exactly the non-tracking query params."""
    from hours_api_clickup_spark.datapipe.curation import canonicalize_url

    url = f"{scheme}://{'www.' if www else ''}{host}.com"
    url += "".join("/" + p for p in path)
    if trailing and path:
        url += "/"
    if params:
        url += "?" + "&".join(f"{k}={v}" for k, v in params)
    if fragment:
        url += "#frag"

    variant = url.replace("http://", "https://", 1).replace(
        "://www.", "://", 1
    )

    df = spark.createDataFrame(
        [(url,), (variant,)], "u string"
    ).select(canonicalize_url("u").alias("c"))
    c1, c2 = [r["c"] for r in df.collect()]
    # scheme/www-insensitive
    assert c1 == c2, (url, variant, c1, c2)
    # idempotent: re-canonicalizing the canonical form is a no-op
    # (feed it back with a scheme so the host regex anchors identically)
    df2 = spark.createDataFrame([("https://" + c1,)], "u string").select(
        canonicalize_url("u").alias("c")
    )
    assert df2.collect()[0]["c"] == c1, (url, c1)
    # no fragment, no tracking params survive; real params do
    assert "#" not in c1
    assert "utm_" not in c1 and "ref=" not in c1
    kept = [f"{k}={v}" for k, v in params if k not in ("utm_source", "utm_campaign", "ref")]
    for kv in kept:
        assert kv in c1, (url, c1, kv)


@settings(max_examples=200, deadline=None)
@given(
    n_rows=st.integers(min_value=0, max_value=257),
    page_size=st.integers(min_value=1, max_value=64),
    policy_short=st.booleans(),
)
def test_pagination_reads_everything_exactly_once(
    n_rows, page_size, policy_short
):
    """Both termination policies must read every row exactly once for
    ANY (row count, page size) — incl. the empty feed, a single short
    page, and totals landing exactly on a page boundary (where the
    empty-page policy issues one extra probe and the short-page policy
    does not)."""
    from hours_api_clickup_spark.sources.pagination import (
        PagePolicy,
        collect_all_pages,
    )

    rows = list(range(n_rows))
    calls = []

    def fetch_page(page: int) -> list:
        calls.append(page)
        start = page * page_size
        return rows[start : start + page_size]

    policy = (
        PagePolicy.SHORT_PAGE if policy_short else PagePolicy.EMPTY_PAGE
    )
    got = collect_all_pages(fetch_page, policy, page_size)
    assert got == rows
    # request accounting: the policies differ exactly when the feed
    # ends in a SHORT page — empty-page probes past it, short-page
    # stops on it; after a FULL last page both must probe once more
    full, rem = divmod(n_rows, page_size)
    non_empty = full + (1 if rem else 0)
    if n_rows == 0:
        expected_calls = 1
    elif policy is PagePolicy.SHORT_PAGE and rem:
        expected_calls = non_empty
    else:
        expected_calls = non_empty + 1
    assert len(calls) == expected_calls, (n_rows, page_size, policy, calls)


# ---------------------------------------------------------------------------
# Warehouse-SQL MERGE twin: the portable DELETE+INSERT transaction
# (sinks/warehouse.py) must satisfy the same §4.3 case analysis as the
# Spark merge on arbitrary populations — pure DuckDB, no Spark session,
# so this runs many examples cheaply. NULL dates are generated too: the
# windowed delete must never purge null-dated history.
# ---------------------------------------------------------------------------


@settings(max_examples=60, deadline=None)
@given(
    fact_rows=st.lists(
        st.tuples(
            st.integers(0, 30),  # id
            st.one_of(st.none(), st.integers(0, 100)),  # day offset or NULL
            st.integers(0, 5),  # payload
        ),
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    stg_rows=st.lists(
        st.tuples(
            st.integers(0, 30),
            st.one_of(st.none(), st.integers(0, 100)),
            st.integers(6, 9),
        ),
        max_size=40,
        unique_by=lambda t: t[0],
    ),
)
def test_warehouse_refresh_transaction_algebra(fact_rows, stg_rows):
    import datetime as dt

    import duckdb

    from hours_api_clickup_spark.sinks.warehouse import (
        apply_statements,
        merge_refresh_statements,
    )

    base = dt.date(2024, 1, 1)
    day = lambda d: None if d is None else base + dt.timedelta(days=d)
    lo, hi = day(50), day(100)  # window = day in [50, 100]

    con = duckdb.connect()
    con.execute("CREATE TABLE f (id INT, start_date_oslo DATE, v INT)")
    con.execute("CREATE TABLE s (id INT, start_date_oslo DATE, v INT)")
    if not fact_rows:
        fact_rows = [(999, 0, 0)]
    con.executemany(
        "INSERT INTO f VALUES (?, ?, ?)",
        [(i, day(d), v) for i, d, v in fact_rows],
    )
    if stg_rows:
        con.executemany(
            "INSERT INTO s VALUES (?, ?, ?)",
            [(i, day(d), v) for i, d, v in stg_rows],
        )

    apply_statements(
        con,
        merge_refresh_statements(
            "f", "s", lo, hi, key="id",
            columns=("id", "start_date_oslo", "v"),
        ),
    )
    got = set(map(tuple, con.sql("SELECT * FROM f").fetchall()))
    con.close()

    in_w = lambda d: d is not None and 50 <= d <= 100
    fact_d = {t[0]: t for t in fact_rows}
    stg_d = {t[0]: t for t in stg_rows}
    expected = set()
    for i, t in stg_d.items():
        if in_w(t[1]):
            expected.add((i, day(t[1]), t[2]))
    for i, t in fact_d.items():
        if not in_w(t[1]) and not (i in stg_d and in_w(stg_d[i][1])):
            expected.add((i, day(t[1]), t[2]))
    assert got == expected


# ---------------------------------------------------------------------------
# Codec roundtrips (r6): any small RGB image survives encode→decode
# bit-exactly through both pure-Python codecs, for every width (the BMP
# row-padding cases w%4 ∈ {0,1,2,3} all get generated).
# ---------------------------------------------------------------------------


@given(
    w=st.integers(min_value=1, max_value=9),
    h=st.integers(min_value=1, max_value=7),
    data=st.data(),
)
@settings(max_examples=40, deadline=None)
def test_codec_roundtrip_arbitrary_images(w, h, data):
    import numpy as np

    from hours_api_clickup_spark.datapipe.multimodal import (
        decode_bmp,
        decode_media,
        decode_ppm,
        encode_bmp,
        encode_ppm,
    )

    flat = data.draw(
        st.lists(
            st.integers(min_value=0, max_value=255),
            min_size=w * h * 3,
            max_size=w * h * 3,
        )
    )
    px = np.array(flat, dtype=np.uint8).reshape(h, w, 3)
    assert np.array_equal(decode_bmp(encode_bmp(px)), px)
    assert np.array_equal(decode_ppm(encode_ppm(px)), px)
    # sniffing dispatch agrees with the direct decoders
    assert np.array_equal(decode_media(encode_bmp(px)), px)
    assert np.array_equal(decode_media(encode_ppm(px)), px)


# ---------------------------------------------------------------------------
# Scheduler cron engine (r6): for arbitrary specs and tick times, the
# computed fire time is (1) strictly after the watermark, (2) a wall
# time that matches every cron field, (3) a wall time that exists in
# Europe/Oslo, and (4) the EARLIEST such time — brute-forced at minute
# granularity, which is the property a subtle day-scan bug would break.
# ---------------------------------------------------------------------------


_cron_minutes = st.lists(
    st.integers(min_value=0, max_value=59), min_size=1, max_size=3, unique=True
)
_cron_hours = st.lists(
    st.integers(min_value=0, max_value=23), min_size=1, max_size=3, unique=True
)
_cron_dom = st.one_of(
    st.none(),
    st.lists(st.integers(min_value=1, max_value=28), min_size=1, max_size=3,
             unique=True),
)
_cron_dow = st.one_of(
    st.none(),
    st.lists(st.integers(min_value=0, max_value=6), min_size=1, max_size=2,
             unique=True),
)


@given(
    minutes=_cron_minutes,
    hours=_cron_hours,
    dom=_cron_dom,
    dow=_cron_dow,
    epoch_min=st.integers(min_value=0, max_value=2 * 366 * 24 * 60),
)
@settings(max_examples=60, deadline=None)
def test_next_fire_is_earliest_matching_existing_wall_time(
    minutes, hours, dom, dow, epoch_min
):
    import datetime as dt

    from hours_api_clickup_spark.scheduler import (
        OSLO,
        _exists_in_tz,
        next_fire,
        parse_cron,
    )

    expr = " ".join(
        [
            ",".join(map(str, sorted(minutes))),
            ",".join(map(str, sorted(hours))),
            ",".join(map(str, sorted(dom))) if dom else "*",
            "*",
            ",".join(map(str, sorted(dow))) if dow else "*",
        ]
    )
    spec = parse_cron(expr)
    after = dt.datetime(2026, 1, 1, tzinfo=OSLO) + dt.timedelta(
        minutes=epoch_min
    )
    fire = next_fire(spec, after)
    local = fire.replace(tzinfo=None)
    # (1) strictly after; (2) field match; (3) exists in tz
    assert fire > after
    assert local.minute in minutes and local.hour in hours
    assert spec.matches_day(local.date()), (expr, local)
    assert _exists_in_tz(local, OSLO)
    # (4) earliest: no matching, existing wall minute in (after, fire).
    # Bounded: only brute-force when the gap is small enough to scan.
    gap = fire - after
    if gap <= dt.timedelta(days=2):
        # scan starts one minute after `after`'s Oslo wall time
        cand = after.astimezone(OSLO).replace(
            second=0, microsecond=0, tzinfo=None
        ) + dt.timedelta(minutes=1)
        while cand < local:
            matches = (
                cand.minute in minutes
                and cand.hour in hours
                and spec.matches_day(cand.date())
            )
            assert not (matches and _exists_in_tz(cand, OSLO)), (
                expr, after, cand, local,
            )
            cand += dt.timedelta(minutes=1)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    fact_rows=st.lists(
        st.tuples(
            st.integers(0, 30),  # id
            st.integers(0, 100),  # day offset (window = day >= 50)
            st.integers(0, 3),  # payload — OVERLAPS staging's range so
            # unchanged-in-window keys occur and must emit NO change row
        ),
        max_size=40,
        unique_by=lambda t: t[0],
    ),
    stg_rows=st.lists(
        st.tuples(
            st.integers(0, 30), st.integers(0, 100), st.integers(0, 3)
        ),
        max_size=40,
        unique_by=lambda t: t[0],
    ),
)
def test_merge_changelog_matches_delta_merge_model(spark, fact_rows, stg_rows):
    """Verdict r6 #7: merge_refresh_with_changelog must agree with the
    Delta-style MERGE reference model — whenMatched UPDATE, whenNotMatched
    INSERT, whenNotMatchedBySource + window DELETE — on arbitrary
    populations, and the changelog must name exactly the keys whose
    state changed (unchanged matches emit nothing)."""
    from hours_api_clickup_spark.operators.merge import (
        merge_refresh,
        merge_refresh_with_changelog,
    )

    fact_rows = fact_rows or [(999, 0, 0)]
    stg_rows = stg_rows or [(998, 0, 1)]
    fact = spark.createDataFrame(fact_rows, ["id", "day", "v"])
    stg = spark.createDataFrame(stg_rows, ["id", "day", "v"])
    w = F.col("day") >= 50
    merged, changes = merge_refresh_with_changelog(fact, stg, w, key="id")
    got_rows = {(r["id"], r["day"], r["v"]) for r in merged.collect()}
    got_changes = {(r["id"], r["change"]) for r in changes.collect()}

    # the Delta MERGE model, window-scoped (source := staging-in-window):
    #   whenMatched                 -> UPDATE SET * (target in-window)
    #   whenNotMatched              -> INSERT *
    #   whenNotMatchedBySource AND window(target) -> DELETE
    fact_d = {t[0]: t for t in fact_rows}
    stg_w = {t[0]: t for t in stg_rows if t[1] >= 50}
    want_rows = set(stg_w.values()) | {
        t for i, t in fact_d.items() if t[1] < 50 and i not in stg_w
    }
    # NOTE the subtlety the window algebra adds over vanilla Delta: a
    # fact row OUTSIDE the window whose key IS staged-in-window is
    # replaced (key moved into the window), handled above by the
    # anti-join on stg_w keys.
    assert got_rows == want_rows

    want_changes = set()
    fact_w = {t[0]: t for t in fact_rows if t[1] >= 50}
    for i, t in stg_w.items():
        if i not in fact_w:
            want_changes.add((i, "inserted"))
        elif (fact_w[i][1], fact_w[i][2]) != (t[1], t[2]):
            want_changes.add((i, "updated"))
        # identical (day, v) -> unchanged -> no row
    for i in fact_w:
        if i not in stg_w:
            want_changes.add((i, "deleted"))
    assert got_changes == want_changes

    # the merged side is definitionally merge_refresh — same plan algebra
    plain = {
        (r["id"], r["day"], r["v"]) for r in merge_refresh(fact, stg, w).collect()
    }
    assert got_rows == plain

    # idempotence: a second refresh from the merged state is a no-op
    # (explicit schema: the merged state can be EMPTY — fact entirely
    # in-window with nothing staged — and inference would fail)
    merged2, changes2 = merge_refresh_with_changelog(
        spark.createDataFrame(
            sorted(got_rows), "id bigint, day bigint, v bigint"
        ),
        stg, w, key="id",
    )
    assert changes2.count() == 0
    assert {
        (r["id"], r["day"], r["v"]) for r in merged2.collect()
    } == got_rows


def _union_find_components(ids, edges):
    """Plain-Python min-label union-find oracle (verdict r7 #7):
    attaching the larger root under the smaller keeps every root the
    min id of its component — exactly connected_components' label."""
    parent = {n: n for n in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {n: find(n) for n in ids}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(data=st.data())
def test_connected_components_matches_union_find(spark, data):
    """Adversarial graph shapes (long paths, stars, disconnected
    singletons, self-loops, duplicate + reversed edges) against the
    union-find oracle — near-clique fixtures alone never exercise
    multi-round label propagation (verdict r7 #7)."""
    import pandas as pd

    from hours_api_clickup_spark.datapipe.clusters import (
        connected_components,
    )

    ids = data.draw(
        st.lists(
            st.integers(0, 10**9), min_size=1, max_size=24, unique=True
        )
    )
    n_edges = data.draw(st.integers(min_value=0, max_value=30))
    edges = [
        (
            data.draw(st.sampled_from(ids)),
            data.draw(st.sampled_from(ids)),
        )
        for _ in range(n_edges)
    ]
    # force a long path through ALL drawn ids half the time — the worst
    # diameter this node count allows
    if data.draw(st.booleans()):
        path = sorted(ids, reverse=True)  # min id at the far end
        edges += list(zip(path, path[1:]))

    nodes_df = spark.createDataFrame(pd.DataFrame({"node": ids}))
    edges_df = (
        spark.createDataFrame(
            pd.DataFrame(
                {"id_a": [e[0] for e in edges], "id_b": [e[1] for e in edges]}
            )
        )
        if edges
        else spark.createDataFrame([], "id_a long, id_b long")
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(
            nodes_df, edges_df, "node", max_iter=30
        ).collect()
    }
    assert got == _union_find_components(ids, edges)


def test_connected_components_long_path_and_loud_guard(spark):
    """A 40-node path (diameter 39) converges with an adequate
    max_iter and matches the oracle; an inadequate max_iter fails
    LOUDLY (RuntimeError), never returns half-propagated labels."""
    import pandas as pd

    from hours_api_clickup_spark.datapipe.clusters import (
        connected_components,
    )

    ids = list(range(40))
    path = list(zip(range(39, 0, -1), range(38, -1, -1)))  # 39-38,…,1-0
    nodes_df = spark.createDataFrame(pd.DataFrame({"node": ids}))
    edges_df = spark.createDataFrame(
        pd.DataFrame(
            {"id_a": [u for u, _ in path], "id_b": [v for _, v in path]}
        )
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(
            nodes_df, edges_df, "node", max_iter=64
        ).collect()
    }
    assert got == {n: 0 for n in ids}
    import pytest

    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(nodes_df, edges_df, "node", max_iter=3)
