"""Deterministic sampling & split assignment for dataset curation.

Seeded-random sampling (``df.sample`` / ``sampleBy``) is engine- and
partitioning-dependent: the drawn subset changes under repartition, AQE
re-planning, or an engine swap. Curation pipelines need sampling that is
(a) reproducible across runs AND engines, (b) stable under
repartitioning, and (c) joinable — the same document must land in the
same split everywhere it appears. The standard construction is
multiplicative hashing on the stable id (Knuth, TAOCP vol. 3 §6.4, with
the golden-ratio multiplier 2654435761 = ⌊2³²/φ⌋), thresholded on
cumulative split weights:

    frac(id) = ((id mod 2³¹) · 2654435761) mod 2³² ∈ [0, 2³²)

Pure int64 arithmetic — no overflow under ANSI mode (the product is
bounded by 2³¹·2³² < 2⁶³), and expressible identically in any SQL
engine, so splits computed here agree bit-for-bit with the warehouse.
Thresholds are compared as integers (⌊weight·2³²⌋), never as floats.

The ``mod 2³¹`` pre-reduction means ids that differ by a multiple of
2³¹ share a hash — irrelevant for sampling quality (the reduction is a
uniform re-key), but use a 64-bit-unique id column as input.

Scale shape: every operator here is a pure projection/filter — zero
shuffles at any scale, fully codegen'd, and the split predicate pushes
down to the scan when the id is a partition or clustering column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

KNUTH_A = 2654435761  # ⌊2^32 / golden ratio⌋, Knuth TAOCP vol.3 §6.4
_MOD_31 = 2**31
_MOD_32 = 2**32


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def hash_bucket(id_col: Column | str, seed: int = 0) -> Column:
    """Deterministic bucket in [0, 2³²) from a non-negative integer id.

    ``seed`` decorrelates sampling stages: all operators in this module
    share this one hash, so two stages composed with the SAME seed are
    fully correlated (an 80% hash_sample followed by an 80/10/10
    assign_split would put every surviving row in 'train'). Give each
    independent stage its own seed.

    The seeded form runs a SECOND multiplicative round over the salted
    id — ``(((id + salt) mod 2³¹ · A) mod 2³¹ · A) mod 2³²`` — because a
    purely additive salt would only rotate the unseeded bucket
    (``(x+s)·A ≡ x·A + s·A``), leaving interval-threshold stages fully
    correlated; the extra multiplication shatters any bucket interval
    into ~A scattered segments. Still pure int64 (every product
    < 2³¹·2654435761 < 2⁶³), engine-portable in any SQL dialect, and
    seed=0 reproduces the historical single-round hash exactly (the
    registry oracles depend on that form)."""
    reduced = F.pmod(_c(id_col).cast("long"), F.lit(_MOD_31))
    if seed:
        salt = (seed * 0x9E3779B9) % _MOD_31
        premix = F.pmod(reduced + F.lit(salt), F.lit(_MOD_31))
        reduced = F.pmod(premix * F.lit(KNUTH_A), F.lit(_MOD_31))
    return F.pmod(reduced * F.lit(KNUTH_A), F.lit(_MOD_32))


def _thresholds(weights: list[float]) -> list[int]:
    """Cumulative integer thresholds ⌊cum_weight·2³²⌋ (exact compares)."""
    total = sum(weights)
    cum, out = 0.0, []
    for w in weights:
        cum += w / total
        out.append(min(_MOD_32, int(cum * _MOD_32)))
    out[-1] = _MOD_32  # guard against float shortfall on the last split
    return out


def assign_split(
    id_col: Column | str, splits: list[tuple[str, float]], seed: int = 0
) -> Column:
    """Split-name column from weighted splits, e.g.
    ``[("train", 0.8), ("val", 0.1), ("test", 0.1)]``. Total weights are
    normalized; assignment is deterministic and engine-portable. Use a
    distinct ``seed`` when composing with other sampling stages."""
    bucket = hash_bucket(id_col, seed)
    names = [n for n, _ in splits]
    ths = _thresholds([w for _, w in splits])
    # nested whens built last-split-outward so the lowest matching
    # threshold wins: bucket < th_0 → split 0, else < th_1 → split 1, …
    out = F.lit(names[-1])
    for name, th in zip(names[:-1][::-1], ths[:-1][::-1]):
        out = F.when(bucket < th, name).otherwise(out)
    return out


def hash_sample(
    df: DataFrame, id_col: Column | str, fraction: float, seed: int = 0
) -> DataFrame:
    """Deterministic ~``fraction`` sample: keep rows whose hash bucket
    falls below ⌊fraction·2³²⌋. Stable under repartition; rerunning or
    growing the table never re-draws previously kept rows. Use a
    distinct ``seed`` when composing with other sampling stages."""
    return df.filter(hash_bucket(id_col, seed) < int(fraction * _MOD_32))


def stratified_hash_sample(
    df: DataFrame,
    id_col: Column | str,
    strata_col: Column | str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling (the reproducible form of
    ``sampleBy``): each stratum gets its own keep-threshold. Used for
    language/source rebalancing when mixing training corpora."""
    th = F.lit(int(default_fraction * _MOD_32))
    strata = _c(strata_col)
    for value, frac in sorted(fractions.items()):
        th = F.when(strata == value, int(frac * _MOD_32)).otherwise(th)
    return df.filter(hash_bucket(id_col, seed) < th)


def stratified_topn_rows(
    df: DataFrame,
    id_col: Column | str,
    strata_col: Column | str,
    n_per_stratum: int,
    seed: int = 0,
) -> DataFrame:
    """Exactly-n-per-stratum deterministic sample returning the ROWS
    (``stratified_hash_sample`` keeps a fraction; this keeps a count) —
    the distributed, reproducible replacement for per-group reservoir
    sampling. Rows rank within their stratum by seeded hash bucket
    (ties by id), and rank ≤ n survives, so the drawn set is stable
    under repartitioning and table growth only re-ranks, never re-draws
    arbitrarily.

    Adds ``sample_rank`` (1-based). Scale shape: one shuffle on the
    stratum key; the rank window compiles to WindowGroupLimit, so each
    partition keeps at most n rows per stratum before the exchange —
    the shuffle carries O(strata·n), not the corpus.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(_c(strata_col)).orderBy(
        hash_bucket(id_col, seed).asc(), _c(id_col).asc()
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= n_per_stratum)
    )


def stratified_topn_oracle_sql(
    table: str,
    id_col: str,
    strata_col: str,
    n_per_stratum: int,
    cols: str,
    seed: int = 0,
) -> str:
    """DuckDB twin of ``stratified_topn_rows`` (same hash, same rank,
    same tie-break). ``cols`` is the projected column list."""
    if seed:
        salt = (seed * 0x9E3779B9) % _MOD_31
        reduced = (
            f"((((({id_col} % {_MOD_31}) + {salt}) % {_MOD_31})"
            f" * {KNUTH_A}) % {_MOD_31})"
        )
    else:
        reduced = f"({id_col} % {_MOD_31})"
    bucket = f"(({reduced} * {KNUTH_A}) % {_MOD_32})"
    return f"""
    SELECT {cols}, sample_rank FROM (
        SELECT *, CAST(row_number() OVER (
                   PARTITION BY {strata_col}
                   ORDER BY {bucket}, {id_col}
               ) AS BIGINT) AS sample_rank
        FROM {table}
    ) WHERE sample_rank <= {n_per_stratum}
    """


def weighted_mix(
    df: DataFrame,
    id_col: Column | str,
    strata_col: Column | str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Corpus mixing with per-stratum sampling RATES, where a rate may
    exceed 1 (epoch-weighting: rate 2.5 ⇒ every row appears twice and
    half the rows a third time). Downsampling (rate < 1) filters by the
    hash bucket; upsampling replicates via an exploded copy index — both
    halves deterministic, so the mixed corpus is reproducible row-for-row
    across runs, engines, and repartitioning.

    Adds ``copy_id`` (0-based) distinguishing the replicas — downstream
    shuffling/packing should include it in any dedup key. Scale shape:
    pure projection + explode, zero shuffles; output size is
    Σ_strata rate·|stratum| by construction.
    """
    strata = _c(strata_col)
    base = F.lit(int(default_rate))
    frac_th = F.lit(int((default_rate - int(default_rate)) * _MOD_32))
    for value, rate in sorted(rates.items()):
        base = F.when(strata == value, int(rate)).otherwise(base)
        frac_th = F.when(
            strata == value, int((rate - int(rate)) * _MOD_32)
        ).otherwise(frac_th)
    copies = base + F.when(hash_bucket(id_col, seed) < frac_th, 1).otherwise(0)
    return (
        df.withColumn("__n_copies", copies)
        .filter(F.col("__n_copies") > 0)
        .withColumn(
            "copy_id",
            F.explode(F.sequence(F.lit(0), F.col("__n_copies") - 1)),
        )
        .drop("__n_copies")
    )


def leakage_safe_split(
    df: DataFrame,
    group_col: Column | str,
    splits: list[tuple[str, float]],
    seed: int = 0,
    out_col: str = "split",
) -> DataFrame:
    """Split assignment keyed on a GROUP — the near-dup cluster id
    (datapipe.clusters.resolve_dup_clusters), the canonical URL, or the
    domain — instead of the row id: every member of a group lands in
    the same split, so near-duplicates can never straddle train and
    test. A row-id split leaks: two 0.9-Jaccard copies of one page have
    independent hashes, and one lands in train while the other scores
    the model. Same deterministic Knuth-hash machinery as
    ``assign_split``; group sizes make the weights approximate at the
    margin (a whole cluster moves together — that is the point).

    String group keys (the URL/domain form) fold through the portable
    md5 32-bit hash first: ``hash_bucket`` casts its key to long, and a
    string's cast yields NULL non-ANSI — every ``bucket < th`` was NULL
    and the whens fell through, silently assigning 100%% of rows to the
    LAST split (review r8; regression-tested)."""
    name = group_col if isinstance(group_col, str) else None
    dtype = dict(df.dtypes).get(name) if name else None
    key = _c(group_col)
    if dtype is not None and dtype not in (
        "tinyint", "smallint", "int", "bigint",
    ):
        from hours_api_clickup_spark.functions.hashing import md5_hash32

        key = md5_hash32(key.cast("string"))
    return df.withColumn(out_col, assign_split(key, splits, seed))
