"""Time-series operators: as-of join and gap-based sessionization.

Neither exists in the reference (its data is tiny and BigQuery-side),
but both are core to a time-tracking/event domain at scale and neither
is a Spark built-in — they're the "custom operator expressed as a
composition of DataFrame ops" case (build-spec: as-of join, range join).

- ``as_of_join``: for each left row, the latest right row with
  right_ts ≤ left_ts per key. Implemented with the union+window trick:
  tag both sides, union, one window sorted by (ts, side) per key,
  last-non-null carry-forward. ONE shuffle on the key — never the
  O(n·m) range join a naive ``l.ts >= r.ts`` theta-join would plan.
- ``sessionize``: split each key's event stream into sessions at
  inactivity gaps > ``gap``: lag → gap flag → running sum. Two window
  passes over the same key partitioning (one shuffle; the second window
  reuses the partitioning).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def as_of_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """Left as-of join (the full pandas ``merge_asof`` surface): append
    ``right_cols`` from the NEAREST right row for the same ``on`` key —
    ``direction='backward'`` takes the latest right row with
    ``right_ts <= left_ts``, ``'forward'`` the earliest with
    ``right_ts >= left_ts``; nulls when none exists. With
    ``tolerance_seconds``, a nearest match farther than the tolerance
    counts as no match (all carried columns null) — identical to
    pandas/kdb tolerance semantics because the nearest row is resolved
    FIRST, then gated.

    One shuffle on the key either way (union + directional running
    window) — never the O(n·m) range theta-join."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward: {direction}")
    clash = [c for c in right_cols if c in left.columns]
    if clash:
        # emitting both would produce a duplicate-name schema that every
        # downstream reference trips over (AMBIGUOUS_REFERENCE) and a
        # corrupt parquet write — fail loudly instead (review r6)
        raise ValueError(
            f"right_cols collide with left columns: {clash} — alias the "
            "right side before the as-of join"
        )
    l_tag = left.withColumn("__ts", F.col(left_ts)).withColumn(
        "__side", F.lit(1)
    )
    r_tag = (
        right.select(
            on,
            F.col(right_ts).alias("__ts"),
            *[F.col(c) for c in right_cols],
        )
        .withColumn("__side", F.lit(0))
    )
    for c in left.columns:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    for c in right_cols:
        if c not in l_tag.columns:
            l_tag = l_tag.withColumn(
                c, F.lit(None).cast(dict(r_tag.dtypes)[c])
            )
    unioned = l_tag.unionByName(r_tag.select(*l_tag.columns))
    # right rows sort before left rows at equal ts (side 0 < 1) in BOTH
    # traversal directions, so an exactly-simultaneous right row is
    # visible to the left row (ties are inclusive, as in merge_asof)
    ts_order = (
        F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    )
    w = (
        Window.partitionBy(on)
        .orderBy(ts_order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *[c for c in left.columns],
        "__side",
        F.last(
            F.when(F.col("__side") == 0, F.col("__ts")), ignorenulls=True
        )
        .over(w)
        .alias("__asof_ts"),
        *[
            F.last(
                F.when(F.col("__side") == 0, F.col(c)), ignorenulls=True
            )
            .over(w)
            .alias(f"__asof_{c}")
            for c in right_cols
        ],
    )
    if tolerance_seconds is None:
        within = F.lit(True)
    else:
        gap_ms = F.abs(
            F.unix_millis(F.col(left_ts).cast("timestamp_ltz"))
            - F.unix_millis(F.col("__asof_ts").cast("timestamp_ltz"))
        )
        within = gap_ms <= F.lit(int(tolerance_seconds * 1000))
    return (
        carried.filter(F.col("__side") == 1)
        .select(
            *[c for c in left.columns],
            *[
                F.when(within, F.col(f"__asof_{c}")).alias(c)
                for c in right_cols
            ],
        )
    )


def sessionize(
    df: DataFrame,
    key: str,
    ts: str,
    gap_minutes: float = 30.0,
) -> DataFrame:
    """Append ``session_id`` (per-key counter from 0): a new session
    starts when the gap since the key's previous event exceeds
    ``gap_minutes``."""
    w_order = Window.partitionBy(key).orderBy(F.col(ts).asc())
    # TIMESTAMP_NTZ (tz-less parquet) can't cast straight to long; going
    # through timestamp_ltz is a no-op for regular timestamps and a
    # session-tz (UTC) interpretation for NTZ — matching DuckDB epoch().
    ts_s = F.col(ts).cast("timestamp_ltz").cast("long")
    gap_s = ts_s - F.lag(ts_s).over(w_order)
    new_session = F.when(
        gap_s.isNull() | (gap_s > gap_minutes * 60), 1
    ).otherwise(0)
    w_run = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return df.withColumn(
        "session_id", F.sum(new_session).over(w_run) - F.lit(1)
    )


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_seconds: int = 21600,
) -> DataFrame:
    """Range join: each point row × every interval containing it
    (``start <= ts < end``), as a bucketized EQUI-join.

    A naive ``p.ts >= i.start AND p.ts < i.end`` theta-join plans a
    broadcast nested loop — O(|points|·|intervals|) comparisons, which
    at 100k × 20k is already 2×10⁹ and at cluster scale is unrunnable.
    Instead both sides land on a time-bucket key:

    - each point belongs to exactly ONE bucket (``floor(ts/g)``)
    - each interval explodes to the buckets it overlaps (≤ len/g + 1)

    so the join is a hash shuffle on the bucket id, cost Σ per-bucket
    (points × intervals), then the exact range predicate refines. A
    (point, interval) pair can only meet in the point's single bucket —
    no duplicate elimination needed. Pick ``bucket_seconds`` ≈ typical
    interval length: shorter buckets multiply the interval fan-out,
    longer ones inflate per-bucket cross products. Skewed hot buckets
    (flash events) take the standard salting treatment
    (``operators/skew.py``). Column names must be disjoint.
    """
    g = F.lit(int(bucket_seconds))
    p = points.withColumn(
        "__b", (F.unix_timestamp(F.col(point_ts)) / g).cast("long")
    )
    i = intervals.withColumn(
        "__bs",
        F.sequence(
            (F.unix_timestamp(F.col(start_ts)) / g).cast("long"),
            (F.unix_timestamp(F.col(end_ts)) / g).cast("long"),
        ),
    ).withColumn("__b", F.explode("__bs")).drop("__bs")
    return (
        p.join(i, "__b")
        .filter(
            (F.col(point_ts) >= F.col(start_ts))
            & (F.col(point_ts) < F.col(end_ts))
        )
        .drop("__b")
    )


def gapfill_locf(
    df: DataFrame,
    key: str,
    ts: str,
    val: str,
    step_seconds: int = 3600,
    tiebreak: str | None = None,
) -> DataFrame:
    """Hypertable-style gap-fill + last-observation-carried-forward
    (TimescaleDB ``time_bucket_gapfill`` + ``locf``): bucket each key's
    observations onto a regular ``step_seconds`` grid, materialize the
    missing buckets between the key's first and last observation, and
    fill them with the most recent observed value. Emits
    ``bucket_start_s`` (epoch seconds), ``<val>_filled``, ``is_gap``.

    Per (key, bucket) the LAST observation wins (latest ``ts``, ties →
    greatest value then greatest ``tiebreak``) — the keep-latest rule
    D1 applies to telemetry rollups.

    Scale shape: the grid derives from a per-key min/max aggregate
    (map-side combining), so grid size is bounded by span/step per key
    — never a corpus-wide calendar cross join; the bucket dedup window,
    the grid join, and the LOCF window all hash on the key family, and
    a key's whole grid lives in one partition (state = one running
    value per key). Dense keys fan out ≤ span/step rows — a 10-year
    hourly grid is 87k rows per key, flat. No UDFs anywhere.
    """
    k = F.col(key)
    step = int(step_seconds)
    bucket = (F.unix_millis(F.col(ts).cast("timestamp_ltz")) / F.lit(1000)).cast(
        "long"
    )
    bucket = (bucket - F.pmod(bucket, F.lit(step))).alias("bucket_start_s")
    order = [F.col(ts).desc(), F.col(val).desc()]
    if tiebreak:
        order.append(F.col(tiebreak).desc())
    w_pick = Window.partitionBy(key, "bucket_start_s").orderBy(*order)
    pick_cols = [ts] + ([tiebreak] if tiebreak else [])
    obs = (
        df.select(k, bucket, F.col(val), *[F.col(c) for c in pick_cols])
        .withColumn("__rn", F.row_number().over(w_pick))
        .filter(F.col("__rn") == 1)
        .drop("__rn", *pick_cols)
    )
    grid = (
        obs.groupBy(key)
        .agg(
            F.min("bucket_start_s").alias("__lo"),
            F.max("bucket_start_s").alias("__hi"),
        )
        .select(
            k,
            F.explode(
                F.sequence(F.col("__lo"), F.col("__hi"), F.lit(step))
            ).alias("bucket_start_s"),
        )
    )
    w_fill = (
        Window.partitionBy(key)
        .orderBy("bucket_start_s")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return grid.join(obs, [key, "bucket_start_s"], "left").select(
        k,
        F.col("bucket_start_s"),
        F.last(F.col(val), ignorenulls=True).over(w_fill).alias(f"{val}_filled"),
        F.col(val).isNull().alias("is_gap"),
    )
