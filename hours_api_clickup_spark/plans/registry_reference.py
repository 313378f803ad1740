"""SURVEY.md §2 staples: the reference's relational operator
inventory (scans, projections, explodes, dedup, joins, aggregations,
MERGE algebra) plus the SQL front-door surfaces (windows, set ops,
grouping sets, recursive CTE, LATERAL, LISTAGG, VARIANT, regex/array/
conditional scalars) and the engine-mounted ingest scan.

Split from plans/registry.py (round 4); registration side-effects
populate the shared QUERIES dict in plans/registry_core.py. See that
module for the determinism rules all oracles follow.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from hours_api_clickup_spark.functions.casts import safe_bool, safe_float, safe_int
from hours_api_clickup_spark.functions.datetime_fns import oslo_date
from hours_api_clickup_spark.operators.dedupe import dedupe_latest
from hours_api_clickup_spark.operators.explode import split_tokens_with_empty
from hours_api_clickup_spark.operators.merge import merge_full_reindex, merge_refresh

from hours_api_clickup_spark.plans.registry_core import (
    _dec,
    load_table,
    register,
)

# ---------------------------------------------------------------------------
# Flagship: hours per user per Oslo civil date (the reference's namesake
# query — epoch timestamps → Europe/Oslo dating → grouped hour totals;
# P4/P6 + A2 over the events stream table).
# ---------------------------------------------------------------------------


@register(
    "flagship_hours_by_user_day",
    """
    SELECT user_id,
           CAST(timezone('Europe/Oslo', timezone('UTC', ts)) AS DATE) AS day_oslo,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS hours,
           COUNT(*) AS n_entries
    FROM events
    GROUP BY 1, 2
    """,
    survey_ids="P4,P6,A2",
    doc="Hours per user per Europe/Oslo civil date. Scale: single hash "
    "shuffle on (user_id, day); partial aggregation map-side.",
)
def q_flagship(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.groupBy(
            "user_id", oslo_date(F.col("ts")).alias("day_oslo")
        ).agg(
            F.sum(_dec("value", "decimal(18,2)")).cast("double").alias("hours"),
            F.count("*").alias("n_entries"),
        )
    )


# ---------------------------------------------------------------------------
# Wide flattening projection (P1-P11 composite): one declarative select
# covering id stringify, epoch-ms round trip, Oslo dating, SHA-256 PII
# hashing, scaling + rounding, and JSON field extraction.
# ---------------------------------------------------------------------------


@register(
    "transform_projection",
    """
    SELECT CAST(event_id AS VARCHAR) AS id,
           epoch_ms(ts) AS epoch_ms,
           make_timestamp(epoch_ms(ts) * 1000) AS ts_ms,
           CAST(timezone('Europe/Oslo', timezone('UTC', ts)) AS DATE) AS day_oslo,
           sha256(CAST(user_id AS VARCHAR)) AS user_sha256,
           floor(value / 3.6 * 100 + 0.5) / 100 AS value_scaled,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val,
           event_type
    FROM events
    """,
    survey_ids="P1,P2,P4,P6,P7,P11,P15",
    doc="Flagship-style wide projection; whole-stage-codegen single pass, "
    "no shuffle, column-pruned scan.",
)
def q_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    ms = F.unix_millis("ts")
    return events.select(
        F.col("event_id").cast("string").alias("id"),
        ms.alias("epoch_ms"),
        F.timestamp_millis(ms).alias("ts_ms"),
        oslo_date(F.col("ts")).alias("day_oslo"),
        F.sha2(F.col("user_id").cast("string"), 256).alias("user_sha256"),
        # round-half-up via floor: pure IEEE double ops, so Spark and the
        # DuckDB oracle agree bit-for-bit (F.round rounds the decimal
        # string repr of the double and can differ at .xx5 boundaries)
        (F.floor(F.col("value") / F.lit(3.6) * 100 + 0.5) / F.lit(100.0)).alias(
            "value_scaled"
        ),
        F.get_json_object("props", "$.k").cast("int").alias("k_val"),
        "event_type",
    )


# ---------------------------------------------------------------------------
# Keep-latest-per-key dedup (D1) — latest event per (user, event_type),
# null-ts-wins tiebreak per the reference's pandas semantics.
# ---------------------------------------------------------------------------


@register(
    "dedupe_keep_latest",
    """
    SELECT user_id, event_type, event_id, ts, value
    FROM events
    QUALIFY row_number() OVER (
        PARTITION BY user_id, event_type
        ORDER BY ts DESC NULLS FIRST, event_id DESC
    ) = 1
    """,
    survey_ids="D1",
    doc="Ranking window partitioned by key: one shuffle on the key, "
    "no global sort. null-wins via desc_nulls_first "
    "(fetch_clickup_data.py:1774-1777).",
)
def q_dedupe(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return dedupe_latest(
        events,
        key=["user_id", "event_type"],
        ts="ts",
        tiebreak=[F.col("event_id").desc()],
    ).select("user_id", "event_type", "event_id", "ts", "value")


# ---------------------------------------------------------------------------
# MERGE upserts (M1/M2): fact = orders; staging simulates a re-fetch where
# prices changed (×2) and every 3rd entry disappeared. Window = orderdate
# ≥ 1997-01-01. merge_refresh must update/insert/delete inside the window
# and preserve history outside it (the BUG_FIX_SUMMARY.md regression).
# ---------------------------------------------------------------------------

_ORDER_COLS = (
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)
_MERGE_WINDOW_START = "1997-01-01"


def _staging_orders(orders: DataFrame) -> DataFrame:
    return orders.filter(F.col("o_orderkey") % 3 != 0).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        (F.col("o_totalprice") * 2).alias("o_totalprice"),
        "o_orderdate",
        "o_orderpriority",
    )


@register(
    "merge_refresh_window",
    f"""
    WITH stg_w AS (
        SELECT o_orderkey, o_custkey, o_orderstatus,
               o_totalprice * 2 AS o_totalprice, o_orderdate, o_orderpriority
        FROM orders
        WHERE o_orderkey % 3 <> 0
          AND o_orderdate >= TIMESTAMP '{_MERGE_WINDOW_START} 00:00:00'
    )
    SELECT * FROM stg_w
    UNION ALL
    SELECT f.*
    FROM orders f ANTI JOIN stg_w s ON f.o_orderkey = s.o_orderkey
    WHERE f.o_orderdate < TIMESTAMP '{_MERGE_WINDOW_START} 00:00:00'
    """,
    survey_ids="M1,J1",
    doc="Windowed-refresh MERGE via SURVEY §4.3 algebra: "
    "fact' = S_w ∪ (fact ▷ S_w).filter(¬W). Scale: W prunes fact "
    "partitions before the anti-join; S_w broadcasts.",
)
def q_merge_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(*_ORDER_COLS)
    staging = _staging_orders(orders)
    w = F.col("o_orderdate") >= F.lit(_MERGE_WINDOW_START).cast("timestamp")
    return merge_refresh(orders, staging, w, key="o_orderkey")


@register(
    "merge_full_reindex",
    """
    SELECT o_orderkey, o_custkey, o_orderstatus,
           o_totalprice * 2 AS o_totalprice, o_orderdate, o_orderpriority
    FROM orders
    WHERE o_orderkey % 3 <> 0
    """,
    survey_ids="M2",
    doc="Full-reindex MERGE ≡ staging overwrite (SURVEY §4.3; "
    "fetch_clickup_data.py:1335-1399).",
)
def q_merge_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(*_ORDER_COLS)
    return merge_full_reindex(orders, _staging_orders(orders))


# ---------------------------------------------------------------------------
# Joins + aggregations (J2-J4, A1-A6) — the doc-SQL analytical surface.
# ---------------------------------------------------------------------------


@register(
    "join_revenue_by_priority",
    """
    SELECT o.o_orderpriority,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (CAST(1 AS DECIMAL(12,2)) - CAST(l.l_discount AS DECIMAL(12,2))))
                AS DOUBLE) AS revenue
    FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
    survey_ids="J2,J3,A2",
    doc="fact ⟕ dim + grouped multi-agg (docs/LISTS_SYNC_FEATURE.md:155-166 "
    "analog). orders is broadcast — no shuffle on the fact side.",
)
def q_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    revenue = _dec("l_extendedprice") * (
        F.lit(1).cast("decimal(12,2)") - _dec("l_discount")
    )
    return (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey, "left")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_items"),
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(revenue).cast("double").alias("revenue"),
        )
    )


@register(
    "pricing_summary_q1",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                         * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
                         AS DECIMAL(20,4))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                         * (CAST(1 AS DECIMAL(12,2)) - CAST(l_discount AS DECIMAL(12,2)))
                         AS DECIMAL(20,4))
                    * (CAST(1 AS DECIMAL(12,2)) + CAST(l_tax AS DECIMAL(12,2))))
                AS DOUBLE) AS sum_charge,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    survey_ids="A2,A3",
    doc="TPC-H Q1-shaped pricing summary: partial aggregation map-side, "
    "one shuffle on the tiny group key; ship-date filter pushed to scan.",
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(12,2)")
    disc_price = (_dec("l_extendedprice") * (one - _dec("l_discount"))).cast(
        "decimal(20,4)"
    )
    charge = disc_price * (one + _dec("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "agg_minmax_distinct",
    """
    SELECT COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users,
           MIN(ts) AS min_ts,
           MAX(ts) AS max_ts
    FROM events
    """,
    survey_ids="A1,A4,A5",
    doc="Verification aggregates (docs/setup.md:93-101 analog). At 100 TB "
    "COUNT DISTINCT would switch to approx_count_distinct; exact here "
    "for oracle parity.",
)
def q_agg_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
    )


@register(
    "pivot_conditional_counts",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
           CAST(count_if(o_orderstatus = 'F') AS BIGINT) AS n_finished,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS DOUBLE)
               / COUNT(*) AS pct_open
    FROM orders
    GROUP BY o_orderpriority
    """,
    survey_ids="A3",
    doc="Pivot-style conditional aggregation "
    "(docs/TASKS_SYNC_FEATURE.md:176-177 analog).",
)
def q_pivot_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    n_open = F.sum(F.when(F.col("o_orderstatus") == "O", 1).otherwise(0))
    return orders.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_total"),
        n_open.alias("n_open"),
        F.count_if(F.col("o_orderstatus") == "F").alias("n_finished"),
        (n_open.cast("double") / F.count("*")).alias("pct_open"),
    )


@register(
    "rollup_having_variance",
    """
    SELECT l.l_orderkey, o.o_orderpriority,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty,
           COUNT(*) AS n_lines
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY l.l_orderkey, o.o_orderpriority
    HAVING CAST(SUM(CAST(l.l_quantity AS DECIMAL(12,2))) AS DOUBLE) > 150
    """,
    survey_ids="J4,A6",
    doc="Estimate-vs-actual rollup with HAVING "
    "(docs/TASKS_SYNC_FEATURE.md:230-245 analog): join → groupBy → "
    "agg → post-agg filter.",
)
def q_rollup_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return (
        li.join(F.broadcast(o), li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderpriority")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("total_qty"),
            F.count("*").alias("n_lines"),
        )
        .filter(F.col("total_qty") > 150)
    )


# ---------------------------------------------------------------------------
# Row-multiplying ops (E1-E4) and set ops.
# ---------------------------------------------------------------------------


@register(
    "split_explode_bridge",
    """
    WITH base AS (
        SELECT p_partkey,
               CASE WHEN p_size % 5 = 0 THEN '' ELSE p_type END AS src
        FROM part
    ), toks AS (
        SELECT p_partkey,
               list_filter(list_transform(string_split(src, ' '), x -> trim(x)),
                           x -> x <> '') AS tokens
        FROM base
    )
    SELECT p_partkey,
           unnest(CASE WHEN len(tokens) > 0 THEN tokens ELSE [''] END) AS token
    FROM toks
    """,
    survey_ids="E1",
    doc="Accounts-bridge fan-out semantics (fetch_clickup_data.py:552-558,"
    "600-611): one row per trimmed token; empty input emits exactly one "
    "''-row (not null). explode is per-partition — no shuffle.",
)
def q_split_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    src = F.when(F.col("p_size") % 5 == 0, F.lit("")).otherwise(F.col("p_type"))
    return part.select(
        "p_partkey",
        F.explode(split_tokens_with_empty(src, " ")).alias("token"),
    )


@register(
    "array_join_group",
    """
    SELECT n.n_name,
           string_agg(c.c_name, ', ' ORDER BY c.c_name) AS customer_names,
           COUNT(*) AS n_customers
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    survey_ids="E2,E3",
    doc="', '-joined denormalized string per group "
    "(fetch_clickup_data.py:596-598,742-748 analog). sort_array makes "
    "collect_list order-deterministic.",
)
def q_array_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.array_join(F.sort_array(F.collect_list("c_name")), ", ").alias(
                "customer_names"
            ),
            F.count("*").alias("n_customers"),
        )
    )


@register(
    "hierarchy_flatten",
    """
    SELECT r.r_name AS region_name,
           n.n_name AS nation_name,
           c.c_custkey,
           c.c_name,
           COALESCE(s.s_name, '') AS supplier_name
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    LEFT JOIN supplier s
      ON c.c_custkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
    """,
    survey_ids="E4",
    doc="Tree → one flat row per leaf with ancestors as columns; missing "
    "level → '' fill (fetch_clickup_data.py:245-272,268-269). All dims "
    "broadcast.",
)
def q_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    s = load_table(spark, sf_dir, "supplier")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(
            F.broadcast(s),
            (c.c_custkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
            "left",
        )
        .select(
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
            "c_custkey",
            "c_name",
            F.coalesce(F.col("s_name"), F.lit("")).alias("supplier_name"),
        )
    )


@register(
    "union_two_passes",
    """
    SELECT o_orderkey, 'active' AS pass_name, o_orderstatus FROM orders
    WHERE o_orderstatus = 'O'
    UNION ALL
    SELECT o_orderkey, 'archived' AS pass_name, o_orderstatus FROM orders
    WHERE o_orderstatus = 'F'
    """,
    survey_ids="S5,§2.8",
    doc="Two-pass archived scan → UNION ALL "
    "(fetch_clickup_data.py:326-401,344).",
)
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey", F.lit("active").alias("pass_name"), "o_orderstatus"
    )
    b = orders.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", F.lit("archived").alias("pass_name"), "o_orderstatus"
    )
    return a.unionByName(b)


# ---------------------------------------------------------------------------
# Safe-cast scalar surface (P8/P9/P10) on synthesized mixed-type strings.
# ---------------------------------------------------------------------------

_SAFE_SRC_SQL = """CASE event_id % 5
        WHEN 0 THEN 'true' WHEN 1 THEN '3.7' WHEN 2 THEN 'x'
        WHEN 3 THEN '' ELSE '-2.9' END"""


@register(
    "safe_cast_surface",
    f"""
    WITH base AS (SELECT event_id, {_SAFE_SRC_SQL} AS src FROM events)
    SELECT event_id, src,
           CASE WHEN src IS NULL THEN FALSE
                WHEN lower(trim(src)) IN ('true','1','yes','on') THEN TRUE
                WHEN TRY_CAST(src AS DOUBLE) IS NOT NULL
                     AND NOT isnan(TRY_CAST(src AS DOUBLE))
                    THEN TRY_CAST(src AS DOUBLE) <> 0
                ELSE FALSE END AS as_bool,
           CASE WHEN TRY_CAST(src AS DOUBLE) IS NOT NULL
                     AND NOT isnan(TRY_CAST(src AS DOUBLE))
                THEN CAST(trunc(TRY_CAST(src AS DOUBLE)) AS BIGINT) END AS as_int,
           COALESCE(TRY_CAST(src AS DOUBLE), 0.0) AS as_float_default,
           TRY_CAST(src AS DOUBLE) AS as_float_null
    FROM base
    """,
    survey_ids="P8,P9,P10",
    doc="safe_bool/safe_int/safe_float semantics "
    "(fetch_clickup_data.py:783-801,560-580) incl. truncation toward "
    "zero and the truthy-string set.",
)
def q_safe_casts(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    m = F.col("event_id") % 5
    src = (
        F.when(m == 0, "true")
        .when(m == 1, "3.7")
        .when(m == 2, "x")
        .when(m == 3, "")
        .otherwise("-2.9")
    )
    return events.select(
        "event_id",
        src.alias("src"),
        safe_bool(src).alias("as_bool"),
        safe_int(src).alias("as_int"),
        safe_float(src, default=0.0).alias("as_float_default"),
        safe_float(src).alias("as_float_null"),
    )


@register(
    "scalar_string_surface",
    """
    SELECT p_partkey,
           lower(p_name) AS name_lower,
           string_split(p_type, ' ')[1] AS type_head,
           sha256(p_brand) AS brand_sha256,
           md5(p_name) AS name_md5,
           floor(p_retailprice / 100 * 100 + 0.5) / 100 AS price_scaled,
           length(p_name) AS name_len,
           concat_ws('-', p_brand, CAST(p_size AS VARCHAR)) AS brand_size,
           substring(p_name, 1, 5) AS name_head
    FROM part
    """,
    survey_ids="§2.10",
    doc="Consolidated scalar-function surface: split/lower/substr/concat/"
    "sha2/md5/round/length (SURVEY §2.10).",
)
def q_scalar_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.lower("p_name").alias("name_lower"),
        F.split(F.col("p_type"), " ").getItem(0).alias("type_head"),
        F.sha2(F.col("p_brand"), 256).alias("brand_sha256"),
        F.md5(F.col("p_name")).alias("name_md5"),
        (F.floor(F.col("p_retailprice") / 100 * 100 + 0.5) / F.lit(100.0)).alias(
            "price_scaled"
        ),
        F.length("p_name").alias("name_len"),
        F.concat_ws("-", F.col("p_brand"), F.col("p_size").cast("string")).alias(
            "brand_size"
        ),
        F.substring("p_name", 1, 5).alias("name_head"),
    )


# ---------------------------------------------------------------------------
# Scan chunk planning (S2) and custom-field map probing (P17) as queries.
# ---------------------------------------------------------------------------


@register(
    "scan_chunk_plan",
    """
    SELECT CAST(i AS BIGINT) AS chunk_id,
           TIMESTAMP '2024-01-01 00:00:00' + i * (INTERVAL 30 DAY) AS chunk_start,
           least(TIMESTAMP '2024-01-01 00:00:00' + (i + 1) * (INTERVAL 30 DAY),
                 TIMESTAMP '2024-12-15 06:30:00') AS chunk_end
    FROM generate_series(0, 11) t(i)
    """,
    survey_ids="S1,S2",
    doc="30-day scan-window chunk plan as data (fetch_clickup_data.py:"
    "124-147): chunk bounds become a DataFrame that a REST source fans "
    "out across executors; the short tail chunk is clamped to the range "
    "end.",
)
def q_scan_chunk_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    import datetime as dt

    from hours_api_clickup_spark.sources.chunks import window_chunks

    return window_chunks(
        spark,
        dt.datetime(2024, 1, 1),
        dt.datetime(2024, 12, 15, 6, 30),
        chunk_days=30,
    )


@register(
    "custom_field_probe",
    """
    WITH base AS (
        SELECT p_partkey,
               [{'id': 'arr', 'value': CAST(p_retailprice AS VARCHAR)},
                {'id': 'size', 'value': CAST(p_size AS VARCHAR)},
                {'id': 'brand', 'value': p_brand}] AS custom_fields
        FROM part
    )
    SELECT p_partkey,
           list_filter(custom_fields, f -> f.id = 'arr')[1].value AS arr_raw,
           TRY_CAST(list_filter(custom_fields, f -> f.id = 'arr')[1].value AS DOUBLE) AS arr,
           list_filter(custom_fields, f -> f.id = 'brand')[1].value AS brand,
           list_filter(custom_fields, f -> f.id = 'missing')[1].value AS absent
    FROM base
    """,
    survey_ids="P10,P17",
    doc="Custom-field array → map → probe-by-id (fetch_clickup_data.py:"
    "546-549): map_from_entries + key lookup, null for absent ids, with "
    "the safe-float parse on top. Array synthesized from part columns.",
)
def q_custom_field_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hours_api_clickup_spark.functions.casts import safe_float

    part = load_table(spark, sf_dir, "part")
    cf = F.array(
        F.struct(F.lit("arr").alias("id"), F.col("p_retailprice").cast("string").alias("value")),
        F.struct(F.lit("size").alias("id"), F.col("p_size").cast("string").alias("value")),
        F.struct(F.lit("brand").alias("id"), F.col("p_brand").alias("value")),
    )
    m = F.map_from_entries(cf)
    return part.select(
        "p_partkey",
        m["arr"].alias("arr_raw"),
        safe_float(m["arr"]).alias("arr"),
        m["brand"].alias("brand"),
        m["missing"].alias("absent"),
    )


# ---------------------------------------------------------------------------
# Window analytics, sessionization, as-of join, rollup — the analytical
# surface beyond the reference's doc-SQL, still oracle-checked.
# ---------------------------------------------------------------------------


@register(
    "window_analytics",
    """
    SELECT event_id, user_id, ts, value,
           lag(value) OVER w AS prev_value,
           CAST(SUM(CAST(value AS DECIMAL(18,2)))
                OVER (PARTITION BY user_id ORDER BY ts, event_id
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total,
           CAST(row_number() OVER w AS BIGINT) AS seq,
           CAST(rank() OVER (PARTITION BY user_id ORDER BY CAST(value AS DECIMAL(18,2)) DESC, event_id)
                AS BIGINT) AS value_rank
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    survey_ids="§2.7",
    doc="Ranking + analytic + frame-spec windows (lag, running decimal "
    "sum, row_number, rank) sharing one key partitioning — a single "
    "shuffle serves all four.",
)
def q_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts"), F.col("event_id"))
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_rank = Window.partitionBy("user_id").orderBy(
        _dec("value", "decimal(18,2)").desc(), F.col("event_id")
    )
    return events.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.sum(_dec("value", "decimal(18,2)")).over(w_run).cast("double").alias(
            "running_total"
        ),
        F.row_number().over(w).cast("long").alias("seq"),
        F.rank().over(w_rank).cast("long").alias("value_rank"),
    )


@register(
    "agg_rollup_hierarchy",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    survey_ids="§2.6-rollup",
    doc="ROLLUP grouping sets (subtotals + grand total). Spark expands "
    "to one Expand + single aggregation — one shuffle for all levels.",
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        F.count("*").alias("n"),
    )


@register(
    "native_pivot_revenue",
    """
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN l_returnflag = 'A'
                THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) AS A,
           CAST(SUM(CASE WHEN l_returnflag = 'N'
                THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) AS N,
           CAST(SUM(CASE WHEN l_returnflag = 'R'
                THEN CAST(l_extendedprice AS DECIMAL(18,2)) END) AS DOUBLE) AS R
    FROM lineitem
    GROUP BY l_linestatus
    """,
    survey_ids="§2.6-pivot",
    doc="Native pivot (long → wide): revenue per linestatus pivoted "
    "over the return flags. With the pivot values given explicitly the "
    "plan is ONE aggregation pass (no value-discovery pre-query) and "
    "compiles to the same conditional aggregates the oracle spells "
    "out — long→wide costs one shuffle, same as any groupBy.",
)
def q_native_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.sum(_dec("l_extendedprice", "decimal(18,2)")).cast("double"))
    )


@register(
    "agg_cube_hierarchy",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
    survey_ids="§2.6-cube",
    doc="CUBE grouping sets (every subset of the keys, incl. the "
    "per-linestatus marginals ROLLUP omits). Same Expand + single "
    "aggregation plan — one shuffle for all 2^k levels.",
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
        F.count("*").alias("n"),
    )


@register(
    "semi_anti_join_surface",
    """
    SELECT 'has_order' AS cohort, COUNT(*) AS n_customers,
           CAST(MIN(c_custkey) AS BIGINT) AS min_key
    FROM customer c WHERE EXISTS (
        SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
    )
    UNION ALL
    SELECT 'no_order', COUNT(*),
           CAST(MIN(c_custkey) AS BIGINT)
    FROM customer c WHERE NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
    )
    """,
    survey_ids="§2.5-semi-anti",
    doc="LEFT SEMI + LEFT ANTI join surface (EXISTS / NOT EXISTS): "
    "customers with vs without orders. Semi/anti ship only the probe "
    "side's rows — no fact columns ever cross the shuffle, and the "
    "build side reduces to its distinct keys.",
)
def q_semi_anti_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    with_orders = cust.join(
        orders, cust["c_custkey"] == orders["o_custkey"], "left_semi"
    )
    without = cust.join(
        orders, cust["c_custkey"] == orders["o_custkey"], "left_anti"
    )

    def _summ(df: DataFrame, label: str) -> DataFrame:
        return df.agg(
            F.lit(label).alias("cohort"),
            F.count("*").alias("n_customers"),
            F.min("c_custkey").alias("min_key"),
        ).select("cohort", "n_customers", "min_key")

    return _summ(with_orders, "has_order").unionByName(
        _summ(without, "no_order")
    )


@register(
    "data_quality_report",
    """
    WITH v AS (
        SELECT CAST(count_if(o_orderkey IS NULL) AS BIGINT) AS nn,
               CAST(COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS uq,
               CAST(count_if(NOT COALESCE(o_totalprice > 0, FALSE)) AS BIGINT) AS pos,
               CAST(count_if(o_orderstatus IS NOT NULL
                             AND o_orderstatus NOT IN ('O','F','P')) AS BIGINT) AS st,
               COUNT(*) AS n
        FROM orders
    )
    SELECT 'not_null[o_orderkey]' AS check, nn AS n_violations, nn = 0 AS passed, n AS n_rows_scanned FROM v
    UNION ALL
    SELECT 'unique[o_orderkey]', uq, uq = 0, n FROM v
    UNION ALL
    SELECT 'condition[positive_price]', pos, pos = 0, n FROM v
    UNION ALL
    SELECT 'in_set[o_orderstatus]', st, st = 0, n FROM v
    """,
    survey_ids="§5-verification",
    doc="The reference's manual verification SQL as a declarative "
    "expectation suite — whole suite in ONE aggregate pass over the "
    "table (docs/setup.md:93-101 automated).",
)
def q_data_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hours_api_clickup_spark.operators.validate import (
        expect_condition,
        expect_in_set,
        expect_not_null,
        expect_unique,
        run_expectations,
    )

    orders = load_table(spark, sf_dir, "orders")
    report = run_expectations(
        orders,
        [
            expect_not_null("o_orderkey"),
            expect_unique("o_orderkey"),
            expect_condition("positive_price", F.col("o_totalprice") > 0),
            expect_in_set("o_orderstatus", ["O", "F", "P"]),
        ],
    )
    return report


@register(
    "set_ops_surface",
    """
    SELECT o_custkey, 'intersect' AS set_op FROM (
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        INTERSECT
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    )
    UNION ALL
    SELECT o_custkey, 'except' AS set_op FROM (
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
        EXCEPT
        SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
    )
    """,
    survey_ids="§2.8",
    doc="INTERSECT / EXCEPT set operations (absent from the reference, "
    "SURVEY §2.8 — provided because any engine user expects them): "
    "customers active in both 1995 and 1996 vs 1995-only. Catalyst "
    "compiles both to aggregate + left-semi/anti hash joins, so each "
    "branch is one shuffle keyed on the (already-distinct) key — no "
    "global sort, broadcast-able when one side is small.",
)
def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    y95 = orders.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    y96 = orders.filter(F.year("o_orderdate") == 1996).select("o_custkey")
    both = y95.intersect(y96).select(
        "o_custkey", F.lit("intersect").alias("set_op")
    )
    only95 = y95.subtract(y96).select(
        "o_custkey", F.lit("except").alias("set_op")
    )
    return both.unionByName(only95)


@register(
    "topk_per_group",
    """
    SELECT o_orderpriority, o_orderkey, o_totalprice, CAST(rk AS BIGINT) AS rk
    FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_orderpriority
                                  ORDER BY o_totalprice DESC, o_orderkey) AS rk
        FROM orders
    )
    WHERE rk <= 3
    """,
    survey_ids="§2.7,D2",
    doc="Top-k per group (3 highest-value orders per priority) — the "
    "grouped form of D2's global ordering, deterministic via the "
    "o_orderkey tiebreak. At scale Spark's WindowGroupLimit rule "
    "(rank-filter pushdown) keeps a per-partition k-heap BEFORE the "
    "shuffle, so the exchange carries ≤ k rows per group per input "
    "partition, never the full table sort.",
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_orderpriority")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
    )
    return (
        orders.select(
            "o_orderpriority",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).cast("long").alias("rk"),
        )
        .filter(F.col("rk") <= 3)
    )


@register(
    "json_props_extract",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract(props, '$.k') AS INT)) AS BIGINT)
               AS sum_k,
           MIN(CAST(json_extract(props, '$.k') AS INT)) AS min_k,
           MAX(CAST(json_extract(props, '$.k') AS INT)) AS max_k,
           COUNT(CASE WHEN json_extract(props, '$.k') IS NULL THEN 1 END)
               AS n_unparsed
    FROM events GROUP BY event_type
    """,
    survey_ids="P2,§2.10,datapipe:semistructured",
    doc="Semi-structured JSON payload parsing — the reference's core "
    "ingest step (every ClickUp REST response is a JSON document, "
    "fetch_clickup_data.py:54-147) as a typed Spark surface: "
    "from_json with an explicit schema projects the payload to typed "
    "columns JVM-side (malformed rows null out, counted per the "
    "reference's tolerant-parse policy, P3), then a grouped rollup. "
    "Projection + one small agg; the JSON parse is codegen'd, no "
    "Python.",
)
def q_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k int")["k"]
    return (
        events.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("k").cast("bigint").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.count(F.when(F.col("k").isNull(), 1)).alias("n_unparsed"),
        )
    )


@register(
    "window_rank_surface",
    """
    SELECT o_custkey, o_orderkey,
           row_number() OVER w AS rn,
           dense_rank() OVER (PARTITION BY o_custkey
                              ORDER BY CAST(o_orderdate AS DATE)) AS drk,
           percent_rank() OVER w AS prk,
           cume_dist() OVER w AS cd,
           ntile(4) OVER w AS quartile,
           first_value(o_orderkey) OVER w AS first_key,
           nth_value(o_orderkey, 2) OVER (
               PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE),
               o_orderkey ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS second_key
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY CAST(o_orderdate AS DATE), o_orderkey)
    """,
    survey_ids="§2.7",
    doc="Ranking/distribution window surface beyond window_analytics: "
    "dense_rank, percent_rank, cume_dist, ntile, first/nth_value — all "
    "sharing ONE customer-key shuffle (every window clause uses the "
    "same partitioning). Ordering is total ((date, orderkey) unique) so "
    "every function is deterministic; percent_rank/cume_dist are exact "
    "rational arithmetic in double — identical across engines. "
    "dense_rank deliberately orders by date alone to exercise peer "
    "groups (ties), which rank functions must handle identically.",
)
def q_window_rank_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders")
    od = F.col("o_orderdate").cast("date")
    w = Window.partitionBy("o_custkey").orderBy(od, "o_orderkey")
    w_peers = Window.partitionBy("o_custkey").orderBy(od)
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.row_number().over(w).alias("rn"),
        F.dense_rank().over(w_peers).alias("drk"),
        F.percent_rank().over(w).alias("prk"),
        F.cume_dist().over(w).alias("cd"),
        F.ntile(4).over(w).alias("quartile"),
        F.first("o_orderkey").over(w).alias("first_key"),
        F.nth_value("o_orderkey", 2).over(w_run).alias("second_key"),
    )


@register(
    "string_distance_surface",
    """
    SELECT c_custkey,
           levenshtein(c_name, c_mktsegment) AS lev_name_seg,
           levenshtein(c_name, reverse(c_name)) AS lev_palindrome,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
           reverse(c_mktsegment) AS seg_rev,
           translate(c_mktsegment, 'AEIOU', 'aeiou') AS seg_lower_vowels,
           repeat(left(c_mktsegment, 1), 3) AS seg_initial_x3,
           strpos(c_name, '0') AS first_zero_pos,
           right(c_name, 4) AS name_tail
    FROM customer
    """,
    survey_ids="§2.10",
    doc="String-distance + padding/positional surface: levenshtein "
    "(fuzzy key matching — both engines implement the standard "
    "Wagner-Fischer distance), lpad zero-padding for sortable keys, "
    "translate, repeat, strpos (1-based in both), left/right slices. "
    "Projection-only; codegen'd JVM execution.",
)
def q_string_distance_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.levenshtein("c_name", "c_mktsegment").alias("lev_name_seg"),
        F.levenshtein(F.col("c_name"), F.reverse("c_name")).alias(
            "lev_palindrome"
        ),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.reverse("c_mktsegment").alias("seg_rev"),
        F.translate("c_mktsegment", "AEIOU", "aeiou").alias(
            "seg_lower_vowels"
        ),
        F.repeat(F.substring("c_mktsegment", 1, 1), 3).alias("seg_initial_x3"),
        F.instr("c_name", "0").alias("first_zero_pos"),
        F.substring("c_name", -4, 4).alias("name_tail"),
    )


@register(
    "datetime_scalar_surface",
    """
    SELECT o_orderkey,
           date_trunc('month', CAST(o_orderdate AS DATE)) AS month_start,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE)
               AS plus_3_months,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           quarter(CAST(o_orderdate AS DATE)) AS qtr,
           dayofweek(CAST(o_orderdate AS DATE)) + 1 AS dow,
           date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
               AS days_since_95,
           make_date(CAST(year(o_orderdate) AS INT), 1, 1) AS year_start
    FROM orders
    """,
    survey_ids="§2.10",
    doc="Date/time scalar surface beyond the reference's epoch-ms/Oslo "
    "core: month truncation, calendar-aware add_months (both engines "
    "clamp Jan 31 + 1mo → Feb 29), last_day, quarter, day-of-week "
    "(Spark is 1=Sunday, DuckDB 0=Sunday — the oracle shifts by one: "
    "a REAL cross-engine semantic difference pinned by the hash "
    "match), datediff against an epoch date, make_date roundtrip. "
    "Projection-only.",
)
def q_datetime_scalar_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    od = F.col("o_orderdate").cast("date")
    return orders.select(
        "o_orderkey",
        F.trunc(od, "month").alias("month_start"),
        F.add_months(od, 3).alias("plus_3_months"),
        F.last_day(od).alias("month_end"),
        F.quarter(od).alias("qtr"),
        F.dayofweek(od).alias("dow"),
        F.datediff(od, F.lit("1995-01-01").cast("date")).alias(
            "days_since_95"
        ),
        F.make_date(F.year(od), F.lit(1), F.lit(1)).alias("year_start"),
    )


@register(
    "unpivot_surface",
    """
    WITH wide AS (
        SELECT p_partkey,
               CAST(p_size AS DOUBLE) AS size,
               p_retailprice AS price,
               CAST(length(p_name) AS DOUBLE) AS name_len
        FROM part
    )
    SELECT p_partkey, metric, value
    FROM wide
    UNPIVOT (value FOR metric IN (size, price, name_len))
    """,
    survey_ids="§2.6-unpivot",
    doc="Native wide→long UNPIVOT (melt) — the inverse of "
    "native_pivot_revenue: one row per (id, metric) from three typed "
    "measure columns. Spark compiles unpivot to an Expand node (the "
    "same operator grouping-sets use) — a projection-only fan-out, "
    "zero shuffles at any width.",
)
def q_unpivot_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    wide = part.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("size"),
        F.col("p_retailprice").alias("price"),
        F.length("p_name").cast("double").alias("name_len"),
    )
    return wide.unpivot(
        ids=["p_partkey"],
        values=["size", "price", "name_len"],
        variableColumnName="metric",
        valueColumnName="value",
    )


@register(
    "regex_surface",
    """
    SELECT p_partkey,
           regexp_extract(p_type, '([A-Z]+) ([A-Z]+)', 2) AS type_second,
           CAST(len(regexp_extract_all(p_name, '[aeiou]')) AS INT) AS n_vowels,
           regexp_matches(p_brand, '^Brand#[0-9]+$') AS brand_wellformed,
           regexp_replace(p_name, '[0-9]+', '#', 'g') AS name_digits_masked,
           regexp_extract(p_name, '([0-9]+)$', 1) AS trailing_number
    FROM part
    """,
    survey_ids="§2.10-regex",
    doc="Regex scalar surface: capture-group extraction, match "
    "counting, anchored boolean match, global replacement, trailing-"
    "group probe. The regex subset is RE2∩Java (no lookaround, no "
    "class shorthands — the \\\\s/\\x0B lesson generalizes); Spark "
    "regexp_replace is global by default, DuckDB needs the explicit "
    "'g' flag — pinned by the hash match. Projection-only.",
)
def q_regex_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.regexp_extract("p_type", r"([A-Z]+) ([A-Z]+)", 2).alias(
            "type_second"
        ),
        F.size(F.regexp_extract_all("p_name", F.lit(r"[aeiou]"), 0)).alias(
            "n_vowels"
        ),
        F.col("p_brand").rlike(r"^Brand#[0-9]+$").alias("brand_wellformed"),
        F.regexp_replace("p_name", r"[0-9]+", "#").alias(
            "name_digits_masked"
        ),
        F.regexp_extract("p_name", r"([0-9]+)$", 1).alias("trailing_number"),
    )


@register(
    "conditional_null_surface",
    """
    SELECT o_orderkey,
           NULLIF(o_orderstatus, 'O') AS status_or_null,
           COALESCE(NULLIF(o_orderpriority, '1-URGENT'), 'top') AS prio_folded,
           LEAST(o_totalprice, 100000.0) AS price_capped,
           GREATEST(o_totalprice, 0.0) AS price_floored,
           o_totalprice / NULLIF(CAST(o_custkey AS DOUBLE), 0.0)
               AS price_per_cust,
           CASE WHEN o_orderstatus = 'F' THEN 'done'
                WHEN o_orderstatus = 'O' THEN 'open'
                ELSE 'other' END AS status_label
    FROM orders
    """,
    survey_ids="§2.10-conditional",
    doc="Conditional / null-handling surface: NULLIF, COALESCE folding, "
    "LEAST/GREATEST (both engines skip nulls), searched CASE, and "
    "null-safe division — Spark try_divide ≡ DuckDB's x / NULLIF(y,0) "
    "(DuckDB integer-safe division yields NULL on zero; Spark's plain "
    "/ yields Infinity, a REAL cross-engine difference the pairing "
    "pins). Projection-only.",
)
def q_conditional_null_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("status_or_null"),
        F.coalesce(
            F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")),
            F.lit("top"),
        ).alias("prio_folded"),
        F.least(F.col("o_totalprice"), F.lit(100000.0)).alias("price_capped"),
        F.greatest(F.col("o_totalprice"), F.lit(0.0)).alias("price_floored"),
        F.try_divide(
            F.col("o_totalprice"), F.col("o_custkey").cast("double")
        ).alias("price_per_cust"),
        F.when(F.col("o_orderstatus") == "F", "done")
        .when(F.col("o_orderstatus") == "O", "open")
        .otherwise("other")
        .alias("status_label"),
    )


@register(
    "generator_surface",
    """
    WITH base AS (
        SELECT p_partkey,
               CASE WHEN p_size % 7 = 0 THEN NULL
                    WHEN p_size % 5 = 0 THEN []
                    ELSE string_split(p_type, ' ') END AS arr
        FROM part
    ),
    nonempty AS (
        SELECT p_partkey,
               generate_subscripts(arr, 1) - 1 AS pos,
               unnest(arr) AS word
        FROM base WHERE arr IS NOT NULL AND len(arr) > 0
    ),
    degenerate AS (
        SELECT p_partkey, CAST(NULL AS BIGINT) AS pos,
               CAST(NULL AS VARCHAR) AS word
        FROM base WHERE arr IS NULL OR len(arr) = 0
    )
    SELECT * FROM nonempty UNION ALL SELECT * FROM degenerate
    """,
    survey_ids="§2.3-generator",
    doc="Generator surface: posexplode_outer — position-tagged fan-out "
    "that KEEPS rows whose array is null/empty (one all-null row), the "
    "lateral-view behavior E1's ''-row semantics generalize to. The "
    "oracle reproduces outer semantics as zip-unnest ∪ degenerate "
    "rows. Projection-side generate, zero shuffles.",
)
def q_generator_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    arr = (
        F.when(F.pmod("p_size", F.lit(7)) == 0, F.lit(None))
        .when(
            F.pmod("p_size", F.lit(5)) == 0,
            F.array().cast("array<string>"),
        )
        .otherwise(F.split("p_type", " "))
    )
    return (
        part.select("p_partkey", arr.alias("arr"))
        .select(
            "p_partkey",
            F.posexplode_outer("arr").alias("pos", "word"),
        )
        .select(
            "p_partkey", F.col("pos").cast("long").alias("pos"), "word"
        )
    )


@register(
    "array_functions_surface",
    """
    WITH b AS (
        SELECT p_partkey,
               string_split(p_type, ' ') AS words,
               string_split(p_name, ' ') AS name_words
        FROM part
    )
    -- COALESCE(...,'') is load-bearing: DuckDB's array_to_string maps an
    -- EMPTY list to NULL while Spark's array_join maps it to '' — the
    -- wrap normalizes DuckDB to Spark's convention (verified: disjoint
    -- word lists occur in `part`). The Spark twin carries the matching
    -- coalesce for the null-ARRAY case so both sides normalize alike.
    SELECT p_partkey,
           COALESCE(array_to_string(
               list_sort(list_distinct(list_concat(words, name_words))), '|'),
               '') AS union_sorted,
           COALESCE(array_to_string(
               list_sort(list_intersect(words, name_words)), '|'), '')
               AS intersect_sorted,
           COALESCE(array_to_string(
               list_sort(list_filter(words,
                                     w -> NOT list_contains(name_words, w))),
               '|'), '') AS except_sorted,
           list_contains(words, 'PROMO') AS has_promo,
           COALESCE(array_to_string(words[1:2], '|'), '') AS head2,
           CAST(len(flatten([words, name_words])) AS INT) AS n_all,
           array_to_string(list_reverse_sort(words), '|') AS rev_sorted_csv
    FROM b
    """,
    survey_ids="§2.10-array",
    doc="Array/set scalar surface: union (distinct ∘ concat), "
    "intersect, except (filter ∘ NOT contains — the form that works "
    "identically in both engines), contains, slice, flatten, reverse-"
    "sorted join. Every array-valued output is explicitly sorted AND "
    "serialized to a '|'-joined string so the driver's pandas-based "
    "hash compare (which cannot hash list cells) sees scalar columns "
    "only. Projection-only, codegen'd.",
)
def q_array_functions_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    words = F.split("p_type", " ")
    name_words = F.split("p_name", " ")
    b = part.select(
        "p_partkey", words.alias("words"), name_words.alias("name_words")
    )
    w, nw = F.col("words"), F.col("name_words")

    def _joined(arr):
        # null-array → '' to mirror the oracle's COALESCE (Spark's
        # array_join already maps EMPTY arrays to '' — the DuckDB-side
        # COALESCE exists to normalize its empty→NULL to this).
        return F.coalesce(F.array_join(arr, "|"), F.lit(""))

    return b.select(
        "p_partkey",
        _joined(F.array_sort(F.array_distinct(F.concat(w, nw)))).alias(
            "union_sorted"
        ),
        _joined(F.array_sort(F.array_intersect(w, nw))).alias(
            "intersect_sorted"
        ),
        _joined(
            F.array_sort(F.filter(w, lambda x: ~F.array_contains(nw, x)))
        ).alias("except_sorted"),
        F.array_contains(w, "PROMO").alias("has_promo"),
        _joined(F.slice(w, 1, 2)).alias("head2"),
        F.size(F.flatten(F.array(w, nw))).alias("n_all"),
        F.array_join(F.reverse(F.array_sort(w)), "|").alias(
            "rev_sorted_csv"
        ),
    )


_Q17_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_small_lines,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0
           AS avg_yearly
FROM lineitem l
WHERE l.l_quantity < (
    SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                  / COUNT(*))
    FROM lineitem l2
    WHERE l2.l_partkey = l.l_partkey
)
"""


@register(
    "correlated_subquery_surface",
    _Q17_SQL,
    survey_ids="§2.5-correlated",
    doc="Correlated scalar subquery (TPC-H Q17 shape): lineitems whose "
    "quantity is below 20% of their part's average. Catalyst "
    "DECORRELATES the per-row subquery into one per-part aggregate + "
    "one equi-join — the plan a hand-writer would build, from the "
    "declarative form (never a per-row re-scan). Exact-decimal average "
    "finalized to double keeps the threshold compare engine-identical. "
    "Entered through spark.sql to exercise the SQL front door the "
    "DataFrame queries bypass.",
)
def q_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_Q17_SQL)


_RECON_SQL = """
    WITH li AS (
        SELECT l_orderkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS li_value,
               COUNT(*) AS n_lines
        FROM lineitem
        WHERE l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_orderkey
    ),
    o AS (
        SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(18,2)) AS o_total
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1993-01-01'
    ),
    rec AS (
        SELECT CASE WHEN o.o_orderkey IS NULL THEN 'lineitem_only'
                    WHEN li.l_orderkey IS NULL THEN 'order_only'
                    ELSE 'both' END AS status,
               o.o_total, li.li_value, li.n_lines
        FROM o FULL OUTER JOIN li ON o.o_orderkey = li.l_orderkey
    )
    SELECT status,
           COUNT(*) AS n_orders,
           CAST(COALESCE(SUM(o_total), 0) AS DOUBLE) AS sum_order_total,
           CAST(COALESCE(SUM(li_value), 0) AS DOUBLE) AS sum_lineitem_value,
           CAST(COALESCE(SUM(n_lines), 0) AS BIGINT) AS n_lineitems
    FROM rec GROUP BY status
"""


@register(
    "full_outer_reconciliation",
    _RECON_SQL,
    survey_ids="§2.5-full-outer,§5-verification",
    doc="Fact-vs-rollup reconciliation: shipped-lineitem value per "
    "order FULL OUTER JOIN recent orders, classified both / "
    "order_only / lineitem_only with exact-decimal value totals — the "
    "cross-system audit every sync pipeline runs (the reference's "
    "manual COUNT checks, docs/setup.md:93-101, generalized to an "
    "outer reconciliation). Scale: big-big full outer CANNOT "
    "broadcast — the plan must be a shuffled sort-merge join on the "
    "key (plan-gated), then the classification aggregate is map-side "
    "combining on 3 statuses.",
)
def q_full_outer_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        .groupBy("l_orderkey")
        .agg(
            _dec(F.sum(_dec("l_extendedprice", "decimal(18,2)")), "decimal(18,2)").alias(
                "li_value"
            ),
            F.count("*").alias("n_lines"),
        )
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= F.lit("1993-01-01").cast("timestamp"))
        .select(
            "o_orderkey", _dec("o_totalprice", "decimal(18,2)").alias("o_total")
        )
    )
    rec = o.join(
        li, o["o_orderkey"] == li["l_orderkey"], "full_outer"
    ).select(
        F.when(F.col("o_orderkey").isNull(), F.lit("lineitem_only"))
        .when(F.col("l_orderkey").isNull(), F.lit("order_only"))
        .otherwise(F.lit("both"))
        .alias("status"),
        "o_total",
        "li_value",
        "n_lines",
    )
    return rec.groupBy("status").agg(
        F.count("*").alias("n_orders"),
        F.coalesce(F.sum("o_total"), F.lit(0))
        .cast("double")
        .alias("sum_order_total"),
        F.coalesce(F.sum("li_value"), F.lit(0))
        .cast("double")
        .alias("sum_lineitem_value"),
        F.coalesce(F.sum("n_lines"), F.lit(0))
        .cast("bigint")
        .alias("n_lineitems"),
    )


_NULLS_ORDER_SQL = """
    WITH o AS (
        SELECT o_custkey, o_orderkey,
               NULLIF(o_orderstatus, 'O') AS st
        FROM orders WHERE o_custkey < 200
    )
    SELECT DISTINCT o_custkey,
           first_value(st) OVER (
               PARTITION BY o_custkey
               ORDER BY st ASC NULLS LAST, o_orderkey
           ) AS first_status_nulls_last,
           first_value(st) OVER (
               PARTITION BY o_custkey
               ORDER BY st DESC NULLS FIRST, o_orderkey
           ) AS first_status_nulls_first,
           COUNT(CASE WHEN st IS NULL THEN 1 END) OVER (
               PARTITION BY o_custkey
           ) AS n_null_status
    FROM o
"""


@register(
    "nulls_ordering_surface",
    _NULLS_ORDER_SQL,
    survey_ids="§2.7-null-ordering",
    doc="Explicit NULLS FIRST/LAST window ordering — pinned on BOTH "
    "engines because the defaults diverge (Spark ASC puts nulls "
    "first, DuckDB ASC puts them last): an implicit ORDER BY over a "
    "nullable key silently reorders between engines; this surface "
    "locks the explicit forms via the hash match. All three windows "
    "share one key shuffle.",
)
def q_nulls_ordering_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 200)
        .select(
            "o_custkey",
            "o_orderkey",
            F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("st"),
        )
    )
    w_last = Window.partitionBy("o_custkey").orderBy(
        F.col("st").asc_nulls_last(), F.col("o_orderkey")
    )
    w_first = Window.partitionBy("o_custkey").orderBy(
        F.col("st").desc_nulls_first(), F.col("o_orderkey")
    )
    w_all = Window.partitionBy("o_custkey")
    return o.select(
        "o_custkey",
        F.first("st").over(w_last).alias("first_status_nulls_last"),
        F.first("st").over(w_first).alias("first_status_nulls_first"),
        F.count(F.when(F.col("st").isNull(), F.lit(1))).over(w_all).alias(
            "n_null_status"
        ),
    ).dropDuplicates()


_BITWISE_SQL = """
    SELECT o_orderpriority,
           bit_and(o_orderkey) AS agg_and,
           bit_or(o_orderkey) AS agg_or,
           bit_xor(o_orderkey) AS agg_xor,
           MIN((o_orderkey & 255) | 4096) AS min_masked,
           MAX((o_orderkey % 1024) << 3) AS max_shifted,
           CAST(SUM(xor(o_orderkey % 256, 170)) AS BIGINT) AS sum_xored
    FROM orders
    GROUP BY o_orderpriority
"""


@register(
    "bitwise_surface",
    _BITWISE_SQL,
    survey_ids="§2.10-bitwise",
    doc="Bitwise scalar + aggregate surface: bit_and/bit_or/bit_xor "
    "aggregates, mask/shift scalars — the arithmetic behind bitmap "
    "flags, feature hashing, and the engine's own LSH band math, all "
    "order-free integer-exact. Dialect trap pinned by the oracle: "
    "Spark's ^ is XOR but DuckDB's ^ is POWER — the SQL twin must use "
    "xor(). One map-side-combining groupBy on 5 priorities.",
)
def q_bitwise_surface(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.bit_and("o_orderkey").alias("agg_and"),
        F.bit_or("o_orderkey").alias("agg_or"),
        F.bit_xor("o_orderkey").alias("agg_xor"),
        F.min(
            F.expr("(o_orderkey & 255) | 4096")
        ).alias("min_masked"),
        F.max(F.expr("shiftleft(o_orderkey % 1024, 3)")).alias("max_shifted"),
        F.sum(F.expr("(o_orderkey % 256) ^ 170")).cast("bigint").alias("sum_xored"),
    )


_OSLO_MONTH_SQL = """
    SELECT user_id,
           date_trunc('month',
               CAST(timezone('Europe/Oslo', timezone('UTC', ts)) AS DATE)
           ) AS month_oslo,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS hours,
           COUNT(*) AS n_entries,
           COUNT(DISTINCT CAST(timezone('Europe/Oslo', timezone('UTC', ts)) AS DATE))
               AS active_days
    FROM events
    WHERE user_id < 100
    GROUP BY 1, 2
"""


@register(
    "oslo_monthly_rollup",
    _OSLO_MONTH_SQL,
    survey_ids="P6,A2-monthly",
    doc="Calendar-month rollup in Europe/Oslo CIVIL time — the "
    "flagship's monthly reporting form: month boundaries fall at Oslo "
    "midnight, not UTC midnight, so rows within ±2h of a month edge "
    "land in the month a Norwegian invoice expects (the DST-shift "
    "cases are exactly where a UTC trunc gets it wrong). Same "
    "session-TZ-independent timezone algebra as the flagship, one "
    "hash shuffle, distinct-day count rides the same grouping.",
)
def q_oslo_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 100)
    day = oslo_date(F.col("ts"))
    return ev.groupBy(
        "user_id", F.trunc(day, "month").alias("month_oslo")
    ).agg(
        F.sum(_dec("value", "decimal(18,2)")).cast("double").alias("hours"),
        F.count("*").alias("n_entries"),
        F.countDistinct(day).alias("active_days"),
    )


_GROUPING_SETS_SQL = """
    SELECT o_orderpriority, o_orderstatus,
           CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_priority,
           CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                            (o_orderpriority), (o_orderstatus))
"""


@register(
    "grouping_sets_surface",
    _GROUPING_SETS_SQL,
    survey_ids="§2.6-grouping-sets",
    doc="Explicit GROUPING SETS (the arbitrary-subset form ROLLUP/CUBE "
    "are sugar for) + GROUPING() markers disambiguating real NULLs "
    "from subtotal rows. Spark expands to ONE Expand + a single "
    "aggregation — one shuffle for all three groupings, not one pass "
    "each. Entered through spark.sql (the DataFrame API has no "
    "grouping-sets builder).",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_GROUPING_SETS_SQL)


# ---------------------------------------------------------------------------
# Round-3 late additions: CDC-out merge, sweep-line concurrency, Markov
# transitions, rank-based winsorization, positional phrase search.
# ---------------------------------------------------------------------------

_CDC_SQL = f"""
    WITH w AS (
        SELECT o_orderkey, o_totalprice FROM orders
        WHERE o_orderdate >= TIMESTAMP '{_MERGE_WINDOW_START} 00:00:00'
    ),
    stg AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 5 <> 1 THEN o_totalprice * 2
                    ELSE o_totalprice END AS o_totalprice
        FROM w WHERE o_orderkey % 3 <> 0
        UNION ALL
        SELECT o_orderkey + 100000000, o_totalprice FROM w
        WHERE o_orderkey % 7 = 0
    ),
    diff AS (
        SELECT COALESCE(f.o_orderkey, s.o_orderkey) AS o_orderkey,
               CASE WHEN f.o_orderkey IS NULL THEN 'inserted'
                    WHEN s.o_orderkey IS NULL THEN 'deleted'
                    WHEN f.o_totalprice <> s.o_totalprice THEN 'updated'
               END AS change
        FROM w f FULL OUTER JOIN stg s ON f.o_orderkey = s.o_orderkey
    )
    SELECT o_orderkey, change FROM diff WHERE change IS NOT NULL
"""


@register(
    "merge_cdc_changelog",
    _CDC_SQL,
    survey_ids="M1-cdc,§2.12-changelog",
    doc="CDC-out merge: the windowed refresh's inserted/updated/deleted "
    "changelog (operators/merge.py merge_refresh_with_changelog) — the "
    "event stream a downstream cache/index/webhook consumer needs. "
    "Staging exercises all four classes: ×2-price updates, %5==1 "
    "unchanged (emit nothing), %3==0 window deletes, +1e8-key inserts. "
    "Scale: both diff sides are the WINDOW slices (partition-pruned at "
    "100 TB), full-outer on the key both are hash-partitioned by; "
    "history outside W is never scanned. Spark classifies via a row "
    "hash over non-key columns; the oracle compares values directly — "
    "same classes by construction.",
)
def q_merge_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hours_api_clickup_spark.operators.merge import (
        merge_refresh_with_changelog,
    )

    orders = load_table(spark, sf_dir, "orders").select(*_ORDER_COLS)
    w_pred = F.col("o_orderdate") >= F.lit(_MERGE_WINDOW_START).cast("timestamp")
    w_orders = orders.filter(w_pred)
    upd = w_orders.filter(F.col("o_orderkey") % 3 != 0).withColumn(
        "o_totalprice",
        F.when(
            F.col("o_orderkey") % 5 != 1, F.col("o_totalprice") * 2
        ).otherwise(F.col("o_totalprice")),
    )
    ins = w_orders.filter(F.col("o_orderkey") % 7 == 0).withColumn(
        "o_orderkey", F.col("o_orderkey") + F.lit(100000000)
    )
    staging = upd.unionByName(ins)
    _, changes = merge_refresh_with_changelog(
        orders, staging, w_pred, key="o_orderkey"
    )
    return changes



# ---------------------------------------------------------------------------
# Round-4 SQL-surface additions: recursive CTE, LATERAL join, LISTAGG,
# VARIANT — the Spark 4 front-door features the §2 surface tables map to
# when a consumer outgrows the reference's flat SQL (docs/*.md doc-SQL).
# ---------------------------------------------------------------------------

_RECURSIVE_CTE_SQL = """
    WITH RECURSIVE chain AS (
        SELECT s_suppkey AS suppkey, s_suppkey AS root, 0 AS depth
        FROM supplier WHERE s_suppkey < 10
        UNION ALL
        SELECT s.s_suppkey, c.root, c.depth + 1
        FROM supplier s JOIN chain c ON s.s_suppkey {div} 10 = c.suppkey
        WHERE s.s_suppkey >= 10
    )
    SELECT root, depth, COUNT(*) AS n_members,
           CAST(SUM(suppkey) AS BIGINT) AS sum_keys
    FROM chain GROUP BY root, depth
"""


@register(
    "recursive_cte_hierarchy",
    _RECURSIVE_CTE_SQL.format(div="//"),
    survey_ids="§2.8-recursive",
    doc="Recursive CTE (WITH RECURSIVE, new in Spark 4) computing the "
    "transitive closure of a supplier forest (parent = suppkey div 10 "
    "— the decimal-trie hierarchy): every node labeled with its root "
    "and depth, then rolled up per (root, depth). The iterative form "
    "S3's space→folder→list walk takes when the tree depth is not "
    "known at plan time (fetch_clickup_data.py:196-279 hardcodes 3 "
    "levels). Scale: breadth-first UnionLoop — one equi-join per "
    "level, ⌈log10 n⌉ iterations, total work linear in nodes; never "
    "a per-row driver walk. Oracle is the same WITH RECURSIVE in "
    "DuckDB (// vs div integer division is the only dialect delta).",
)
def q_recursive_cte(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql(_RECURSIVE_CTE_SQL.format(div="div"))


@register(
    "listagg_surface",
    """
    SELECT c_nationkey AS nationkey,
           string_agg(DISTINCT c_mktsegment, '|' ORDER BY c_mktsegment)
               AS segments,
           COUNT(*) AS n_customers
    FROM customer GROUP BY c_nationkey
    """,
    survey_ids="§2.6-listagg,E2-native",
    doc="Native LISTAGG(DISTINCT …) WITHIN GROUP (ORDER BY …) — the "
    "ISO form of the reference's ', '.join denormalization "
    "(fetch_clickup_data.py:596-598,742-748) as ONE aggregate instead "
    "of collect_set→array_sort→array_join. Deterministic because the "
    "WITHIN GROUP order is total; DuckDB twin is string_agg(DISTINCT "
    "… ORDER BY …). One hash shuffle on the group key; per-group "
    "state is the distinct-segment set (bounded by the domain, not "
    "the row count). Known engine edge pinned by this round's "
    "regression hunt: combining listagg(DISTINCT) WITHIN GROUP with a "
    "second COUNT(DISTINCT) in the same SELECT trips a Spark 4.1 "
    "distinct-rewrite ClassCastException — the companion aggregate "
    "here is deliberately non-distinct.",
)
def q_listagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    return spark.sql(
        """
        SELECT c_nationkey AS nationkey,
               listagg(DISTINCT c_mktsegment, '|')
                   WITHIN GROUP (ORDER BY c_mktsegment) AS segments,
               COUNT(*) AS n_customers
        FROM customer GROUP BY c_nationkey
        """
    )


_LATERAL_TOPK_SQL = """
    SELECT o.o_orderkey AS orderkey, t.l_quantity AS qty,
           t.l_linenumber AS lineno
    FROM orders o,
    LATERAL (
        SELECT l.l_quantity, l.l_linenumber FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
        ORDER BY l.l_quantity DESC, l.l_linenumber LIMIT 2
    ) t
    WHERE o.o_orderpriority = '1-URGENT'
"""


@register(
    "lateral_join_topk",
    _LATERAL_TOPK_SQL,
    survey_ids="§2.5-lateral,D2",
    doc="Correlated LATERAL subquery with ORDER BY … LIMIT 2 — top-2 "
    "line items per urgent order written as the per-row subquery a "
    "SQL author reaches for. Catalyst DECORRELATES it: the per-order "
    "LIMIT becomes a row_number window (WindowGroupLimit pushes the "
    "2-heap below the shuffle) joined back on the equi-key — the "
    "identical physical plan to the hand-built topk_per_group, from "
    "the naive declarative form (plan-gated: no nested-loop, no "
    "per-row re-scan). Same SQL text runs on DuckDB as the oracle.",
)
def q_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(_LATERAL_TOPK_SQL)


@register(
    "variant_json_surface",
    """
    SELECT
        priority,
        COUNT(*) AS n,
        CAST(SUM(CAST(j->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
        CAST(SUM(CAST(j->>'$.items[1]' AS BIGINT)) AS BIGINT) AS sum_item1,
        CAST(SUM(CASE WHEN (j->>'$.absent') IS NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_absent,
        MIN(j->>'$.st') AS min_status
    FROM (
        SELECT o_orderpriority AS priority,
               CONCAT('{"k":', o_orderkey, ',"st":"', o_orderstatus,
                      '","items":[', o_custkey, ',', o_orderkey % 7, ']}')
                   AS j
        FROM orders
    )
    GROUP BY priority
    """,
    survey_ids="P2-variant,§2.10-json",
    doc="Spark 4 VARIANT ingestion: parse_json into the binary VARIANT "
    "type, then typed variant_get path extraction (object field, "
    "array index, absent-path → NULL) aggregated per priority. The "
    "schema-on-read form of P2's nested-struct access for payloads "
    "whose shape drifts (the reference's custom_fields values, "
    "fetch_clickup_data.py:547-549, are exactly such a column). "
    "VARIANT keeps extraction JVM-side on a binary-encoded tree — no "
    "per-row JSON re-parse per path, no Python. Oracle extracts the "
    "same paths with DuckDB's ->> JSON operators. Grouped result: "
    "the driver compares 5 rows however large the corpus.",
)
def q_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT
            priority,
            COUNT(*) AS n,
            CAST(SUM(variant_get(v, '$.k', 'long')) AS BIGINT) AS sum_k,
            CAST(SUM(variant_get(v, '$.items[1]', 'long')) AS BIGINT)
                AS sum_item1,
            SUM(CASE WHEN variant_get(v, '$.absent', 'string') IS NULL
                     THEN 1 ELSE 0 END) AS n_absent,
            MIN(variant_get(v, '$.st', 'string')) AS min_status
        FROM (
            SELECT o_orderpriority AS priority,
                   parse_json(concat('{"k":', CAST(o_orderkey AS STRING),
                       ',"st":"', o_orderstatus,
                       '","items":[', CAST(o_custkey AS STRING), ',',
                       CAST(o_orderkey % 7 AS STRING), ']}')) AS v
            FROM orders
        )
        GROUP BY priority
        """
    )


def _pyds_fixture(spark: SparkSession, sf_dir: str, n_chunks: int = 5) -> str:
    """Deterministic per-sf fixture dir for the paged-events source;
    rebuilt only when the source bytes or layout changed (the sidecar
    meta check in write_fixture_from_events), so repeated queries pay
    the ingest once."""
    import os
    import re as _re
    import tempfile

    from hours_api_clickup_spark.sources.pyds import (
        write_fixture_from_events,
    )

    path = os.path.join(
        tempfile.gettempdir(),
        f"hours_pyds_fixture_c{n_chunks}_" + _re.sub(r"\W", "_", sf_dir),
    )
    write_fixture_from_events(
        spark, sf_dir, path, n_chunks=n_chunks, reuse=True
    )
    return path


_PYDS_ORACLE = """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS sum_cents,
           MIN(epoch_ms(ts)) AS min_ts_ms,
           MAX(epoch_ms(ts)) AS max_ts_ms,
           COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type
"""


@register(
    "python_datasource_scan",
    _PYDS_ORACLE,
    survey_ids="S1,S2,S4,S6,P13",
    doc="The REST scan mounted INSIDE the engine: a Spark 4 Python "
    "DataSource (sources/pyds.py) whose input partitions are the "
    "30-day-window chunks (fetch_clickup_data.py:124-147), each "
    "paged 100 rows per request in-partition with the reference's "
    "termination policies (:403-465, :516-624), the event_type "
    "filter applied server-side (query-param pushdown analog, "
    ":96-104) and failed chunks skipped not fatal (:140-144). "
    "Chunks fetch in PARALLEL across executors with Spark task "
    "retry — the property the reference's sequential driver loop "
    "gives up. Fixture-backed like the rest of the ingest layer "
    "(JSONL per chunk, written distributed; epoch-ms int64 + "
    "shortest-roundtrip doubles make the hop lossless), then "
    "rolled up per event type; the oracle computes the same "
    "aggregate straight from the parquet — proving the whole "
    "source path bit-exact.",
)
def q_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    from hours_api_clickup_spark.sources.pyds import read_paged_events

    path = _pyds_fixture(spark, sf_dir)
    df = read_paged_events(spark, path)
    return df.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("sum_cents"),
        F.min("ts_ms").alias("min_ts_ms"),
        F.max("ts_ms").alias("max_ts_ms"),
        F.countDistinct("user_id").alias("n_users"),
    )


@register(
    "lambda_hof_surface",
    """
    SELECT priority,
           COUNT(*) AS n,
           CAST(SUM(2*k7 + 2*c5 + 2*k3) AS BIGINT) AS sum_doubled,
           CAST(SUM((k7+1)%2 + (c5+1)%2 + (k3+1)%2) AS BIGINT)
               AS n_even_elems,
           CAST(SUM(k7*k2 + c5*c4 + k3*k6) AS BIGINT) AS sum_dot,
           CAST(SUM(CASE WHEN k7=0 OR c5=0 OR k3=0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_with_zero,
           CAST(SUM(CASE WHEN k7<7 AND c5<7 AND k3<7 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_all_small
    FROM (
        SELECT o_orderpriority AS priority,
               o_orderkey % 7 AS k7, o_custkey % 5 AS c5,
               o_orderkey % 3 AS k3, o_orderkey % 2 AS k2,
               o_custkey % 4 AS c4, o_orderkey % 6 AS k6
        FROM orders
    )
    GROUP BY priority
    """,
    survey_ids="§2.10-lambda-hof",
    doc="Array lambda higher-order functions — transform / filter / "
    "aggregate(fold) / zip_with / exists / forall — the JVM-side "
    "array programming surface (SURVEY §2.10's comprehension analogs, "
    "fetch_clickup_data.py:556,598,747, generalized to lambdas). "
    "zip_with × aggregate composes the in-row dot product the "
    "embedding family uses at scale. All-integer arithmetic; the "
    "oracle evaluates the same element expressions scalar-wise, so "
    "any HOF semantic drift (1-based indexing, null element handling, "
    "fold order) breaks the hash. Projection-only: one shuffle for "
    "the 5-row rollup, codegen'd HOFs, no Python anywhere.",
)
def q_lambda_hof(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT priority,
               COUNT(*) AS n,
               CAST(SUM(aggregate(transform(a, x -> x * 2), 0L,
                                  (acc, x) -> acc + x)) AS BIGINT)
                   AS sum_doubled,
               CAST(SUM(size(filter(a, x -> x % 2 = 0))) AS BIGINT)
                   AS n_even_elems,
               CAST(SUM(aggregate(zip_with(a, b, (x, y) -> x * y), 0L,
                                  (acc, x) -> acc + x)) AS BIGINT)
                   AS sum_dot,
               SUM(CASE WHEN exists(a, x -> x = 0) THEN 1 ELSE 0 END)
                   AS n_with_zero,
               SUM(CASE WHEN forall(a, x -> x < 7) THEN 1 ELSE 0 END)
                   AS n_all_small
        FROM (
            SELECT o_orderpriority AS priority,
                   array(o_orderkey % 7, o_custkey % 5, o_orderkey % 3)
                       AS a,
                   array(o_orderkey % 2, o_custkey % 4, o_orderkey % 6)
                       AS b
            FROM orders
        )
        GROUP BY priority
        """
    )


@register(
    "map_functions_surface",
    """
    SELECT priority,
           COUNT(*) AS n,
           CAST(SUM(a3 + c7) AS BIGINT) AS sum_zip_a,
           CAST(SUM(c5 * 10) AS BIGINT) AS sum_tv_b,
           CAST(SUM((CASE WHEN a3>1 THEN 1 ELSE 0 END)
                  + (CASE WHEN c5>1 THEN 1 ELSE 0 END)) AS BIGINT)
               AS n_filtered,
           CAST(SUM(3) AS BIGINT) AS n_concat,
           CAST(SUM(a3) AS BIGINT) AS sum_tk_a
    FROM (
        SELECT o_orderpriority AS priority,
               o_orderkey % 3 AS a3, o_custkey % 5 AS c5,
               o_custkey % 7 AS c7
        FROM orders
    )
    GROUP BY priority
    """,
    survey_ids="P17,§2.10-map-hof",
    doc="Map higher-order functions — map_zip_with (outer-union of key "
    "sets with null-absent sides), transform_keys / transform_values, "
    "map_filter, map_concat — P17's custom-field map probe extended "
    "to the full map-programming surface. Each HOF result is probed "
    "back to a scalar via element_at, so the oracle replays the "
    "values from the generating expressions without needing map "
    "types at all; integer-exact. Projection-only + 5-row rollup.",
)
def q_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT priority,
               COUNT(*) AS n,
               CAST(SUM(element_at(
                   map_zip_with(m1, m2,
                       (k, v1, v2) -> coalesce(v1, 0L) + coalesce(v2, 0L)),
                   'a')) AS BIGINT) AS sum_zip_a,
               CAST(SUM(element_at(
                   transform_values(m1, (k, v) -> v * 10), 'b'))
                   AS BIGINT) AS sum_tv_b,
               CAST(SUM(size(map_filter(m1, (k, v) -> v > 1)))
                   AS BIGINT) AS n_filtered,
               CAST(SUM(size(map_concat(m1, map('c', o_orderkey % 11))))
                   AS BIGINT) AS n_concat,
               CAST(SUM(element_at(
                   transform_keys(m1, (k, v) -> upper(k)), 'A'))
                   AS BIGINT) AS sum_tk_a
        FROM (
            SELECT o_orderpriority AS priority, o_orderkey,
                   map('a', o_orderkey % 3, 'b', o_custkey % 5) AS m1,
                   map('a', o_custkey % 7, 'x', o_orderkey % 2) AS m2
            FROM orders
        )
        GROUP BY priority
        """
    )


_PIPE_SQL = """
    FROM lineitem
    |> WHERE l_shipdate >= DATE '1997-01-01'
    |> EXTEND CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5)
                   AS BIGINT) AS rev_cents
    |> AGGREGATE COUNT(*) AS n_items, SUM(rev_cents) AS rev
       GROUP BY l_orderkey
    |> JOIN orders o ON l_orderkey = o.o_orderkey
    |> WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH')
    |> AGGREGATE COUNT(*) AS n_orders,
                 CAST(SUM(rev) AS BIGINT) AS rev_cents_total,
                 CAST(SUM(n_items) AS BIGINT) AS n_items_total
       GROUP BY o.o_orderpriority
    |> SELECT o_orderpriority AS priority, n_orders, n_items_total,
              rev_cents_total
"""


@register(
    "pipe_syntax_surface",
    """
    SELECT o.o_orderpriority AS priority,
           COUNT(*) AS n_orders,
           CAST(SUM(t.n_items) AS BIGINT) AS n_items_total,
           CAST(SUM(t.rev) AS BIGINT) AS rev_cents_total
    FROM (
        SELECT l_orderkey, COUNT(*) AS n_items,
               SUM(CAST(FLOOR(l_extendedprice * (1 - l_discount) * 100
                              + 0.5) AS BIGINT)) AS rev
        FROM lineitem WHERE l_shipdate >= DATE '1997-01-01'
        GROUP BY l_orderkey
    ) t JOIN orders o ON t.l_orderkey = o.o_orderkey
    WHERE o.o_orderpriority IN ('1-URGENT', '2-HIGH')
    GROUP BY o.o_orderpriority
    """,
    survey_ids="§2.10-pipe-sql",
    doc="SQL pipe syntax (Spark 4, |> operators): scan → filter → "
    "EXTEND (computed column) → per-order aggregate → join → filter → "
    "re-aggregate → projection as a linear dataflow — the front-door "
    "form that reads like the DataFrame chain and compiles to the "
    "identical Catalyst plan as the nested-subquery spelling the "
    "oracle uses (same pushdown, same partial aggregation, same "
    "broadcast decision; nothing about the syntax changes the "
    "physical plan). Revenue kept integer-cents end to end.",
)
def q_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(_PIPE_SQL)


@register(
    "udtf_lateral_surface",
    """
    SELECT n.n_nationkey AS nationkey, u.w AS word,
           CAST(u.pos AS INT) AS pos, CAST(LENGTH(u.w) AS INT) AS wlen
    FROM nation n,
    LATERAL (
        SELECT unnest(string_split(n.n_name || ' region ' || n.n_regionkey,
                                   ' ')) AS w,
               generate_subscripts(string_split(n.n_name || ' region ' ||
                                                n.n_regionkey, ' '), 1)
                   AS pos
    ) u
    """,
    survey_ids="§2.12-udtf",
    doc="Python user-defined table function (Spark 4 @udtf) applied "
    "LATERALLY per input row — the pluggable UDTF surface SURVEY "
    "§2.12 notes the reference lacks entirely. The generator yields "
    "(word, 1-based position, length) rows from a per-nation string; "
    "the oracle replays it with unnest + generate_subscripts. The "
    "class is defined inside the query fn so cloudpickle ships it by "
    "value (vanilla sessions have no package on the worker path — "
    "same stance as sources/pyds.py). Deliberately DIM-SIZED input: "
    "a UDTF is row-at-a-time Python, the right tool for plugging "
    "custom generators over small tables; corpus-sized fan-out "
    "belongs to codegen explode (doc_chunking) or Arrow-batched "
    "mapInPandas (multimodal_frame_sample), which this repo uses on "
    "every hot path.",
)
def q_udtf_lateral(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="word string, pos int, wlen int")
    class WordsUdtf:
        def eval(self, s: str):
            for i, w in enumerate((s or "").split(" ")):
                yield (w, i + 1, len(w))

    spark.udtf.register("words_udtf", WordsUdtf)
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation")
    return spark.sql(
        """
        SELECT n.n_nationkey AS nationkey, t.word, t.pos, t.wlen
        FROM nation n,
        LATERAL words_udtf(concat_ws(' ', n.n_name, 'region',
                                     CAST(n.n_regionkey AS STRING))) t
        """
    )


@register(
    "jsonl_quarantine_ingest",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT)
               AS sum_cents
    FROM events WHERE event_id % 50 <> 0
    GROUP BY event_type
    UNION ALL
    SELECT '__quarantined__' AS event_type,
           COUNT(*) AS n,
           CAST(0 AS BIGINT) AS sum_cents
    FROM events WHERE event_id % 50 = 0
    """,
    survey_ids="P3,S2-tolerance",
    doc="Per-row error tolerance as a DRIVER-CHECKED behavior (P3, "
    "fetch_clickup_data.py:891-926 routes transform failures instead "
    "of dying): the events table is serialized to JSONL with every "
    "50th record deliberately corrupted at the text level, read back "
    "through the PERMISSIVE quarantine reader (one scan serves both "
    "outputs; malformed lines carry their raw text + source file for "
    "replay), and rolled up — valid rows per type plus one "
    "__quarantined__ row proving every bad line was routed, none "
    "dropped, none fatal. The oracle computes both sides from the "
    "parquet with the same corruption predicate.",
)
def q_jsonl_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import re as _re
    import tempfile

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from hours_api_clickup_spark.sources.readers import (
        read_json_with_quarantine,
    )

    ev = load_table(spark, sf_dir, "events")
    line = F.when(
        F.col("event_id") % 50 == 0,
        F.concat(
            F.lit('{"event_id":'),
            F.col("event_id").cast("string"),
            F.lit(",BROKEN"),
        ),
    ).otherwise(
        F.to_json(F.struct("event_id", "user_id", "event_type", "value"))
    )
    stage = os.path.join(
        tempfile.gettempdir(),
        "hours_quarantine_fixture_" + _re.sub(r"\W", "_", sf_dir),
    )
    ev.select(line.alias("value")).write.mode("overwrite").text(stage)

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("user_id", LongType()),
            StructField("event_type", StringType()),
            StructField("value", DoubleType()),
        ]
    )
    valid, quarantine = read_json_with_quarantine(spark, stage, schema)
    good = valid.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("sum_cents"),
    )
    bad = quarantine.agg(
        F.lit("__quarantined__").alias("event_type"),
        F.count("*").alias("n"),
        F.lit(0).cast("bigint").alias("sum_cents"),
    ).select("event_type", "n", "sum_cents")
    return good.unionByName(bad)
