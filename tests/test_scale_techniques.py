"""Scale-technique verification: salted aggregation equals plain
aggregation (and actually spreads the hot key), and bucketed tables join
with zero exchanges."""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import functions as F

from hours_api_clickup_spark.operators.skew import salted_agg, with_salt
from hours_api_clickup_spark.plans.registry import load_table
from hours_api_clickup_spark.sinks.writers import write_bucketed
from tests.conftest import SF_DIR


def _skewed_df(spark):
    # 90% of rows share one hot key
    return spark.range(0, 20_000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 100).cast("string"))
        ).alias("k"),
        (F.col("id") % 7).cast("double").alias("v"),
    )


def test_salted_agg_matches_plain(spark):
    df = _skewed_df(spark)
    plain = df.groupBy("k").agg(
        F.sum("v").alias("total"), F.count("*").alias("n")
    )
    salted = salted_agg(
        df,
        ["k"],
        {
            "total": (F.sum("v"), F.sum("total")),
            "n": (F.count("*"), F.sum("n")),
        },
        n_salts=8,
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salt_spreads_hot_key(spark):
    df = _skewed_df(spark)
    per_salt = (
        with_salt(df, 8)
        .filter(F.col("k") == "hot")
        .groupBy("__salt")
        .count()
        .collect()
    )
    assert len(per_salt) == 8  # the hot key now occupies 8 reducers
    counts = [r["count"] for r in per_salt]
    assert max(counts) < sum(counts)  # genuinely spread, not one bucket


def test_bucketed_join_no_shuffle(spark):
    orders = load_table(spark, SF_DIR, "orders")
    li = load_table(spark, SF_DIR, "lineitem")
    write_bucketed(orders, "b_orders", "o_orderkey", 8)
    write_bucketed(
        li.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        "o_orderkey",
        8,
    )
    joined = (
        spark.table("b_lineitem")
        .hint("merge")  # force SMJ so the exchange absence is meaningful
        .join(spark.table("b_orders"), "o_orderkey")
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        joined.explain()
    plan = buf.getvalue()
    # co-located bucketed join: sort-merge with NO shuffle on either side
    assert "SortMergeJoin" in plan
    assert "Exchange hashpartitioning" not in plan, plan
    assert joined.count() == li.count()
