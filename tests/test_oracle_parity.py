"""Oracle parity: every registry query with an oracle must hash-match its
DuckDB twin at sf0.01 — this mirrors the driver's correctness gate
(CORRECTNESS_r{N}.json) with zero float tolerance."""

from __future__ import annotations

import pytest

from hours_api_clickup_spark.plans.registry import QUERIES
from tests.conftest import SF_DIR, compare_spark_duckdb

ORACLED = sorted(name for name, spec in QUERIES.items() if spec.oracle)


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_parity(spark, duck, name):
    spec = QUERIES[name]
    df = spec.fn(spark, SF_DIR)
    compare_spark_duckdb(df, duck, spec.oracle)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()) <= set(e.queries())
