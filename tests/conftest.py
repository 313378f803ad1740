from __future__ import annotations

import math
import os

import duckdb
import pytest

from hours_api_clickup_spark.plans.registry import TABLE_NAMES
from hours_api_clickup_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.01")
SF_DIR_SMOKE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark(tmp_path_factory):
    wh = tmp_path_factory.mktemp("warehouse")
    s = get_spark(
        app_name="tests",
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.sql.warehouse.dir": str(wh)},
    )
    yield s


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        path = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(path):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')"
            )
    yield con
    con.close()


def _norm_cell(v):
    """Normalize a cell for order-insensitive comparison."""
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):  # date/datetime
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(_norm_cell(x) for x in v)
    return v


def rows_to_multiset(cols, rows):
    """Sort columns by name (driver behavior), normalize, sort rows."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(
        (tuple(_norm_cell(r[i]) for i in order) for r in rows),
        key=lambda t: tuple((x is None, str(x)) for x in t),
    )


def compare_spark_duckdb(spark_df, duck_con, sql, *, float_tol=0.0):
    """Mimic the driver's correctness gate: row count + column names +
    order-insensitive value comparison with columns sorted by name."""
    s_rows = [tuple(r) for r in spark_df.collect()]
    s_cols = spark_df.columns
    rel = duck_con.sql(sql)
    d_rows = rel.fetchall()
    d_cols = [d[0] for d in rel.description]

    assert sorted(s_cols) == sorted(d_cols), (
        f"column mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    )
    assert len(s_rows) == len(d_rows), (
        f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    s_ms = rows_to_multiset(s_cols, s_rows)
    d_ms = rows_to_multiset(d_cols, d_rows)
    mism = 0
    first = None
    for a, b in zip(s_ms, d_ms):
        if a != b and not _rows_close(a, b, float_tol):
            mism += 1
            if first is None:
                first = (a, b)
    assert mism == 0, f"{mism} mismatched rows; first: {first}"


def _rows_close(a, b, tol):
    if tol <= 0 or len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if x == y:
            continue
        if isinstance(x, float) and isinstance(y, float):
            if math.isclose(x, y, rel_tol=tol, abs_tol=tol):
                continue
        return False
    return True
