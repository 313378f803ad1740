from __future__ import annotations

import math
import os
from decimal import Decimal

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
    """Normalize a cell, mirroring the DRIVER's strictness (r4 lesson):
    container cells are a hard error (the driver's pandas hash throws
    `unhashable type: 'list'`), and the numeric type CLASS is part of
    the identity — Arrow HUGEINT→float64 decay must surface as a
    mismatch instead of being masked by Python's `1 == 1.0`."""
    if v is None:
        return None
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("f", "NaN")
        return ("f", v)
    if isinstance(v, Decimal):
        # normalize() canonicalizes scale (1.50 -> 1.5) so the string
        # sort key agrees for numerically-equal decimals.
        return ("d", v.normalize())
    if hasattr(v, "isoformat"):  # date/datetime
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, (list, tuple, dict, set)):
        raise AssertionError(
            "container-typed output cell reached the compare — the "
            "driver's hash gate cannot handle these; serialize the "
            f"column to a string in query AND oracle: {v!r}"
        )
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


_NUM_TAGS = ("i", "f", "d")


def _rows_close(a, b, tol):
    """Tolerance compare that preserves the driver's dtype strictness:
    the numeric type TAG must match before math.isclose is consulted,
    so an int64-vs-float64 drift (e.g. HUGEINT→float64 Arrow decay)
    still fails even on queries compared with float_tol > 0 — the
    driver's dtype-sensitive hash would reject it, so we must too."""
    if tol <= 0 or len(a) != len(b):
        return False
    for x, y in zip(a, b):
        if x == y:
            continue
        if (
            isinstance(x, tuple)
            and isinstance(y, tuple)
            and len(x) == 2
            and len(y) == 2
            and x[0] in _NUM_TAGS
            and x[0] == y[0]
        ):
            try:
                if math.isclose(
                    float(x[1]), float(y[1]), rel_tol=tol, abs_tol=tol
                ):
                    continue
            except (ValueError, OverflowError):
                pass
        return False
    return True
