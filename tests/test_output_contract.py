"""Registry-wide output contract — the driver's strictness made local.

Round-4 lesson (VERDICT r4 "What's wrong" #1-#3): the driver's hash gate
(a) throws on container-typed output cells (pandas `unhashable type:
'list'`) and (b) hashes the fetched dtype, so a DuckDB HUGEINT aggregate
that decays to float64 through Arrow hash-mismatches a Spark int64 even
when every value is identical.  Nothing in the local suite guarded
either class, so three round-4 queries reached the driver window red.

This test binds (not executes) every registered oracle through DuckDB
and rejects, for every output column of the final SELECT:

  * container types — LIST / ARRAY / STRUCT / MAP / UNION: would crash
    the driver's hash table.  Serialize to a string (`array_to_string`
    in the oracle, `F.array_join` on the Spark side) instead.
  * HUGEINT / UHUGEINT — DuckDB's 128-bit aggregate type (uncast
    `SUM(CASE ...)`, `SUM(int)`): decays to float64 over Arrow while
    Spark yields int64.  Wrap in `CAST(... AS BIGINT)`.

Binding is milliseconds per query (no execution), so the whole registry
is checked in one short test.  The Spark side of the same contract is
enforced by tests/conftest.py::_norm_cell, which now raises on container
cells and tags numeric type class — test_oracle_parity therefore fails
on exactly the queries the driver would fail on.
"""

from __future__ import annotations

import re

import pytest

from hours_api_clickup_spark.plans.registry import QUERIES

ORACLED = sorted(n for n, s in QUERIES.items() if s.oracle)

_BANNED = re.compile(
    r"HUGEINT|\[\]|^LIST|^ARRAY|^STRUCT|^MAP|^UNION", re.IGNORECASE
)


@pytest.mark.parametrize("name", ORACLED)
def test_oracle_output_types_driver_safe(duck, name):
    rel = duck.sql(QUERIES[name].oracle)
    bad = [
        (col, str(typ))
        for col, typ in zip(rel.columns, rel.types)
        if _BANNED.search(str(typ))
    ]
    assert not bad, (
        f"{name}: driver-unsafe output column types {bad} — serialize "
        "container columns to strings and CAST aggregates to BIGINT/"
        "DOUBLE in BOTH the oracle SQL and the Spark query"
    )
