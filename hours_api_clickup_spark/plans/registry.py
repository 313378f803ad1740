"""Driver-facing query registry: façade + driver-window rotation.

The query definitions live in the family modules (split round 4):

- ``registry_core``       shared plumbing: QUERIES, register, load_table
- ``registry_reference``  SURVEY §2 staples + SQL-surface queries
- ``registry_datapipe``   training-data pipeline (dedup/ANN/text/sampling)
- ``registry_streaming``  Structured Streaming queries
- ``registry_analytics``  time-series / robust-stats / scale techniques

Importing this module imports them all (registration is an import
side-effect), then applies the driver-window rotation derived from the
committed CORRECTNESS_r*.json history. Public names are re-exported so
``from ...plans.registry import QUERIES, load_table`` keeps working.
"""

from __future__ import annotations

from hours_api_clickup_spark.plans.registry_core import (  # noqa: F401
    QUERIES,
    QuerySpec,
    TABLE_NAMES,
    _NANOS_TS_COLS,
    _dec,
    load_table,
    register,
)

# family imports populate QUERIES in registration order
from hours_api_clickup_spark.plans import registry_reference  # noqa: F401,E402
from hours_api_clickup_spark.plans import registry_datapipe  # noqa: F401,E402
from hours_api_clickup_spark.plans import registry_streaming  # noqa: F401,E402
from hours_api_clickup_spark.plans import registry_analytics  # noqa: F401,E402

# bench.py clears these between timed phases
from hours_api_clickup_spark.plans.registry_datapipe import (  # noqa: F401,E402
    _ANN_INDEX_CACHE,
    _LSH_PAIRS_CACHE,
)



# --------------------------------------------------------------------------
# Driver-window rotation — DERIVED from the committed CORRECTNESS_r*.json
# history (repo root), not hand-maintained lists. The driver checks only
# the first 50 registry entries per round, so ordering is coverage policy:
#   1. the flagship is pinned first (smoke-checked every round),
#   2. queries with NO green driver row in any round come next, in
#      registration order (these are the ones the window must prove),
#   3. green queries follow, ordered by how stale their evidence is —
#      most-recently-green last — so remaining slots re-verify the
#      oldest proofs first.
# A query is "driver-green" in a round when its row has a true value
# hash match, or (for non-SQL-expressible ops the driver checks
# rows-only) err == "no_oracle" with a recorded row count.


def _driver_green_rounds() -> dict[str, list[int]]:
    """Map query name -> sorted list of rounds with a green driver row."""
    import json
    import re
    from pathlib import Path

    root = Path(__file__).resolve().parents[2]
    greens: dict[str, list[int]] = {}
    for path in sorted(root.glob("CORRECTNESS_r*.json")):
        m = re.search(r"r(\d+)", path.stem)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            rows = json.loads(path.read_text())
        except (OSError, ValueError):
            continue
        if not isinstance(rows, dict):
            # a round file that parses to a list/string must be skipped
            # like an unreadable one — rotation runs at import time, so
            # crashing here would take down every consumer of QUERIES
            # including the grading driver (review r6)
            continue
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            # the rows-only fallback counts as green ONLY for queries
            # that genuinely register no oracle (QuerySpec.oracle is
            # None) — a query WITH an oracle whose driver row somehow
            # reads err == "no_oracle" is a driver/registry mismatch
            # and must be re-proven, not silently exempted from hash
            # evidence (VERDICT r9 nit; the branch is dead today — all
            # registered queries carry oracles — and this keeps it
            # dead for them)
            spec = QUERIES.get(name)
            ok = row.get("hash_match") is True or (
                row.get("err") == "no_oracle"
                and row.get("spark_rows") is not None
                and spec is not None
                and spec.oracle is None
            )
            if ok:
                greens.setdefault(name, []).append(rnd)
    return {k: sorted(v) for k, v in greens.items()}


_FLAGSHIP = "flagship_hours_by_user_day"


def derive_driver_order(
    names: list[str], greens: dict[str, list[int]]
) -> list[str]:
    """Pure ordering policy, unit-testable without the filesystem."""
    reg_pos = {n: i for i, n in enumerate(names)}

    def key(n: str):
        if n == _FLAGSHIP:
            return (0, 0, 0)
        rounds = greens.get(n, [])
        if not rounds:
            return (1, 0, reg_pos[n])
        return (2, rounds[-1], reg_pos[n])

    return sorted(names, key=key)


def _reorder_for_driver_window() -> None:
    ordered = derive_driver_order(list(QUERIES), _driver_green_rounds())
    snapshot = {n: QUERIES[n] for n in ordered}
    QUERIES.clear()
    QUERIES.update(snapshot)


_reorder_for_driver_window()
