"""Plan audit: programmatic guardrails against scale anti-patterns.

The repo's own test suite pins plan shapes query-by-query
(tests/test_plan_shapes.py); this module exposes the same checks as a
LIBRARY so user pipelines can gate their plans in CI or refuse to
launch a 100 TB job whose plan would melt the cluster:

    problems = audit_plan(df)            # [] when clean
    assert_scalable(df)                  # raises PlanAuditError otherwise

Checks are string inspections of the physical plan (the same surface
``df.explain()`` prints — stable across Spark 3.x/4.x for these
operator names):

- ``cartesian``        CartesianProduct / BroadcastNestedLoopJoin — the
                       O(n·m) joins; legitimate only for bounded sides,
                       so they're flagged for a human to allowlist.
- ``global-window``    a window over an empty PARTITION BY clause
                       (SinglePartition exchange feeding a Window/Sort)
                       — collapses the table onto one task. The
                       two-phase forms (operators/quantiles.py,
                       datapipe/packing.py) exist precisely to avoid it.
- ``python-row-udf``   BatchEvalPython = row-at-a-time Python UDF in
                       the plan (ArrowEvalPython / MapInPandas are the
                       sanctioned vectorized paths and are NOT flagged).
- ``global-sort``      a rangepartitioning exchange (global orderBy)
                       that isn't immediately a TakeOrderedAndProject —
                       full-table sorts are almost never what a
                       pipeline means (top-k compiles to the heap form).

``allow`` silences named checks where the shape is intentional (e.g. a
broadcast nested-loop against a literal 1-row bound is fine —
textstats' corpus-count crossJoin is the canonical example).
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame

CHECKS = ("cartesian", "global-window", "python-row-udf", "global-sort")


class PlanAuditError(AssertionError):
    """A plan failed ``assert_scalable`` — carries the findings list."""

    def __init__(self, problems: list[str], plan: str):
        self.problems = problems
        self.plan = plan
        super().__init__(
            "plan audit failed: " + "; ".join(problems) + "\n" + plan
        )


def physical_plan(df: DataFrame) -> str:
    """The simple-mode physical plan as a string."""
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain()
    return buf.getvalue()


def audit_plan(
    df: DataFrame, allow: tuple[str, ...] = (), plan: str | None = None
) -> list[str]:
    """Return findings ("check: detail" strings); empty list == clean.
    ``plan`` lets a caller reuse an already-computed physical plan
    (Catalyst planning on big multi-join plans can take seconds)."""
    if plan is None:
        plan = physical_plan(df)
    problems: list[str] = []

    if "cartesian" not in allow:
        for op in ("CartesianProduct", "BroadcastNestedLoopJoin"):
            if op in plan:
                problems.append(
                    f"cartesian: {op} in plan — O(n·m) join; broadcast an "
                    "equi-key or bucketize the range predicate"
                )
    if "global-window" not in allow:
        # A global window shows as a Window operator DOWNSTREAM of a
        # SinglePartition exchange in the same operator chain. Plain
        # co-occurrence anywhere in the plan false-positived on clean
        # pipelines that have a keyed window AND an unrelated global
        # single-row aggregate (review r6) — so require the exchange to
        # appear between the Window line and the next Exchange above it
        # in the printed bottom-up tree (explain prints operators with
        # children below, so the window's input follows its line).
        lines = plan.splitlines()
        for i, line in enumerate(lines):
            if "Window" not in line:
                continue
            for nxt in lines[i + 1:]:
                if "Exchange" in nxt:
                    if "SinglePartition" in nxt:
                        problems.append(
                            "global-window: window over SinglePartition "
                            "exchange — the whole input lands on one "
                            "task; use a two-phase form (range exchange "
                            "+ broadcast offsets)"
                        )
                    break
            if problems and problems[-1].startswith("global-window"):
                break
    if "python-row-udf" not in allow and "BatchEvalPython" in plan:
        problems.append(
            "python-row-udf: row-at-a-time Python UDF — use builtins or "
            "an Arrow-batched pandas_udf/mapInPandas"
        )
    if "global-sort" not in allow:
        if "rangepartitioning" in plan and "TakeOrderedAndProject" not in plan:
            problems.append(
                "global-sort: rangepartitioning exchange without a "
                "top-k — full-table sort; orderBy().limit() compiles to "
                "the per-partition heap form if k is what you meant"
            )
    return problems


def assert_scalable(df: DataFrame, allow: tuple[str, ...] = ()) -> None:
    """Raise ``PlanAuditError`` when ``audit_plan`` finds problems."""
    plan = physical_plan(df)  # planned once; shared with the error payload
    problems = audit_plan(df, allow, plan=plan)
    if problems:
        raise PlanAuditError(problems, plan)
