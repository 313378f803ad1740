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
    """The simple-mode physical plan as a string.

    Goes through QueryExecution.explainString directly: capturing
    ``df.explain()`` via redirect_stdout swaps the process-global
    ``sys.stdout``, so two threads gating plans concurrently could read
    each other's (or mixed) plan text (review r7). The redirect path
    remains as a fallback for API drift."""
    try:
        jvm = df.sparkSession._jvm
        mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "simple"
        )
        return df._jdf.queryExecution().explainString(mode)
    except Exception:  # noqa: BLE001 — connect mode / JVM API drift
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain()
        return buf.getvalue()


def _tree_depth(line: str) -> int:
    """Indentation depth of one explain-tree line: the offset where the
    operator text starts, past the ``+- : | `` scaffolding."""
    return len(line) - len(line.lstrip(" :+-|"))


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
        # single-row aggregate (review r6), so the scan looks for the
        # first Exchange BELOW the Window line — and it must stay
        # INSIDE the window's subtree (lines strictly deeper than the
        # Window's indentation): a window whose input needs no shuffle
        # (bucketed scan) would otherwise leak the scan into a sibling
        # join branch and flag that branch's unrelated SinglePartition
        # aggregate (review r7).
        lines = plan.splitlines()
        for i, line in enumerate(lines):
            if "Window" not in line:
                continue
            w_depth = _tree_depth(line)
            for nxt in lines[i + 1:]:
                if _tree_depth(nxt) <= w_depth:
                    break  # left the window's subtree: no exchange input
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
        # per-line, not plan-wide: a top-k that compiles to
        # TakeOrderedAndProject produces NO rangepartitioning exchange,
        # so any such exchange in the plan IS a full-table sort (or an
        # intentional repartitionByRange — allowlist it). The old
        # plan-wide waiver let a genuine full sort hide behind an
        # unrelated top-k elsewhere in the same plan (review r7).
        if any(
            "Exchange" in line and "rangepartitioning" in line
            for line in plan.splitlines()
        ):
            problems.append(
                "global-sort: rangepartitioning exchange — full-table "
                "sort; orderBy().limit() compiles to the per-partition "
                "heap form if top-k is what you meant (allowlist for an "
                "intentional repartitionByRange)"
            )
    return problems


def assert_scalable(df: DataFrame, allow: tuple[str, ...] = ()) -> None:
    """Raise ``PlanAuditError`` when ``audit_plan`` finds problems."""
    plan = physical_plan(df)  # planned once; shared with the error payload
    problems = audit_plan(df, allow, plan=plan)
    if problems:
        raise PlanAuditError(problems, plan)
