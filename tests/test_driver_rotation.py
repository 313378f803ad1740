"""The driver checks only the first WINDOW registry entries per round, so
the registry's ordering IS the coverage policy. These tests pin the
derived-rotation invariants (VERDICT r3 next-round #1/#2): ordering is
computed from the committed CORRECTNESS_r*.json history, never-green
queries always occupy the front of the window, and simulated rotation
proves every query in ceil(N/WINDOW) rounds.
"""

from __future__ import annotations

from hours_api_clickup_spark.plans.registry import (
    _FLAGSHIP,
    QUERIES,
    _driver_green_rounds,
    derive_driver_order,
)

WINDOW = 50


def test_flagship_is_first():
    assert next(iter(QUERIES)) == _FLAGSHIP


def test_never_green_queries_fill_front_of_window():
    """Every query with no green driver row sits inside the checked window
    (or, if they outnumber the window, the window is entirely unproven
    queries — the best any single round can do)."""
    greens = _driver_green_rounds()
    names = list(QUERIES)
    never = [n for n in names if n not in greens and n != _FLAGSHIP]
    front = names[:WINDOW]
    if len(never) + 1 <= WINDOW:
        assert set(never) <= set(front), sorted(set(never) - set(front))
    else:
        assert all(n == _FLAGSHIP or n not in greens for n in front)


def test_green_queries_ordered_stalest_first():
    """Among green queries, older most-recent evidence comes earlier, so
    leftover window slots re-verify the stalest proofs."""
    greens = _driver_green_rounds()
    names = list(QUERIES)
    last_green = [greens[n][-1] for n in names if n in greens and n != _FLAGSHIP]
    assert last_green == sorted(last_green)


def test_simulated_rotation_covers_registry():
    """If each round the driver greenlights the first WINDOW entries and
    the ordering is re-derived, every registered query gains a green row
    within ceil(N/WINDOW) rounds. This is the invariant the hand-kept
    _FRONT/_TWICE_GREEN lists drifted away from."""
    names = list(QUERIES)
    greens = {k: list(v) for k, v in _driver_green_rounds().items()}
    n_rounds = -(-len(names) // WINDOW)
    next_round = max((r for rs in greens.values() for r in rs), default=0) + 1
    for rnd in range(next_round, next_round + n_rounds):
        ordered = derive_driver_order(names, greens)
        for n in ordered[:WINDOW]:
            greens.setdefault(n, []).append(rnd)
    missing = [n for n in names if n not in greens]
    assert not missing, missing


def test_rotation_cadence_bound():
    """Steady-state cadence guard (VERDICT r5 #1): simulating many rounds
    from the committed history, no query ever waits more than
    ceil(N/WINDOW) rounds between driver-window slots — the staleness of
    any proof is bounded, so an r2-era streaming proof sitting under
    three rounds of churn (the r5 finding) cannot recur."""
    names = list(QUERIES)
    greens = {k: list(v) for k, v in _driver_green_rounds().items()}
    max_gap = -(-len(names) // WINDOW)
    next_round = max((r for rs in greens.values() for r in rs), default=0) + 1
    # warm-up: one full cycle so every query has at least one slot
    horizon = next_round + 3 * max_gap
    slots: dict[str, list[int]] = {}
    for rnd in range(next_round, horizon):
        ordered = derive_driver_order(names, greens)
        for n in ordered[:WINDOW]:
            greens.setdefault(n, []).append(rnd)
            slots.setdefault(n, []).append(rnd)
    bad = {}
    for n in names:
        rs = slots.get(n, [])
        assert rs, f"{n} never got a window slot in {3 * max_gap} rounds"
        gaps = [b - a for a, b in zip(rs, rs[1:])]
        # ignore the first slot's offset (history-dependent); steady-state
        # gaps between consecutive slots must respect the bound
        if gaps and max(gaps) > max_gap:
            bad[n] = rs
    assert not bad, f"queries exceeding {max_gap}-round cadence: {bad}"


def test_derive_order_is_total_and_stable():
    greens = _driver_green_rounds()
    names = list(QUERIES)
    ordered = derive_driver_order(names, greens)
    assert sorted(ordered) == sorted(names)
    # Re-deriving from the already-ordered list is a fixpoint for the
    # never-green block (registration order is preserved within ties).
    assert derive_driver_order(ordered, greens) == ordered
