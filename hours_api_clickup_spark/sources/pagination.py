"""Paginated-fetch abstraction (S4/S6/S7).

The reference pages 100 rows at a time with two distinct termination
policies: stop on an empty page (tasks, ``fetch_clickup_data.py:428-429``)
vs stop on an empty page OR a short page (<100 rows; accounts/apps,
``:616-617,767-769``). Both are encoded here so fixture-backed tests can
pin the difference; the REST wiring plugs in as ``fetch_page``.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from dataclasses import dataclass
from enum import Enum


class PagePolicy(Enum):
    EMPTY_PAGE = "empty_page"  # stop only when a page returns 0 rows
    SHORT_PAGE = "short_page"  # stop when a page returns < page_size rows


@dataclass
class PageResult:
    rows: list
    page: int


def paginate(
    fetch_page: Callable[[int], list],
    policy: PagePolicy = PagePolicy.EMPTY_PAGE,
    page_size: int = 100,
    max_pages: int = 10_000,
) -> Iterator[PageResult]:
    """Drive ``fetch_page(page_idx) -> rows`` until the policy says stop.

    ``max_pages`` is a runaway guard, not a reference behavior.
    """
    for page in range(max_pages):
        rows = fetch_page(page)
        if not rows:
            return
        yield PageResult(rows=rows, page=page)
        if policy is PagePolicy.SHORT_PAGE and len(rows) < page_size:
            return


def collect_all_pages(
    fetch_page: Callable[[int], list],
    policy: PagePolicy = PagePolicy.EMPTY_PAGE,
    page_size: int = 100,
) -> list:
    """Concatenate all pages (the reference's ``extend`` loop,
    fetch_clickup_data.py:116,135)."""
    out: list = []
    for result in paginate(fetch_page, policy, page_size):
        out.extend(result.rows)
    return out
