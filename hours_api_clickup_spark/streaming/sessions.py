"""Custom stateful streaming operator: gap-based sessionization via
``applyInPandasWithState``.

The batch analog lives in ``operators/timeseries.py::sessionize`` (lag →
flag → running sum; the reference has no sessions at all — its closest
notion is the 6-hour scheduler cadence, ``deploy.sh:68-76``). The
streaming form keeps one open session per user as explicit state and
emits a session row the moment it closes, which is what a 100 TB event
stream needs: state is O(active users), not O(events), and the shuffle
is the single groupBy(user_id) that Structured Streaming maintains
across micro-batches.

Flush discipline (both paths implemented):

- **event-time timeout** (production): state registers a timeout at
  ``last_event + gap``; when the watermark passes it the open session is
  emitted and state dropped. Late events beyond the watermark start a
  fresh session rather than corrupting a closed one.
- **sentinel flush** (bounded replay): a ``__flush__`` row per user with
  a far-future timestamp closes whatever is open. This makes a bounded
  ``availableNow`` replay emit *every* session deterministically —
  equal to the batch sessionizer row-for-row — without waiting on
  watermark movement, so the query is DuckDB-oracle-checkable.

Per-user session ids are 0-based ordinals in session-start order,
carried in state so they stay stable across micro-batches.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SENTINEL_TYPE = "__flush__"

OUTPUT_SCHEMA = (
    "user_id long, session_id long, session_start timestamp, "
    "session_end timestamp, n_events long"
)
# open-session state: epoch-micros longs keep the state row flat/cheap.
# start_us = -1 encodes "no open session, but keep the counter": a
# closed session must NOT state.remove(), or the next event would
# re-initialize next_sid = 0 and emit a DUPLICATE (user_id, session_id)
# (review r6). The trade, stated: counter rows persist per user seen,
# so state is O(distinct users), not O(users with an open session).
STATE_SCHEMA = "start_us long, last_us long, n long, next_sid long"

_US = 1_000_000


def _ts_to_us(ts: Any) -> int:
    return int(pd.Timestamp(ts).value // 1_000)  # ns → µs


def _sessionize_group(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    gap_us: int,
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    out: list[tuple[int, int, int, int]] = []  # (sid, start, last, n)

    if state.exists:
        start_us, last_us, n, next_sid = state.get
        open_sess: tuple[int, int, int] | None = (
            (start_us, last_us, n) if start_us >= 0 else None
        )
    else:
        open_sess, next_sid = None, 0

    if state.hasTimedOut:
        # watermark passed last_event + gap: the open session is final.
        # Keep the counter in state (start_us = -1) — removing it would
        # restart the user's session ids at 0 (review r6).
        if open_sess is not None:
            out.append((next_sid, *open_sess))
            next_sid += 1
        state.update((-1, -1, 0, next_sid))
        yield _emit(user_id, out)
        return

    flush = False
    rows: list[tuple[int, int]] = []  # (ts_us, event_id) sorted
    for pdf in pdfs:
        for ts, etype, eid in zip(
            pdf["ts"], pdf["event_type"], pdf["event_id"]
        ):
            if etype == SENTINEL_TYPE:
                flush = True
            else:
                rows.append((_ts_to_us(ts), int(eid)))
    rows.sort()

    for ts_us, _ in rows:
        if open_sess is None:
            open_sess = (ts_us, ts_us, 1)
        elif ts_us - open_sess[1] > gap_us:
            out.append((next_sid, *open_sess))
            next_sid += 1
            open_sess = (ts_us, ts_us, 1)
        else:
            open_sess = (open_sess[0], max(open_sess[1], ts_us), open_sess[2] + 1)

    if flush:
        if open_sess is not None:
            out.append((next_sid, *open_sess))
            next_sid += 1
        # same counter-preserving close as the timeout branch
        state.update((-1, -1, 0, next_sid))
    elif open_sess is not None:
        state.update((open_sess[0], open_sess[1], open_sess[2], next_sid))
        # production flush path: fire when the watermark passes the gap
        state.setTimeoutTimestamp((open_sess[1] + gap_us) // 1_000)

    yield _emit(user_id, out)


def _emit(user_id: int, sessions: list[tuple[int, int, int, int]]) -> pd.DataFrame:
    # explicit dtypes: an empty emission must still carry Arrow-exact types
    return pd.DataFrame(
        {
            "user_id": pd.Series([user_id] * len(sessions), dtype="int64"),
            "session_id": pd.Series([s[0] for s in sessions], dtype="int64"),
            "session_start": pd.Series(
                [pd.Timestamp(s[1] * 1_000) for s in sessions],
                dtype="datetime64[ns]",
            ),
            "session_end": pd.Series(
                [pd.Timestamp(s[2] * 1_000) for s in sessions],
                dtype="datetime64[ns]",
            ),
            "n_events": pd.Series([s[3] for s in sessions], dtype="int64"),
        }
    )


def streaming_sessionize(
    events_stream: DataFrame, gap_minutes: float = 30.0
) -> DataFrame:
    """Session rows from a watermarked event stream (append output).

    ``events_stream`` needs columns ``user_id, ts, event_type,
    event_id`` with a watermark already applied on ``ts``.
    """
    gap_us = int(gap_minutes * 60 * _US)

    def fn(key, pdfs, state):
        return _sessionize_group(key, pdfs, state, gap_us)

    return events_stream.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
