"""Cross-batch stateful sessionization: applyInPandasWithState.

The reference's only long-lived state is driver-side maps (TableInfos,
ColumnNameCache); its heartbeat/keep-alive machinery (BinLogReader.java:333-380)
is the closest thing to liveness tracking. This module is the Spark-native
custom STATEFUL operator the engine exposes for that class of problems:
per-key gap sessions whose state (open session) survives micro-batch
boundaries — the canonical `applyInPandasWithState` shape (arbitrary state,
Arrow-batched, no per-row Python driver round-trips).

Determinism contract: a session CLOSES only on evidence — a later event of
the same key beyond the gap — never on wall-clock timeout, so replaying the
same chunk sequence yields byte-identical output (tested against the batch
window/lag formulation in tests/test_streaming_sessions.py). Production
streams that also want idle-closure can pass a GroupStateTimeout; that is a
liveness policy, intentionally outside the deterministic core.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.LongType()),  # epoch seconds
        T.StructField("session_end", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)

# open-session state: (start, last, n)
SESSION_STATE = T.StructType(
    [
        T.StructField("start", T.LongType()),
        T.StructField("last", T.LongType()),
        T.StructField("n", T.LongType()),
    ]
)


def _close_sessions(
    key: Tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
    gap_seconds: int,
) -> Iterator[pd.DataFrame]:
    ts = sorted(
        int(t) for pdf in pdfs for t in pdf["ts_sec"].tolist()
    )
    if state.exists:
        start, last, n = state.get
    else:
        start = last = None
        n = 0
    closed = []
    for t in ts:
        if last is not None and t < last:
            # Late event behind the open session's tail: the state machine
            # cannot extend session_start backward, and the batch
            # window/lag formulation it mirrors would have sorted it into
            # place. Input contract (see sessionize_stream docstring) is
            # per-key non-decreasing time across micro-batches; a violator
            # is dropped rather than silently corrupting `last`.
            continue
        if last is not None and t - last > gap_seconds:
            closed.append((key[0], start, last, n))
            start, n = t, 0
        if start is None:
            start = t
        last = t
        n += 1
    state.update((start, last, n))
    yield pd.DataFrame(
        closed, columns=["user_id", "session_start", "session_end", "n_events"]
    )


def sessionize_stream(
    events: DataFrame,
    *,
    gap_seconds: int = 1800,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-key gap sessions over a (possibly streaming) event DataFrame.

    Emits a session row when a LATER event of the same key proves the gap
    (deterministic closure); the open tail session stays in state across
    micro-batches. Works identically on a batch DataFrame (one "batch" of
    state) and a readStream source — the test runs both and also splits the
    stream mid-session to prove state carry-over.

    INPUT CONTRACT: per key, event times must be non-decreasing ACROSS
    micro-batches (within a batch they are sorted here). This holds for a
    binlog tail (delivery order == log order). An event arriving behind the
    open session's last timestamp is DROPPED — matching neither extending
    the session backward nor corrupting the gap clock; callers needing
    bounded-lateness reordering should buffer upstream (e.g. a watermarked
    sort) before this operator.
    """
    prepared = events.select(
        F.col(key_col).cast("long").alias("user_id"),
        F.col(ts_col).cast("timestamp").cast("long").alias("ts_sec"),
    )

    def fn(key, pdfs, state):
        return _close_sessions(key, pdfs, state, gap_seconds)

    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUTPUT,
        stateStructType=SESSION_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
