"""Custom stateful streaming operator: per-host fetch-session tracking via
``applyInPandasWithState``.

The reference tracks per-host behavior implicitly (AutoThrottle adapts a
per-host delay from observed latency, settings.py:71-78) and in-memory
(worker-local). A production deployment of this engine consumes the fetch
event stream and maintains durable per-host state — running fetch/error
counts, first/last timestamps — with a processing-time timeout that closes
and emits idle host sessions. This is the engine's custom-stateful-operator
surface (X6/streaming per the build brief): arbitrary per-key state that
watermarked window aggregates can't express (session close on inactivity,
cumulative counters across triggers).

Correctness contract (tests/test_streaming.py): on bounded input the final
emitted per-host totals equal a plain batch groupBy over the same events.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

FETCH_EVENT_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("ts", T.LongType()),       # unix seconds
        T.StructField("ok", T.BooleanType()),
    ]
)

SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_fetches", T.LongType()),
        T.StructField("n_errors", T.LongType()),
        T.StructField("first_ts", T.LongType()),
        T.StructField("last_ts", T.LongType()),
    ]
)

SESSION_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("host", T.StringType()),
        T.StructField("n_fetches", T.LongType()),
        T.StructField("n_errors", T.LongType()),
        T.StructField("first_ts", T.LongType()),
        T.StructField("last_ts", T.LongType()),
        T.StructField("closed", T.BooleanType()),
    ]
)


def _update_host_session(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (host,) = key
    if state.hasTimedOut:
        n_f, n_e, first_ts, last_ts = state.get
        state.remove()
        yield pd.DataFrame(
            [(host, n_f, n_e, first_ts, last_ts, True)],
            columns=[f.name for f in SESSION_OUTPUT_SCHEMA.fields],
        )
        return
    n_f, n_e, first_ts, last_ts = state.get if state.exists else (0, 0, None, None)
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        n_f += len(pdf)
        n_e += int((~pdf["ok"]).sum())
        lo, hi = int(pdf["ts"].min()), int(pdf["ts"].max())
        first_ts = lo if first_ts is None else min(first_ts, lo)
        last_ts = hi if last_ts is None else max(last_ts, hi)
    state.update((n_f, n_e, first_ts, last_ts))
    state.setTimeoutDuration(30_000)  # close a host session after 30 s idle
    yield pd.DataFrame(
        [(host, n_f, n_e, first_ts, last_ts, False)],
        columns=[f.name for f in SESSION_OUTPUT_SCHEMA.fields],
    )


def host_sessions(fetch_events: DataFrame) -> DataFrame:
    """fetch_events(host, url, ts, ok) stream → per-trigger per-host
    session snapshots (+ a final `closed=True` row when a host goes idle).

    Scale shape: state is partitioned by host (one GroupState per host,
    Arrow-batched updates); the shuffle key is the host — the same axis-A
    partitioning as the frontier."""
    return fetch_events.groupBy("host").applyInPandasWithState(
        _update_host_session,
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
