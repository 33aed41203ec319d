"""Custom stateful streaming operator [EXT] — applyInPandasWithState.

The reference is strictly batch (SURVEY §2.10); this is the
north-star streaming upgrade: per-key state maintained by the engine's
state store across micro-batches, with bounded memory and exactly-once
sink semantics under checkpointing.

``running_user_totals`` keeps (event count, value-cents sum) per user.
Money is accumulated in integer cents — ``floor(value*100 + 0.5)`` —
so the running total is exact, order-independent, and replayable by a
SQL oracle (float accumulation across micro-batches would drift).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

__all__ = [
    "running_user_totals",
    "running_user_totals_tws",
    "RunningTotalsProcessor",
    "streaming_anomaly_zscore",
]

OUTPUT_SCHEMA = "user_id long, n_events long, sum_cents long"
STATE_SCHEMA = "n long, cents long"


def running_user_totals(events: DataFrame) -> DataFrame:
    """Stateful running totals per ``user_id`` over a (streaming or
    batch-test) events DataFrame with columns ``user_id, value``.

    Emits one updated ``(user_id, n_events, sum_cents)`` row per user
    per micro-batch that touched the user. In update output mode the
    LAST row per user is the final total (``n_events`` is monotone).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    def fn(key, pdfs: Iterator["pd.DataFrame"], state) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        if state.exists:
            n, cents = state.get
        else:
            n, cents = 0, 0
        for pdf in pdfs:
            n += len(pdf)
            cents += int(np.floor(pdf["value"].to_numpy() * 100 + 0.5).sum())
        state.update((n, cents))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "sum_cents": [cents]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def _make_processor_class():
    """Build the StatefulProcessor subclass for transformWithState.

    Deferred class creation (not a module-level class) only so the
    pyspark import stays lazy, matching the rest of the streaming
    package; the base-class import itself needs NO protobuf — every
    line of processor logic below is plain-pytest-covered via a fake
    handle/ValueState (tests/test_streaming_stateful.py). Only the
    worker PROTOCOL at query start needs google.protobuf (the gated
    core in running_user_totals_tws)."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotalsProcessor(StatefulProcessor):
        """Per-user running (count, integer-cents sum) totals on the
        Spark 4 arbitrary-state v2 API: typed ValueState managed by
        the processor handle, lifecycle hooks (init/close) and room
        for timers/TTL. Identical semantics to running_user_totals."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._agg = handle.getValueState("agg", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            import numpy as np
            import pandas as pd

            n, cents = self._agg.get() if self._agg.exists() else (0, 0)
            for pdf in rows:
                n += len(pdf)
                cents += int(
                    np.floor(pdf["value"].to_numpy() * 100 + 0.5).sum()
                )
            self._agg.update((n, cents))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "sum_cents": [cents]}
            )

        def close(self) -> None:
            pass

    return RunningTotalsProcessor


def __getattr__(name: str):
    # expose the class lazily so `from ... import RunningTotalsProcessor`
    # works without importing pyspark at module import time
    if name == "RunningTotalsProcessor":
        return _make_processor_class()
    raise AttributeError(name)


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """Running totals via ``transformWithStateInPandas`` — the thin
    wiring around :class:`RunningTotalsProcessor`.

    ENVIRONMENT GATE (irreducible core — these 5 lines only): the
    transformWithState Python WORKER protocol serializes state
    requests with ``google.protobuf`` (pyspark/sql/streaming/proto/
    StateMessage_pb2.py needs the full descriptor-pool runtime, not
    shimmable without vendoring the protobuf library); where absent
    the streaming query crashes at start. Everything else — state
    schema, output schema/mode, time mode, and the complete processor
    logic — is plain-pytest-covered without protobuf. Use
    :func:`running_user_totals` (applyInPandasWithState) otherwise."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_make_processor_class()(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )


ANOMALY_OUTPUT_SCHEMA = (
    "event_id long, user_id long, us long, value_c long, "
    "n_ref long, direction string"
)
ANOMALY_STATE_SCHEMA = "buf array<long>"


def streaming_anomaly_zscore(
    events: DataFrame,
    *,
    lookback: int = 20,
    min_history: int = 8,
    threshold: int = 3,
) -> DataFrame:
    """Streaming rolling z-score anomaly detector — the stateful
    twin of ``timeseries.anomaly_zscore``: per user, a ring buffer of
    the last ``lookback`` fixed-point readings lives in the state
    store; each arriving event is tested against its trailing window
    with the same all-BIGINT identity
    ``(n*x - s)^2 > t^2 * (n*ssq - s^2)`` (zero-variance history
    flags any deviation), then pushed into the buffer. Anomalous
    rows are APPENDED as they are detected; state is O(lookback)
    integers per user, forever.

    Input must carry ``(event_id, user_id, us, value_c)`` — the
    microsecond timestamp and integer cents are derived JVM-side so
    the Python processor is pure integer arithmetic. Rows are
    processed in ``(us, event_id)`` order within each micro-batch;
    equality with the batch operator needs micro-batch boundaries
    that respect event-time order (an AvailableNow drain of
    time-ordered files, or an upstream watermark+sort stage) — the
    same contract the batch window's ORDER BY states explicitly.
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    t2 = threshold * threshold

    def fn(key, pdfs: Iterator["pd.DataFrame"], state) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        buf = list(state.get[0]) if state.exists else []
        cols: dict[str, list] = {
            "event_id": [], "user_id": [], "us": [],
            "value_c": [], "n_ref": [], "direction": [],
        }
        frames = [p for p in pdfs if len(p)]
        if frames:
            pdf = pd.concat(frames).sort_values(["us", "event_id"])
            for row in pdf.itertuples(index=False):
                x = int(row.value_c)
                n = len(buf)
                if n >= min_history:
                    s = sum(buf)
                    q = sum(v * v for v in buf)
                    num = n * x - s
                    if num * num > t2 * (n * q - s * s):
                        cols["event_id"].append(int(row.event_id))
                        cols["user_id"].append(key[0])
                        cols["us"].append(int(row.us))
                        cols["value_c"].append(x)
                        cols["n_ref"].append(n)
                        cols["direction"].append(
                            "high" if num > 0 else "low"
                        )
                buf.append(x)
                if len(buf) > lookback:
                    buf = buf[-lookback:]
        state.update((buf,))
        yield pd.DataFrame(cols)

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=ANOMALY_OUTPUT_SCHEMA,
        stateStructType=ANOMALY_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
