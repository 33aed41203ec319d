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
