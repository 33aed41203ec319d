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

__all__ = ["running_user_totals", "running_user_totals_tws"]

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


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """The same per-user running totals on the transformWithState API
    (Spark 4 arbitrary-state v2, ``StatefulProcessor``): typed
    ValueState managed by the processor handle instead of a single
    opaque tuple, with lifecycle hooks (init/close) and room for
    timers/TTL — the API an evolving stateful operator grows into.
    Identical integer-cents semantics to running_user_totals.

    ENVIRONMENT GATE: the transformWithState Python worker protocol
    needs a working ``google.protobuf``; where that is absent (as in
    this build container) the streaming query crashes at start. The
    operator stays for environments that have it; use
    :func:`running_user_totals` (applyInPandasWithState) otherwise —
    tests probe protobuf and skip accordingly."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class RunningTotals(StatefulProcessor):
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

    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotals(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
