"""Custom stateful streaming operator via applyInPandasWithState: per-user
running totals that survive across micro-batches (the engine's
demonstration of arbitrary keyed state, beyond the built-in windowed
aggregations).

State is one (count, total) pair per user_id — bounded by the key
cardinality; a production deployment adds a timeout
(GroupStateTimeout.EventTimeTimeout + watermark) to expire idle keys,
which is the knob that keeps the state store finite at 100 TB.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n long, total double"
STATE_SCHEMA = "n long, total double"


def _update_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n": [n], "total": [round(total, 2)]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming per-user cumulative (count, sum(value)) — one output row
    per user per micro-batch carrying the running totals."""
    return events.groupBy("user_id").applyInPandasWithState(
        _update_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
