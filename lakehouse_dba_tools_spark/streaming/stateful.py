"""Custom stateful streaming operator via applyInPandasWithState.

Example operator the reference's polling loops imply but never build:
a per-user running profile (event count, value sum, last-seen ts) that
survives across micro-batches — the streaming analog of a grouped
aggregate with explicit state control and timeout hooks.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, sum_value double, last_epoch double"
STATE_SCHEMA = "n long, s double, last double"


def _update_user_profile(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    import math

    n, s, last = state.get if state.exists else (0, 0.0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        # fsum is exact over the batch, so the emitted sum does not
        # depend on the (unspecified) row order within the group.
        s = math.fsum([s, *map(float, pdf["value"])])
        last = max(last, float(pdf["epoch"].max()))
    state.update((n, s, last))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "sum_value": [round(s, 2)], "last_epoch": [last]}
    )


def running_user_profile(events: DataFrame) -> DataFrame:
    """Stateful per-user profile stream (update output mode).

    Input needs columns: user_id, value, epoch (double seconds).
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _update_user_profile,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
