"""Custom stateful streaming operators via applyInPandasWithState.

The reference's only cross-batch state is the driver-side download
cursor (exchange_connector.py:89-105) and the keep-last upsert
(writer.py:83-92). Here the same "remember across micro-batches"
semantics run inside the engine: per-key state lives in the state
store, scales with the number of keys (not events), and survives
restarts through the checkpoint.

Scale: state is partitioned by the grouping key across executors;
each micro-batch touches only the keys present in that batch. The
Arrow boundary batches rows per key-group — no per-row Python.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

USER_STATS_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("last_ts", T.LongType()),
    ]
)

USER_STATS_STATE = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("last_ts", T.LongType()),
    ]
)


def running_user_stats(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum, last_ts) maintained across
    micro-batches. Input needs columns user_id:long, ts:long,
    value:double; emits one updated row per user per batch.
    """

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        # worker-side closure: keep self-contained (no module globals) so
        # it runs on sessions whose workers can't import this package
        import pandas as pd

        (user_id,) = key
        if state.exists:
            n, total, last_ts = state.get
        else:
            n, total, last_ts = 0, 0.0, 0
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
            last_ts = max(last_ts, int(pdf["ts"].max()))
        state.update((n, total, last_ts))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "sum_value": [total],
                "last_ts": [last_ts],
            }
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=USER_STATS_OUTPUT,
        stateStructType=USER_STATS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
