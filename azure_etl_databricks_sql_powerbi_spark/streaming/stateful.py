"""Custom stateful streaming operators (ST4 surface) via
``applyInPandasWithState`` — Arrow-batched per-group state, the Spark-native
replacement for hand-rolled operator state.

The shipped operator keeps running per-key totals across micro-batches:
the streaming generalization of the reference's daily "re-aggregate the
whole snapshot" pattern — at 100 TB/day you cannot re-scan history, you
fold each arriving batch into keyed state. State is partitioned by the
group key across executors; per-trigger work is one shuffle on the key plus
an Arrow-batched pandas fold of just the new rows.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_totals(
    stream: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key running (count, sum) maintained in group state; emits the
    updated totals for every key touched by the trigger (update semantics).

    Output: (key, n_events, total_value) — matches a batch
    ``groupBy(key).agg(count, sum)`` once the stream is drained, which is
    exactly what the unit test asserts.
    """

    def _update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            n, total = state.get
        else:
            n, total = 0, 0.0
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].fillna(0.0).sum())
        state.update((n, total))
        yield pd.DataFrame(
            {key_col: [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        _update,
        outputStructType=f"{key_col} bigint, n_events bigint, total_value double",
        stateStructType="n bigint, total double",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
