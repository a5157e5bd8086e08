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

import numpy as np
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
            n, cents = state.get
        else:
            n, cents = 0, 0
        for pdf in pdfs:
            n += len(pdf)
            # 2-dp money folds as INTEGER CENTS: float accumulation is
            # order-dependent and round(total, 2) splits across engines
            # at half-cent boundaries (the r12 money sweep). The cents
            # sum is exact at any stream length, and cents/100.0 is one
            # correctly-rounded IEEE division — bit-identical to the
            # oracle's DECIMAL(18,2)->DOUBLE cast of the same total.
            # Per-value cents use the banded HALF_UP twin of that cast
            # (the dedup.semantic.round_half_up_4 discipline): bare
            # np.round is banker's on the BINARY double and disagrees on
            # exact half-cent values (0.125 -> 12, the cast gives 13).
            # Kept inline: applyInPandasWithState closures must not
            # reference engine-module globals (cloudpickle ships them
            # by module name; see the multimodal/ops.py pattern).
            v = pdf[value_col].fillna(0.0).to_numpy(dtype="float64")
            scaled = v * 100.0
            c = np.round(scaled).astype("int64")
            near = (
                np.abs(np.abs(scaled) - np.floor(np.abs(scaled)) - 0.5)
                < 1e-6
            )
            if near.any():
                from decimal import ROUND_HALF_UP, Decimal

                c[near] = [
                    int(
                        Decimal(repr(float(x))).quantize(
                            Decimal("0.01"), rounding=ROUND_HALF_UP
                        )
                        * 100
                    )
                    for x in v[near]
                ]
            cents += int(c.sum())
        state.update((n, cents))
        yield pd.DataFrame(
            {key_col: [key[0]], "n_events": [n], "total_value": [cents / 100.0]}
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        _update,
        outputStructType=f"{key_col} bigint, n_events bigint, total_value double",
        stateStructType="n bigint, cents bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionize(
    stream: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 120,
) -> DataFrame:
    """Custom event-time sessionizer with BOUNDED state: one open session
    per key, evicted via ``GroupStateTimeout.EventTimeTimeout`` once the
    watermark passes ``last_event + gap`` — the eviction contract that
    keeps state O(active keys) instead of O(all keys ever seen) at
    100 TB/day. (Spark's built-in ``session_window`` covers windowed aggs;
    this is the ST4 surface for session state with custom per-key logic.)

    Input must carry ``withWatermark(ts_col, ...)`` — event-time timeouts
    are defined relative to it. Emits one row per CLOSED session
    ``(key, session_start, session_end, n_events)`` with ``session_end``
    the last event's timestamp; sessions still within the gap of the final
    watermark stay in state (their rows appear on a later trigger in
    production). Closure paths: (a) timeout — watermark passed the gap
    with no new data; (b) in-batch split — a batch holds a gap-exceeding
    ts jump for the key, so every sub-session before the jump closes
    immediately. Batch≡stream parity and the state-size bound are
    asserted in tests/test_streaming.py::test_sessionize_bounded_state.
    """
    gap_us = gap_minutes * 60 * 1_000_000

    def _update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        closed: list[tuple[int, int, int]] = []
        if state.hasTimedOut:
            start, last, n = state.get
            closed.append((start, last, n))
            state.remove()
        else:
            # vectorized epoch-µs conversion (guide §4.2): the datetime64
            # column converts in one astype instead of materializing a
            # python Timestamp object per event (identical integer µs —
            # both paths truncate the same ns value by 1000)
            ts_arrays = [
                pd.to_datetime(pdf[ts_col]).to_numpy(dtype="datetime64[ns]").astype("int64") // 1000
                for pdf in pdfs
            ]
            ts_list = np.sort(np.concatenate(ts_arrays)).tolist() if ts_arrays else []
            if state.exists:
                start, last, n = state.get
            else:
                start, last, n = ts_list[0], ts_list[0] - 1, 0
                # sentinel: first event below folds in as (n=0 -> n=1)
            for t in ts_list:
                if t - last > gap_us and n > 0:
                    closed.append((start, last, n))
                    start, n = t, 0
                last = max(last, t)
                n += 1
            state.update((start, last, n))
            # evict once the watermark passes last + gap (ms precision).
            # Clamped one past the current watermark: a key whose data is
            # already older than watermark - gap would otherwise request a
            # timeout in the past, which Spark rejects — clamping makes
            # such stragglers evict on the next trigger instead.
            wm_ms = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(max((last + gap_us) // 1000, wm_ms + 1))
        if closed:
            yield pd.DataFrame(
                {
                    key_col: [key[0]] * len(closed),
                    "session_start": [pd.Timestamp(s, unit="us") for s, _, _ in closed],
                    "session_end": [pd.Timestamp(e, unit="us") for _, e, _ in closed],
                    "n_events": [n for _, _, n in closed],
                }
            )

    return stream.groupBy(key_col).applyInPandasWithState(
        _update,
        outputStructType=(
            f"{key_col} bigint, session_start timestamp, "
            "session_end timestamp, n_events bigint"
        ),
        stateStructType="start bigint, last bigint, n bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
