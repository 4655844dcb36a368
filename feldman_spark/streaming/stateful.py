"""Custom stateful streaming operators via ``applyInPandasWithState``.

Beyond-reference capability: keyed state that survives across
micro-batches — the building block the built-in windowed aggregations
can't express. Two operators:

* :func:`streaming_dedup` — emit only the first occurrence of each key
  ever seen on the stream (exact dedup over an unbounded stream). State
  per key: a seen marker + count of suppressed duplicates. At 100 TB-of-
  stream scale the state store shards by key across executors; use
  RocksDB state store (``spark.sql.streaming.stateStore.providerClass``)
  for state larger than memory.

  CARDINALITY CONTRACT: ``applyInPandasWithState`` invokes the Python
  function once PER KEY per micro-batch — fine for bounded key sets
  (per-user, per-session, per-device state, like
  :func:`streaming_running_totals`), ruinous for unbounded ones
  (measured 380 s vs ~4 s for the native operator on a 1M-key stream at
  sf1). For plain dedup semantics use
  :func:`feldman_spark.streaming.events.dedup_native`
  (``dropDuplicatesWithinWatermark`` — JVM state, no per-key Python);
  this operator earns its keep only when the per-key logic is genuinely
  custom (the n_dupes counter here stands in for such logic).

* :func:`streaming_running_totals` — per-key running aggregates
  (count/sum) emitted every micro-batch — the update-mode twin of a
  batch ``groupBy().agg()``.

Both take and return pandas iterators (Arrow-batched), and both have exact
batch twins in this library (``pipeline.dedup.exact_dedup``,
``groupBy().agg``) — the batch twin is the correctness oracle in tests.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType, StringType, StructField, StructType,
)

__all__ = ["streaming_dedup", "streaming_running_totals"]


def streaming_dedup(
    events: DataFrame,
    key_col: str = "event_id",
    payload_cols: Tuple[str, ...] = ("event_type", "user_id"),
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """First occurrence of each key wins; later arrivals are suppressed.

    Output schema: key + payload of the first-seen row + ``n_dupes``
    (duplicates suppressed so far — 0 on first emission).

    With ``watermark`` set, rows whose ``ts_col`` falls behind the
    event-time watermark are dropped before they touch keyed state —
    unbounded streams need the bound so a straggler cannot resurrect or
    pollute state arbitrarily far in the past (late-drop is
    pytest-asserted in test_streaming.py). Spark does NOT auto-filter
    late input for arbitrary stateful ops (only for its built-in
    windowed aggregations), so the filter runs inside the state
    function against ``state.getCurrentWatermarkMs()`` — the documented
    flatMapGroupsWithState pattern. State itself is deliberately
    NoTimeout: dedup semantics are "ever seen", not "seen recently";
    switch to event-time timeout only if re-admission past the horizon
    is acceptable."""
    if watermark:
        from .events import _watermarkable

        events = _watermarkable(events, ts_col).withWatermark(ts_col, watermark)
    key_field = events.schema[key_col]
    out_schema = StructType(
        [StructField(key_col, key_field.dataType)]
        + [StructField(c, events.schema[c].dataType) for c in payload_cols]
        + [StructField("n_dupes", LongType())]
    )
    state_schema = StructType([StructField("seen", LongType())])

    drop_late = watermark is not None

    def fn(key: Tuple[Any, ...], batches: Iterator[pd.DataFrame], state: GroupState):
        wm_ms = state.getCurrentWatermarkMs() if drop_late else 0
        n_new = 0
        first_row = None
        for pdf in batches:
            if wm_ms > 0:
                ts_ms = pdf[ts_col].astype("datetime64[ms]").astype("int64")
                pdf = pdf[ts_ms >= wm_ms]
            if first_row is None and len(pdf) > 0:
                first_row = pdf.iloc[0]
            n_new += len(pdf)
        already_emitted = state.exists
        if n_new == 0 and not already_emitted:
            return  # every row was late: leave no state behind
        seen = state.get[0] if already_emitted else 0
        state.update((seen + n_new,))
        if not already_emitted and first_row is not None:
            out = {key_col: [key[0]]}
            for c in payload_cols:
                out[c] = [first_row[c]]
            out["n_dupes"] = [n_new - 1]
            yield pd.DataFrame(out)

    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout)
    )


def streaming_running_totals(
    events: DataFrame,
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-key running (count, sum) updated every micro-batch the key
    appears in — classic keyed-state accumulation."""
    key_field = events.schema[key_col]
    out_schema = StructType([
        StructField(key_col, key_field.dataType),
        StructField("n_events", LongType()),
        StructField("value_sum", StringType()),  # string to avoid fp drift in tests
    ])
    state_schema = StructType([
        StructField("n", LongType()), StructField("s", StringType()),
    ])

    def fn(key: Tuple[Any, ...], batches: Iterator[pd.DataFrame], state: GroupState):
        n, s = (state.get if state.exists else (0, "0"))
        total = float(s)
        for pdf in batches:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, repr(total)))
        yield pd.DataFrame({key_col: [key[0]], "n_events": [n],
                            "value_sum": [repr(round(total, 2))]})

    return (
        events.groupBy(key_col)
        .applyInPandasWithState(
            fn, out_schema, state_schema, "update", GroupStateTimeout.NoTimeout)
    )
