"""Stateful processing — Beam state/timer API on Spark group state.

Reference: scio ``applyPerKeyDoFn`` (PairSCollectionFunctions.scala:84) with
Beam @StateId ValueState/BagState + timers (StatefulExample.scala:36-54).
Spark analog: ``applyInPandasWithState`` (GroupState + timeout timers), which
covers ValueState (a state row), BagState (accumulate into state columns /
lists), and processing-time timers (GroupStateTimeout).
"""

from __future__ import annotations

from typing import Callable, Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def running_counter(
    keyed_stream,
    output_schema: str = "key string, total bigint",
    state_schema: str = "total bigint",
    output_mode: str = "update",
):
    """ValueState exemplar (StatefulExample.scala analog): per-key running
    count that survives across micro-batches.

    ``keyed_stream`` is a GroupedData (stream.groupBy(key...)). Returns the
    stateful streaming DataFrame; drive it with streaming/core.run_to_memory.
    """

    def update(key, pdf_iter: Iterable[pd.DataFrame], state: GroupState):
        total = state.get[0] if state.exists else 0
        for pdf in pdf_iter:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame({"key": [key[0]], "total": [total]})

    return keyed_stream.applyInPandasWithState(
        update,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode=output_mode,
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def value_state_processor(
    output_schema: str,
    state_schema,
    update_fn,
    emit_fn,
):
    """Build a StatefulProcessor (Spark 4 ``transformWithStateInPandas`` —
    the closest analog to Beam's full @StateId/@TimerId API: named state
    variables + timers, vs applyInPandasWithState's single state row).

    ``update_fn(prev_state_tuple | None, pdf) -> state_tuple``;
    ``emit_fn(key, state_tuple) -> dict`` (one output row per batch+key).
    Import-gated: returns the processor class instance; raises
    NotImplementedError if the API is unavailable in this Spark.
    """
    try:
        from pyspark.sql.streaming.stateful_processor import (
            StatefulProcessor,
            StatefulProcessorHandle,
        )

        # the TWS state server speaks protobuf — absent/broken in this image
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "transformWithStateInPandas requires Spark 4.0+ AND a working "
            "protobuf install (its state protocol); unavailable here — use "
            "running_counter/stateful_map (applyInPandasWithState) instead"
        ) from e

    import pandas as pd

    class _Proc(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle):
            self._state = handle.getValueState("state", state_schema)

        def handleInputRows(self, key, rows, timerValues):
            prev = self._state.get() if self._state.exists() else None
            acc = prev
            for pdf in rows:
                acc = update_fn(acc, pdf)
            self._state.update(acc)
            yield pd.DataFrame([emit_fn(key, acc)])

        def close(self):
            pass

    return _Proc()


def transform_with_state(
    keyed_stream,
    output_schema: str,
    state_schema,
    update_fn,
    emit_fn,
    output_mode: str = "Update",
    time_mode: str = "None",
):
    """Next-gen stateful op over transformWithStateInPandas."""
    proc = value_state_processor(output_schema, state_schema, update_fn, emit_fn)
    return keyed_stream.transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=output_schema,
        outputMode=output_mode,
        timeMode=time_mode,
    )


def stateful_map(
    keyed_stream,
    fn: Callable,
    output_schema: str,
    state_schema: str,
    output_mode: str = "update",
    timeout: str = GroupStateTimeout.NoTimeout,
):
    """General stateful per-key op: ``fn(key, iter_of_pandas, state) ->
    iter_of_pandas`` with full GroupState access (get/update/remove,
    setTimeoutDuration) — the applyPerKeyDoFn escape hatch."""
    return keyed_stream.applyInPandasWithState(
        fn,
        outputStructType=output_schema,
        stateStructType=state_schema,
        outputMode=output_mode,
        timeoutConf=timeout,
    )
