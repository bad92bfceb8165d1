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
