"""Custom stateful streaming operators via ``applyInPandasWithState``.

Built-in windowed aggregations (tumbling/sliding/session — see
``streaming/__init__``) cover the declarative cases; this module is the
escape hatch for operator semantics Spark lacks: arbitrary per-key state
machines updated per micro-batch, with Arrow-batched Python execution.

State is partitioned by key (one shuffle per micro-batch on the group key)
and checkpointed by the engine; state size is bounded by what the update
function keeps — the running-aggregate example below holds O(1) per key.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_STATS_OUTPUT = "user_id bigint, n_events bigint, sum_value double"
_RUNNING_STATS_STATE = "n bigint, s double"


def _update_running_stats(
    key: Tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Per-key state machine: carries (count, sum) across micro-batches and
    emits the updated running totals for keys seen in this batch."""
    n, s = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_value": [round(s, 2)]})


def running_stats_per_user(events: DataFrame) -> DataFrame:
    """Streaming running (count, sum(value)) per user — the
    ``applyInPandasWithState`` shape: one state row per user, updated per
    micro-batch, emitted in Update mode. The batch twin is a plain
    groupBy aggregate (tests assert final-state equality after an
    availableNow drain)."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _update_running_stats,
            outputStructType=RUNNING_STATS_OUTPUT,
            stateStructType=_RUNNING_STATS_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
