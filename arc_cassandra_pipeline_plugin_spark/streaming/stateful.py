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


# ---------------------------------------------------------------------------
# transformWithStateInPandas (Spark 4 next-gen stateful API)
# ---------------------------------------------------------------------------

try:  # the processor API needs Spark >= 4.0 AND the protobuf package:
    # transformWithState's Python state-protocol client imports
    # google.protobuf (StateMessage_pb2) in the streaming driver worker —
    # absent in this container (no pip install), so the operator is gated
    # exactly like the Cassandra driver path and the test skips.
    import google.protobuf  # noqa: F401

    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class RunningStatsProcessor(StatefulProcessor):
        """Per-key running (count, sum) with an explicit ValueState handle —
        the transformWithState re-expression of ``running_stats_per_user``.
        Unlike applyInPandasWithState, state is a typed named handle (the
        API also offers ListState/MapState, timers, and TTL), and the
        engine requires the RocksDB state store provider."""

        def init(self, handle: StatefulProcessorHandle) -> None:
            self._stats = handle.getValueState("stats", _RUNNING_STATS_STATE)

        def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
            n, s = self._stats.get() if self._stats.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                s += float(pdf["value"].sum())
            self._stats.update((n, s))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "sum_value": [round(s, 2)]}
            )

        def close(self) -> None:
            pass

    def running_stats_tws(events: DataFrame) -> DataFrame:
        """``transformWithStateInPandas`` running stats per user. Caller must
        enable the RocksDB state store provider (required by the API):
        ``spark.sql.streaming.stateStore.providerClass =
        ...RocksDBStateStoreProvider``."""
        return events.groupBy("user_id").transformWithStateInPandas(
            statefulProcessor=RunningStatsProcessor(),
            outputStructType=RUNNING_STATS_OUTPUT,
            outputMode="Update",
            timeMode="None",
        )

except ImportError:  # pragma: no cover
    RunningStatsProcessor = None  # type: ignore[assignment]
    running_stats_tws = None  # type: ignore[assignment]
