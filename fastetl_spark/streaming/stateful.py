"""Custom stateful streaming operator via applyInPandasWithState —
the escape hatch for operators Structured Streaming lacks as built-ins
(SURVEY custom-operator guidance step (b)).

running_user_totals keeps one state row per user (event count, value
sum, last seen ts) updated per micro-batch — the streaming analog of a
running aggregate dashboard. State is partitioned by user_id, so it
scales horizontally with the key space; per-key state is O(1).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)


def _update_user_totals(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "total_value": [total]})


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Per-user running totals with explicit state (Arrow-batched)."""
    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# --- transformWithStateInPandas (Spark 4 arbitrary-state API) ------------


def running_user_totals_tws(stream: DataFrame) -> DataFrame:
    """Same running per-user totals on the Spark 4
    ``transformWithStateInPandas`` API (the successor to
    applyInPandasWithState: named state variables, TTL support, timers).
    Kept alongside the older twin so pipelines can migrate per-operator;
    the batch-equivalence test pins both to the same totals.

    Runtime requirements beyond applyInPandasWithState: the protobuf
    package (state ser/de) and the RocksDB state-store provider
    (``spark.sql.streaming.stateStore.providerClass`` =
    ...RocksDBStateStoreProvider). Raises ImportError up front when
    protobuf is absent instead of crashing the Python worker mid-query.
    """
    try:
        import google.protobuf  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "transformWithStateInPandas requires the protobuf package; "
            "use running_user_totals (applyInPandasWithState) instead"
        ) from e
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class _Totals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState("totals", STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            n, total = self._state.get() if self._state.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._state.update((n, total))
            yield pd.DataFrame(
                {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
            )

        def close(self) -> None:
            pass

    return (
        stream.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            _Totals(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
