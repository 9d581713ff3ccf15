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

# State keeps the value sum as EXACT 1e-6-quantized integer units (the
# same trick as the promoted UDAFs): pandas float summation order would
# vary with arrow batch order, but integer sums are order-independent,
# so the emitted totals are deterministic (and DuckDB-verifiable —
# streaming_stateful_totals). int64 headroom: ~9e18 units = ~9e12 in
# value terms per key.
_Q_UNIT = 1_000_000

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("total_q", T.LongType()),
    ]
)


def _batch_q_sum(pdf: pd.DataFrame) -> int:
    import numpy as np

    v = pdf["value"].to_numpy(dtype="float64")
    return int(np.floor(v * _Q_UNIT + 0.5).astype("int64").sum())


def _update_user_totals(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    n, total_q = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        n += len(pdf)
        total_q += _batch_q_sum(pdf)
    state.update((n, total_q))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [total_q / _Q_UNIT]}
    )


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
            n, total_q = self._state.get() if self._state.exists() else (0, 0)
            for pdf in rows:
                n += len(pdf)
                total_q += _batch_q_sum(pdf)
            self._state.update((n, total_q))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [total_q / _Q_UNIT],
                }
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
