"""HTTP-enrichment operator (F17/J6 — reference OSRM distance
enrichment, osrm_hook.py:56-116 + osrm_distance_operator.py:100-220).

The reference loops rows, calls an HTTP route service per row, and
UPDATE-joins results back. Here:

- enrichment runs as Arrow-batched mapInPandas with a pluggable
  `fetch(batch: pd.DataFrame) -> pd.Series` callable — the network call
  is injected, so tests use a deterministic stub and production plugs a
  real client with connection pooling;
- per-partition rate limiting (`max_per_second`) throttles politely at
  any parallelism (the reference slept between chunks);
- idempotent-enrichment predicate (P5): only rows where the target
  column IS NULL and inputs are NOT NULL are fetched; the rest pass
  through — re-running after a partial failure only fetches the gap;
- results join back by PK (J6) — here the enrichment happens in-plan,
  so the join-back is implicit.
"""

from __future__ import annotations

import time
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def http_enrich(
    df: DataFrame,
    input_cols: list[str],
    target_col: str,
    fetch: Callable[[pd.DataFrame], pd.Series],
    target_type: T.DataType = T.DoubleType(),
    batch_size: int = 100,
    max_per_second: float | None = None,
) -> DataFrame:
    """Fill `target_col` for rows where it is NULL and all `input_cols`
    are NOT NULL, by calling `fetch` on batches of `batch_size` rows."""
    out_schema = T.StructType(
        [*df.schema.fields]
        if target_col in df.columns
        else [*df.schema.fields, T.StructField(target_col, target_type)]
    )

    def enrich(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if target_col not in pdf.columns:
                pdf[target_col] = None
            needs = pdf[target_col].isna()
            for c in input_cols:
                needs &= pdf[c].notna()
            todo = pdf[needs]
            for start in range(0, len(todo), batch_size):
                chunk = todo.iloc[start : start + batch_size]
                t0 = time.monotonic()
                fetched = fetch(chunk[input_cols])
                # Re-index positionally: .loc assignment aligns a returned
                # Series by index label, so a fetch that builds its result
                # with a fresh RangeIndex would silently write NaN.
                pdf.loc[chunk.index, target_col] = pd.Series(
                    list(fetched), index=chunk.index
                )
                if max_per_second:
                    min_elapsed = len(chunk) / max_per_second
                    sleep = min_elapsed - (time.monotonic() - t0)
                    if sleep > 0:
                        time.sleep(sleep)
            yield pdf

    return df.mapInPandas(enrich, out_schema)


def fake_route_distance(inputs: pd.DataFrame) -> pd.Series:
    """Deterministic stand-in for an OSRM /route call: 'distance' derived
    from the coordinates (haversine-ish scale, meters -> km like the
    reference divides by 1000). Swap for a real client in production."""
    import numpy as np

    lat1, lon1, lat2, lon2 = (inputs.iloc[:, i].astype(float) for i in range(4))
    dx = (lat2 - lat1).abs()
    dy = (lon2 - lon1).abs()
    return np.round(np.sqrt(dx * dx + dy * dy) * 111.32, 3)
