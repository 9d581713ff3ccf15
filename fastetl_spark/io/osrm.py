"""OSRM (Open Source Routing Machine) client + distance enrichment —
the reference's route-distance hook and operator
(osrm_hook.py:56-116, get_shortest_distance :99-116,
osrm_distance_operator.py:100-220) re-expressed for Spark.

The HTTP transport is injected (same recorded-fixture pattern as the
CKAN/BACEN connectors); the per-row route lookups run through the
Arrow-batched `http_enrich` operator, never a driver loop. A native
haversine expression provides the no-network fallback / sanity bound
(route distance >= great-circle distance).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Protocol

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class HttpTransport(Protocol):
    def request(self, method: str, url: str, **kwargs): ...


@dataclass
class OSRMClient:
    """URL semantics of the reference hook: coordinates go on the path
    as lon,lat;lon,lat (OSRM's order — the reference takes (lat, long)
    tuples and swaps, osrm_hook.py:81-86)."""

    transport: HttpTransport
    api_endpoint: str
    timeout: float = 30.0

    def route_url(
        self,
        origin: tuple[float, float],
        destination: tuple[float, float],
        profile: str = "driving",
    ) -> str:
        lat_o, long_o = origin
        lat_d, long_d = destination
        base = self.api_endpoint.rstrip("/")
        return f"{base}/route/v1/{profile}/{long_o},{lat_o};{long_d},{lat_d}"

    def get_route(
        self,
        origin: tuple[float, float],
        destination: tuple[float, float],
        profile: str = "driving",
        steps: bool = True,
    ) -> dict:
        resp = self.transport.request(
            "GET",
            self.route_url(origin, destination, profile),
            params={"steps": str(steps).lower()},
            timeout=self.timeout,
        )
        if resp.status_code != 200:
            raise ValueError(f"OSRM API returned code {resp.status_code}.")
        return resp.json()


def get_shortest_distance(data: dict) -> float | None:
    """Distance in km of the first (shortest) route; None when the API
    found no route (reference osrm_hook.py:99-116 divides meters by
    1000)."""
    if data.get("code") == "Ok" and data.get("routes"):
        return data["routes"][0]["distance"] / 1000.0
    return None


def osrm_distance_enrich(
    df: DataFrame,
    client: OSRMClient,
    origin_cols: tuple[str, str] = ("origin_lat", "origin_long"),
    dest_cols: tuple[str, str] = ("dest_lat", "dest_long"),
    target_col: str = "distance_km",
    max_per_second: float | None = 10.0,
) -> DataFrame:
    """Route-distance enrichment: for every row with coordinates and no
    distance yet, query OSRM and fill `target_col` (km). Runs through
    http_enrich — Arrow batches, per-partition rate limiting, idempotent
    re-runs (only NULL targets are fetched)."""
    from fastetl_spark.operators.enrich import http_enrich

    cols = [*origin_cols, *dest_cols]

    def fetch(batch: pd.DataFrame) -> pd.Series:
        out = []
        for row in batch.itertuples(index=False):
            o = (row[0], row[1])
            d = (row[2], row[3])
            out.append(get_shortest_distance(client.get_route(o, d, steps=False)))
        return pd.Series(out)

    return http_enrich(
        df, cols, target_col, fetch, max_per_second=max_per_second
    )


_EARTH_RADIUS_KM = 6371.0088


def haversine_km(lat1: Column, lon1: Column, lat2: Column, lon2: Column) -> Column:
    """Great-circle distance in km as a native expression — the
    no-network fallback and the lower bound any route distance must
    respect. Transcendental (sin/cos/asin), so it is unit-tested against
    known distances rather than hash-compared across engines."""
    rlat1, rlat2 = F.radians(lat1), F.radians(lat2)
    dlat = F.radians(lat2 - lat1) / 2
    dlon = F.radians(lon2 - lon1) / 2
    a = F.sin(dlat) ** 2 + F.cos(rlat1) * F.cos(rlat2) * F.sin(dlon) ** 2
    return F.lit(2 * _EARTH_RADIUS_KM) * F.asin(F.sqrt(a))
