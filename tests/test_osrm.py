"""OSRM route-distance parity: URL semantics, shortest-distance
extraction, Arrow-batched enrichment against a recorded transport, and
the haversine fallback's accuracy + lower-bound property.
(Reference osrm_hook.py:56-116; the reference itself ships no OSRM
tests — tests/test_osrm.py:5-8 notes the external service.)"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from fastetl_spark.io.http_client import HttpResponse, RecordedTransport
from fastetl_spark.io.osrm import (
    OSRMClient,
    get_shortest_distance,
    haversine_km,
    osrm_distance_enrich,
)

# Brasília-ish coordinates from the reference's docstring example
ORIGIN = (-15.799114, -47.871450)
DEST = (-15.870442, -47.921462)


def _route_body(meters: float) -> bytes:
    return json.dumps({"code": "Ok", "routes": [{"distance": meters}]}).encode()


def test_route_url_is_lon_lat_ordered():
    c = OSRMClient(RecordedTransport({}), "http://osrm.local")
    url = c.route_url(ORIGIN, DEST)
    # OSRM takes lon,lat pairs; the hook takes (lat, lon) and swaps
    assert url == (
        "http://osrm.local/route/v1/driving/"
        "-47.87145,-15.799114;-47.921462,-15.870442"
    )


def test_get_shortest_distance_km_and_no_route():
    assert get_shortest_distance({"code": "Ok", "routes": [{"distance": 15443.8}]}) == 15.4438
    assert get_shortest_distance({"code": "NoRoute"}) is None
    assert get_shortest_distance({"code": "Ok", "routes": []}) is None


def test_non_200_raises():
    url = OSRMClient(RecordedTransport({}), "http://o").route_url(ORIGIN, DEST)
    c = OSRMClient(RecordedTransport({("GET", url): HttpResponse(500, b"")}), "http://o")
    with pytest.raises(ValueError, match="500"):
        c.get_route(ORIGIN, DEST)


def test_osrm_distance_enrich_batched(spark):
    c = OSRMClient(RecordedTransport({}), "http://osrm.local")
    url = c.route_url((1.0, 2.0), (3.0, 4.0))
    client = OSRMClient(
        RecordedTransport({("GET", url): HttpResponse(200, _route_body(15443.8))}),
        "http://osrm.local",
    )
    df = spark.createDataFrame(
        [(1, 1.0, 2.0, 3.0, 4.0, None), (2, None, 2.0, 3.0, 4.0, None), (3, 1.0, 2.0, 3.0, 4.0, 9.9)],
        "id long, origin_lat double, origin_long double, dest_lat double, dest_long double, distance_km double",
    )
    out = {r["id"]: r["distance_km"] for r in osrm_distance_enrich(df, client).collect()}
    assert out[1] == 15.4438  # fetched
    assert out[2] is None  # missing input -> untouched
    assert out[3] == 9.9  # already enriched -> idempotent skip


def test_haversine_known_distance_and_lower_bound(spark):
    df = spark.createDataFrame([ORIGIN + DEST], "lat1 double, lon1 double, lat2 double, lon2 double")
    km = df.select(
        haversine_km(F.col("lat1"), F.col("lon1"), F.col("lat2"), F.col("lon2")).alias("km")
    ).first()["km"]
    # great-circle ~9.6 km for these points; the reference's route was 15.44 km
    assert 9.0 < km < 10.5
    assert km < 15.4438  # road route can never beat the great circle
