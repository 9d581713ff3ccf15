"""Shared HTTP transport for the driver-side catalog/download connectors
(CKAN, dados.gov.br, BACEN STA).

The connectors speak to a three-method ``HttpTransport`` protocol so
every API interaction is testable against recorded fixtures;
``RequestsTransport`` wires the real `requests` library (import-gated),
``RecordedTransport`` replays canned responses and records calls.
"""

from __future__ import annotations

import json as _json
from dataclasses import dataclass, field
from typing import Protocol


@dataclass
class HttpResponse:
    status_code: int
    content: bytes = b""
    headers: dict = field(default_factory=dict)

    def json(self):
        return _json.loads(self.content.decode("utf-8"))

    def raise_for_status(self) -> None:
        if self.status_code >= 400:
            raise HttpError(self.status_code, self.content[:500])


class HttpError(RuntimeError):
    def __init__(self, status_code: int, body: bytes):
        super().__init__(f"HTTP {status_code}: {body!r}")
        self.status_code = status_code


class HttpTransport(Protocol):
    def request(
        self,
        method: str,
        url: str,
        headers: dict | None = None,
        params: dict | None = None,
        json: dict | None = None,
        timeout: float = 60.0,
    ) -> HttpResponse: ...


class RequestsTransport:
    """Production transport over the `requests` library."""

    def request(self, method, url, headers=None, params=None, json=None, timeout=60.0):
        import requests

        r = requests.request(
            method, url, headers=headers, params=params, json=json, timeout=timeout
        )
        return HttpResponse(r.status_code, r.content, dict(r.headers))


@dataclass
class RecordedTransport:
    """Replays canned responses keyed by (METHOD, url); records every
    call for assertions. The fixture format IS the API contract the
    tests pin down."""

    responses: dict[tuple[str, str], HttpResponse] = field(default_factory=dict)
    calls: list[dict] = field(default_factory=list)

    def request(self, method, url, headers=None, params=None, json=None, timeout=60.0):
        self.calls.append(
            {"method": method.upper(), "url": url, "headers": headers or {},
             "params": params, "json": json}
        )
        key = (method.upper(), url)
        if key not in self.responses:
            return HttpResponse(404, f"no fixture for {key}".encode())
        return self.responses[key]
