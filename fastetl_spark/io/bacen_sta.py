"""BACEN STA file download (S11 — reference
fastetl/hooks/bacen_STA_hook.py:40-135).

The Central Bank of Brazil's file-transfer webservice (STA): Basic-auth
XML listing of available files per system, newest-protocol selection
within a date window, then a streamed content download. Times follow
the service's rule set: America/Sao_Paulo, `data_max` defaults to now
and must not be in the future; naive datetimes are taken as UTC and
converted (bacen_STA_hook.py:52-70).
"""

from __future__ import annotations

import base64
import datetime as dt
import xml.etree.ElementTree as ET
from dataclasses import dataclass
from zoneinfo import ZoneInfo

from fastetl_spark.io.http_client import HttpTransport

STA_URL = "https://sta.bcb.gov.br/staws"
DATE_FORMAT = "%Y-%m-%dT%H:%M:%S.%f"
_TZ = ZoneInfo("America/Sao_Paulo")


def basic_auth_headers(user: str, password: str) -> dict:
    """Reference _get_auth_headers (bacen_STA_hook.py:36-50)."""
    token = base64.b64encode(f"{user}:{password}".encode("ascii")).decode("ascii")
    return {"user-agent": "fastetl-spark", "authorization": f"Basic {token}"}


def _localized_range(
    date_min: dt.datetime, date_max: dt.datetime | None, now: dt.datetime | None = None
) -> tuple[dt.datetime, dt.datetime]:
    """Reference _get_correct_time_range (bacen_STA_hook.py:52-70):
    naive datetimes are UTC; data_max defaults to now and may not be in
    the future (webservice rule)."""
    now = now or dt.datetime.now(_TZ)
    if date_max is None:
        date_max = now
    else:
        if date_max.tzinfo is None:
            date_max = date_max.replace(tzinfo=dt.timezone.utc).astimezone(_TZ)
        if date_max > now:
            raise ValueError("data_max não pode ser maior que a data atual")
    if date_min.tzinfo is None:
        date_min = date_min.replace(tzinfo=dt.timezone.utc).astimezone(_TZ)
    return date_min, date_max


@dataclass
class BacenSTAClient:
    transport: HttpTransport
    user: str
    password: str
    base_url: str = STA_URL
    timeout: float = 120.0

    def _headers(self) -> dict:
        return basic_auth_headers(self.user, self.password)

    def list_available(
        self,
        sistema: str,
        data_min: dt.datetime,
        data_max: dt.datetime | None = None,
        now: dt.datetime | None = None,
    ) -> dict[dt.datetime, str]:
        """GET /arquivos/disponiveis -> {availability datetime: protocol
        id} parsed from the Arquivo XML nodes (bacen_STA_hook.py:72-105)."""
        lo, hi = _localized_range(data_min, data_max, now)
        params = {
            "dataHoraInicio": lo.strftime(DATE_FORMAT)[:23],
            "dataHoraFim": hi.strftime(DATE_FORMAT)[:23],
            "sistemas": sistema,
        }
        resp = self.transport.request(
            "GET",
            self.base_url + "/arquivos/disponiveis",
            headers=self._headers(),
            params=params,
            timeout=self.timeout,
        )
        if resp.status_code == 401:
            raise ValueError(
                "Web Service do Bacen rejeitou as credenciais de login."
            )
        resp.raise_for_status()
        tree = ET.fromstring(resp.content)
        return {
            dt.datetime.strptime(node.find("DataHoraDisponibilizacao").text, DATE_FORMAT):
                node.find("Protocolo").text
            for node in tree.findall("Arquivo")
        }

    def newest_file_id(
        self,
        sistema: str,
        data_min: dt.datetime,
        data_max: dt.datetime | None = None,
        now: dt.datetime | None = None,
    ) -> str:
        """Protocol id of the newest available file in the window
        (bacen_STA_hook.py:72-105)."""
        available = self.list_available(sistema, data_min, data_max, now)
        if not available:
            raise ValueError("Web Service do Bacen (STA) respondeu com nenhum resultado.")
        return available[max(available)]

    def download_file(self, file_id: str, dest_file_path: str) -> int:
        """GET /arquivos/{id}/conteudo streamed to `dest_file_path`
        (bacen_STA_hook.py:107-129). Returns bytes written."""
        resp = self.transport.request(
            "GET",
            self.base_url + f"/arquivos/{file_id}/conteudo",
            headers=self._headers(),
            timeout=self.timeout,
        )
        resp.raise_for_status()
        with open(dest_file_path, "wb") as fh:
            fh.write(resp.content)
        return len(resp.content)

    def download_latest_file(
        self,
        dest_file_path: str,
        sistema: str,
        data_min: dt.datetime,
        data_max: dt.datetime | None = None,
        now: dt.datetime | None = None,
    ) -> str:
        """Newest-in-window download, the reference's headline method.
        Returns the downloaded protocol id."""
        file_id = self.newest_file_id(sistema, data_min, data_max, now)
        self.download_file(file_id, dest_file_path)
        return file_id
