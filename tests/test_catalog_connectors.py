"""CKAN / dados.gov.br / BACEN STA connectors against recorded fixtures
(K11/S11): create-vs-update by URL match, merge-preserves-existing
semantics, auth headers, newest-file selection, time-window rules.
"""

from __future__ import annotations

import datetime as dt
import json

import pytest

from fastetl_spark.io.bacen_sta import BacenSTAClient, basic_auth_headers
from fastetl_spark.io.catalog_push import CkanClient, DadosGovBrClient, InMemoryCkan
from fastetl_spark.io.http_client import HttpError, HttpResponse, RecordedTransport

# --- CKAN ----------------------------------------------------------------


def ckan_with_one_resource() -> InMemoryCkan:
    return InMemoryCkan(
        datasets={
            "ds1": {
                "name": "ds1",
                "notes": "old notes",
                "resources": [
                    {
                        "id": "r1",
                        "url": "https://repo/x.zip",
                        "name": "old name",
                        "description": "keep me",
                        "format": "ZIP",
                        "hash": "abc",
                    }
                ],
            }
        }
    )


def test_ckan_update_dataset_patches_properties():
    ckan = ckan_with_one_resource()
    CkanClient(ckan).update_dataset("ds1", notes="new notes")
    assert ckan.datasets["ds1"]["notes"] == "new notes"


def test_ckan_resource_update_by_url_preserves_existing_fields():
    ckan = ckan_with_one_resource()
    out = CkanClient(ckan).create_or_update_resource(
        "ds1", name="new name", url="https://repo/x.zip", format="CSV"
    )
    assert out == "updated"
    r = ckan.datasets["ds1"]["resources"][0]
    assert r["name"] == "new name" and r["format"] == "CSV"
    assert r["description"] == "keep me"  # not replaced when None
    assert r["hash"] == "abc"  # unrelated fields preserved (ChainMap merge)


def test_ckan_resource_created_when_url_unmatched():
    ckan = ckan_with_one_resource()
    out = CkanClient(ckan).create_or_update_resource(
        "ds1", name="novo", url="https://repo/y.csv", format="CSV", description="d"
    )
    assert out == "created"
    urls = [r["url"] for r in ckan.datasets["ds1"]["resources"]]
    assert urls == ["https://repo/x.zip", "https://repo/y.csv"]


# --- dados.gov.br --------------------------------------------------------

API = "https://dados.gov.br/"
DS_URL = "https://dados.gov.br/dados/api/publico/conjuntos-dados/abc"
SAVE_URL = "https://dados.gov.br/dados/api/recurso/salvar"


def dadosgov_transport(recursos: list[dict]) -> RecordedTransport:
    return RecordedTransport(
        responses={
            ("GET", DS_URL): HttpResponse(200, json.dumps({"id": "abc", "recursos": recursos}).encode()),
            ("POST", SAVE_URL): HttpResponse(200, b"{}"),
            ("PATCH", "https://dados.gov.br/dados/api/publico/conjuntos-dados/abc"): HttpResponse(200, b"{}"),
        }
    )


def client(t: RecordedTransport) -> DadosGovBrClient:
    return DadosGovBrClient(t, API, token="tok123")


def test_dadosgov_update_dataset_patch_with_api_key():
    t = dadosgov_transport([])
    client(t).update_dataset("abc", descricao="nova")
    call = t.calls[-1]
    assert call["method"] == "PATCH" and call["json"] == {"descricao": "nova"}
    assert call["headers"]["chave-api-dados-abertos"] == "tok123"


def test_dadosgov_create_resource_when_link_unmatched():
    t = dadosgov_transport([{"id": 1, "link": "https://repo/other.zip", "descricao": "x"}])
    out = client(t).create_or_update_resource(
        "abc", titulo="T", link="https://repo/new.zip", formato="ZIP", descricao="D"
    )
    assert out == "created"
    payload = t.calls[-1]["json"]
    assert payload == {
        "idConjuntoDados": "abc", "titulo": "T", "link": "https://repo/new.zip",
        "descricao": "D", "tipo": "DADOS", "formato": "ZIP",
    }


def test_dadosgov_update_resource_merges_and_keeps_descricao():
    existing = {"id": 7, "link": "https://repo/x.zip", "descricao": "mantida",
                "tipo": "DADOS", "formato": "ZIP", "extra": "ok"}
    t = dadosgov_transport([existing])
    out = client(t).create_or_update_resource(
        "abc", titulo="Novo título", link="https://repo/x.zip", formato="CSV"
    )
    assert out == "updated"
    payload = t.calls[-1]["json"]
    assert payload["titulo"] == "Novo título" and payload["formato"] == "CSV"
    assert payload["descricao"] == "mantida" and payload["extra"] == "ok"
    assert payload["id"] == 7


def test_dadosgov_invalid_tipo_rejected():
    with pytest.raises(ValueError, match="tipo"):
        client(dadosgov_transport([])).create_or_update_resource(
            "abc", titulo="T", link="l", formato="ZIP", tipo="PLANILHA"
        )


def test_dadosgov_http_error_propagates():
    t = RecordedTransport(responses={("GET", DS_URL): HttpResponse(500, b"boom")})
    with pytest.raises(HttpError):
        client(t).get_dataset("abc")


# --- BACEN STA -----------------------------------------------------------

STA_LIST_XML = b"""<?xml version="1.0"?>
<Arquivos>
  <Arquivo>
    <Protocolo>P111</Protocolo>
    <DataHoraDisponibilizacao>2024-03-01T08:00:00.000</DataHoraDisponibilizacao>
  </Arquivo>
  <Arquivo>
    <Protocolo>P222</Protocolo>
    <DataHoraDisponibilizacao>2024-03-02T09:30:00.000</DataHoraDisponibilizacao>
  </Arquivo>
</Arquivos>
"""

NOW = dt.datetime(2024, 3, 10, 12, 0, tzinfo=dt.timezone.utc)


def sta_transport() -> RecordedTransport:
    return RecordedTransport(
        responses={
            ("GET", "https://sta.bcb.gov.br/staws/arquivos/disponiveis"): HttpResponse(200, STA_LIST_XML),
            ("GET", "https://sta.bcb.gov.br/staws/arquivos/P222/conteudo"): HttpResponse(200, b"FILECONTENT"),
        }
    )


def sta_client(t) -> BacenSTAClient:
    return BacenSTAClient(t, user="u", password="p")


def test_basic_auth_header_encoding():
    h = basic_auth_headers("user", "pass")
    assert h["authorization"] == "Basic dXNlcjpwYXNz"


def test_sta_download_latest_picks_newest(tmp_path):
    t = sta_transport()
    dest = str(tmp_path / "sta.bin")
    fid = sta_client(t).download_latest_file(
        dest, "SISBACEN", data_min=dt.datetime(2024, 2, 1), now=NOW
    )
    assert fid == "P222"  # newest DataHoraDisponibilizacao wins
    assert open(dest, "rb").read() == b"FILECONTENT"
    listing = t.calls[0]
    assert listing["params"]["sistemas"] == "SISBACEN"
    assert listing["headers"]["authorization"].startswith("Basic ")


def test_sta_future_data_max_rejected():
    with pytest.raises(ValueError, match="data_max"):
        sta_client(sta_transport()).list_available(
            "S", dt.datetime(2024, 2, 1), data_max=dt.datetime(2030, 1, 1), now=NOW
        )


def test_sta_empty_window_raises():
    t = RecordedTransport(
        responses={
            ("GET", "https://sta.bcb.gov.br/staws/arquivos/disponiveis"):
                HttpResponse(200, b"<?xml version='1.0'?><Arquivos/>"),
        }
    )
    with pytest.raises(ValueError, match="nenhum resultado"):
        sta_client(t).newest_file_id("S", dt.datetime(2024, 2, 1), now=NOW)


def test_sta_bad_credentials_message():
    t = RecordedTransport(
        responses={
            ("GET", "https://sta.bcb.gov.br/staws/arquivos/disponiveis"): HttpResponse(401, b"")
        }
    )
    with pytest.raises(ValueError, match="credenciais"):
        sta_client(t).list_available("S", dt.datetime(2024, 2, 1), now=NOW)
