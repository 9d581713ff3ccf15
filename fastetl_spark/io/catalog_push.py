"""Open-data catalog metadata push: CKAN and dados.gov.br (K11).

Mirrors the reference hooks (reference fastetl/hooks/ckan_hook.py:37-81,
dadosgovbr_hook.py:106-237): after a pipeline lands a file, the catalog
entry is patched and its resource list is created-or-updated by URL
match, preserving any existing resource fields not explicitly replaced
(the reference's ChainMap-merge semantics).

CKAN speaks through a four-action catalog protocol (what ckanapi's
RemoteCKAN.action exposes); dados.gov.br speaks raw HTTP through
HttpTransport. Both are driver-side metadata calls — no Spark data path.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Protocol
from fastetl_spark.io.http_client import HttpTransport


# --- CKAN ----------------------------------------------------------------


class CkanCatalog(Protocol):
    """The four CKAN API actions the push needs (ckanapi
    RemoteCKAN.action equivalents)."""

    def package_show(self, id: str) -> dict: ...

    def package_patch(self, id: str, **properties) -> dict: ...

    def resource_create(self, **resource) -> dict: ...

    def resource_update(self, **resource) -> dict: ...


@dataclass
class CkanClient:
    """Reference CKANHook twin (ckan_hook.py:37-81)."""

    catalog: CkanCatalog

    def update_dataset(self, dataset_id: str, **properties) -> None:
        """Patch dataset properties (ckan_hook.py:37-44)."""
        self.catalog.package_patch(id=dataset_id, **properties)

    def create_or_update_resource(
        self,
        dataset_id: str,
        name: str,
        url: str,
        format: str,
        description: str | None = None,
    ) -> str:
        """Match the dataset's resources by URL: update in place when
        found (existing fields preserved, description kept unless given),
        create otherwise (ckan_hook.py:46-81). Returns 'updated' or
        'created'."""
        dataset = self.catalog.package_show(id=dataset_id)
        matching = [r for r in dataset["resources"] if r["url"] == url]
        if matching:
            existing = matching[0]
            new_resource = {
                **existing,
                "name": name,
                "url": url,
                "description": existing["description"] if description is None else description,
                "format": format,
            }
            self.catalog.resource_update(**new_resource)
            return "updated"
        self.catalog.resource_create(
            package_id=dataset_id,
            url=url,
            name=name,
            format=format,
            description=description,
        )
        return "created"


@dataclass
class InMemoryCkan:
    """CkanCatalog fixture: datasets keyed by id, each holding a
    resource list — the contract spec for tests."""

    datasets: dict

    def package_show(self, id: str) -> dict:
        return self.datasets[id]

    def package_patch(self, id: str, **properties) -> dict:
        self.datasets[id].update(properties)
        return self.datasets[id]

    def resource_create(self, **resource) -> dict:
        ds = self.datasets[resource["package_id"]]
        ds.setdefault("resources", []).append(
            {k: v for k, v in resource.items() if k != "package_id"}
        )
        return resource

    def resource_update(self, **resource) -> dict:
        for ds in self.datasets.values():
            for i, r in enumerate(ds.get("resources", [])):
                if r.get("id") and r["id"] == resource.get("id"):
                    ds["resources"][i] = resource
                    return resource
        raise KeyError(f"resource not found: {resource.get('id')}")


# --- dados.gov.br --------------------------------------------------------


VALID_RESOURCE_TYPES = (
    "INVALIDO", "DADOS", "DOCUMENTACAO", "DICIONARIO_DE_DADOS", "API", "OUTRO",
)


@dataclass
class DadosGovBrClient:
    """Reference DadosGovBrHook twin (dadosgovbr_hook.py:106-237): the
    Brazilian open-data portal's own API (PT-BR field names, API-key
    header)."""

    transport: HttpTransport
    api_url: str
    token: str
    timeout: float = 60.0

    def _headers(self) -> dict:
        return {"accept": "application/json", "chave-api-dados-abertos": self.token}

    def _base(self) -> str:
        """Every endpoint lives under <portal>/dados/api; normalize once
        so get/update/save cannot drift apart (the portal root, with or
        without a trailing slash or an explicit /dados/api suffix, all
        resolve to the same base)."""
        base = self.api_url.rstrip("/")
        if not base.endswith("/dados/api"):
            base = base + "/dados/api"
        return base

    def get_dataset(self, dataset_id: str) -> dict:
        """GET /dados/api/publico/conjuntos-dados/{id}
        (dadosgovbr_hook.py:52-87)."""
        url = f"{self._base()}/publico/conjuntos-dados/{dataset_id}"
        resp = self.transport.request("GET", url, headers=self._headers(), timeout=self.timeout)
        resp.raise_for_status()
        return resp.json()

    def update_dataset(self, dataset_id: str, **properties) -> None:
        """PATCH /dados/api/publico/conjuntos-dados/{id}
        (dadosgovbr_hook.py:106-139)."""
        url = f"{self._base()}/publico/conjuntos-dados/{dataset_id}"
        resp = self.transport.request(
            "PATCH", url, headers=self._headers(), json=properties, timeout=self.timeout
        )
        resp.raise_for_status()

    def create_or_update_resource(
        self,
        dataset_id: str,
        titulo: str,
        link: str,
        formato: str,
        descricao: str | None = None,
        tipo: str = "DADOS",
    ) -> str:
        """POST recurso/salvar with create-vs-update chosen by matching
        the dataset's `recursos` on `link` (dadosgovbr_hook.py:141-237);
        on update, existing fields are preserved and `descricao` kept
        unless explicitly given. (The reference's update branch reads
        `resource["descricao"]` before binding it — the intended
        `existing_resource` is used here.) Returns 'updated'/'created'."""
        if tipo not in VALID_RESOURCE_TYPES:
            raise ValueError(f"tipo must be one of {VALID_RESOURCE_TYPES}")
        dataset = self.get_dataset(dataset_id)
        matching = [r for r in dataset.get("recursos", []) if r.get("link") == link]
        if matching:
            existing = matching[0]
            resource = {
                **existing,
                "titulo": titulo,
                "link": link,
                "descricao": existing.get("descricao") if descricao is None else descricao,
                "formato": formato,
            }
            outcome = "updated"
        else:
            resource = {
                "idConjuntoDados": dataset_id,
                "titulo": titulo,
                "link": link,
                "descricao": descricao,
                "tipo": tipo,
                "formato": formato,
            }
            outcome = "created"
        url = f"{self._base()}/recurso/salvar"
        resp = self.transport.request(
            "POST", url, headers=self._headers(), json=resource, timeout=self.timeout
        )
        resp.raise_for_status()
        return outcome
