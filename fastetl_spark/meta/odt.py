"""OpenDocument Text writer for data dictionaries (K9 — reference
utils/odf_tables.py:20-488, tests/test_odf_tables.py:51-99).

The reference builds .odt files with odfpy; that library is not in this
container, and ODT is just a zip package holding `content.xml`
(OASIS OpenDocument 1.2), so this module hand-rolls the same document
shape with stdlib zipfile + ElementTree: per-table heading (level 3) +
description paragraph + named table with a header row, plus the
template-fill variant that loads an existing .odt and appends rows to
its named tables. `extract_text` mirrors odf.teletype.extractText so
assertions match the reference's test strategy.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
import zipfile

MIMETYPE = "application/vnd.oasis.opendocument.text"

NS = {
    "office": "urn:oasis:names:tc:opendocument:xmlns:office:1.0",
    "text": "urn:oasis:names:tc:opendocument:xmlns:text:1.0",
    "table": "urn:oasis:names:tc:opendocument:xmlns:table:1.0",
    "manifest": "urn:oasis:names:tc:opendocument:xmlns:manifest:1.0",
}
for prefix, uri in NS.items():
    ET.register_namespace(prefix, uri)


def _q(tag: str) -> str:
    prefix, local = tag.split(":")
    return f"{{{NS[prefix]}}}{local}"


DATA_DICT_COLUMN_NAMES = {
    "en": ["field name", "type", "description"],
    "pt": ["nome do campo", "tipo", "descrição"],
}

_MANIFEST = (
    '<?xml version="1.0" encoding="UTF-8"?>\n'
    f'<manifest:manifest xmlns:manifest="{NS["manifest"]}" manifest:version="1.2">\n'
    f' <manifest:file-entry manifest:full-path="/" manifest:media-type="{MIMETYPE}"/>\n'
    ' <manifest:file-entry manifest:full-path="content.xml"'
    ' manifest:media-type="text/xml"/>\n'
    "</manifest:manifest>\n"
)


class OdtDocument:
    """A minimal OpenDocument text file with named tables — the same
    surface as the reference DocumentWithTables (odf_tables.py:171-380):
    append_heading / append_paragraph / append_table / add_rows /
    save / load."""

    def __init__(self, content_root: ET.Element | None = None):
        if content_root is None:
            content_root = ET.Element(
                _q("office:document-content"), {_q("office:version"): "1.2"}
            )
            body = ET.SubElement(content_root, _q("office:body"))
            ET.SubElement(body, _q("office:text"))
        self.root = content_root
        self.text = self.root.find(f"{_q('office:body')}/{_q('office:text')}")
        if self.text is None:
            raise ValueError("not an ODT content tree (office:body/office:text missing)")

    # --- building ---------------------------------------------------------

    def append_heading(self, text: str, level: int = 1) -> None:
        h = ET.SubElement(self.text, _q("text:h"), {_q("text:outline-level"): str(level)})
        h.text = text

    def append_paragraph(self, text: str) -> None:
        # reference odf_tables.py:370-380: blank-line-separated blocks
        # become separate paragraphs
        for block in text.split("\n\n"):
            p = ET.SubElement(self.text, _q("text:p"))
            p.text = block

    def append_table(
        self,
        name: str,
        column_names: list[str],
        title: str | None = None,
        description: str | None = None,
    ) -> None:
        """Heading (level 3) + description paragraph + named table with
        a header row (odf_tables.py:60-99)."""
        if title:
            self.append_heading(title, level=3)
        if description:
            self.append_paragraph(description)
        tbl = ET.SubElement(self.text, _q("table:table"), {_q("table:name"): name})
        ET.SubElement(
            tbl,
            _q("table:table-column"),
            {_q("table:number-columns-repeated"): str(len(column_names))},
        )
        header_rows = ET.SubElement(tbl, _q("table:table-header-rows"))
        self._append_row(header_rows, column_names)

    def _append_row(self, parent: ET.Element, cells: list[str]) -> None:
        row = ET.SubElement(parent, _q("table:table-row"))
        for cell in cells:
            c = ET.SubElement(
                row, _q("table:table-cell"), {_q("office:value-type"): "string"}
            )
            p = ET.SubElement(c, _q("text:p"))
            p.text = "" if cell is None else str(cell)

    def _find_table(self, name: str) -> ET.Element:
        for tbl in self.text.iter(_q("table:table")):
            if tbl.get(_q("table:name")) == name:
                return tbl
        raise ValueError(f"Table with id '{name}' not found in document.")

    def add_rows(self, table_name: str, rows: list[list[str]]) -> None:
        tbl = self._find_table(table_name)
        for cells in rows:
            self._append_row(tbl, cells)

    # --- introspection (odf.teletype parity) ------------------------------

    def table_names(self) -> list[str]:
        return [t.get(_q("table:name")) for t in self.text.iter(_q("table:table"))]

    def table_rows(self, name: str) -> list[list[str]]:
        """All rows (header first) as cell-text lists."""
        out = []
        for row in self._find_table(name).iter(_q("table:table-row")):
            out.append(
                ["".join(c.itertext()) for c in row.findall(_q("table:table-cell"))]
            )
        return out

    def extract_text(self) -> str:
        """Concatenated document text in order — the same check surface
        as odf.teletype.extractText in the reference tests."""
        return "".join(self.text.itertext())

    # --- package io -------------------------------------------------------

    def save(self, path: str) -> None:
        content = ET.tostring(self.root, encoding="unicode", xml_declaration=True)
        with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
            # mimetype MUST be the first entry and stored uncompressed
            zf.writestr(
                zipfile.ZipInfo("mimetype"), MIMETYPE, compress_type=zipfile.ZIP_STORED
            )
            zf.writestr("META-INF/manifest.xml", _MANIFEST)
            zf.writestr("content.xml", content)

    @classmethod
    def load(cls, path: str) -> "OdtDocument":
        with zipfile.ZipFile(path) as zf:
            root = ET.fromstring(zf.read("content.xml"))
        return cls(root)


# --- data-dictionary rendering (odf_tables.py:384-430) -------------------


def create_data_dictionary(
    resources: dict[str, dict],
    output: str,
    lang: str = "pt",
    title: str | None = None,
    description: str | None = None,
) -> None:
    """Render a data dictionary to .odt. `resources` maps resource name
    -> {"title": ..., "description": ..., "fields": [{"name","type",
    "description"}, ...]} (build it from DataFrames with
    `dictionary_resource`)."""
    doc = OdtDocument()
    if title:
        doc.append_heading(title)
    if description:
        doc.append_paragraph(description)
    for name, res in resources.items():
        doc.append_table(
            name,
            column_names=DATA_DICT_COLUMN_NAMES[lang],
            title=res.get("title"),
            description=res.get("description"),
        )
        doc.add_rows(
            name,
            [[f["name"], f["type"], f.get("description", "")] for f in res["fields"]],
        )
    doc.save(output)


def create_data_dictionary_from_template(
    resources: dict[str, dict],
    doc_template: str,
    resource_names: list[str] | None = None,
    output: str | None = None,
) -> None:
    """Template-fill variant (odf_tables.py:444-488): load an existing
    .odt, append field rows to the tables whose table:name matches a
    resource, save (over the template when `output` is None, like the
    reference's caution note)."""
    doc = OdtDocument.load(doc_template)
    present = set(doc.table_names())
    names = resource_names if resource_names is not None else list(resources)
    for name in names:
        if name in present and name in resources:
            doc.add_rows(
                name,
                [
                    [f["name"], f["type"], f.get("description", "")]
                    for f in resources[name]["fields"]
                ],
            )
    doc.save(output or doc_template)
