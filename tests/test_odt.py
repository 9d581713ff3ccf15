"""ODT data-dictionary writer: extracted-text assertions mirroring the
reference test strategy (reference tests/test_odf_tables.py:51-99),
plus package-structure and template-fill round-trips.
"""

from __future__ import annotations

import zipfile

import pytest

from fastetl_spark.meta.odt import (
    DATA_DICT_COLUMN_NAMES,
    MIMETYPE,
    OdtDocument,
    create_data_dictionary,
    create_data_dictionary_from_template,
)

TABLE_TITLE = "Countries"
TABLE_DESCRIPTION = "List of country names and international codes."
COLUMN_NAMES = DATA_DICT_COLUMN_NAMES["en"]
TABLE_DATA = [
    ["contry name", "string", "name of the country"],
    ["contry code", "string", "ISO 3166-1 alpha-2 two letter code"],
    ["contry number", "integer", "ISO 3166-1 numeric three-digit code"],
]
EXPECTED_TEXT = "".join(
    (
        TABLE_TITLE,
        TABLE_DESCRIPTION,
        "".join(COLUMN_NAMES),
        "".join("".join(cell) for cell in TABLE_DATA),
    )
)


def resources() -> dict:
    return {
        "countries": {
            "title": TABLE_TITLE,
            "description": TABLE_DESCRIPTION,
            "fields": [
                {"name": n, "type": t, "description": d} for n, t, d in TABLE_DATA
            ],
        }
    }


def test_create_new_table_document_extracted_text():
    """Twin of reference test_create_new_table_document:51-78."""
    doc = OdtDocument()
    doc.append_table(
        "countries",
        column_names=COLUMN_NAMES,
        title=TABLE_TITLE,
        description=TABLE_DESCRIPTION,
    )
    doc.add_rows("countries", TABLE_DATA)
    assert doc.extract_text() == EXPECTED_TEXT


def test_create_data_dictionary_roundtrip(tmp_path):
    """Twin of reference test_create_new_data_dictionary:81-99: write
    the file, load it back, assert the extracted text."""
    out = str(tmp_path / "dict.odt")
    create_data_dictionary(resources(), out, lang="en")
    doc = OdtDocument.load(out)
    assert doc.extract_text() == EXPECTED_TEXT
    assert doc.table_names() == ["countries"]
    rows = doc.table_rows("countries")
    assert rows[0] == COLUMN_NAMES and rows[1:] == TABLE_DATA


def test_odt_package_structure(tmp_path):
    """mimetype must be the first entry and stored uncompressed —
    that's what makes the zip a valid ODF package."""
    out = str(tmp_path / "dict.odt")
    create_data_dictionary(resources(), out, lang="en")
    with zipfile.ZipFile(out) as zf:
        infos = zf.infolist()
        assert infos[0].filename == "mimetype"
        assert infos[0].compress_type == zipfile.ZIP_STORED
        assert zf.read("mimetype").decode() == MIMETYPE
        assert {i.filename for i in infos} >= {"mimetype", "META-INF/manifest.xml", "content.xml"}


def test_template_fill_appends_rows_to_named_table(tmp_path):
    """Twin of the reference template variant (odf_tables.py:444-488):
    an existing document's named table receives the schema rows; other
    tables and surrounding text are untouched."""
    template = str(tmp_path / "template.odt")
    doc = OdtDocument()
    doc.append_heading("Relatório")
    doc.append_table("countries", column_names=COLUMN_NAMES)
    doc.append_table("untouched", column_names=["a", "b"])
    doc.save(template)

    out = str(tmp_path / "filled.odt")
    create_data_dictionary_from_template(resources(), template, output=out)
    filled = OdtDocument.load(out)
    assert filled.table_rows("countries")[1:] == TABLE_DATA
    assert filled.table_rows("untouched") == [["a", "b"]]
    assert filled.extract_text().startswith("Relatório")
    # template untouched when output given
    assert OdtDocument.load(template).table_rows("countries") == [COLUMN_NAMES]


def test_template_fill_missing_table_is_skipped(tmp_path):
    template = str(tmp_path / "t.odt")
    doc = OdtDocument()
    doc.append_table("other", column_names=["x"])
    doc.save(template)
    create_data_dictionary_from_template(resources(), template)  # no error
    assert OdtDocument.load(template).table_rows("other") == [["x"]]


def test_add_rows_unknown_table_raises():
    doc = OdtDocument()
    with pytest.raises(ValueError, match="not found"):
        doc.add_rows("ghost", [["1"]])


def test_write_odt_from_dataframes(spark, tmp_path):
    from fastetl_spark.meta.comments import with_column_comments
    from fastetl_spark.meta.dictionary import write_odt

    df = with_column_comments(
        spark.createDataFrame([(1, "x")], ["id", "name"]), {"id": "identificador"}
    )
    out = str(tmp_path / "dd.odt")
    write_odt({"clientes": df}, out, lang="pt")
    doc = OdtDocument.load(out)
    rows = doc.table_rows("clientes")
    assert rows[0] == DATA_DICT_COLUMN_NAMES["pt"]
    assert ["id", "bigint", "identificador"] in rows
    assert ["name", "string", ""] in rows
