"""Samba connector parity (S8/K10) against the in-memory share:
extension dispatch, reference read options (sep/encoding/decimal),
MultiIndex flattening, store/move/mkdir semantics.
"""

from __future__ import annotations

import datetime as dt

import pandas as pd
import pytest

from fastetl_spark.io.samba import (
    InMemorySmbShare,
    create_folder,
    get_file_last_write_time,
    get_samba_df,
    move_files,
    store_samba_df,
)

CSV_BODY = "Código IBGE;Valor Total;UF\n5300108;10,5;DF\n3550308;20,25;SP\n".encode("latin-1")


def share_with_csv() -> InMemorySmbShare:
    return InMemorySmbShare(files={"/dados/planilha.csv": CSV_BODY})


def test_csv_read_honors_sep_encoding_decimal(spark):
    df = get_samba_df(
        spark,
        share_with_csv(),
        "/dados/planilha.csv",
        separator=";",
        encoding="latin-1",
        decimal=",",
    )
    assert df.columns == ["codigo_ibge", "valor_total", "uf"]
    rows = {r.codigo_ibge: r.valor_total for r in df.collect()}
    assert rows[5300108] == 10.5 and rows[3550308] == 20.25  # decimal=',' parsed


def test_csv_read_sniffs_separator_when_unspecified(spark):
    share = InMemorySmbShare(files={"/d/f.csv": b"a;b\n1;2\n"})
    df = get_samba_df(spark, share, "/d/f.csv")
    assert df.columns == ["a", "b"]


def test_unsupported_extension_raises(spark):
    with pytest.raises(ValueError, match="not supported"):
        get_samba_df(spark, share_with_csv(), "/dados/file.parquet")


def test_missing_file_raises(spark):
    with pytest.raises(FileNotFoundError):
        get_samba_df(spark, InMemorySmbShare(), "/nope.csv")


def test_excel_dispatch_and_multiindex_flatten(spark, monkeypatch):
    """No excel engine ships in this container, so the xlsx branch is
    exercised with a patched reader returning a MultiIndex header —
    verifying dispatch, '_' flattening and slugification."""
    mi = pd.MultiIndex.from_tuples([("Ano", "2023"), ("Ano", "2024"), ("Município", "")])
    fake = pd.DataFrame([[1, 2, "x"], [3, 4, "y"]], columns=mi)
    seen = {}

    def fake_read_excel(buf, sheet_name=0, header=0):
        seen["sheet_name"], seen["header"] = sheet_name, header
        return fake

    monkeypatch.setattr(pd, "read_excel", fake_read_excel)
    share = InMemorySmbShare(files={"/d/p.xlsx": b"PK fake xlsx"})
    df = get_samba_df(spark, share, "/d/p.xlsx", sheet_name="Aba1", header=[0, 1])
    assert seen == {"sheet_name": "Aba1", "header": [0, 1]}
    assert df.columns == ["ano_2023", "ano_2024", "municipio"]
    assert df.count() == 2


def test_store_samba_df_roundtrip(spark):
    share = InMemorySmbShare()
    src = spark.createDataFrame([(1, "a"), (2, "b")], "id int, name string")
    n = store_samba_df(src, share, "/out/extract.csv", separator=";")
    assert n == 2
    back = get_samba_df(spark, share, "/out/extract.csv", separator=";")
    assert sorted(map(tuple, back.collect())) == [(1, "a"), (2, "b")]


def test_store_row_cap(spark):
    with pytest.raises(ValueError, match="refusing"):
        store_samba_df(spark.range(10), InMemorySmbShare(), "/o.csv", max_rows=5)


def test_last_write_time(spark):
    ts = dt.datetime(2024, 5, 1, 8, 30)
    share = InMemorySmbShare(files={"/d/f.csv": b"a\n1\n"}, mtimes={"/d/f.csv": ts})
    assert get_file_last_write_time(share, "/d/f.csv") == ts


def test_create_folder_idempotent():
    share = InMemorySmbShare(dirs={"/dados/existing"})
    assert create_folder(share, "/dados/nova/") is True
    assert "/dados/nova" in share.dirs
    assert create_folder(share, "/dados/existing") is False  # no error, no dup


def test_move_files_deletes_source():
    share = InMemorySmbShare(files={"/in/a.csv": b"1", "/in/b.csv": b"2"})
    move_files(share, [("/in/a.csv", "/arch/a.csv"), ("/in/b.csv", "/arch/b.csv")])
    assert set(share.files) == {"/arch/a.csv", "/arch/b.csv"}


def test_move_files_keep_source():
    share = InMemorySmbShare(files={"/in/a.csv": b"1"})
    move_files(share, [("/in/a.csv", "/arch/a.csv")], delete_source=False)
    assert set(share.files) == {"/in/a.csv", "/arch/a.csv"}


def test_move_files_error_names_failing_path():
    share = InMemorySmbShare()
    with pytest.raises(RuntimeError, match='reading file "/nope.csv"'):
        move_files(share, [("/nope.csv", "/x.csv")])


def test_create_folder_at_share_root():
    share = InMemorySmbShare()
    assert create_folder(share, "rootdir") is True
    assert create_folder(share, "rootdir") is False
