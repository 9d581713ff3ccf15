"""Samba/SMB file-share connector (S8 read / K10 write).

Mirrors the reference samba_services.py surface (reference
fastetl/custom_functions/samba_services.py: read :108-162, last-write
:81-106, mkdir :164-188, move :190-232) re-expressed for Spark: a share
file is driver-side bytes that land as a DataFrame with slugified
headers.

The SMB transport is isolated behind ``SmbClient`` — retrieve / store /
delete / list / mkdir / attributes. Production wraps pysmb's
SMBConnection (one method each); ``InMemorySmbShare`` is the reference
implementation used in tests and documents the exact contract. No SMB
library is imported here.
"""

from __future__ import annotations

import datetime as dt
import io
from dataclasses import dataclass, field
from typing import Protocol

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from fastetl_spark.operators.copy import slugify_column

_SUPPORTED = ("csv", "xls", "xlsx")


class SmbClient(Protocol):
    """Minimal SMB share surface (maps 1:1 onto pysmb SMBConnection
    calls scoped to one service/share)."""

    def retrieve_file(self, path: str) -> bytes: ...

    def store_file(self, path: str, data: bytes) -> None: ...

    def delete_file(self, path: str) -> None: ...

    def list_path(self, dirpath: str) -> list[tuple[str, bool]]:
        """[(name, is_directory), ...] for the directory's entries."""
        ...

    def create_directory(self, path: str) -> None: ...

    def last_write_time(self, path: str) -> dt.datetime: ...


@dataclass
class InMemorySmbShare:
    """In-memory SmbClient: the test double AND the contract spec."""

    files: dict[str, bytes] = field(default_factory=dict)
    dirs: set[str] = field(default_factory=set)
    mtimes: dict[str, dt.datetime] = field(default_factory=dict)

    def _norm(self, path: str) -> str:
        return "/" + path.strip("/")

    def retrieve_file(self, path: str) -> bytes:
        p = self._norm(path)
        if p not in self.files:
            raise FileNotFoundError(path)
        return self.files[p]

    def store_file(self, path: str, data: bytes) -> None:
        self.files[self._norm(path)] = bytes(data)

    def delete_file(self, path: str) -> None:
        p = self._norm(path)
        if p not in self.files:
            raise FileNotFoundError(path)
        del self.files[p]

    def list_path(self, dirpath: str) -> list[tuple[str, bool]]:
        d = self._norm(dirpath)
        prefix = "" if d == "/" else d
        out: list[tuple[str, bool]] = []
        for p in self.dirs:
            if p.rsplit("/", 1)[0] == (prefix or "/").rstrip("/") or (prefix == "" and "/" not in p[1:]):
                out.append((p.rsplit("/", 1)[1], True))
        for p in self.files:
            if p.rsplit("/", 1)[0] == (prefix or ""):
                out.append((p.rsplit("/", 1)[1], False))
        return out

    def create_directory(self, path: str) -> None:
        self.dirs.add(self._norm(path))

    def last_write_time(self, path: str) -> dt.datetime:
        p = self._norm(path)
        if p not in self.files:
            raise FileNotFoundError(path)
        return self.mtimes.get(p, dt.datetime(1970, 1, 1))


def _flatten_multiindex(df: pd.DataFrame) -> pd.DataFrame:
    """Reference samba_services.py:157-159: multi-row excel headers are
    joined with '_' before slugification."""
    if isinstance(df.columns, pd.MultiIndex):
        df.columns = ["_".join(str(part) for part in col) for col in df.columns]
    return df


def get_samba_df(
    spark: SparkSession,
    client: SmbClient,
    filepath: str,
    sheet_name=0,
    header=0,
    separator: str | None = None,
    encoding: str | None = None,
    decimal: str | None = None,
) -> DataFrame:
    """Share file -> DataFrame. Extension dispatch (csv/xls/xlsx,
    reference samba_services.py:136-154), honoring the reference's read
    options: sheet_name/header for excel, separator/encoding/decimal for
    csv. MultiIndex headers flatten with '_'; all headers slugified."""
    filetype = filepath.rsplit(".", 1)[-1].lower()
    if filetype not in _SUPPORTED:
        raise ValueError(
            f"File format not supported: .{filetype} — only {_SUPPORTED}"
        )
    raw = client.retrieve_file(filepath)
    buf = io.BytesIO(raw)
    if filetype in ("xls", "xlsx"):
        try:
            pdf = pd.read_excel(buf, sheet_name=sheet_name, header=header)
        except ImportError as e:
            raise ImportError(
                "reading .xls/.xlsx requires an excel engine (openpyxl/xlrd) "
                "on the driver"
            ) from e
    else:
        pdf = pd.read_csv(
            buf,
            sep=separator,
            encoding=encoding,
            decimal=decimal or ".",
            engine="python" if separator is None else "c",
        )
    pdf = _flatten_multiindex(pdf)
    pdf.columns = [slugify_column(str(c)) for c in pdf.columns]
    return spark.createDataFrame(pdf)


def store_samba_df(
    df: DataFrame,
    client: SmbClient,
    filepath: str,
    separator: str = ",",
    encoding: str = "utf-8",
    max_rows: int = 1_000_000,
) -> int:
    """K10: DataFrame -> csv bytes -> share. A share file is driver-side
    small data; `max_rows` guards against collecting a fact table. For
    cluster-scale extracts use write_csv to a mounted path instead."""
    rows = df.limit(max_rows + 1).toPandas()
    if len(rows) > max_rows:
        raise ValueError(f"refusing to store >{max_rows} rows on a file share")
    payload = rows.to_csv(index=False, sep=separator).encode(encoding)
    client.store_file(filepath, payload)
    return len(rows)


def get_file_last_write_time(client: SmbClient, filepath: str) -> dt.datetime:
    """Reference samba_services.py:81-106 (epoch-seconds conversion is
    the client's concern; the hook surface returns datetime)."""
    return client.last_write_time(filepath)


def create_folder(client: SmbClient, new_folderpath: str) -> bool:
    """Idempotent mkdir (reference samba_services.py:164-188): returns
    False if the folder already existed, True if created."""
    clean = new_folderpath.rstrip("/")
    folder_path, _, folder_name = clean.rpartition("/")  # share-root names have no '/'
    existing = {name for name, is_dir in client.list_path(folder_path or "/") if is_dir}
    if folder_name in existing:
        return False
    client.create_directory(clean)
    return True


def move_files(
    client: SmbClient,
    filepaths_to_move: list[tuple[str, str]],
    delete_source: bool = True,
) -> None:
    """Copy each (src, dst) pair, then optionally delete src (reference
    samba_services.py:190-232). Errors propagate with the failing path."""
    for src, dst in filepaths_to_move:
        try:
            data = client.retrieve_file(src)
        except Exception as e:
            raise RuntimeError(f'Error reading file "{src}"') from e
        try:
            client.store_file(dst, data)
        except Exception as e:
            raise RuntimeError(f'Error writing file on "{dst}"') from e
        if delete_source:
            try:
                client.delete_file(src)
            except Exception as e:
                raise RuntimeError(f'Error deleting source file on "{src}"') from e
