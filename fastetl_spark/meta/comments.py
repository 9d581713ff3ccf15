"""Table/column comments (M1-M3 — reference table_comments.py:25-487).

The reference reads comments via engine-specific catalogs (mssql
extended properties, pg inspector, Teiid SYS tables) and writes them
with sp_addextendedproperty / COMMENT ON. Spark's equivalents are
DataFrame schema metadata and catalog DDL (`ALTER TABLE ... ALTER
COLUMN ... COMMENT`, `COMMENT ON TABLE`). This module implements:

- get_comments(df/table)   -> {column: comment} + table comment
- set_comments(df)         -> new DataFrame with schema metadata
- copy_comments(src, dest) -> M3, compose get+set
- DDL emission for JDBC destinations (COMMENT ON statements, returned
  as strings, side-effect free) and EXECUTION via apply_comments /
  apply_df_comments against a StatementRunner (a JDBC connection, DBAPI
  cursor, or hook), with mssql add-vs-update chosen per existing value.
"""

from __future__ import annotations

from typing import Protocol

from pyspark.sql import DataFrame
from pyspark.sql import types as T


def get_column_comments(df: DataFrame) -> dict[str, str]:
    """Read per-column comments from schema metadata."""
    return {
        f.name: f.metadata["comment"]
        for f in df.schema.fields
        if f.metadata and "comment" in f.metadata
    }


def with_column_comments(df: DataFrame, comments: dict[str, str]) -> DataFrame:
    """Attach comments as column metadata (Spark's schema-level analog of
    sp_addextendedproperty, reference table_comments.py:204-269)."""
    out = df
    for col, comment in comments.items():
        if col in df.columns:
            out = out.withMetadata(col, {"comment": comment})
    return out


def copy_comments(source: DataFrame, dest: DataFrame) -> DataFrame:
    """M3 (_copy_table_comments, fast_etl.py:99-124): propagate source
    comments onto the destination's matching columns (case-insensitive,
    like the reference's lower-cased matching)."""
    src = {k.lower(): v for k, v in get_column_comments(source).items()}
    dest_comments = {c: src[c.lower()] for c in dest.columns if c.lower() in src}
    return with_column_comments(dest, dest_comments)


def comment_ddl(
    schema: T.StructType, table: str, table_comment: str | None = None, dialect: str = "postgresql"
) -> list[str]:
    """COMMENT ON statements for a JDBC destination (executed by the
    caller's connection; generated here so they are testable)."""
    stmts: list[str] = []
    esc = lambda s: s.replace("'", "''")
    if table_comment:
        stmts.append(f"COMMENT ON TABLE {table} IS '{esc(table_comment)}'")
    for f in schema.fields:
        if f.metadata and "comment" in f.metadata:
            stmts.append(
                f"COMMENT ON COLUMN {table}.{f.name} IS '{esc(f.metadata['comment'])}'"
            )
    return stmts


# --- execution against a destination connection (M1-M3) ------------------


class StatementRunner(Protocol):
    """The two-method surface comment propagation needs from a
    destination connection. Wrap a JDBC Connection, a DBAPI cursor, or
    an Airflow hook — `run` executes DDL, `get_first` returns the first
    row of a probe query (or None), mirroring the reference hook calls
    (table_comments.py:262-267 get_first, :338/:365 run)."""

    def run(self, sql: str) -> None: ...

    def get_first(self, sql: str):  # -> tuple | None
        ...


def _esc(s: str) -> str:
    return s.replace("'", "''")


def apply_comments(
    runner: StatementRunner,
    table: str,
    column_comments: dict[str, str],
    table_comment: str | None = None,
    dialect: str = "postgresql",
    schema: str = "dbo",
) -> int:
    """Execute comment propagation on the destination (M1-M3 executed,
    not just emitted). Returns the number of statements run.

    - postgresql/duckdb: `COMMENT ON` is an upsert, one statement per
      object (reference pg path, table_comments.py:377-417).
    - mssql: probe `fn_listextendedproperty` per object and EXEC
      `sp_addextendedproperty` or `sp_updateextendedproperty` —
      add-vs-update chosen per existing value exactly like the reference
      (table_comments.py:204-269, :313-373).
    """
    n = 0
    if dialect in ("postgresql", "duckdb"):
        if table_comment is not None:
            runner.run(f"COMMENT ON TABLE {table} IS '{_esc(table_comment)}'")
            n += 1
        for col, comment in column_comments.items():
            runner.run(f"COMMENT ON COLUMN {table}.{col} IS '{_esc(comment)}'")
            n += 1
        return n
    if dialect == "mssql":
        if table_comment is not None:
            probe = (
                "SELECT value FROM fn_listextendedproperty ('MS_Description',"
                f" 'schema', '{schema}', 'table', '{table}', default, default)"
            )
            verb = "updateextendedproperty" if runner.get_first(probe) else "addextendedproperty"
            runner.run(
                f"EXEC sys.sp_{verb} @name='MS_Description',"
                f" @value='{_esc(table_comment)}',"
                f" @level0type='schema', @level0name='{schema}',"
                f" @level1type='table', @level1name='{table}'"
            )
            n += 1
        for col, comment in column_comments.items():
            probe = (
                "SELECT value FROM fn_listextendedproperty ('MS_Description',"
                f" 'schema', '{schema}', 'table', '{table}', 'column', '{col}')"
            )
            verb = "updateextendedproperty" if runner.get_first(probe) else "addextendedproperty"
            runner.run(
                f"EXEC sys.sp_{verb} @name='MS_Description',"
                f" @value='{_esc(comment)}',"
                f" @level0type='schema', @level0name='{schema}',"
                f" @level1type='table', @level1name='{table}',"
                f" @level2type='column', @level2name='{col}'"
            )
            n += 1
        return n
    raise ValueError(f"unsupported comment dialect: {dialect}")


def apply_df_comments(
    runner: StatementRunner,
    df: DataFrame,
    table: str,
    table_comment: str | None = None,
    dialect: str = "postgresql",
    schema: str = "dbo",
) -> int:
    """M3 end-to-end: take the comments riding on a DataFrame's schema
    metadata and execute them against the destination table."""
    return apply_comments(
        runner, table, get_column_comments(df), table_comment, dialect, schema
    )
