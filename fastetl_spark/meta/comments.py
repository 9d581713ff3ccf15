"""Table/column comments (M1-M3 — reference table_comments.py:25-487).

The reference reads comments via engine-specific catalogs (mssql
extended properties, pg inspector, Teiid SYS tables) and writes them
with sp_addextendedproperty / COMMENT ON. Spark's equivalents are
DataFrame schema metadata and catalog DDL (`ALTER TABLE ... ALTER
COLUMN ... COMMENT`, `COMMENT ON TABLE`). This module implements:

- get_comments(df/table)   -> {column: comment} + table comment
- set_comments(df)         -> new DataFrame with schema metadata
- copy_comments(src, dest) -> M3, compose get+set
- DDL emission for JDBC destinations (COMMENT ON statements a JDBC
  connection would execute — returned as strings, side-effect free).
"""

from __future__ import annotations

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
