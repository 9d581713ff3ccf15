"""Identifier quoting / SQL fragments per destination dialect.

The reference quotes columns with double quotes and strips them for
MySQL (fast_etl.py:33-38,312-314); TRUNCATE/SELECT templates come from
build_dest_sqls (fast_etl.py:41-68). These are the string-level helpers
a JDBC destination needs; Spark's own JdbcDialect handles type mapping.
"""

from __future__ import annotations

QUOTES = {
    "postgresql": '"',
    "mssql": '"',
    "sqlserver": '"',
    "teiid": '"',
    "mysql": "`",
}


def quote_ident(name: str, dialect: str = "postgresql") -> str:
    q = QUOTES.get(dialect, '"')
    return f"{q}{name}{q}"


def build_select_sql(schema: str, table: str, columns: list[str], dialect: str = "postgresql") -> str:
    """build_select_sql (fast_etl.py:33-38): explicit quoted column list
    (mysql gets backticks instead of the reference's strip-quotes hack)."""
    cols = ", ".join(quote_ident(c, dialect) for c in columns)
    return f"SELECT {cols} FROM {schema}.{table}"


def build_truncate_sql(schema: str, table: str) -> str:
    return f"TRUNCATE TABLE {schema}.{table}"


def build_insert_sql(schema: str, table: str, columns: list[str], dialect: str = "postgresql") -> str:
    """Parameterized insert (fast_etl.py:41-68); Spark's JDBC writer
    generates this internally — exposed for connector parity/testing."""
    cols = ", ".join(quote_ident(c, dialect) for c in columns)
    params = ", ".join("?" for _ in columns)
    return f"INSERT INTO {schema}.{table} ({cols}) VALUES ({params})"
