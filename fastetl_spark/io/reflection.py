"""Source-schema reflection -> destination CREATE TABLE DDL.

Re-expresses the reference's SQLAlchemy reflection round-trip
(create_table.py:296-340: Inspector.get_columns on the source ->
_convert_column type overrides -> Table(...).create_all on the
destination) without SQLAlchemy: a source schema — reflected from a
live JDBC endpoint by Spark, or given as Inspector-style column dicts
— is mapped through io/types_mapping to a dialect-specific
``CREATE TABLE`` statement, and DDL can be parsed back to a Spark
schema so the mapping is verifiable as a round trip.

The reference's overrides are preserved (create_table.py:276-282):
NUMERIC with no precision -> NUMERIC(38,13); BIT -> Boolean;
DATETIME -> DATETIME2 on mssql; string length >= 4000 -> TEXT /
VARCHAR(MAX) (types_mapping.yml:2-20).

All of this is driver-side metadata work on a handful of column
descriptors — nothing here touches data paths or scales with rows.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from fastetl_spark.io.types_mapping import db_type_to_spark, spark_type_to_ddl


def reflect_columns_to_schema(columns: list[dict]) -> T.StructType:
    """Inspector-style column dicts -> Spark schema.

    Each dict: ``{"name": str, "type": str, "precision": int | None,
    "scale": int | None, "nullable": bool}`` (precision/scale/nullable
    optional) — the shape a JDBC metadata query (or the reference's
    ``Inspector.get_columns``) returns."""
    fields = []
    for c in columns:
        dtype = db_type_to_spark(c["type"], c.get("precision"), c.get("scale"))
        fields.append(T.StructField(c["name"], dtype, c.get("nullable", True)))
    return T.StructType(fields)


def reflect_jdbc_source_schema(
    spark: SparkSession, url: str, table: str, **options
) -> T.StructType:
    """Reflect a live JDBC source's schema WITHOUT moving data: Spark
    plans a zero-row query (WHERE 1=0 pushed into the dbtable subquery)
    and the JDBC driver reports column metadata only."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", f"(SELECT * FROM {table} WHERE 1=0) fe_reflect")
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load().schema


def create_table_ddl(
    table: str,
    schema: T.StructType,
    dialect: str = "postgresql",
    schema_name: str | None = None,
    if_not_exists: bool = True,
    lengths: dict[str, int] | None = None,
) -> str:
    """Emit the destination ``CREATE TABLE`` for a Spark schema.

    ``lengths`` optionally carries known string lengths per column (from
    source reflection), so VARCHAR(n) survives the trip and the
    >= 4000 -> TEXT/VARCHAR(MAX) overflow rule applies per column.
    Matches the conditional semantics of the reference's
    ``create_all`` (a checkfirst metadata probe): postgresql/mysql get
    ``IF NOT EXISTS``; T-SQL has no such clause, so mssql gets the
    ``IF OBJECT_ID(...) IS NULL`` guard statement instead — emitting
    IF NOT EXISTS there would be a syntax error."""
    lengths = lengths or {}
    cols = []
    for f in schema.fields:
        frag = spark_type_to_ddl(f.dataType, dialect, lengths.get(f.name))
        null = "" if f.nullable else " NOT NULL"
        cols.append(f"    {f.name} {frag}{null}")
    qualified = f"{schema_name}.{table}" if schema_name else table
    body = ",\n".join(cols)
    mssql = dialect in ("mssql", "sqlserver")
    if if_not_exists and mssql:
        return (
            f"IF OBJECT_ID(N'{qualified}', N'U') IS NULL\n"
            f"CREATE TABLE {qualified} (\n{body}\n)"
        )
    ine = "IF NOT EXISTS " if if_not_exists and not mssql else ""
    return f"CREATE TABLE {ine}{qualified} (\n{body}\n)"


_COL_RE = re.compile(
    r"^\s*(?P<name>\w+)\s+(?P<type>\w+)"
    r"(?:\s*\(\s*(?P<a1>MAX|\d+)\s*(?:,\s*(?P<a2>\d+)\s*)?\))?"
    r"(?P<notnull>\s+NOT\s+NULL)?\s*$",
    re.IGNORECASE,
)


def parse_create_table_ddl(ddl: str) -> T.StructType:
    """Parse a ``CREATE TABLE`` statement (ours, or a hand-written one)
    back to a Spark schema through the same type mapping — the verify
    half of the round trip, and the reader for reflect-from-DDL
    migration flows."""
    # tolerate a leading T-SQL existence guard (IF OBJECT_ID(...) IS
    # NULL) by parsing from the CREATE TABLE keyword on
    start = ddl.upper().find("CREATE TABLE")
    if start > 0:
        ddl = ddl[start:]
    m = re.search(r"\((?P<body>.*)\)\s*;?\s*$", ddl, re.DOTALL)
    if not m:
        raise ValueError("not a CREATE TABLE statement: no column list found")
    fields = []
    for raw in _split_top_level(m.group("body")):
        cm = _COL_RE.match(raw.strip())
        if not cm:
            raise ValueError(f"unparseable column definition: {raw.strip()!r}")
        a1, a2 = cm.group("a1"), cm.group("a2")
        if a1 is not None and a1.upper() == "MAX":
            precision = scale = None
        else:
            precision = int(a1) if a1 is not None else None
            scale = int(a2) if a2 is not None else None
        type_name = cm.group("type")
        if type_name.lower() in ("varchar", "char") :
            dtype: T.DataType = T.StringType()
        else:
            dtype = db_type_to_spark(type_name, precision, scale)
        fields.append(
            T.StructField(cm.group("name"), dtype, cm.group("notnull") is None)
        )
    return T.StructType(fields)


def _split_top_level(body: str) -> list[str]:
    """Split the column list on commas not inside parentheses."""
    parts, depth, cur = [], 0, []
    for ch in body:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if "".join(cur).strip():
        parts.append("".join(cur))
    return [p for p in parts if p.strip()]


def source_to_dest_ddl(
    source_df: DataFrame,
    table: str,
    dialect: str = "postgresql",
    schema_name: str | None = None,
) -> str:
    """One-call form of the reference's create_table_if_not_exists
    source->dest flow: any readable source (JDBC scan, parquet, csv)
    already carries a Spark schema; emit the destination DDL from it."""
    return create_table_ddl(table, source_df.schema, dialect, schema_name)
