"""Database <-> Spark type mapping.

Reproduces the semantics of the reference's Teiid type-mapping config
(fastetl/custom_functions/utils/config/types_mapping.yml:1-125) and the
SQLAlchemy overrides in create_table.py:276-282, as data — Spark's
JdbcDialect handles the rest at read time; at write time we emit
`createTableColumnTypes` strings.

Rules carried over:
- string length >= 4000 -> TEXT/VARCHAR(MAX)-class type (yml:2-20)
- NUMERIC with no precision -> NUMERIC(38,13) (create_table.py:276-282)
- DECIMAL precision overflow (>38) -> DECIMAL(38,8) (yml:70-103)
- BIT -> Boolean; DATETIME -> DATETIME2 on mssql (create_table.py:278-282)
"""

from __future__ import annotations

from pyspark.sql import types as T

MAX_VARCHAR = 4000  # yml threshold: fixed-length strings above this go to MAX/TEXT
DECIMAL_OVERFLOW = (38, 8)
DEFAULT_NUMERIC = (38, 13)

# generic db type name -> Spark type (read direction)
DB_TO_SPARK: dict[str, T.DataType] = {
    "char": T.StringType(),
    "varchar": T.StringType(),
    "string": T.StringType(),
    "text": T.StringType(),
    "xml": T.StringType(),
    "short": T.ShortType(),
    "smallint": T.ShortType(),
    "integer": T.IntegerType(),
    "int": T.IntegerType(),
    "biginteger": T.LongType(),
    "long": T.LongType(),
    "bigint": T.LongType(),
    "boolean": T.BooleanType(),
    "bit": T.BooleanType(),
    "float": T.FloatType(),
    "real": T.FloatType(),
    "float4": T.FloatType(),
    "double": T.DoubleType(),
    "float8": T.DoubleType(),
    "timestamp": T.TimestampType(),
    "datetime": T.TimestampType(),
    "datetime2": T.TimestampType(),
    "date": T.DateType(),
    "object": T.BinaryType(),
    "bytea": T.BinaryType(),
    "varbinary": T.BinaryType(),
    # mysql family
    "double": T.DoubleType(),
    "tinytext": T.StringType(),
    "mediumtext": T.StringType(),
    "longtext": T.StringType(),
    "blob": T.BinaryType(),
    "mediumblob": T.BinaryType(),
    "longblob": T.BinaryType(),
}


def db_type_to_spark(type_name: str, precision: int | None = None, scale: int | None = None) -> T.DataType:
    name = type_name.strip().lower()
    if name in ("decimal", "numeric", "bigdecimal"):
        if precision is None:
            precision, scale = DEFAULT_NUMERIC
        if precision > 38:
            precision, scale = DECIMAL_OVERFLOW
        return T.DecimalType(precision, scale or 0)
    return DB_TO_SPARK.get(name, T.StringType())


def spark_type_to_ddl(dtype: T.DataType, dialect: str = "postgresql", length: int | None = None) -> str:
    """Write-direction DDL fragment for createTableColumnTypes / CREATE TABLE.

    Dialects: ``postgresql`` (default), ``mssql``/``sqlserver``,
    ``mysql`` (the three the reference targets — its get_hook_and_engine
    dispatches on exactly these; for mysql it also strips identifier
    quoting, fast_etl.py:312-314 — moot here since we emit unquoted
    identifiers everywhere). Applies the reference's length-overflow
    rule: a string column with a known length >= 4000 becomes TEXT (pg,
    mysql) / VARCHAR(MAX) (mssql)."""
    mssql = dialect in ("mssql", "sqlserver")
    mysql = dialect == "mysql"
    if isinstance(dtype, T.StringType):
        if length is None or length >= MAX_VARCHAR:
            return "VARCHAR(MAX)" if mssql else "TEXT"
        return f"VARCHAR({length})"
    if isinstance(dtype, T.DecimalType):
        p, s = dtype.precision, dtype.scale
        if p > 38:
            p, s = DECIMAL_OVERFLOW
        return f"NUMERIC({p},{s})" if not (mssql or mysql) else f"DECIMAL({p},{s})"
    if isinstance(dtype, T.BooleanType):
        return "BIT" if mssql else "BOOLEAN"
    if isinstance(dtype, T.TimestampType):
        if mssql:
            return "DATETIME2"
        return "DATETIME" if mysql else "TIMESTAMP"
    if isinstance(dtype, T.DateType):
        return "DATE"
    if isinstance(dtype, T.FloatType):
        return "FLOAT" if (mssql or mysql) else "FLOAT4"
    if isinstance(dtype, T.DoubleType):
        if mssql:
            return "FLOAT"
        return "DOUBLE" if mysql else "FLOAT8"
    if isinstance(dtype, T.ShortType):
        return "SMALLINT"
    if isinstance(dtype, T.IntegerType):
        return "INT"
    if isinstance(dtype, T.LongType):
        return "BIGINT"
    if isinstance(dtype, T.BinaryType):
        if mssql:
            return "VARBINARY(MAX)"
        return "LONGBLOB" if mysql else "BYTEA"
    return "TEXT"


def create_table_column_types(schema: T.StructType, dialect: str = "postgresql") -> str:
    """Full createTableColumnTypes string for df.write.jdbc (K7 auto-create,
    reference create_table.py:51-94,328-350)."""
    return ", ".join(f"{f.name} {spark_type_to_ddl(f.dataType, dialect)}" for f in schema.fields)
