"""Zipped-CSV / Frictionless data-package reader-writer (S9 —
reference DataPatch.read_zipped_csv, patchwork.py:110-151, and
to_file, patchwork.py:183-246).

A patch artifact is a zip holding `datapackage.json` + one CSV; the
package's Table Schema types the columns (the reference mapped
`integer` -> pandas Int64, patchwork.py:34-36 — here Frictionless types
map to Spark types). Zip handling is driver-side (artifacts are small
by construction: changed rows only); the DataFrame is distributed.
"""

from __future__ import annotations

import json
import os
import tempfile
import zipfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

FRICTIONLESS_TO_SPARK: dict[str, T.DataType] = {
    "integer": T.LongType(),
    "number": T.DoubleType(),
    "boolean": T.BooleanType(),
    "date": T.DateType(),
    "datetime": T.TimestampType(),
    "string": T.StringType(),
}

SPARK_TO_FRICTIONLESS: dict[type, str] = {
    T.LongType: "integer",
    T.IntegerType: "integer",
    T.ShortType: "integer",
    T.DoubleType: "number",
    T.FloatType: "number",
    T.BooleanType: "boolean",
    T.DateType: "date",
    T.TimestampType: "datetime",
    T.StringType: "string",
}


def schema_from_package(descriptor: dict) -> T.StructType:
    fields = descriptor["resources"][0]["schema"]["fields"]
    return T.StructType(
        [
            T.StructField(f["name"], FRICTIONLESS_TO_SPARK.get(f.get("type", "string"), T.StringType()))
            for f in fields
        ]
    )


def read_zipped_csv(spark: SparkSession, zip_path: str) -> DataFrame:
    """Unzip to a scratch dir, read datapackage.json for the schema,
    then spark.read.csv the payload with that schema."""
    scratch = tempfile.mkdtemp(prefix="dpkg_")
    with zipfile.ZipFile(zip_path) as zf:
        zf.extractall(scratch)
    with open(os.path.join(scratch, "datapackage.json")) as fh:
        descriptor = json.load(fh)
    csv_name = descriptor["resources"][0]["path"]
    schema = schema_from_package(descriptor)
    return (
        spark.read.schema(schema)
        .option("header", "true")
        .csv(os.path.join(scratch, csv_name))
    )


def write_zipped_csv(df: DataFrame, zip_path: str, resource_name: str = "data") -> None:
    """Inverse: land the DataFrame as a single CSV + descriptor in a zip
    (the reference's patch-artifact format)."""
    pdf = df.toPandas()  # patch artifacts are small (changed rows only)
    descriptor = {
        "name": resource_name,
        "resources": [
            {
                "name": resource_name,
                "path": f"{resource_name}.csv",
                "schema": {
                    "fields": [
                        {"name": f.name, "type": SPARK_TO_FRICTIONLESS.get(type(f.dataType), "string")}
                        for f in df.schema.fields
                    ]
                },
            }
        ],
    }
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("datapackage.json", json.dumps(descriptor, indent=2))
        zf.writestr(f"{resource_name}.csv", pdf.to_csv(index=False))
