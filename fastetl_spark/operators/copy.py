"""Replication operators: full_copy + external small-table ingestion.

full_copy re-expresses copy_db_to_db (reference fast_etl.py:189-356):
destination-driven projection, optional truncate, batched write, row
count to the load log — as one distributed plan instead of a
single-threaded fetchmany/executemany loop.

small_table_from_records covers the GSheet/Samba/zipped-CSV family
(S7-S9): a driver-side fetch lands rows (any connector), headers are
slugified (string_formatting.py:13-28), empty-header columns dropped
(gsheet_operator.py:60-61), and the result becomes a broadcastable
DataFrame.
"""

from __future__ import annotations

import re
import unicodedata
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession

from fastetl_spark.io.writers import select_intersection
from fastetl_spark.meta.load_info import LoadInfo


def slugify_column(name: str) -> str:
    """F9 (reference string_formatting.py:13-28): unaccent, lowercase,
    non-alphanumerics to single underscores."""
    norm = unicodedata.normalize("NFKD", name).encode("ascii", "ignore").decode("ascii")
    slug = re.sub(r"[^a-z0-9]+", "_", norm.lower()).strip("_")
    return slug


def slugify_columns(df: DataFrame) -> DataFrame:
    return df.toDF(*[slugify_column(c) for c in df.columns])


def drop_empty_header_columns(df: DataFrame) -> DataFrame:
    """P6 (gsheet_operator.py:60-61): spreadsheet imports carry unnamed
    columns; drop any column whose (slugified) name is empty."""
    keep = [c for c in df.columns if slugify_column(c)]
    return df.select(*keep)


def small_table_from_records(
    spark: SparkSession, records: Sequence[dict] | Sequence[tuple], schema=None, header: list[str] | None = None
) -> DataFrame:
    """Driver-side connector landing zone: rows fetched from a
    spreadsheet/share/HTTP API become a DataFrame with slugified headers.
    Small by construction — meant to be broadcast against fact tables."""
    if header is not None:
        df = spark.createDataFrame(list(records), schema=header)
    else:
        df = spark.createDataFrame(list(records), schema=schema)
    return slugify_columns(drop_empty_header_columns(df))


def full_copy(
    source: DataFrame,
    dest_path: str,
    dest_columns: list[str] | None = None,
    columns_to_ignore: list[str] | None = None,
    truncate: bool = True,
    load_info: LoadInfo | None = None,
    table_name: str = "",
) -> int:
    """Full replication: project to the destination's columns
    (case-insensitive, fast_etl.py:84-89,290-310), minus ignores
    (db_to_csv_operator.py:63-72), truncate-or-append, then log the row
    count (fast_etl.py:343-356). Returns rows written."""
    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    df = source
    if dest_columns:
        df = select_intersection(df, dest_columns)
    if columns_to_ignore:
        df = df.drop(*columns_to_ignore)
    mode = "overwrite" if truncate else "append"
    # row-count metric rides on the write itself (observe) — one scan,
    # no second job re-executing the source plan
    obs = Observation()
    df = df.observe(obs, F.count(F.lit(1)).alias("n_rows"))
    df.write.mode(mode).parquet(dest_path)
    n = int(obs.get["n_rows"])
    if not truncate:
        # append logs the destination TOTAL, like the reference's
        # post-load count — parquet footer metadata only, no data scan
        n = df.sparkSession.read.parquet(dest_path).count()
    if load_info is not None:
        load_info.save(table_name or dest_path, "full" if truncate else "append", n)
    return n


def copy_by_key_ranges(
    source: DataFrame,
    dest_dir: str,
    key_column: str,
    key_interval: int = 10_000,
    key_start: int = 0,
    key_end: int | None = None,
) -> dict[str, int]:
    """Resumable key-interval copy (reference copy_by_key_interval +
    copy_by_key_with_retry, copy_db_extensions.py:21-294): each key range
    lands as its own parquet subdir; ranges already present are skipped,
    so a failed run resumes from the next missing range — the Spark
    analog of the reference's `next_key` bookkeeping. Ranges run as
    ordinary parallel jobs (the reference ran them serially)."""
    import os

    from pyspark.sql import functions as F

    if key_end is None:
        key_end = source.agg(F.max(key_column)).first()[0] or key_start
    written: dict[str, int] = {}
    lo = key_start
    while lo <= key_end:
        hi = lo + key_interval - 1
        part_path = os.path.join(dest_dir, f"{key_column}_{lo}_{hi}")
        if os.path.exists(os.path.join(part_path, "_SUCCESS")):
            written[part_path] = -1  # already present: skipped (resume)
        else:
            from pyspark.sql import Observation

            obs = Observation()
            chunk = source.filter(F.col(key_column).between(lo, hi)).observe(
                obs, F.count(F.lit(1)).alias("n_rows")
            )
            chunk.write.mode("overwrite").parquet(part_path)
            # count observed on the write job — no re-scan of the range
            written[part_path] = int(obs.get["n_rows"])
        lo = hi + 1
    return written
