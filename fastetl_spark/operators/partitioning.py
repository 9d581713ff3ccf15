"""Partitioning strategies for co-located and skew-resistant joins —
the knobs a 100 TB deployment turns (SURVEY §4 / task brief):

- bucketed tables: both join sides bucketed by the key -> the join
  runs shuffle-free (SortMergeJoin over pre-sorted buckets);
- salted join: a hot key is split across `salt_n` sub-keys so no single
  task receives the whole key's rows (manual complement to AQE's
  skew-join splitting, which only helps sort-merge stages).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame, table_name: str, bucket_col: str, num_buckets: int = 16, sort: bool = True
) -> None:
    """Persist as a bucketed (and bucket-sorted) managed table; two
    tables bucketed identically join without an Exchange."""
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_col)
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table_name)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, on: str) -> DataFrame:
    return spark.table(left_table).join(spark.table(right_table), on)


def salted_join(
    fact: DataFrame, dim: DataFrame, on: str, salt_n: int = 8
) -> DataFrame:
    """Equi-join where `fact` is skewed on `on`: fact rows get a random-
    free deterministic salt (hash of a secondary expression modulo
    salt_n), and the dim side is exploded salt_n times, so each hot key
    spreads over salt_n tasks. Result equals fact.join(dim, on)."""
    fact_s = fact.withColumn("__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_n)))
    dim_s = dim.withColumn("__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_n)])))
    out = fact_s.join(dim_s, [on, "__salt"])
    return out.drop("__salt")
