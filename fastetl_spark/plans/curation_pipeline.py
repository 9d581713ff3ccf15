"""Declarative corpus-curation pipeline: ordered stages, one pass,
per-stage funnel stats observed on the job itself.

The composition a training-data pipeline actually runs — quality
filters, then dedup, then (downstream) split/shard — expressed so that:

- expression stages (filters/transforms) FUSE: Catalyst collapses them
  into the scan's WholeStageCodegen, so ten filters still cost one
  pass over the corpus;
- per-stage row counts ride the same job via ``Observation`` (one
  metric per stage boundary) — the funnel report costs ZERO extra
  actions, where a naive ``count()`` per stage would re-execute the
  lineage N times;
- dedup stages are explicit barriers (one fingerprint shuffle), so a
  reader of the pipeline sees exactly where the shuffles are.

The registered ``curation_pipeline_stats`` query runs the canonical
funnel (length floor -> digit-ratio cap -> normalized exact dedup) and
returns the stats table, oracle-checked against the same funnel in SQL.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column, DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from fastetl_spark.registry import query


@dataclass
class CorpusCurator:
    """Ordered corpus-curation stages over a (doc_id, text, ...) frame."""

    _stages: list = field(default_factory=list)

    def filter(self, name: str, cond: Column) -> "CorpusCurator":
        self._stages.append((name, "filter", cond))
        return self

    def transform(self, name: str, fn: Callable[[DataFrame], DataFrame]) -> "CorpusCurator":
        self._stages.append((name, "transform", fn))
        return self

    def dedup_exact_normalized(
        self, name: str = "dedup_normalized", text_col: str = "text", id_col: str = "doc_id"
    ) -> "CorpusCurator":
        """Keep the minimum-id document per normalized fingerprint —
        the barrier stage (one fingerprint shuffle; only the window
        rank runs per group, no doc-list buffers)."""
        from pyspark.sql.window import Window

        from fastetl_spark.operators.dedup import normalize_text

        def dedup(df: DataFrame) -> DataFrame:
            w = Window.partitionBy(F.md5(normalize_text(F.col(text_col)))).orderBy(
                F.col(id_col)
            )
            return (
                df.withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") == 1)
                .drop("__rn")
            )

        self._stages.append((name, "transform", dedup))
        return self

    def run(self, docs: DataFrame) -> tuple[DataFrame, Callable[[], list[tuple]]]:
        """Build the curated frame. Returns ``(curated, stats)`` where
        ``stats()`` — valid after any action on ``curated`` — yields
        ``[(stage_idx, stage_name, rows_out), ...]`` including the
        ``raw`` input row. All counts are observed on the single job."""
        observations: list[tuple[int, str, Observation]] = []

        def observed(df: DataFrame, idx: int, name: str) -> DataFrame:
            obs = Observation()
            observations.append((idx, name, obs))
            return df.observe(obs, F.count(F.lit(1)).alias("rows"))

        out = observed(docs, 0, "raw")
        for i, (name, kind, payload) in enumerate(self._stages, start=1):
            if kind == "filter":
                out = out.filter(payload)
            else:
                out = payload(out)
            out = observed(out, i, name)

        def stats() -> list[tuple]:
            return [(i, name, int(obs.get["rows"])) for i, name, obs in observations]

        return out, stats


# --- registered canonical funnel -----------------------------------------

_MIN_LEN = 100
_MAX_DIGIT_PCT = 30  # digit chars <= 30% of text, integer arithmetic

_CURATION_SQL = f"""
WITH s1 AS (
  SELECT * FROM documents WHERE LENGTH(text) >= {_MIN_LEN}
), s2 AS (
  SELECT * FROM s1
  WHERE (LENGTH(text) - LENGTH(regexp_replace(text, '[0-9]', '', 'g'))) * 100
        <= {_MAX_DIGIT_PCT} * LENGTH(text)
), s3 AS (
  SELECT MIN(doc_id) AS doc_id
  FROM s2
  GROUP BY md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g')))
)
SELECT 0 AS stage_idx, 'raw' AS stage,
       CAST((SELECT COUNT(*) FROM documents) AS BIGINT) AS rows_out
UNION ALL SELECT 1, 'min_length', CAST((SELECT COUNT(*) FROM s1) AS BIGINT)
UNION ALL SELECT 2, 'digit_ratio', CAST((SELECT COUNT(*) FROM s2) AS BIGINT)
UNION ALL SELECT 3, 'dedup_normalized', CAST((SELECT COUNT(*) FROM s3) AS BIGINT)
"""


@query("curation_pipeline_stats", _CURATION_SQL)
def curation_pipeline_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical curation funnel's stage report: raw -> length
    floor -> digit-ratio cap -> normalized exact dedup. The two filter
    stages fuse into the scan; dedup is the one shuffle; all four
    counts are observed on that single job (the oracle recomputes each
    stage as SQL — equality proves both the stage semantics and the
    funnel bookkeeping)."""
    from fastetl_spark.io.readers import ensure_parallelism, read_table

    d = ensure_parallelism(read_table(spark, sf_dir, "documents"))
    n_digits = F.length("text") - F.length(F.regexp_replace("text", "[0-9]", ""))
    curator = (
        CorpusCurator()
        .filter("min_length", F.length("text") >= _MIN_LEN)
        .filter("digit_ratio", n_digits * 100 <= _MAX_DIGIT_PCT * F.length("text"))
        .dedup_exact_normalized()
    )
    curated, stats = curator.run(d)
    curated.write.format("noop").mode("overwrite").save()  # one action, all stages
    return spark.createDataFrame(
        stats(), "stage_idx int, stage string, rows_out long"
    )
