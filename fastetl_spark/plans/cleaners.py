"""Concrete cleaner classes (the reference's BaseDataCleaner plugin
surface, patchwork.py:264-1103) — each wraps the vectorized expressions
from functions/cleaning.py + functions/cpf.py and emits set-wise QA
rows.

The reference mutated a pandas frame row-by-row and appended QA entries
per decision; these produce identical decisions as (cleaned_df, qa_df)
pairs computed distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from fastetl_spark.functions import cleaning as C
from fastetl_spark.functions.cpf import cpf_clean, cpf_normalize
from fastetl_spark.plans.qa import BaseCleaner, QALogLevel


class DuplicatedRowCleaner(BaseCleaner):
    """A3 (patchwork.py:380-412): drop PK duplicates keeping the first by
    an explicit order (the reference's keep='first' relied on file order
    — nondeterministic at scale, SURVEY §7.3.2)."""

    def __init__(self, pks, order_by: list[str], **kw):
        super().__init__(pks, **kw)
        self.order_by = order_by

    def clean(self, df: DataFrame):
        w = Window.partitionBy(*self.pks).orderBy(*self.order_by)
        marked = df.withColumn("__rn", F.row_number().over(w))
        qa = self._qa(
            marked.filter(F.col("__rn") > 1),
            coluna=",".join(self.pks),
            violation=F.lit(True),
            original=F.concat_ws(",", *[F.col(p).cast("string") for p in self.pks]),
            considered=F.lit(None).cast("string"),
            level=QALogLevel.DROP_LINE,
            motivo="linha duplicada removida",
        )
        return marked.filter(F.col("__rn") == 1).drop("__rn"), qa


class DecimalCommaCleaner(BaseCleaner):
    """F1 (patchwork.py:445-471)."""

    def __init__(self, pks, column: str, **kw):
        super().__init__(pks, **kw)
        self.column = column

    def clean(self, df: DataFrame):
        fixed = C.fix_decimal_comma(F.col(self.column))
        cleaned = df.withColumn(self.column, fixed)
        had_comma = F.col(self.column).contains(",")
        cast_failed = fixed.isNull() & F.col(self.column).isNotNull()
        qa_fix = self._qa(
            df, self.column,
            violation=had_comma & ~cast_failed,
            original=F.col(self.column),
            considered=fixed.cast("string"),
            level=QALogLevel.CAST_FIX,
            motivo="vírgula decimal corrigida",
        )
        qa_null = self._qa(
            df, self.column,
            violation=cast_failed,
            original=F.col(self.column),
            considered=F.lit(None).cast("string"),
            level=QALogLevel.CAST_NULL,
            motivo="valor não numérico",
        )
        return cleaned, qa_fix.unionByName(qa_null)


class GeoPointCleaner(BaseCleaner):
    """F2+F3 (patchwork.py:414-589): scale repair then bounds nulling for
    a latitude/longitude column pair."""

    def __init__(self, pks, lat_col: str, lon_col: str, **kw):
        super().__init__(pks, **kw)
        self.lat_col, self.lon_col = lat_col, lon_col

    def clean(self, df: DataFrame):
        out = df
        qa = None
        for col, lo, hi in ((self.lat_col, -90.0, 90.0), (self.lon_col, -180.0, 180.0)):
            orig = F.col(col)
            scaled = C.fix_coordinate_scale(orig, lo, hi)
            bounded = C.null_out_of_bounds(scaled, lo, hi)
            q_fix = self._qa(
                out, col,
                violation=orig.isNotNull() & (scaled != orig),
                original=orig.cast("string"),
                considered=scaled.cast("string"),
                level=QALogLevel.CAST_FIX,
                motivo="escala de coordenada corrigida",
            )
            q_null = self._qa(
                out, col,
                violation=scaled.isNotNull() & bounded.isNull(),
                original=orig.cast("string"),
                considered=F.lit(None).cast("string"),
                level=QALogLevel.CAST_NULL,
                motivo="coordenada fora dos limites",
            )
            out = out.withColumn(col, bounded)
            part = q_fix.unionByName(q_null)
            qa = part if qa is None else qa.unionByName(part)
        return out, qa


class CPFCleaner(BaseCleaner):
    """F5 (patchwork.py:607-726): normalize + validate check digits."""

    def __init__(self, pks, column: str, **kw):
        super().__init__(pks, **kw)
        self.column = column

    def clean(self, df: DataFrame):
        orig = F.col(self.column)
        cleaned_col = cpf_clean(orig)
        norm = cpf_normalize(orig)
        qa_fix = self._qa(
            df, self.column,
            violation=cleaned_col.isNotNull() & (orig != cleaned_col),
            original=orig, considered=norm,
            level=QALogLevel.CAST_FIX, motivo="cpf normalizado",
        )
        qa_null = self._qa(
            df, self.column,
            violation=orig.isNotNull() & cleaned_col.isNull(),
            original=orig, considered=F.lit(None).cast("string"),
            level=QALogLevel.CAST_NULL, motivo="cpf inválido",
        )
        return df.withColumn(self.column, cleaned_col), qa_fix.unionByName(qa_null)


class UFCleaner(BaseCleaner):
    """F6 (patchwork.py:728-758)."""

    def __init__(self, pks, column: str, **kw):
        super().__init__(pks, **kw)
        self.column = column

    def clean(self, df: DataFrame):
        orig = F.col(self.column)
        cleaned_col = C.uf_clean(orig)
        qa = self._qa(
            df, self.column,
            violation=orig.isNotNull() & cleaned_col.isNull(),
            original=orig, considered=F.lit(None).cast("string"),
            level=QALogLevel.CAST_NULL, motivo="UF inválida",
        )
        return df.withColumn(self.column, cleaned_col), qa


class TextCropCleaner(BaseCleaner):
    """F7 (patchwork.py:760-819): crop with '...', log the original at
    2x size like the reference (patchwork.py:806-817)."""

    def __init__(self, pks, column: str, size: int, **kw):
        super().__init__(pks, **kw)
        self.column = column
        self.size = size

    def clean(self, df: DataFrame):
        orig = F.col(self.column)
        cropped = C.text_crop(orig, self.size)
        qa = self._qa(
            df, self.column,
            violation=F.length(orig) > self.size,
            original=F.substring(orig, 1, 2 * self.size),
            considered=cropped,
            level=QALogLevel.CAST_FIX, motivo="texto truncado",
        )
        return df.withColumn(self.column, cropped), qa


class MappingCleaner(BaseCleaner):
    """F8/J1 (GSheetMappingCleaner, patchwork.py:865-897): canonicalize a
    column via a broadcast (dirty_value -> valor_canonico) map."""

    def __init__(self, pks, column: str, mapping: DataFrame, **kw):
        super().__init__(pks, **kw)
        self.column = column
        self.mapping = mapping

    def clean(self, df: DataFrame):
        m = broadcast(self.mapping.select(
            F.col("dirty_value"), F.col("valor_canonico").alias("__canon")
        ))
        joined = df.join(m, df[self.column] == m.dirty_value, "left").drop("dirty_value")
        qa = self._qa(
            joined, self.column,
            violation=F.col("__canon").isNotNull() & (F.col("__canon") != F.col(self.column)),
            original=F.col(self.column), considered=F.col("__canon"),
            level=QALogLevel.CAST_FIX, motivo="valor canonizado",
        )
        cleaned = joined.withColumn(
            self.column, F.coalesce(F.col("__canon"), F.col(self.column))
        ).drop("__canon")
        return cleaned, qa
