"""Patch overlay & merge_patches (reference patchwork.py:1113-1257).

The reference overlays cell-level fixes with pandas indexed assignment
`df.loc[fixes.index, fixes.columns] = fixes` (patchwork.py:1179) —
last-writer-wins — and drops rows whose PKs appear in QA DROP_LINE
records (patchwork.py:1181-1212). Here:

- apply_patch  = left join on PKs + per-column overlay. A `__patched__`
  marker distinguishes "patch sets NULL" (CAST_NULL must really
  overwrite, SURVEY §7.3.3) from "no patch row";
- drop_by_key  = anti-join (J8);
- merge_patches = ordered fold of overlays (later patches win) + drops.

Scale: each overlay is one equi-join on the PKs; patches are typically
tiny relative to the base, so AQE broadcasts them — the 100 TB base is
never shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from fastetl_spark.io.readers import read_table
from fastetl_spark.registry import query

_MARK = "__patched__"


def apply_patch(base: DataFrame, patch: DataFrame, pks: list[str]) -> DataFrame:
    """Overlay patch cells onto base. Patch columns (other than PKs)
    replace base values wherever a patch row matches — including
    explicit NULLs (real-NULL overwrite, not coalesce)."""
    patch_cols = [c for c in patch.columns if c not in pks]
    marked = patch.withColumn(_MARK, F.lit(True))
    renamed = marked.select(
        *pks, _MARK, *[F.col(c).alias(f"__p_{c}") for c in patch_cols]
    )
    joined = base.join(renamed, on=pks, how="left")
    out_cols = []
    for c in base.columns:
        if c in pks or c not in patch_cols:
            out_cols.append(F.col(c))
        else:
            out_cols.append(
                F.when(F.col(_MARK), F.col(f"__p_{c}")).otherwise(F.col(c)).alias(c)
            )
    return joined.select(*out_cols)


def drop_by_key(base: DataFrame, drops: DataFrame, pks: list[str]) -> DataFrame:
    """J8: remove rows whose PKs appear in DROP_LINE QA records."""
    return base.join(drops.select(*pks).distinct(), on=pks, how="left_anti")


def merge_patches(
    base: DataFrame,
    patches: list[DataFrame],
    pks: list[str],
    drops: DataFrame | None = None,
) -> DataFrame:
    """Ordered fold: later patches overwrite earlier ones (the reference
    applies patch files in sequence), then apply drops."""
    out = base
    for p in patches:
        out = apply_patch(out, p, pks)
    if drops is not None:
        out = drop_by_key(out, drops, pks)
    return out


# --- registered queries --------------------------------------------------

_OVERLAY_SQL = """
WITH patch AS (
  SELECT l_orderkey, l_linenumber, 0.0 AS p_discount
  FROM lineitem WHERE l_orderkey % 100 = 0
)
SELECT b.l_orderkey, b.l_linenumber,
       CASE WHEN p.l_orderkey IS NOT NULL THEN p.p_discount ELSE b.l_discount END AS l_discount,
       p.l_orderkey IS NOT NULL AS patched
FROM lineitem b
LEFT JOIN patch p ON b.l_orderkey = p.l_orderkey AND b.l_linenumber = p.l_linenumber
"""


@query("patch_overlay", _OVERLAY_SQL)
def patch_overlay_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J7 cell-level overlay: zero the discount of every 100th order's
    lines via a patch table; the tiny patch side is broadcast."""
    l = read_table(spark, sf_dir, "lineitem")
    patch = l.filter(F.col("l_orderkey") % 100 == 0).select(
        "l_orderkey", "l_linenumber", F.lit(0.0).alias("l_discount")
    )
    base = l.select("l_orderkey", "l_linenumber", "l_discount")
    patched = apply_patch(base, patch, ["l_orderkey", "l_linenumber"])
    marker = (F.col("l_orderkey") % 100 == 0).alias("patched")
    return patched.select("l_orderkey", "l_linenumber", "l_discount", marker)


_DROP_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem
WHERE NOT EXISTS (
  SELECT 1 FROM lineitem d
  WHERE d.l_quantity > 49 AND d.l_orderkey = lineitem.l_orderkey
        AND d.l_linenumber = lineitem.l_linenumber
)
"""


@query("drop_by_qa_key", _DROP_SQL)
def drop_by_qa_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J8: DROP_LINE records (here: quantity outliers) removed by PK
    anti-join."""
    l = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_quantity")
    drops = l.filter(F.col("l_quantity") > 49)
    return drop_by_key(l, drops, ["l_orderkey", "l_linenumber"])
