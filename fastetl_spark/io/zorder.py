"""Z-order (Morton-curve) file layout for multi-column scan pruning.

Parquet pruning works off per-file / per-row-group min-max stats; a
sort on ONE column makes files selective on that column and useless on
every other. Interleaving the bits of several columns' normalized
values (the Morton / Z-curve) and range-partitioning + sorting on that
code makes every file a small hyper-rectangle in the combined key
space — filters on ANY of the z-ordered columns skip most files (the
technique behind Delta/Iceberg OPTIMIZE ZORDER, here for plain
parquet).

Cost: one min-max aggregate pass (bounds for normalization) + the
range-repartition shuffle the write needs anyway. Pure native bit
expressions — no UDFs; the code column is dropped before the write.

Sizing: `bits` per dimension (default 12 -> 4096 cells/dim) bounds the
curve resolution; past file count x a few, more bits buy nothing.
Skewed value distributions degrade linear normalization — pair heavy
skew with a pre-transform (log, rank bucket) on the way in.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_Z_COL = "__z_code"


def _scale_to_bits(col: Column, lo, hi, bits: int) -> Column:
    """Linear map of [lo, hi] onto the integer grid [0, 2^bits - 1]."""
    max_cell = (1 << bits) - 1
    if lo is None or hi is None or hi == lo:
        return F.lit(0).cast("long")
    span = float(hi) - float(lo)
    scaled = ((col.cast("double") - float(lo)) / span) * max_cell
    return F.least(
        F.greatest(scaled.cast("long"), F.lit(0)), F.lit(max_cell)
    )


def morton_code(scaled_cols: list[Column], bits: int) -> Column:
    """Interleave `bits` low bits of each (already-scaled) column:
    output bit (b * n + i) = bit b of column i. Built as a flat
    native-expression tree (bits x n shift/mask/or ops) — stays inside
    whole-stage codegen."""
    n = len(scaled_cols)
    parts = []
    for b in range(bits):
        for i, c in enumerate(scaled_cols):
            parts.append(
                F.shiftleft(F.shiftright(c, b).bitwiseAND(F.lit(1)), b * n + i)
            )
    out = parts[0]
    for p in parts[1:]:
        out = out.bitwiseOR(p)
    return out


def zorder_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    n_files: int = 16,
    bits: int = 12,
    mode: str = "overwrite",
) -> None:
    """Write `df` as parquet laid out along the Z-curve of `cols`:
    range-partitioned into `n_files` splits of the Morton code and
    sorted by it within each file, so min-max stats prune on every
    z-ordered column.

    ``bits`` is auto-reduced so the interleaved code fits a signed
    64-bit long: JVM shifts wrap mod 64, so bits * len(cols) > 63
    would silently corrupt the codes (data unharmed, pruning useless).
    """
    if not cols:
        raise ValueError("zorder_write needs at least one column")
    max_bits = 63 // len(cols)
    if bits > max_bits:
        bits = max_bits
    if bits < 1:
        raise ValueError(
            f"cannot z-order {len(cols)} columns in a 63-bit code; "
            "drop to at most 63 columns"
        )
    bounds = df.agg(
        *[F.min(c).alias(f"lo_{c}") for c in cols],
        *[F.max(c).alias(f"hi_{c}") for c in cols],
    ).first()
    scaled = [
        _scale_to_bits(F.col(c), bounds[f"lo_{c}"], bounds[f"hi_{c}"], bits)
        for c in cols
    ]
    coded = df.withColumn(_Z_COL, morton_code(scaled, bits))
    (
        coded.repartitionByRange(n_files, _Z_COL)
        .sortWithinPartitions(_Z_COL)
        .drop(_Z_COL)
        .write.mode(mode)
        .parquet(path)
    )
