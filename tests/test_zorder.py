"""Z-order layout (io/zorder): the scale property under test is that
every written file covers a SMALL min-max range on BOTH z-ordered
columns — that is what lets parquet stats prune files for filters on
either column. A single-column sort gives selectivity on one column
and none on the other; the Z-curve gives it on both.
"""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from fastetl_spark.io.zorder import morton_code, zorder_write


def _python_morton(vals: list[int], bits: int) -> int:
    out = 0
    n = len(vals)
    for b in range(bits):
        for i, v in enumerate(vals):
            out |= ((v >> b) & 1) << (b * n + i)
    return out


def test_morton_code_matches_reference(spark):
    rows = [(0, 0), (1, 0), (0, 1), (3, 5), (255, 255), (170, 85)]
    df = spark.createDataFrame(rows, "a long, b long")
    got = [
        r.z
        for r in df.select(
            morton_code([F.col("a"), F.col("b")], 8).alias("z")
        ).collect()
    ]
    assert got == [_python_morton(list(r), 8) for r in rows]
    # the curve is injective on the grid: distinct inputs, distinct codes
    assert len(set(got)) == len(rows)


def _file_ranges(path: str, col_a: str, col_b: str):
    """Per-file (min, max) of both columns from parquet footers."""
    out = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.ParquetFile(f).metadata
        names = {md.schema.column(i).name: i for i in range(md.num_columns)}
        mins = {c: None for c in (col_a, col_b)}
        maxs = {c: None for c in (col_a, col_b)}
        for rg in range(md.num_row_groups):
            for c in (col_a, col_b):
                st = md.row_group(rg).column(names[c]).statistics
                mins[c] = st.min if mins[c] is None else min(mins[c], st.min)
                maxs[c] = st.max if maxs[c] is None else max(maxs[c], st.max)
        out.append(((mins[col_a], maxs[col_a]), (mins[col_b], maxs[col_b])))
    return out


def test_zorder_files_are_selective_on_both_columns(spark, tmp_path):
    """16 z-ordered files over a uniform 2-D grid: the AVERAGE per-file
    span must be far below the global range on BOTH dimensions, where a
    1-D sort layout leaves the second dimension at ~full range per
    file."""
    n = 1 << 14
    df = (
        spark.range(n)
        .select(
            F.pmod(F.hash("id"), F.lit(1000)).alias("x"),
            F.pmod(F.hash(F.col("id") + 7), F.lit(1000)).alias("y"),
        )
    )
    zpath = str(tmp_path / "zordered")
    zorder_write(df, zpath, ["x", "y"], n_files=16, bits=10)
    back = spark.read.parquet(zpath)
    assert back.count() == n  # layout changes, content doesn't

    spath = str(tmp_path / "sorted_x")
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(spath)

    def avg_spans(path):
        ranges = _file_ranges(path, "x", "y")
        ax = sum(hi - lo for (lo, hi), _ in ranges) / len(ranges)
        ay = sum(hi - lo for _, (lo, hi) in ranges) / len(ranges)
        return ax, ay

    global_span = 999
    zx, zy = avg_spans(zpath)
    sx, sy = avg_spans(spath)
    # z-order: both dims well under the global span
    assert zx < 0.55 * global_span and zy < 0.55 * global_span, (zx, zy)
    # 1-D sort: x tight but y ~unpruned — the gap z-order closes
    assert sy > 0.9 * global_span
    assert zy < 0.6 * sy


def test_zorder_many_columns_auto_reduces_bits(spark, tmp_path):
    """bits * n_cols must stay within a 63-bit long: with 6+ columns the
    default bits=12 would shift past 64 and wrap (silently corrupt
    codes) — zorder_write auto-reduces instead, and the layout is still
    written and selective enough to read back intact."""
    import pytest as _pytest

    from fastetl_spark.io.zorder import zorder_write

    cols = [f"c{i}" for i in range(6)]
    df = spark.range(1000).select(
        *[((F.col("id") * (i + 7)) % 1000).alias(c) for i, c in enumerate(cols)]
    )
    path = str(tmp_path / "z6")
    zorder_write(df, path, cols, n_files=4)  # would need 72 bits unreduced
    assert spark.read.parquet(path).count() == 1000

    with _pytest.raises(ValueError, match="63"):
        zorder_write(df, path, [f"c{i % 6}" for i in range(64)], n_files=2)
