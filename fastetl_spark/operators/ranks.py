"""Distributed exact cumulative counts / ranks — no single-partition sort.

``Window.orderBy(key)`` with no partition key funnels every row through
ONE task: the textbook scale-killer the shuffle audit flags as
``Exchange SinglePartition``.  This module provides the exact
replacement used by the rank-statistic tier (AUC, KS, Spearman,
calibration): a bucketed two-level prefix sum.

    1. *Distinct-value compression* happens upstream: callers pass one
       row per (partition, key) with a count — cumulative counts over
       the compressed support equal ranks over raw rows.
    2. ``range_bounds`` collects approximate equi-depth split points to
       the driver as LITERAL floats (one bounded job, < num_buckets
       values).  Split points only steer load balance: the prefix sum
       below is exact for ANY monotone bucketing, and embedding the
       values as literals makes every downstream plan deterministic
       (no sketch-recompute hazard between the offset job and the
       final job).
    3. ``bucketed_cum_sum`` assigns each key its bucket, collects the
       per-(group, bucket) totals to the driver (bounded by
       |groups| * num_buckets rows — the same bounded-collect pattern
       as ann_index.py:129), turns them into exclusive running
       offsets, broadcast-joins the offsets back, and finishes with a
       window partitioned BY BUCKET.  Every stage is a hash exchange;
       no Exchange SinglePartition anywhere.

Equivalence (asserted bit-for-bit by tests/test_ranks.py): for unique
(group, key) rows, ``offset(bucket) + within-bucket prefix`` equals the
global ``Window.partitionBy(group).orderBy(key)`` prefix sum, because
bucketing is monotone in key (key1 <= key2 implies bkt1 <= bkt2).

At 100 TB: the support frame shuffles by bucket hash (balanced by the
equi-depth split points), each bucket sorts locally, the offset table
is a broadcast of at most |groups| * num_buckets longs.  Wall-clock is
two jobs over the compressed support plus the caller's final job.
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import Column, DataFrame, Observation, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DateType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampNTZType,
    TimestampType,
)

_BKT = "__rank_bkt"
_OFF = "__rank_off"

#: Hard ceiling on offset tuples a bucketed prefix sum may collect to
#: the driver (|distinct partition_cols| x num_buckets rows).  The
#: docstrings always REQUIRED bounded groups; this enforces it — an
#: unbounded group column now fails loudly instead of growing a silent
#: driver collect + broadcast (r11 VERDICT ask #1b).  2^20 tuples is
#: ~tens of MB broadcast — far past any sane dictionary, far below a
#: driver melt.
MAX_OFFSET_ROWS = 1_048_576


def default_num_buckets(spark) -> int:
    """Adaptive bucket count for the prefix-sum primitives: 2x the
    cluster's ``defaultParallelism`` so the within-(group, bucket)
    windows scale with the executors, not a constant (r11 VERDICT ask
    #1a) — floored at 64 (the previous fixed value: identical plans on
    a 32-core box) and capped at 1024 (bounds the percentile_approx
    literal list and the offset broadcast at |groups| x 1024 rows)."""
    try:
        par = int(spark.sparkContext.defaultParallelism)
    except Exception:  # pragma: no cover - connect-only sessions
        par = 32
    return max(64, min(1024, 2 * par))


def _as_double(key: Column, dtype) -> Column:
    """Monotone numeric image of ``key`` for bucketing.

    TIMESTAMP (an instant) maps through ``unix_micros`` — a genuinely
    timezone-free epoch image.  The previous calendar-field form
    (cast-to-date + hour/minute/second) was only monotone because the
    engine session pins spark.sql.session.timeZone=UTC: field
    extraction on TIMESTAMP is session-tz-dependent and INVERTS across
    a DST fall-back transition (the r11 ADVICE finding, pinned by
    tests/test_ranks.py::test_timestamp_key_monotone_under_dst_tz).
    Double rounding of the micros is monotone, so precision loss only
    merges neighbors into one bucket.

    TIMESTAMP_NTZ (a wall clock, no instant) keeps the calendar
    arithmetic — field extraction on NTZ reads the stored wall-clock
    fields directly, no session timezone involved."""
    if isinstance(dtype, TimestampType):
        return F.unix_micros(key).cast("double")
    if isinstance(dtype, TimestampNTZType):
        return (
            F.unix_date(key.cast("date")).cast("double") * 86400.0
            + F.hour(key) * 3600
            + F.minute(key) * 60
            + F.second(key)
        )
    if isinstance(dtype, DateType):
        return F.unix_date(key).cast("double")
    if isinstance(dtype, StringType):
        # first 7 UTF-8 bytes as a big-endian integer, zero-padded on
        # the RIGHT (variable-length prefixes are not order-preserving
        # unpadded: "AZ" < "B" bytewise but 0x415A > 0x42).  7 bytes
        # keep the value under 2^56 — positive in conv's signed BIGINT,
        # and double rounding of the low bits is monotone (neighbors
        # may merge into one bucket; order never inverts).  Matches
        # Spark's binary string comparison order; longer shared
        # prefixes simply share a bucket.
        return F.conv(
            F.rpad(F.hex(F.substring(key.cast("binary"), 1, 7)), 14, "0"),
            16,
            10,
        ).cast("double")
    return key.cast("double")


def _finite_bounds(vals) -> list[float]:
    """Dedup, sort, and drop NON-FINITE split points.  Keys of +/-inf
    make percentile_approx return +/-inf values, which would collide
    with the Bucketizer's [-inf, *bounds, +inf] sentinels and violate
    its strictly-increasing-splits requirement — a hard
    IllegalArgumentException (the r12 ADVICE finding).  Exactness never
    depends on split values (any monotone bucketing is exact), so
    dropping them only affects balance: infinite keys share the edge
    buckets."""
    import math

    return sorted(
        {float(v) for v in vals if v is not None and math.isfinite(v)}
    )


def range_bounds(
    g: DataFrame, key_col: str, num_buckets: int | None = None
) -> list[float]:
    """Approximate equi-depth split points for ``key_col``, returned as
    a sorted list of literal floats (one bounded job).
    ``num_buckets=None`` (default) adapts to the cluster via
    ``default_num_buckets``.

    Exactness of downstream prefix sums does NOT depend on these values
    — any monotone bucketing works — so percentile_approx error only
    affects balance."""
    if num_buckets is None:
        num_buckets = default_num_buckets(g.sparkSession)
    if num_buckets < 2:
        return []
    qs = [i / num_buckets for i in range(1, num_buckets)]
    kd = _as_double(F.col(key_col), g.schema[key_col].dataType)
    row = g.agg(F.percentile_approx(kd, qs, 10000).alias("b")).head()
    vals = (row["b"] if row is not None else None) or []
    return _finite_bounds(vals)


def materialize_with_bounds(
    g: DataFrame, key_col: str, num_buckets: int | None = None
) -> tuple[DataFrame, list[float]]:
    """Materialize the support frame AND compute its split points in
    the SAME job: the percentile_approx aggregate rides the
    localCheckpoint action via observe(), so callers pay one job where
    ``materialize`` + ``range_bounds`` would pay two — and every later
    job reads the checkpoint instead of re-deriving the support.
    ``num_buckets=None`` (default) adapts to the cluster via
    ``default_num_buckets``."""
    from fastetl_spark.checkpointing import materialize

    if num_buckets is None:
        num_buckets = default_num_buckets(g.sparkSession)
    kd = _as_double(F.col(key_col), g.schema[key_col].dataType)
    qs = [i / num_buckets for i in range(1, num_buckets)]
    obs = Observation()
    g2 = g.observe(
        obs, F.percentile_approx(kd, qs, 10000).alias("b")
    ).transform(materialize)
    vals = obs.get.get("b") or []
    return g2, _finite_bounds(vals)


def _check_offset_rows(n: int, max_offset_rows: int, where: str) -> None:
    # Checked AFTER the collect on purpose: a .limit(max+1).collect()
    # would bound the driver intake itself but costs a second scheduled
    # job (CollectLimit's incremental execution — measured 2 jobs vs
    # 1), regressing the one-eager-job discipline every caller relies
    # on.  The guard's job is the CONTRACT (fail loudly before the
    # broadcast instead of silently degrading); 2^20 Row objects of
    # intake is ~100 MB — far from a driver melt.
    if n > max_offset_rows:
        raise RuntimeError(
            f"{where}: {n} offset tuples exceed max_offset_rows="
            f"{max_offset_rows} — partition_cols must be a bounded"
            " dictionary (|groups| x num_buckets rows reach the driver"
            " and a broadcast). Pre-aggregate or bucket the group"
            " column, or raise max_offset_rows deliberately."
        )


def collect_bucket_totals(
    g: DataFrame,
    key_col: str,
    cnt_col: str,
    *,
    bounds: list[float],
    partition_cols: tuple[str, ...] | list[str] = (),
    max_offset_rows: int = MAX_OFFSET_ROWS,
) -> list[tuple]:
    """One bounded job: per-(partition_cols, bucket) totals of
    ``cnt_col`` as plain tuples (*group, bucket, total).  Feed the
    result to ``bucketed_cum_sum(offsets=...)`` — and derive COARSER
    offset sets (e.g. global per-bucket totals from per-label ones) by
    summing driver-side instead of paying a second job.  Raises
    ``RuntimeError`` past ``max_offset_rows`` tuples (the boundedness
    contract, enforced)."""
    kd = _as_double(F.col(key_col), g.schema[key_col].dataType)
    pc = list(partition_cols)
    rows = (
        _with_bucket(g, kd, bounds)
        .groupBy(*pc, _BKT)
        .agg(F.sum(cnt_col).cast("long").alias("t"))
        .collect()
    )
    _check_offset_rows(len(rows), max_offset_rows, "collect_bucket_totals")
    return [(*(r[c] for c in pc), r[_BKT], r["t"]) for r in rows]


def totals_to_offsets(
    totals: list[tuple], num_buckets: int | None = None
) -> list[tuple]:
    """Exclusive running offsets per group from (*group, bucket, total)
    tuples (bucket order within group): (*group, bucket, offset).

    With ``num_buckets`` the offsets are DENSIFIED — every bucket
    0..num_buckets-1 gets a row per group, carrying the running offset
    through empty buckets.  Required whenever the frame being summed
    can hold (group, bucket) combinations with zero collected mass
    (e.g. the KS label x support grid): the offset broadcast is an
    INNER join, and a missing bucket row would silently drop data."""
    per_group: dict[tuple, dict[int, int]] = defaultdict(dict)
    for row in totals:
        *grp, bkt, tot = row
        per_group[tuple(grp)][bkt] = per_group[tuple(grp)].get(bkt, 0) + tot
    out = []
    for grp, by_bkt in per_group.items():
        running = 0
        buckets = (
            range(num_buckets)
            if num_buckets is not None
            else sorted(by_bkt)
        )
        for bkt in buckets:
            out.append((*grp, bkt, running))
            running += by_bkt.get(bkt, 0)
    return out


def drop_partition_level(totals: list[tuple]) -> list[tuple]:
    """Sum (*group, bucket, total) tuples across the group columns to
    plain (bucket, total) — the driver-side coarsening that lets one
    collect serve both the per-label and the global prefix sums."""
    acc: dict[int, int] = defaultdict(int)
    for row in totals:
        *_, bkt, tot = row
        acc[bkt] += tot
    return [(b, t) for b, t in acc.items()]


def _with_bucket(g: DataFrame, kd: Column, bounds: list[float]) -> DataFrame:
    """``g`` + ``_BKT`` int column: monotone bucket of the key image
    ``kd`` — the ONE bucket-assignment path shared by the totals
    collect and the final prefix sum (both sides must agree on the
    rule or offsets silently shift).

    Implemented with the JVM binary search of ml.feature.Bucketizer:
    per-row cost is FLAT in the bucket count (measured 0.28 s / 2M
    rows at 1024 splits vs 2.17 s for the literal when-tree it
    replaced, whose expression size grew with depth — PERF.md #48/49),
    which is what makes the adaptive ``default_num_buckets`` cap of
    1024 genuinely usable on large clusters.  Ties at a split point
    land in the UPPER bucket (Bucketizer's [lo, hi) rule — any single
    consistent monotone rule is exact; test_result_invariant_to_
    bucket_count pins the invariance).  NULL images map to -inf →
    bucket 0, matching the window form's NULLS FIRST order.  NaN
    images RAISE (Bucketizer handleInvalid=error): every caller
    filters NaN keys, and a silent misbucket would corrupt the
    cumulative counts."""
    if not bounds:
        return g.withColumn(_BKT, F.lit(0).cast("int"))
    from pyspark.ml.feature import Bucketizer

    img, raw = "__rank_img", "__rank_bkt_raw"
    bk = Bucketizer(
        splits=[float("-inf"), *bounds, float("inf")],
        inputCol=img,
        outputCol=raw,
    )
    g2 = bk.transform(
        g.withColumn(img, F.coalesce(kd, F.lit(float("-inf"))))
    )
    return g2.withColumn(_BKT, F.col(raw).cast("int")).drop(img, raw)


def bucket_of(key: Column, bounds: list[float]) -> Column:
    """Monotone bucket id of a NUMERIC ``key`` given literal split
    points: bucket = #{b in bounds : key > b}.  Ties at a split point
    land in the lower bucket; equal keys always share a bucket.

    Column-expression form (binary when-tree, log2(|bounds|)
    comparisons per row) kept for expression contexts; the primitive's
    internal path is ``_with_bucket`` (JVM binary search — flat in the
    bucket count, see its docstring), so the two MUST NOT be mixed on
    the same bounds within one computation (their split-point tie
    rules differ)."""
    if not bounds:
        return F.lit(0)
    kd = key.cast("double")

    def build(lo: int, hi: int) -> Column:
        # bucket range [lo, hi]; x lands right of split m-1 iff x > b[m-1]
        if lo == hi:
            return F.lit(lo)
        mid = (lo + hi + 1) // 2
        return F.when(
            kd > F.lit(bounds[mid - 1]), build(mid, hi)
        ).otherwise(build(lo, mid - 1))

    return build(0, len(bounds))


def bucketed_cum_sum(
    g: DataFrame,
    key_col: str,
    cnt_col: str,
    *,
    bounds: list[float],
    partition_cols: tuple[str, ...] | list[str] = (),
    inclusive: bool = False,
    out_col: str = "cum_below",
    offsets: list[tuple] | None = None,
    max_offset_rows: int = MAX_OFFSET_ROWS,
) -> DataFrame:
    """``g`` + ``out_col`` = prefix sum of ``cnt_col`` in ``key_col``
    order (per ``partition_cols`` group) with no single-partition stage.

    Requirements: one row per (partition_cols, key_col) — compress with
    a groupBy first — and |distinct partition_cols| bounded (the offset
    collect is |groups| * buckets rows).  ``inclusive=False`` gives the
    exclusive prefix (rows strictly below), ``True`` includes the
    current key.  Runs one bounded driver job eagerly (the offset
    totals) unless ``offsets`` supplies precomputed
    (*group, bucket, exclusive_offset) tuples (see
    collect_bucket_totals / totals_to_offsets — one collect can serve
    several prefix sums); the returned frame is lazy.

    Exactness caveat for precomputed offsets: they must total the SAME
    cnt mass per (group, bucket) as ``g`` — rows absent from ``g`` but
    present in the collect (or zero-count rows either way) are fine,
    a genuine mass mismatch is not.

    NULL group keys are legitimate groups: the offset join is
    null-safe (``eqNullSafe`` per partition column), so a NULL label
    keeps its rows — matching the window form and the SQL engines'
    GROUP BY, where NULL is one group (the r11 ADVICE finding: a plain
    equi-join silently dropped NULL-labelled rows)."""
    spark = g.sparkSession
    pc = list(partition_cols)
    kd = _as_double(F.col(key_col), g.schema[key_col].dataType)
    gb = _with_bucket(g, kd, bounds)
    if offsets is None:
        totals = (
            gb.groupBy(*pc, _BKT)
            .agg(F.sum(cnt_col).cast("long").alias("t"))
            .collect()
        )
        _check_offset_rows(len(totals), max_offset_rows, "bucketed_cum_sum")
        rows = totals_to_offsets(
            [(*(r[c] for c in pc), r[_BKT], r["t"]) for r in totals]
        )
    else:
        rows = [tuple(r) for r in offsets]
        _check_offset_rows(len(rows), max_offset_rows, "bucketed_cum_sum")
    # offset-side columns get private names so the join condition can
    # be null-safe per group column without ambiguous references
    off_names = [f"__rank_offg_{i}" for i in range(len(pc))]
    obkt = "__rank_off_bkt"
    schema = StructType(
        [
            *(
                StructField(n, g.schema[c].dataType)
                for n, c in zip(off_names, pc)
            ),
            StructField(obkt, IntegerType(), False),
            StructField(_OFF, LongType(), False),
        ]
    )
    off = F.broadcast(spark.createDataFrame(rows, schema))
    cond = F.col(_BKT) == F.col(obkt)
    for c, n in zip(pc, off_names):
        cond = cond & F.col(c).eqNullSafe(F.col(n))
    w = (
        Window.partitionBy(*pc, _BKT)
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, 0 if inclusive else -1)
    )
    return (
        gb.join(off, cond)
        .drop(obkt, *off_names)
        .withColumn(
            out_col,
            (
                F.col(_OFF) + F.coalesce(F.sum(cnt_col).over(w), F.lit(0))
            ).cast("long"),
        )
        .drop(_BKT, _OFF)
    )
