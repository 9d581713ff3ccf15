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


class KeyBounds(list):
    """Split points (a plain ``list[float]``) that optionally carry a
    STRING-KEY common-prefix strip: ``prefix`` is the byte prefix every
    key in the bounds frame shares, and the bounds are percentiles of
    the image of bytes ``len(prefix)+1 .. len(prefix)+7``.  Bucket
    assignment (``_with_bucket`` via ``_as_double``) reads the prefix
    off the bounds object, so the totals collect and the final prefix
    sum always bucket with the SAME image as the split points — the
    one invariant exactness rests on.  Plain lists (every existing
    caller, precomputed bounds) mean ``prefix = b""``: byte-identical
    behavior to the absolute 7-byte image."""

    prefix: bytes = b""

    def __init__(self, vals=(), prefix: bytes = b""):
        super().__init__(vals)
        self.prefix = prefix


def _common_prefix(mn: str | None, mx: str | None) -> bytes:
    """Byte-level common prefix of the key range.  Every key k with
    mn <= k <= mx (Spark's string order IS unsigned-bytewise UTF-8
    order) shares it: a first-difference below len(prefix) against mn
    or mx would put k outside the range."""
    if mn is None or mx is None:
        return b""
    a, b = mn.encode("utf-8"), mx.encode("utf-8")
    i = 0
    while i < min(len(a), len(b)) and a[i] == b[i]:
        i += 1
    return a[:i]


def _as_double(key: Column, dtype, prefix: bytes = b"") -> Column:
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
        # A 7-byte window of the UTF-8 bytes as a big-endian integer,
        # zero-padded on the RIGHT (variable-length prefixes are not
        # order-preserving unpadded: "AZ" < "B" bytewise but
        # 0x415A > 0x42).  7 bytes keep the value under 2^56 —
        # positive in conv's signed BIGINT, and double rounding of the
        # low bits is monotone (neighbors may merge into one bucket;
        # order never inverts).  Matches Spark's binary string
        # comparison order.
        #
        # ``prefix`` (from KeyBounds) shifts the window PAST the
        # corpus-wide common prefix: an ABSOLUTE first-7-bytes image
        # collapses URL/path/ISO-date-style corpora (>= 7 shared
        # leading bytes) to ONE double, so the split points degenerate
        # and the whole frame lands in a single bucket — a parallelism
        # cliff at scale (the r12 VERDICT finding).  Keys that do NOT
        # share the prefix (possible when the assignment frame is not
        # the bounds frame) clamp to sentinel images below/above the
        # shared-prefix block, keeping the image TOTAL and monotone
        # for any key.
        kb = key.cast("binary")
        L = len(prefix)
        img = F.conv(
            F.rpad(F.hex(F.substring(kb, L + 1, 7)), 14, "0"), 16, 10
        ).cast("double")
        if L == 0:
            return img
        head = F.substring(kb, 1, L)
        p = F.lit(bytearray(prefix))
        return (
            F.when(head < p, F.lit(-1.0))
            .when(head > p, F.lit(float(2**57)))
            .otherwise(img)
        )
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


def _degenerate(bounds: list[float], num_buckets: int) -> bool:
    """Too few distinct split points to spread load: the re-percentile
    trigger for prefix-shared string corpora.  >= 7 shared leading
    bytes collapse the absolute image to ONE value (0 or 1 distinct
    split points); a partial overlap (1-6 shared bytes) still leaves
    1-6 varying window bytes and near-full split sets, so the 8-point
    threshold only fires on genuine collapse (or on supports so small
    that a second bounded job is free anyway)."""
    return len(bounds) < min(num_buckets - 1, 8)


def range_bounds(
    g: DataFrame, key_col: str, num_buckets: int | None = None
) -> list[float]:
    """Approximate equi-depth split points for ``key_col``, returned as
    a sorted list of literal floats (one bounded job; see KeyBounds —
    for string keys the list may carry a common-prefix strip, computed
    from min/max that ride the SAME job).  ``num_buckets=None``
    (default) adapts to the cluster via ``default_num_buckets``.

    Exactness of downstream prefix sums does NOT depend on these values
    — any monotone bucketing works — so percentile_approx error only
    affects balance."""
    if num_buckets is None:
        num_buckets = default_num_buckets(g.sparkSession)
    if num_buckets < 2:
        return KeyBounds()
    qs = [i / num_buckets for i in range(1, num_buckets)]
    dtype = g.schema[key_col].dataType
    kd = _as_double(F.col(key_col), dtype)
    exprs = [F.percentile_approx(kd, qs, 10000).alias("b")]
    is_str = isinstance(dtype, StringType)
    if is_str:
        exprs += [F.min(key_col).alias("mn"), F.max(key_col).alias("mx")]
    row = g.agg(*exprs).head()
    vals = (row["b"] if row is not None else None) or []
    bounds = _finite_bounds(vals)
    if is_str and row is not None:
        prefix = _common_prefix(row["mn"], row["mx"])
        if prefix and _degenerate(bounds, num_buckets):
            return _restripe_string_bounds(g, key_col, dtype, prefix, qs)
    return KeyBounds(bounds)


def _restripe_string_bounds(
    g: DataFrame, key_col: str, dtype, prefix: bytes, qs: list[float]
) -> "KeyBounds":
    """Second bounded percentile job on the PREFIX-STRIPPED image —
    paid only when the absolute image collapsed (all keys share >= 7
    leading bytes), i.e. exactly when the first job's split points
    cannot spread load anyway."""
    kd = _as_double(F.col(key_col), dtype, prefix)
    row = g.agg(F.percentile_approx(kd, qs, 10000).alias("b")).head()
    vals = (row["b"] if row is not None else None) or []
    return KeyBounds(_finite_bounds(vals), prefix=prefix)


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
    dtype = g.schema[key_col].dataType
    kd = _as_double(F.col(key_col), dtype)
    qs = [i / num_buckets for i in range(1, num_buckets)]
    obs = Observation()
    exprs = [F.percentile_approx(kd, qs, 10000).alias("b")]
    is_str = isinstance(dtype, StringType)
    if is_str:
        # min/max ride the same observe: the common-prefix length is
        # free, and the (rare) re-percentile below scans the fresh
        # CHECKPOINT, not the upstream plan
        exprs += [F.min(key_col).alias("mn"), F.max(key_col).alias("mx")]
    g2 = g.observe(obs, *exprs).transform(materialize)
    got = obs.get
    bounds = _finite_bounds(got.get("b") or [])
    if is_str:
        prefix = _common_prefix(got.get("mn"), got.get("mx"))
        if prefix and _degenerate(bounds, num_buckets):
            return g2, _restripe_string_bounds(g2, key_col, dtype, prefix, qs)
    return g2, KeyBounds(bounds)


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
    kd = _as_double(
        F.col(key_col),
        g.schema[key_col].dataType,
        getattr(bounds, "prefix", b""),
    )
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
    strict: bool = True,
) -> DataFrame:
    """``g`` + ``out_col`` = prefix sum of ``cnt_col`` in ``key_col``
    order (per ``partition_cols`` group) with no single-partition stage.

    Requirements: one row per (partition_cols, key_col) — compress with
    a groupBy first.  ``inclusive=False`` gives the exclusive prefix
    (rows strictly below), ``True`` includes the current key.  Runs one
    bounded driver job eagerly (the offset totals) unless ``offsets``
    supplies precomputed (*group, bucket, exclusive_offset) tuples (see
    collect_bucket_totals / totals_to_offsets — one collect can serve
    several prefix sums); the returned frame is lazy.

    Group-cardinality contract: the offset collect is |distinct
    partition_cols| x buckets rows, reaching the driver and a
    broadcast.  ``strict=True`` (default) keeps the loud failure —
    RuntimeError past ``max_offset_rows`` — so a misused unbounded
    group column cannot silently grow a driver collect.
    ``strict=False`` makes the primitive TOTAL: a count probe sizes
    the offset table first (so driver intake is bounded — nothing is
    collected past the cap), and past the cap the offsets are computed
    DISTRIBUTED — an exclusive prefix window over the per-(group,
    bucket) totals (<= buckets rows per group, hash-partitioned by
    group) joined back on (group, bucket).  Costs one extra count job
    plus a shuffle join where the broadcast path pays one collect.
    With NO partition cols the fallback's offsets window would be a
    single-partition stage, but it is unreachable: the offset table is
    then <= len(bounds)+1 <= 1025 rows, always under the cap.

    Exactness caveat for precomputed offsets: they must total the SAME
    cnt mass per (group, bucket) as ``g`` — rows absent from ``g`` but
    present in the collect (or zero-count rows either way) are fine,
    a genuine mass mismatch is not.

    NULL group keys are legitimate groups: the offset join is
    null-safe (``eqNullSafe`` per partition column) on BOTH the
    broadcast and the distributed-fallback path, so a NULL label keeps
    its rows — matching the window form and the SQL engines' GROUP BY,
    where NULL is one group (the r11 ADVICE finding: a plain equi-join
    silently dropped NULL-labelled rows)."""
    spark = g.sparkSession
    pc = list(partition_cols)
    kd = _as_double(
        F.col(key_col),
        g.schema[key_col].dataType,
        getattr(bounds, "prefix", b""),
    )
    gb = _with_bucket(g, kd, bounds)
    # offset-side columns get private names so the join condition can
    # be null-safe per group column without ambiguous references
    off_names = [f"__rank_offg_{i}" for i in range(len(pc))]
    obkt = "__rank_off_bkt"
    off = None
    if offsets is None:
        tot_df = gb.groupBy(*pc, _BKT).agg(
            F.sum(cnt_col).cast("long").alias("__rank_t")
        )
        over_cap = False
        if not strict:
            # Persist around the probe so the under-cap path's collect
            # reads the cached totals instead of re-running the whole
            # grouped aggregation (the r13 ADVICE finding: count() +
            # collect() were two full passes over g's aggregation even
            # when well under the cap).  The cache is dropped as soon
            # as the totals are on the driver; on the over-cap
            # fallback it is dropped immediately (the lazy offsets
            # window would otherwise hold a cache reference past this
            # call), so that rare path keeps paying its documented
            # second pass rather than leaking a persisted frame.
            tot_df.persist()
            over_cap = tot_df.count() > max_offset_rows
            if over_cap:
                tot_df.unpersist()
        if over_cap:
            # distributed offsets: exclusive prefix over buckets per
            # group (<= len(bounds)+1 rows each), joined back — no
            # driver collect, no broadcast, one extra hash exchange
            woff = (
                Window.partitionBy(*pc)
                .orderBy(_BKT)
                .rowsBetween(Window.unboundedPreceding, -1)
            )
            off = tot_df.select(
                *(F.col(c).alias(n) for c, n in zip(pc, off_names)),
                F.col(_BKT).alias(obkt),
                F.coalesce(F.sum("__rank_t").over(woff), F.lit(0))
                .cast("long")
                .alias(_OFF),
            )
        else:
            totals = tot_df.collect()
            if not strict:
                tot_df.unpersist()
            _check_offset_rows(len(totals), max_offset_rows, "bucketed_cum_sum")
            rows = totals_to_offsets(
                [(*(r[c] for c in pc), r[_BKT], r["__rank_t"]) for r in totals]
            )
    else:
        rows = [tuple(r) for r in offsets]
        _check_offset_rows(len(rows), max_offset_rows, "bucketed_cum_sum")
    if off is None:
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


def grouped_row_ranks(
    df: DataFrame,
    group_col: str,
    value_col: str,
    order_col: str,
    *,
    rank_col: str = "r",
    n_col: str = "n",
) -> tuple[DataFrame, DataFrame, "KeyBounds", list[tuple]]:
    """Per-row exact rank + group size with CLUSTER-WIDE parallelism —
    the de-skewed replacement for
    ``row_number() OVER (PARTITION BY group ORDER BY value, order)`` +
    ``COUNT(*) OVER (PARTITION BY group)`` when ``group_col`` is a
    dictionary column (the r13 VERDICT finding: a 5-value event_type
    dictionary bounds that window at 5 tasks regardless of cluster
    size — ~20 TB per task at 100 TB).

    Decomposition (bit-identical to the window form, pinned by
    tests/test_ranks.py):

    * rank r = (exclusive offset of the row's (group, bucket) —
      densified from the SAME bounded totals collect that serves the
      callers' prefix sums) + (1-based ``row_number`` within a window
      partitioned by (group, bucket) and ordered by (value, order)).
      Bucketing is monotone in the value order and equal values always
      share a bucket (``_with_bucket``: NULL image -> bucket 0,
      matching NULLS FIRST), so concatenating buckets in order
      reproduces the global per-group (value, order) sort exactly.
    * n is the per-group sum of the same totals, folded into the SAME
      broadcast offsets frame — ONE dictionary-sized broadcast join
      attaches both r's offset and n.

    This is the r14.2 direct form: the base frame is exchanged ONCE
    (by (group, bucket)) — the earlier decomposition paid a second
    full exchange of the base to join the support's cum-below back on
    (group, value), which at 100 TB re-shuffles every byte a second
    time and at small scale was most of the primitive's fixed cost.
    The trade is parallelism bounded at |groups| x num_buckets
    (``default_num_buckets``: 2x cluster parallelism, capped 1024) —
    for the dictionary-keyed family this primitive exists for, that
    is cluster-wide, versus the replaced window form's |groups| tasks.

    Returns ``(ranked, support, bounds, totals)`` — support has one
    row per (group, value) with a ``cnt`` column, and (bounds,
    totals) let callers derive further exact statistics (e.g. a
    global quantile grid via ``drop_partition_level``) without a
    second materialize or collect."""
    spark = df.sparkSession
    sup = df.groupBy(group_col, value_col).agg(
        F.count(F.lit(1)).cast("long").alias("cnt")
    )
    sup, bounds = materialize_with_bounds(sup, value_col)
    totals = collect_bucket_totals(
        sup, value_col, "cnt", bounds=bounds, partition_cols=[group_col]
    )
    per_group: dict = {}
    for k, _bkt, t in totals:
        per_group[k] = per_group.get(k, 0) + t
    off_df = spark.createDataFrame(
        [
            (g, int(b), int(o), int(per_group[g]))
            for g, b, o in totals_to_offsets(totals, len(bounds) + 1)
        ],
        StructType(
            [
                StructField("__grr_g", df.schema[group_col].dataType),
                StructField("__grr_b", IntegerType(), False),
                StructField("__grr_off", LongType(), False),
                StructField("__grr_n", LongType(), False),
            ]
        ),
    )
    kd = _as_double(
        F.col(value_col),
        df.schema[value_col].dataType,
        getattr(bounds, "prefix", b""),
    )
    wt = Window.partitionBy(group_col, _BKT).orderBy(value_col, order_col)
    ranked = (
        _with_bucket(df, kd, bounds)
        .withColumn("__grr_rn", F.row_number().over(wt))
        .join(
            F.broadcast(off_df),
            F.col(group_col).eqNullSafe(F.col("__grr_g"))
            & (F.col(_BKT) == F.col("__grr_b")),
        )
        .withColumn(
            rank_col, (F.col("__grr_off") + F.col("__grr_rn")).cast("long")
        )
        .withColumnRenamed("__grr_n", n_col)
        .drop("__grr_g", "__grr_b", "__grr_off", "__grr_rn", _BKT)
    )
    return ranked, sup, bounds, totals
