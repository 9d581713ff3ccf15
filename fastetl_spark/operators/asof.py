"""As-of (point-in-time) and range joins — operators Spark lacks as
built-ins, composed from existing DataFrame ops (SURVEY custom-operator
guidance: composition first, Pandas UDF only if semantics demand it).

As-of join strategy: union both sides tagged, one window pass per key
ordered by (ts, side) carrying the last left-side row forward. This is
one shuffle on the key — same cost as a regular join — instead of the
naive per-row backward probe. At 100 TB the shuffle partitions by the
join key; skewed keys fall to AQE.

Range join strategy: small band tables broadcast; the range predicate
evaluates as a broadcast nested-loop, never a shuffle of the fact side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.window import Window

from fastetl_spark.io.readers import read_table
from fastetl_spark.registry import query


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    inclusive: bool = True,
) -> DataFrame:
    """For each left row, attach the most recent right row with
    right_ts <= left_ts (strictly < when inclusive=False) within the
    same `on` key. Implemented as tagged-union + one window pass."""
    lt = left.withColumn("__side", F.lit(1))
    rt = right.select(
        F.col(on), F.col(right_ts).alias(left_ts), F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    l_aligned = lt.select(
        *[F.col(c) for c in left.columns],
        "__side",
        *[F.lit(None).cast(dict(rt.dtypes)[f"__r_{c}"]).alias(f"__r_{c}") for c in right_cols],
    )
    r_aligned = rt.select(
        *[
            F.col(c) if c in (on, left_ts) else F.lit(None).cast(dict(lt.dtypes).get(c, "string")).alias(c)
            for c in left.columns
        ],
        "__side",
        *[F.col(f"__r_{c}") for c in right_cols],
    )
    combined = l_aligned.unionByName(r_aligned)
    # right rows sort before left rows at equal ts when inclusive;
    # the trailing __r_ columns break ties among right rows sharing
    # (key, ts) so the carried value is deterministic (the max by the
    # right-column tuple wins) instead of partition-order-dependent
    order = [
        F.col(left_ts).asc(),
        F.col("__side").asc() if inclusive else F.col("__side").desc(),
        *[F.col(f"__r_{c}").asc_nulls_first() for c in right_cols],
    ]
    w = Window.partitionBy(on).orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    carried = combined.select(
        *left.columns,
        "__side",
        *[
            F.last(F.col(f"__r_{c}"), ignorenulls=True).over(w).alias(f"__r_{c}")
            for c in right_cols
        ],
    )
    return carried.filter(F.col("__side") == 1).select(
        *left.columns, *[F.col(f"__r_{c}").alias(c) for c in right_cols]
    )


_ASOF_SQL = """
WITH purchases AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
), clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
)
SELECT p.event_id, p.user_id, c.event_id AS prior_click_id
FROM purchases p ASOF LEFT JOIN clicks c
  ON p.user_id = c.user_id AND p.ts >= c.ts
"""


@query("asof_join_prior_click", _ASOF_SQL)
def asof_join_prior_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time correctness join: for every purchase, the latest
    click of the same user at-or-before the purchase timestamp."""
    e = read_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    joined = asof_join(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="ts", right_cols=["click_id"]
    )
    return joined.select("event_id", "user_id", F.col("click_id").alias("prior_click_id"))


_RANGE_SQL = """
WITH bands AS (
  SELECT * FROM (VALUES
    (0.0,   50.0,  'low'),
    (50.0,  120.0, 'mid'),
    (120.0, 1e9,   'high')
  ) AS t(lo, hi, band)
)
SELECT band, COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value
FROM events JOIN bands ON value >= lo AND value < hi
GROUP BY band
"""


@query("range_join_value_bands", _RANGE_SQL)
def range_join_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (band) join: fact side joined to broadcast interval table on
    lo <= value < hi — broadcast nested-loop, no fact shuffle."""
    from fastetl_spark.functions.stable import dec

    e = read_table(spark, sf_dir, "events")
    bands = spark.createDataFrame(
        [(0.0, 50.0, "low"), (50.0, 120.0, "mid"), (120.0, 1e9, "high")],
        "lo double, hi double, band string",
    )
    return (
        e.join(broadcast(bands), (e.value >= bands.lo) & (e.value < bands.hi))
        .groupBy("band")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(dec("value")), 2).cast("double").alias("total_value"),
        )
    )


def asof_join_cogrouped_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_val: str,
) -> DataFrame:
    """Cogrouped-applyInPandas twin of asof_join (§2.11 surface): both
    frames are shuffled on the key ONCE, each key's two groups arrive as
    pandas frames, and pandas.merge_asof does the per-key backward
    match. Same single-shuffle cost shape as the native tagged-union
    window — use the native one in production (no Python boundary);
    this is the pattern to copy when per-group logic genuinely needs
    pandas (model scoring, scipy, business rules)."""
    import pandas as pd

    out_type = dict(right.dtypes)[right_val]
    schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in left.schema.fields]
        + [f"{right_val} {out_type}"]
    )

    def merge(l_pdf: pd.DataFrame, r_pdf: pd.DataFrame) -> pd.DataFrame:
        l_sorted = l_pdf.sort_values(left_ts)
        if r_pdf.empty:
            out = l_sorted.copy()
            out[right_val] = pd.Series([None] * len(out), dtype="object")
            return out
        r_sorted = r_pdf[[right_ts, right_val]].sort_values(right_ts)
        return pd.merge_asof(
            l_sorted,
            r_sorted,
            left_on=left_ts,
            right_on=right_ts,
            direction="backward",
        ).drop(columns=[right_ts] if right_ts != left_ts else [])

    return (
        left.groupBy(on)
        .cogroup(right.groupBy(on))
        .applyInPandas(merge, schema)
    )


# --- linear interpolation at probe times ---------------------------------

_INTERP_PROBES = [f"2024-01-{d:02d} 12:00:00" for d in (5, 10, 15, 20, 25)]

_INTERP_SQL = f"""
WITH probes AS (
  SELECT u.user_id, p.t
  FROM (SELECT DISTINCT user_id FROM events) u
  CROSS JOIN (
    SELECT CAST(unnest([{", ".join(f"TIMESTAMP '{p}'" for p in _INTERP_PROBES)}])
                AS TIMESTAMP) AS t
  ) p
), sides AS (
  SELECT p.user_id, p.t,
         arg_max(struct_pack(tu := epoch_us(e.ts), v := e.value),
                 epoch_us(e.ts))
           FILTER (WHERE e.ts <= p.t) AS prev,
         arg_min(struct_pack(tu := epoch_us(e.ts), v := e.value),
                 epoch_us(e.ts))
           FILTER (WHERE e.ts > p.t) AS next
  FROM probes p JOIN events e ON e.user_id = p.user_id
  GROUP BY p.user_id, p.t
)
SELECT user_id, t AS probe_t,
       prev.tu AS prev_ts_us, next.tu AS next_ts_us,
       CASE WHEN prev.tu IS NOT NULL AND next.tu IS NOT NULL THEN
         (prev.v * (next.tu - epoch_us(t)) + next.v * (epoch_us(t) - prev.tu))
           / (next.tu - prev.tu)
       END AS v_interp
FROM sides
"""


@query("time_interpolate_linear", _INTERP_SQL)
def time_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user linear interpolation of `value` at fixed probe
    timestamps: bracket each probe with the last event at-or-before and
    the first event after (timestamps are unique per user in this corpus;
    pre-dedupe or add a disambiguator column where they are not),
    then interpolate on microsecond integers. The weighted sum runs in
    ONE identical IEEE shape — double*bigint products, one add, one
    divide — so the interpolated doubles are bit-identical to DuckDB's,
    not merely close; probes outside a user's observed span yield NULL
    (strict interior interpolation, no extrapolation guessing).

    Scale shape: probes join to events on user_id (one key shuffle) and
    collapse immediately through FILTERed max_by/min_by aggregation —
    the bracketing never materializes a per-(probe, event) sort. With a
    dense probe grid use the asof_join union-window form instead; the
    aggregate form wins when |probes| per key is small."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    probe_arr = F.array(
        *[F.lit(p).cast("timestamp") for p in _INTERP_PROBES]
    )
    probes = (
        ev.select("user_id")
        .distinct()
        .select("user_id", F.explode(probe_arr).alias("t"))
    )
    joined = probes.join(ev, "user_id")
    sides = joined.groupBy("user_id", "t").agg(
        F.expr(
            "max_by(struct(unix_micros(ts) AS tu, value AS v),"
            " unix_micros(ts)) FILTER (WHERE ts <= t)"
        ).alias("prev"),
        F.expr(
            "min_by(struct(unix_micros(ts) AS tu, value AS v),"
            " unix_micros(ts)) FILTER (WHERE ts > t)"
        ).alias("next"),
    )
    tu = F.unix_micros(F.col("t"))
    interp = (
        F.col("prev.v") * (F.col("next.tu") - tu)
        + F.col("next.v") * (tu - F.col("prev.tu"))
    ) / (F.col("next.tu") - F.col("prev.tu"))
    return sides.select(
        "user_id",
        F.col("t").alias("probe_t"),
        F.col("prev.tu").alias("prev_ts_us"),
        F.col("next.tu").alias("next_ts_us"),
        F.when(
            F.col("prev.tu").isNotNull() & F.col("next.tu").isNotNull(), interp
        ).alias("v_interp"),
    )


# --- big-to-big interval join via time-grain bucketing -------------------

_IJ_WINDOW_US = 24 * 3600 * 1_000_000  # interval length: 24h after anchor
_IJ_GRAIN_US = _IJ_WINDOW_US  # grain = max interval length -> <=2 grains


def _floor_div(c, g: int):
    """Exact integer floor division of a BIGINT column: subtracting the
    pmod makes the numerator an exact multiple, so the double division
    is exact for any epoch-scale magnitude (well under 2^53)."""
    return ((c - F.pmod(c, F.lit(g))) / F.lit(g)).cast("long")


def interval_join_bucketed(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    point_us: str,
    start_us: str,
    end_us: str,
    grain_us: int,
) -> DataFrame:
    """Inner join of point rows to interval rows with
    ``start <= point < end`` when BOTH sides are large — the 1-D time
    analog of the spatial grid join, for the case the broadcast band
    join (range_join_value_bands) cannot handle.

    Each interval explodes into the time grains it overlaps
    (ceil(len/grain)+1 rows — bounded when grain >= typical interval
    length); each point computes its single grain; the match is then a
    plain EQUI-join on (keys..., grain) followed by the exact range
    filter. Every qualifying (point, interval) pair appears exactly
    once: the point's one grain meets each interval's distinct grain
    list at most once. No nested-loop join, no broadcast requirement,
    AQE-splittable on skewed (key, grain) buckets — the same
    bounded-candidates shape as grid_neighbor_pairs, applied to time.
    Columns from both frames are carried; callers project afterward."""
    ivals = intervals.withColumn(
        "__g",
        F.explode(
            F.sequence(
                _floor_div(F.col(start_us), grain_us),
                _floor_div(F.col(end_us) - 1, grain_us),
            )
        ),
    )
    pts = points.withColumn("__g", _floor_div(F.col(point_us), grain_us))
    return (
        pts.join(ivals, [*on, "__g"])
        .filter(
            (F.col(point_us) >= F.col(start_us)) & (F.col(point_us) < F.col(end_us))
        )
        .drop("__g")
    )


_IJ_SQL = f"""
WITH p AS (
  SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS us
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT event_id AS click_id, user_id, epoch_us(ts) AS us
  FROM events WHERE event_type = 'click'
)
SELECT p.purchase_id,
       CAST(COUNT(*) AS BIGINT) AS n_clicks,
       arg_min(c.click_id, c.us) AS first_click_id
FROM p JOIN c
  ON p.user_id = c.user_id
 AND c.us >= p.us AND c.us < p.us + {_IJ_WINDOW_US}
GROUP BY p.purchase_id
"""


@query("interval_join_clicks_after_purchase", _IJ_SQL)
def interval_join_clicks_after_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution-window join under the exact gate: for every purchase,
    the clicks of the same user inside the following 24h — intervals
    built from one big fact table, points from another, joined with
    interval_join_bucketed (grain = window, so each interval covers at
    most 2 grains). The oracle states the same join as a plain theta
    join; grain bucketing must not add or drop a single pair. Output:
    per-purchase click count and the temporally-first click id
    (min_by on the microsecond timestamp; (user, ts) is duplicate-free
    in the fixture, so the pick is deterministic)."""
    e = read_table(spark, sf_dir, "events").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.unix_micros(F.col("ts")).alias("start_us"),
        (F.unix_micros(F.col("ts")) + _IJ_WINDOW_US).alias("end_us"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        "user_id",
        F.unix_micros(F.col("ts")).alias("point_us"),
    )
    joined = interval_join_bucketed(
        clicks,
        purchases,
        on=["user_id"],
        point_us="point_us",
        start_us="start_us",
        end_us="end_us",
        grain_us=_IJ_GRAIN_US,
    )
    return joined.groupBy("purchase_id").agg(
        F.count(F.lit(1)).alias("n_clicks"),
        F.min_by("click_id", "point_us").alias("first_click_id"),
    )
