"""Event-time operators over `events`: tumbling-window aggregation and
gap-based sessionization, in batch form (the streaming twins live in
fastetl_spark/streaming/ and are asserted equivalent in tests).

The reference has no streaming/window surface (SURVEY §2.10); these are
the batch-equivalent semantics of Structured Streaming's
window()/session_window(), expressed so a DuckDB oracle can check them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from fastetl_spark.functions.stable import dec
from fastetl_spark.io.readers import read_table
from fastetl_spark.registry import query

SESSION_GAP_S = 1800  # 30 min


# --- tumbling window -----------------------------------------------------

_TUMBLING_SQL = """
SELECT date_trunc('hour', ts) AS window_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
"""


@query("tumbling_window_agg", _TUMBLING_SQL)
def tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows (batch twin of groupBy(window(ts,'1 hour'));
    epoch-aligned hour buckets are identical to date_trunc)."""
    e = read_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_trunc("hour", F.col("ts")).alias("window_start"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(dec("value")), 2).cast("double").alias("total_value"),
        )
    )


# --- gap-based sessionization -------------------------------------------

_SESSION_SQL = f"""
WITH ordered AS (
  SELECT user_id, event_id, ts,
         date_diff('second',
                   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                   ts) AS gap_s
  FROM events
), flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN gap_s IS NULL OR gap_s > {SESSION_GAP_S} THEN 1 ELSE 0 END AS is_new
  FROM ordered
), numbered AS (
  SELECT user_id, event_id, ts,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM flagged
)
SELECT user_id, session_seq,
       MIN(ts) AS session_start,
       MAX(ts) AS session_end,
       COUNT(*) AS n_events,
       date_diff('second', MIN(ts), MAX(ts)) AS duration_s
FROM numbered
GROUP BY user_id, session_seq
"""


@query("sessionize_events", _SESSION_SQL)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-min-gap sessions via lag + cumulative-sum (batch twin of
    session_window(ts, '30 minutes')). One shuffle on user_id serves both
    window passes and the final aggregation — partitioning is reused."""
    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    flagged = e.withColumn(
        "is_new", F.when(gap.isNull() | (gap > SESSION_GAP_S), 1).otherwise(0)
    )
    numbered = flagged.withColumn(
        "session_seq", F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return numbered.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.count("*").alias("n_events"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias("duration_s"),
    )


# --- incremental CDC diff over event time (P3 on streams) ----------------

_CDC_SQL = """
SELECT event_type, COUNT(*) AS n_new,
       MAX(ts) AS new_watermark
FROM events
WHERE ts > TIMESTAMP '2024-01-25 00:00:00'
GROUP BY event_type
"""


@query("events_cdc_diff", _CDC_SQL)
def events_cdc_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch CDC by high-watermark on the stream table (sync §2.9 step 2-3
    applied to event time)."""
    e = read_table(spark, sf_dir, "events")
    return (
        e.filter(F.col("ts") > F.lit("2024-01-25 00:00:00").cast("timestamp"))
        .groupBy("event_type")
        .agg(F.count("*").alias("n_new"), F.max("ts").alias("new_watermark"))
    )


# --- sliding window (hop = 30 min, length = 1 hour) ----------------------

_SLIDING_SQL = """
WITH contrib AS (
  SELECT event_type, value,
         CAST(date_trunc('hour', ts) AS TIMESTAMP)
           + CASE WHEN minute(ts) >= 30 THEN INTERVAL 30 MINUTE ELSE INTERVAL 0 MINUTE END
           - offs * INTERVAL 30 MINUTE AS window_start
  FROM events, (SELECT unnest([0, 1]) AS offs) o
)
SELECT window_start, event_type,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_value
FROM contrib
GROUP BY window_start, event_type
"""


@query("sliding_window_agg", _SLIDING_SQL)
def sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 min (each event lands in two
    windows) — Spark's window(ts, '1 hour', '30 minutes'); the oracle
    replays the same assignment by exploding two offsets."""
    e = read_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum(dec("value")), 2).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


# --- funnel analysis ------------------------------------------------------

_FUNNEL_SQL = """
WITH v AS (
  SELECT user_id, MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view
  FROM events GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS first_click_after
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'click' AND v.first_view IS NOT NULL AND e.ts > v.first_view
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS first_purchase_after
  FROM events e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts > c.first_click_after
  GROUP BY e.user_id
)
SELECT v.user_id, v.first_view, c.first_click_after, p.first_purchase_after
FROM v LEFT JOIN c ON c.user_id = v.user_id
       LEFT JOIN p ON p.user_id = v.user_id
WHERE v.first_view IS NOT NULL
"""


@query("funnel_conversion", _FUNNEL_SQL)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view -> click -> purchase funnel: per user, the first
    view, the first click strictly AFTER it, and the first purchase
    strictly after that — the sequential-conversion semantics a plain
    per-type MIN gets wrong (a click before any view must not count).
    Three keyed aggregations; each stage's join key is user_id, so all
    shuffles share one partitioning and AQE coalesces them."""
    e = read_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("first_view")
    ).filter(F.col("first_view").isNotNull())
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click_after"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("first_click_after"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase_after"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select("user_id", "first_view", "first_click_after", "first_purchase_after")
    )


# --- retention cohorts ----------------------------------------------------

_RETENTION_SQL = """
WITH first_seen AS (
  SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
  FROM events GROUP BY user_id
)
SELECT CAST(f.cohort_week AS VARCHAR) AS cohort_week,
       CAST(date_diff('day', f.cohort_week, CAST(e.ts AS DATE)) // 7 AS BIGINT)
         AS week_offset,
       COUNT(DISTINCT e.user_id) AS n_active_users
FROM events e JOIN first_seen f ON f.user_id = e.user_id
GROUP BY 1, 2
"""


@query("retention_cohorts", _RETENTION_SQL)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-seen week, counted
    distinct in each subsequent week offset — the activity-retention
    matrix. The first-seen aggregate shuffles once on user_id; the
    cohort join reuses that key; the final count-distinct is the only
    wide aggregation. Week truncation is cast to DATE on both engines
    (DuckDB's date_trunc returns DATE, Spark's returns TIMESTAMP)."""
    e = read_table(spark, sf_dir, "events").select("user_id", "ts")
    first = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    j = e.join(first, "user_id")
    offset = F.floor(F.datediff(F.to_date("ts"), F.col("cohort_week")) / 7).cast("long")
    return (
        # DATE cells land as python objects in the driver's pandas
        # canonicalizer (vs datetime64 from DuckDB) — emit ISO strings
        j.select(
            F.col("cohort_week").cast("string").alias("cohort_week"),
            offset.alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").alias("n_active_users"))
    )


# --- daily gap-fill + forward fill ---------------------------------------

_GAPFILL_SQL = """
WITH daily AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS day_value
  FROM events WHERE user_id % 100 = 0 GROUP BY 1, 2
), bounds AS (
  SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM daily GROUP BY user_id
), spine AS (
  SELECT b.user_id, unnest(generate_series(b.d0, b.d1, INTERVAL 1 DAY))::DATE AS day
  FROM bounds b
), joined AS (
  SELECT s.user_id, s.day, d.day_value,
         COUNT(d.day_value) OVER (PARTITION BY s.user_id ORDER BY s.day) AS grp
  FROM spine s LEFT JOIN daily d ON d.user_id = s.user_id AND d.day = s.day
)
SELECT user_id, CAST(day AS VARCHAR) AS day,
       day_value IS NOT NULL AS observed,
       MAX(day_value) OVER (PARTITION BY user_id, grp) AS filled_value
FROM joined
"""


@query("time_gapfill_forward", _GAPFILL_SQL)
def time_gapfill_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily gap-fill with forward fill: each (sampled) user's daily
    value series gets a continuous day spine between its first and last
    observation (sequence + explode — the spine is generated, not
    scanned) and missing days carry the last observed value
    (last_value(ignorenulls) over the user-day window; the oracle's
    equivalent is the count-over grouping trick). Day keys are emitted
    as ISO strings (DATE cells hash differently between engines);
    values go through exact DECIMAL so the fill is bit-stable."""
    e = read_table(spark, sf_dir, "events").filter(F.col("user_id") % 100 == 0)
    daily = (
        e.select("user_id", F.to_date("ts").alias("day"), dec("value").alias("v"))
        .groupBy("user_id", "day")
        .agg(F.round(F.sum("v"), 2).cast("double").alias("day_value"))
    )
    bounds = daily.groupBy("user_id").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    spine = bounds.select(
        "user_id", F.explode(F.sequence("d0", "d1")).alias("day")
    )
    joined = spine.join(daily, ["user_id", "day"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        F.col("day").cast("string").alias("day"),
        F.col("day_value").isNotNull().alias("observed"),
        F.last("day_value", ignorenulls=True).over(w).alias("filled_value"),
    )


# --- session path analysis -----------------------------------------------

_PATHS_SQL = f"""
WITH ordered AS (
  SELECT user_id, event_id, ts, event_type,
         date_diff('second',
                   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                   ts) AS gap_s
  FROM events
), flagged AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN gap_s IS NULL OR gap_s > {SESSION_GAP_S} THEN 1 ELSE 0 END AS is_new
  FROM ordered
), numbered AS (
  SELECT user_id, event_id, ts, event_type,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
  FROM flagged
), paths AS (
  SELECT user_id, session_seq,
         string_agg(event_type, '>' ORDER BY ts, event_id) AS path
  FROM numbered GROUP BY user_id, session_seq
)
SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
FROM paths GROUP BY path
ORDER BY n_sessions DESC, path
LIMIT 20
"""


@query("top_session_paths", _PATHS_SQL)
def top_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path analysis: the 20 most common within-session event-type
    sequences — which journeys users actually take. Builds on the same
    gap-sessionization window chain (one shuffle on user_id feeds lag,
    cumsum, and the per-session ordered aggregation); the ordered
    concatenation is array_sort(collect_list(struct)) — struct field
    order (ts, event_id) IS the sort key, so the path is deterministic
    under any partitioning. Final top-20 compiles to
    TakeOrderedAndProject (per-partition heaps), not a global sort."""
    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    numbered = (
        e.withColumn(
            "is_new", F.when(gap.isNull() | (gap > SESSION_GAP_S), 1).otherwise(0)
        )
        .withColumn(
            "session_seq",
            F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    paths = numbered.groupBy("user_id", "session_seq").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("ts", "event_id", "event_type"))),
                lambda x: x["event_type"],
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(20)
    )


# --- binned interval-overlap join ----------------------------------------

_OVERLAP_USER_CAP = 50  # keep the registered pair surface bounded

_OVERLAP_SQL = f"""
WITH ordered AS (
  SELECT user_id, event_id, ts,
         date_diff('second',
                   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                   ts) AS gap_s
  FROM events WHERE user_id < {_OVERLAP_USER_CAP}
), numbered AS (
  SELECT user_id, ts,
         SUM(CASE WHEN gap_s IS NULL OR gap_s > {SESSION_GAP_S} THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM ordered
), sessions AS (
  SELECT user_id, session_seq, MIN(ts) AS s, MAX(ts) AS e
  FROM numbered GROUP BY user_id, session_seq
), binned AS (
  SELECT user_id, session_seq, s, e,
         unnest(generate_series(date_trunc('hour', s), date_trunc('hour', e),
                                INTERVAL 1 HOUR)) AS hour_bin
  FROM sessions
)
SELECT a.user_id AS user_a, b.user_id AS user_b,
       CAST(COUNT(*) AS BIGINT) AS n_session_overlaps
FROM (SELECT DISTINCT user_id, session_seq, s, e, hour_bin FROM binned) a
JOIN (SELECT DISTINCT user_id, session_seq, s, e, hour_bin FROM binned) b
  ON a.hour_bin = b.hour_bin AND a.user_id < b.user_id
 AND a.s <= b.e AND b.s <= a.e
 AND date_trunc('hour', greatest(a.s, b.s)) = a.hour_bin
GROUP BY a.user_id, b.user_id
"""


@query("session_overlap_pairs", _OVERLAP_SQL)
def session_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join via hour binning — the scale pattern for
    joining two interval sets without an O(n^2) theta join: each
    session explodes to the hour bins it covers, candidates meet on an
    EQUI-join of the bin, the true overlap predicate filters, and the
    start-bin-ownership condition (the overlap is counted only in the
    hour where it begins) deduplicates multi-bin overlaps WITHOUT a
    distinct over pairs. Work scales with bins x bin occupancy, never
    |sessions|^2; skew = the busiest hour, handled by AQE.

    Counts overlapping session pairs per (user_a < user_b) pair over a
    bounded user subset."""
    e = read_table(spark, sf_dir, "events").filter(
        F.col("user_id") < _OVERLAP_USER_CAP
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    numbered = e.withColumn(
        "session_seq",
        F.sum(
            F.when(gap.isNull() | (gap > SESSION_GAP_S), 1).otherwise(0)
        ).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    sessions = numbered.groupBy("user_id", "session_seq").agg(
        F.min("ts").alias("s"), F.max("ts").alias("e")
    )
    binned = sessions.select(
        "user_id",
        "session_seq",
        "s",
        "e",
        F.explode(
            F.sequence(
                F.date_trunc("hour", F.col("s")),
                F.date_trunc("hour", F.col("e")),
                F.expr("INTERVAL 1 HOUR"),
            )
        ).alias("hour_bin"),
    )
    a = binned.select(*[F.col(c).alias(f"a_{c}") for c in binned.columns])
    b = binned.select(*[F.col(c).alias(f"b_{c}") for c in binned.columns])
    pairs = a.join(
        b,
        (F.col("a_hour_bin") == F.col("b_hour_bin"))
        & (F.col("a_user_id") < F.col("b_user_id"))
        & (F.col("a_s") <= F.col("b_e"))
        & (F.col("b_s") <= F.col("a_e"))
        # count each overlap exactly once: in its starting hour's bin
        & (
            F.date_trunc("hour", F.greatest(F.col("a_s"), F.col("b_s")))
            == F.col("a_hour_bin")
        ),
    )
    return pairs.groupBy(
        F.col("a_user_id").alias("user_a"), F.col("b_user_id").alias("user_b")
    ).agg(F.count(F.lit(1)).alias("n_session_overlaps"))


# --- continuous-aggregate rollup cascade ---------------------------------

_CASCADE_SQL = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       COUNT(*) AS n_events,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE)
         AS total_value
FROM events
GROUP BY 1
"""


@query("rollup_cascade_daily", _CASCADE_SQL)
def rollup_cascade_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Continuous-aggregate cascade (the hypertable/materialized-rollup
    pattern): raw events collapse to HOUR partials once, days re-sum
    the hour partials (months would re-sum days) — the raw table is
    scanned exactly once, at the finest level. The oracle aggregates
    the day DIRECTLY from raw, so the hash match proves the cascade's
    merge associativity (exact DECIMAL partials make re-summation
    lossless; a double cascade would NOT hash-match).

    Scale shape: this is how a 100 TB metrics pipeline maintains
    day/month rollups — each level reads the much-smaller level below,
    and incremental refresh (incremental_agg_merge, sync.py:259) only
    touches the partial rows of changed hours."""
    from fastetl_spark.functions.stable import dec

    ev = read_table(spark, sf_dir, "events").select(
        F.col("ts").cast("timestamp").alias("ts"), "value"
    )
    hours = ev.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec("value")).alias("sum_value"),
    )
    return (
        hours.groupBy(F.date_trunc("day", F.col("hour")).alias("day"))
        .agg(
            F.sum("n_events").alias("n_events"),
            F.round(F.sum("sum_value"), 2).cast("double").alias("total_value"),
        )
    )


# --- Markov transition matrix over event sequences -----------------------

_TRANSITION_SQL = """
WITH seq AS (
  SELECT user_id, event_type AS from_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS to_type
  FROM events
), counts AS (
  SELECT from_type, to_type, COUNT(*) AS n_transitions
  FROM seq WHERE to_type IS NOT NULL
  GROUP BY from_type, to_type
), outdeg AS (
  SELECT from_type, SUM(n_transitions) AS n_out FROM counts GROUP BY from_type
)
SELECT c.from_type, c.to_type,
       CAST(c.n_transitions AS BIGINT) AS n_transitions,
       CAST(c.n_transitions AS DOUBLE) / CAST(o.n_out AS DOUBLE) AS p
FROM counts c JOIN outdeg o ON o.from_type = c.from_type
"""


@query("event_transition_matrix", _TRANSITION_SQL)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of event types: per-user
    sequences ordered by (ts, event_id), adjacent pairs counted, each
    row normalized by its from-type out-degree — the user-behavior
    model path analysis feeds. Counts are exact integers; each
    probability is ONE int/int double division, bit-identical across
    engines. One shuffle on user_id for the LEAD window, then a
    transition-matrix-sized aggregation (|types|^2 rows)."""
    e = read_table(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    counts = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    outdeg = counts.groupBy("from_type").agg(F.sum("n_transitions").alias("n_out"))
    return counts.join(F.broadcast(outdeg), "from_type").select(
        "from_type",
        "to_type",
        "n_transitions",
        (
            F.col("n_transitions").cast("double") / F.col("n_out").cast("double")
        ).alias("p"),
    )


# --- Kaplan-Meier time-to-conversion curve -------------------------------

_KM_SQL = """
WITH firsts AS (
  SELECT user_id, MIN(ts) AS t0,
         MIN(CASE WHEN event_type = 'purchase' AND value > 150 THEN ts END)
           AS thit,
         MAX(ts) AS tlast
  FROM events GROUP BY user_id
), spans AS (
  SELECT CASE WHEN thit IS NOT NULL THEN date_diff('day', CAST(t0 AS DATE), CAST(thit AS DATE))
              ELSE date_diff('day', CAST(t0 AS DATE), CAST(tlast AS DATE)) END AS t,
         (thit IS NOT NULL) AS hit
  FROM firsts
), km AS (
  SELECT t, SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS d,
         SUM(CASE WHEN hit THEN 0 ELSE 1 END) AS c
  FROM spans GROUP BY t
), arr AS (
  SELECT list(struct_pack(t := t, d := d, c := c) ORDER BY t) AS a,
         (SELECT COUNT(*) FROM firsts) AS n_total
  FROM km
), rows_ AS (
  SELECT unnest(list_transform(generate_series(1, len(a)), i -> struct_pack(
    t := a[i].t,
    n_at_risk := n_total
      - COALESCE(list_sum(list_transform(a[1:i-1], s -> s.d + s.c)), 0),
    n_events := a[i].d,
    n_censored := a[i].c,
    survival := list_reduce(
      list_transform(generate_series(1, i), j ->
        CAST(n_total
             - COALESCE(list_sum(list_transform(a[1:j-1], s -> s.d + s.c)), 0)
             - a[j].d AS DOUBLE)
        / CAST(n_total
               - COALESCE(list_sum(list_transform(a[1:j-1], s -> s.d + s.c)), 0)
               AS DOUBLE)),
      (x, y) -> x * y)
  ))) AS r FROM arr
)
SELECT CAST(r.t AS BIGINT) AS t,
       CAST(r.n_at_risk AS BIGINT) AS n_at_risk,
       CAST(r.n_events AS BIGINT) AS n_events,
       CAST(r.n_censored AS BIGINT) AS n_censored,
       r.survival AS survival
FROM rows_
"""


@query("kaplan_meier_conversion", _KM_SQL)
def kaplan_meier_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier time-to-first-high-value-purchase curve: per user,
    days from first event to first qualifying purchase (event) or to
    last observed event (right-censored); per distinct day t, the
    at-risk count, events, censorings, and S(t) = prod_{s<=t}
    (1 - d_s/n_s).

    Determinism: every ratio is one exact-int double division and the
    cumulative product is a SEQUENTIAL left fold in ascending-t order
    on both engines (F.aggregate / list_reduce) — multiplication chains
    of identical doubles are bit-identical, so S(t) needs NO rounding
    or tolerance, unlike ln/exp formulations (exp differs in the last
    ulp across libms). Exhaustion (n = d at some t) yields an exact
    0.0 ratio, not a log singularity.

    Scale shape: the curve's state is one row per distinct duration —
    bounded by the observation window in days, not by users — so the
    O(k^2) fold runs on a driver-size array; the heavy work is the one
    per-user aggregation shuffle."""
    e = read_table(spark, sf_dir, "events")
    hit_ts = F.min(
        F.when(
            (F.col("event_type") == "purchase") & (F.col("value") > 150),
            F.col("ts"),
        )
    )
    firsts = e.groupBy("user_id").agg(
        F.min("ts").alias("t0"), hit_ts.alias("thit"), F.max("ts").alias("tlast")
    )
    spans = firsts.select(
        F.when(
            F.col("thit").isNotNull(),
            F.datediff(F.col("thit").cast("date"), F.col("t0").cast("date")),
        )
        .otherwise(F.datediff(F.col("tlast").cast("date"), F.col("t0").cast("date")))
        .cast("long")
        .alias("t"),
        F.col("thit").isNotNull().alias("hit"),
    )
    km = spans.groupBy("t").agg(
        F.sum(F.when(F.col("hit"), 1).otherwise(0)).alias("d"),
        F.sum(F.when(F.col("hit"), 0).otherwise(1)).alias("c"),
    )
    arr = (
        km.agg(F.array_sort(F.collect_list(F.struct("t", "d", "c"))).alias("a"))
        .crossJoin(firsts.agg(F.count(F.lit(1)).alias("n_total")))
        # empty-input guard: sequence(1, 0) would yield [1, 0] (negative
        # step inference) and element_at(a, 0) throws under ANSI
        .filter(F.size("a") > 0)
    )

    def prefix(a, n_total, j):
        # users removed before index j (1-based): sum of d+c over a[1:j-1]
        return F.coalesce(
            F.aggregate(
                F.slice(a, 1, j - 1),
                F.lit(0).cast("long"),
                lambda acc, s: acc + s["d"] + s["c"],
            ),
            F.lit(0).cast("long"),
        )

    def row_at(a, n_total, i):
        n_i = n_total - prefix(a, n_total, i)
        surv = F.aggregate(
            F.sequence(F.lit(1), i),
            F.lit(1.0),
            lambda acc, j: acc
            * (
                (n_total - prefix(a, n_total, j) - F.element_at(a, j)["d"]).cast(
                    "double"
                )
                / (n_total - prefix(a, n_total, j)).cast("double")
            ),
        )
        el = F.element_at(a, i)
        return F.struct(
            el["t"].alias("t"),
            n_i.alias("n_at_risk"),
            el["d"].alias("n_events"),
            el["c"].alias("n_censored"),
            surv.alias("survival"),
        )

    exploded = arr.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("a")),
                lambda i: row_at(F.col("a"), F.col("n_total"), i),
            )
        ).alias("r")
    )
    return exploded.select(
        F.col("r.t").alias("t"),
        F.col("r.n_at_risk").alias("n_at_risk"),
        F.col("r.n_events").alias("n_events"),
        F.col("r.n_censored").alias("n_censored"),
        F.col("r.survival").alias("survival"),
    )
