package graft.queries

import graft.Tables
import graft.extensions.{Det, RangeJoin, Timeseries}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Group H (continued) — round-6 batch 6: interval-overlap analytics and
  * per-key time-series smoothing. Scale notes live on the extension
  * objects; every query follows the Q determinism contract.
  */
object GroupH10 {

  /** Interval × interval overlap join, binned (RangeJoin.intervalOverlapJoin):
    * shipment exposure intervals (derived deterministically from lineitem,
    * the table has no receipt date) against a calendar of monthly promo
    * windows (the 5th–25th of each month). A raw two-sided range predicate
    * can only plan as BroadcastNestedLoopJoin / CartesianProduct —
    * O(|L|·|W|) row comparisons; the binned form explodes both sides onto
    * 14-day buckets, equi-joins on the bucket, exact-filters in the join
    * stream, and dedups multi-bucket matches with a per-row
    * first-shared-bucket predicate instead of a distinct (PlanSpec pins
    * no-BNLJ/no-cartesian). The oracle is the plain inequality join —
    * DuckDB at oracle scale can afford the quadratic plan; the Spark side
    * must not.
    */
  val h86 = Q(
    "h86_interval_overlap",
    """WITH li AS (
      |  SELECT CAST(l_shipdate AS DATE) AS istart,
      |    CAST(l_shipdate AS DATE)
      |      + CAST(1 + (l_orderkey + l_linenumber) % 45 AS INTEGER) AS iend,
      |    CAST(l_quantity AS DECIMAL(18,2)) AS qty
      |  FROM lineitem),
      |w AS (
      |  SELECT CAST(m + INTERVAL 4 DAY AS DATE) AS ws,
      |    CAST(m + INTERVAL 24 DAY AS DATE) AS we
      |  FROM (SELECT unnest(generate_series(TIMESTAMP '1995-01-01',
      |    TIMESTAMP '2002-01-01', INTERVAL 1 MONTH)) AS m))
      |SELECT strftime(ws, '%Y-%m-%d') AS window_start,
      |  count(*) AS n_overlap,
      |  CAST(sum(qty) AS DOUBLE) AS sum_qty
      |FROM w JOIN li ON li.istart <= w.we AND w.ws <= li.iend
      |GROUP BY ws, we
      |ORDER BY window_start""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d).select(
      col("l_shipdate").cast("date").as("istart"),
      date_add(col("l_shipdate").cast("date"),
        (lit(1) + pmod(col("l_orderkey") + col("l_linenumber"), lit(45)))
          .cast("int")).as("iend"),
      col("l_quantity").cast("decimal(18,2)").as("qty"))
    val w = s.range(0, 85)
      .select(add_months(lit("1995-01-01").cast("date"), col("id").cast("int")).as("m"))
      .select(date_add(col("m"), 4).as("ws"), date_add(col("m"), 24).as("we"))
    RangeJoin.intervalOverlapJoin(w, li, "ws", "we", "istart", "iend",
        bucketSeconds = 14L * 86400)
      .groupBy("ws", "we")
      .agg(count(lit(1)).as("n_overlap"), sum("qty").as("sq"))
      .select(date_format(col("ws"), "yyyy-MM-dd").as("window_start"),
        col("n_overlap"), col("sq").cast("double").as("sum_qty"))
      .orderBy("window_start")
  }

  /** Per-user EWMA smoothing + anomaly summary over the event stream
    * (Timeseries.ewmaFixedHorizon: 10-term α=0.7 horizon, one window pass,
    * literal coefficients so Spark and the oracle compute bit-identical
    * doubles). Per user: event count, the final smoothed value, and the
    * largest absolute deviation of an observation from its smoothed value
    * — the screen a telemetry pipeline runs to flag unstable series.
    */
  val h87 = Q(
    "h87_ewma_anomaly",
    """WITH base AS (
      |  SELECT user_id, event_id, ts, value,
      |    lag(value, 1) OVER w AS l1, lag(value, 2) OVER w AS l2,
      |    lag(value, 3) OVER w AS l3, lag(value, 4) OVER w AS l4,
      |    lag(value, 5) OVER w AS l5, lag(value, 6) OVER w AS l6,
      |    lag(value, 7) OVER w AS l7, lag(value, 8) OVER w AS l8,
      |    lag(value, 9) OVER w AS l9
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |e AS (
      |  SELECT user_id, event_id, ts, value,
      |    (coalesce(value, 0.0) * 1.0 + coalesce(l1, 0.0) * 0.7
      |      + coalesce(l2, 0.0) * 0.49 + coalesce(l3, 0.0) * 0.343
      |      + coalesce(l4, 0.0) * 0.2401 + coalesce(l5, 0.0) * 0.16807
      |      + coalesce(l6, 0.0) * 0.117649 + coalesce(l7, 0.0) * 0.0823543
      |      + coalesce(l8, 0.0) * 0.05764801
      |      + coalesce(l9, 0.0) * 0.040353607) /
      |    (CASE WHEN value IS NULL THEN 0.0 ELSE 1.0 END
      |      + CASE WHEN l1 IS NULL THEN 0.0 ELSE 0.7 END
      |      + CASE WHEN l2 IS NULL THEN 0.0 ELSE 0.49 END
      |      + CASE WHEN l3 IS NULL THEN 0.0 ELSE 0.343 END
      |      + CASE WHEN l4 IS NULL THEN 0.0 ELSE 0.2401 END
      |      + CASE WHEN l5 IS NULL THEN 0.0 ELSE 0.16807 END
      |      + CASE WHEN l6 IS NULL THEN 0.0 ELSE 0.117649 END
      |      + CASE WHEN l7 IS NULL THEN 0.0 ELSE 0.0823543 END
      |      + CASE WHEN l8 IS NULL THEN 0.0 ELSE 0.05764801 END
      |      + CASE WHEN l9 IS NULL THEN 0.0 ELSE 0.040353607 END) AS ewma
      |  FROM base),
      |lastr AS (
      |  SELECT user_id, ewma AS last_ewma FROM (
      |    SELECT user_id, ewma, row_number() OVER (
      |      PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |    FROM e) WHERE rn = 1),
      |agg AS (
      |  SELECT user_id, count(*) AS n_events,
      |    max(abs(value - ewma)) AS max_dev
      |  FROM e GROUP BY user_id)
      |SELECT a.user_id, a.n_events,
      |  floor(l.last_ewma * 1000000 + 0.5) / 1000000 AS last_ewma,
      |  floor(a.max_dev * 1000000 + 0.5) / 1000000 AS max_dev
      |FROM agg a JOIN lastr l ON a.user_id = l.user_id
      |ORDER BY a.user_id""".stripMargin) { (s, d) =>
    val coeffs = Seq(1.0, 0.7, 0.49, 0.343, 0.2401, 0.16807, 0.117649,
      0.0823543, 0.05764801, 0.040353607)
    val e = Timeseries.ewmaFixedHorizon(Tables.events(s, d),
        Seq("user_id"), Seq("ts", "event_id"), "value", coeffs)
      .withColumn("dev", abs(col("value") - col("ewma")))
    val last = e.withColumn("rn", row_number().over(
        Window.partitionBy("user_id")
          .orderBy(col("ts").desc, col("event_id").desc)))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("ewma").as("last_ewma"))
    e.groupBy("user_id")
      .agg(count(lit(1)).as("n_events"), max("dev").as("max_dev"))
      .join(last, "user_id")
      .select(col("user_id"), col("n_events"),
        Det.floorRound(col("last_ewma"), 6).as("last_ewma"),
        Det.floorRound(col("max_dev"), 6).as("max_dev"))
      .orderBy("user_id")
  }

  /** Gaps-and-islands consecutive-day activity streaks per user
    * (Sequences.activityStreaks) — the `day − row_number` island-id
    * device; integer date math only, so both engines agree exactly.
    */
  val h88 = Q(
    "h88_activity_streaks",
    """WITH days AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |isl AS (
      |  SELECT user_id, day,
      |    day - CAST(row_number() OVER (
      |      PARTITION BY user_id ORDER BY day) AS INTEGER) AS grp
      |  FROM days),
      |streaks AS (
      |  SELECT user_id, grp, count(*) AS len, min(day) AS start_day
      |  FROM isl GROUP BY user_id, grp),
      |sel AS (
      |  SELECT user_id, len, start_day, row_number() OVER (
      |    PARTITION BY user_id ORDER BY len DESC, start_day) AS rk
      |  FROM streaks)
      |SELECT s.user_id, a.n_streaks, s.len AS longest_days,
      |  strftime(s.start_day, '%Y-%m-%d') AS streak_start
      |FROM sel s JOIN (
      |  SELECT user_id, count(*) AS n_streaks FROM streaks
      |  GROUP BY user_id) a USING (user_id)
      |WHERE rk = 1
      |ORDER BY s.user_id""".stripMargin) { (s, d) =>
    graft.extensions.Sequences
      .activityStreaks(Tables.events(s, d), "user_id", "ts")
      .orderBy("user_id")
      .select("user_id", "n_streaks", "longest_days", "streak_start")
  }

  val all: Seq[Q] = Seq(h86, h87, h88)
}
