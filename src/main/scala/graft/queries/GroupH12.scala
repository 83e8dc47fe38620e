package graft.queries

import graft.Tables
import graft.extensions.{Attribution, Quality}
import org.apache.spark.sql.functions._

/** Group H (continued) — round-6 batch 8: data-quality expectations and
  * multi-touch attribution. Scale notes live on the extension objects.
  */
object GroupH12 {

  /** Data-quality expectation report over the star (Quality.check): six
    * rules across three sources — per source ONE scan of conditional
    * aggregates, reshaped to rule rows by the `stack` generator (no
    * per-rule scans). Cross-table rules (referential integrity, cross-field
    * date order) enter as pre-joined violation flags through the same path.
    */
  val h92 = Q(
    "h92_dq_expectations",
    """WITH li AS (
      |  SELECT count(*) AS total,
      |    CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_qty_null,
      |    CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS v_disc_range
      |  FROM lineitem),
      |o AS (
      |  SELECT count(*) AS total,
      |    CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_price_pos,
      |    CAST(sum(CASE WHEN o_orderdate > TIMESTAMP '1998-12-01' THEN 1 ELSE 0 END) AS BIGINT) AS v_future_date
      |  FROM orders),
      |ref AS (
      |  SELECT count(*) AS total,
      |    CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_orphan,
      |    CAST(sum(CASE WHEN o_orderkey IS NOT NULL
      |             AND l_shipdate < o_orderdate THEN 1 ELSE 0 END) AS BIGINT) AS v_ship_before_order
      |  FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey)
      |SELECT rule_id, violations, total,
      |  floor(CAST(violations AS DOUBLE) / CAST(total AS DOUBLE) * 1000000 + 0.5)
      |    / 1000000 AS violation_rate
      |FROM (
      |  SELECT 'li_quantity_not_null' AS rule_id, v_qty_null AS violations, total FROM li
      |  UNION ALL SELECT 'li_discount_in_range', v_disc_range, total FROM li
      |  UNION ALL SELECT 'o_totalprice_positive', v_price_pos, total FROM o
      |  UNION ALL SELECT 'o_orderdate_not_future', v_future_date, total FROM o
      |  UNION ALL SELECT 'li_orderkey_resolves', v_orphan, total FROM ref
      |  UNION ALL SELECT 'li_ship_after_order', v_ship_before_order, total FROM ref)
      |ORDER BY rule_id""".stripMargin) { (s, d) =>
    import graft.extensions.Quality.Expectation
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    val liRules = Quality.check(li, Seq(
      Expectation("li_quantity_not_null", col("l_quantity").isNull),
      Expectation("li_discount_in_range",
        col("l_discount") < 0 || col("l_discount") > 0.5)))
    val oRules = Quality.check(o, Seq(
      Expectation("o_totalprice_positive", col("o_totalprice") <= 0),
      Expectation("o_orderdate_not_future",
        col("o_orderdate") > lit("1998-12-01").cast("timestamp"))))
    val joined = li.join(o, col("l_orderkey") === col("o_orderkey"), "left")
    val refRules = Quality.check(joined, Seq(
      Expectation("li_orderkey_resolves", col("o_orderkey").isNull),
      Expectation("li_ship_after_order",
        col("o_orderkey").isNotNull && col("l_shipdate") < col("o_orderdate"))))
    liRules.unionAll(oRules).unionAll(refRules).orderBy("rule_id")
  }

  /** Linear multi-touch attribution by position
    * (Attribution.linearByPosition): purchases credit every same-user
    * click in the trailing 24 h equally; the report splits credited value
    * by first/middle/last touch position. Banded user+time-bucket join —
    * never a cross product; exact integer credit math.
    */
  val h93 = Q(
    "h93_touch_attribution",
    """WITH c AS (
      |  SELECT user_id, event_id AS c_event_id, ts AS c_ts FROM events
      |  WHERE event_type = 'click'),
      |p AS (
      |  SELECT user_id, event_id AS p_event_id, ts AS p_ts,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase'),
      |paired AS (
      |  SELECT p.user_id, p_event_id, c_event_id, c_ts, cents
      |  FROM p JOIN c ON p.user_id = c.user_id
      |    AND c_ts >= p_ts - INTERVAL '24 hours' AND c_ts <= p_ts),
      |ranked AS (
      |  SELECT *,
      |    count(*) OVER (PARTITION BY p_event_id) AS n,
      |    row_number() OVER (PARTITION BY p_event_id
      |      ORDER BY c_ts, c_event_id) AS rk
      |  FROM paired)
      |SELECT CASE WHEN rk = 1 THEN 'first'
      |            WHEN rk = n THEN 'last'
      |            ELSE 'middle' END AS position,
      |  count(*) AS n_touches,
      |  CAST(sum((cents * 10000) // n) AS BIGINT) AS credit_micro,
      |  CAST(sum((cents * 10000) // n) AS DOUBLE) / 1000000.0 AS credit_value
      |FROM ranked GROUP BY 1 ORDER BY position""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    Attribution.linearByPosition(
        ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts").as("c_ts"), col("event_id").as("c_event_id")),
        ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("p_event_id"),
            col("value")),
        "user_id", "c_ts", "c_event_id", "p_ts", "p_event_id", "value",
        windowSeconds = 24L * 3600)
      .orderBy("position")
  }

  val all: Seq[Q] = Seq(h92, h93)
}
