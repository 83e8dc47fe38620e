package graft.queries

import graft.Tables
import graft.extensions.{Cdc, Retention, Sequences}
import org.apache.spark.sql.functions._

/** Group H (continued) — round-6 batch 4: SCD2 point-in-time lookup,
  * event-sequence analytics (Markov transitions, entry paths), and weekly
  * cohort retention. Scale notes live on the extension objects; every
  * query follows the Q determinism contract.
  */
object GroupH9 {

  /** The h73 merge SQL re-dated for historical facts, as a reusable CTE
    * prefix ending in `merged` — the SCD2 customer dimension with v1 open
    * from 1990-01-01 and changes effective 1998-01-01 (mid-orders range,
    * so lookups split across versions).
    */
  private val Scd2DimCtes =
    """WITH snap AS (
      |  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
      |  FROM customer),
      |upd AS (
      |  SELECT c_custkey, c_name, c_nationkey, c_acctbal + 100.0 AS c_acctbal,
      |    'MOVED' AS c_mktsegment FROM snap WHERE c_custkey % 10 = 3
      |  UNION ALL
      |  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
      |  FROM snap WHERE c_custkey % 10 = 7
      |  UNION ALL
      |  SELECT c_custkey + 10000000, 'NEW ' || c_name, c_nationkey,
      |    c_acctbal, c_mktsegment FROM snap WHERE c_custkey % 97 = 0),
      |j AS (
      |  SELECT d.c_custkey AS dk, d.c_name AS dn, d.c_nationkey AS dnk,
      |    d.c_acctbal AS dab, d.c_mktsegment AS dms,
      |    u.c_custkey AS uk, u.c_name AS un, u.c_nationkey AS unk,
      |    u.c_acctbal AS uab, u.c_mktsegment AS ums,
      |    (d.c_custkey IS NOT NULL AND u.c_custkey IS NOT NULL AND NOT (
      |      d.c_name IS NOT DISTINCT FROM u.c_name AND
      |      d.c_nationkey IS NOT DISTINCT FROM u.c_nationkey AND
      |      d.c_acctbal IS NOT DISTINCT FROM u.c_acctbal AND
      |      d.c_mktsegment IS NOT DISTINCT FROM u.c_mktsegment)) AS chg
      |  FROM snap d FULL OUTER JOIN upd u ON d.c_custkey = u.c_custkey),
      |merged AS (
      |  SELECT dk AS c_custkey, dn AS c_name, dnk AS c_nationkey,
      |    dab AS c_acctbal, dms AS c_mktsegment,
      |    '1990-01-01' AS valid_from, '1998-01-01' AS valid_to
      |  FROM j WHERE chg
      |  UNION ALL
      |  SELECT uk, un, unk, uab, ums, '1998-01-01', NULL FROM j WHERE chg
      |  UNION ALL
      |  SELECT dk, dn, dnk, dab, dms, '1990-01-01', NULL
      |  FROM j WHERE dk IS NOT NULL AND NOT chg
      |  UNION ALL
      |  SELECT uk, un, unk, uab, ums, '1998-01-01', NULL
      |  FROM j WHERE dk IS NULL)""".stripMargin

  /** Point-in-time dimension lookup: every order joins the customer
    * version valid at its order date — orders before 1998 read v1
    * attributes, later orders of changed customers read the MOVED
    * version. The oracle rebuilds the SCD2 dim and replays the windowed
    * key join.
    */
  val h81 = Q(
    "h81_scd2_lookup",
    Scd2DimCtes +
      """
      |SELECT o.o_orderkey, o.o_custkey,
      |  strftime(o.o_orderdate, '%Y-%m-%d') AS o_date,
      |  m.c_mktsegment, m.c_acctbal, m.valid_from
      |FROM orders o JOIN merged m ON m.c_custkey = o.o_custkey
      |  AND strftime(o.o_orderdate, '%Y-%m-%d') >= m.valid_from
      |  AND strftime(o.o_orderdate, '%Y-%m-%d')
      |    < coalesce(m.valid_to, '9999-12-31')
      |ORDER BY o.o_orderkey""".stripMargin) { (s, d) =>
    val snap = Tables.customer(s, d)
    val attrs = Seq("c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val dim = Cdc.scd2Merge(Cdc.scd2Init(snap, "1990-01-01"),
      GroupH7.customerUpdates(snap), "c_custkey", attrs, "1998-01-01")
    val facts = Tables.orders(s, d).select(col("o_orderkey"),
      col("o_custkey"), date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date"))
    Cdc.scd2Lookup(facts, "o_custkey", "o_date", dim, "c_custkey")
      .select(col("o_orderkey"), col("o_custkey"), col("o_date"),
        col("c_mktsegment"), col("c_acctbal"), col("valid_from"))
      .orderBy("o_orderkey")
  }

  /** First-order Markov transition matrix over per-user event sequences
    * (ts, event_id total order): counts + row-normalized probabilities.
    */
  val h82 = Q(
    "h82_markov_transitions",
    """WITH r AS (
      |  SELECT user_id, event_type,
      |    lead(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS next_type
      |  FROM events),
      |t AS (
      |  SELECT event_type AS prev_type, next_type, count(*) AS cnt
      |  FROM r WHERE next_type IS NOT NULL GROUP BY 1, 2),
      |tt AS (SELECT prev_type, CAST(sum(cnt) AS BIGINT) AS prev_tot
      |  FROM t GROUP BY prev_type)
      |SELECT prev_type, next_type, CAST(cnt AS BIGINT) AS cnt,
      |  floor(CAST(cnt AS DOUBLE) / CAST(prev_tot AS DOUBLE)
      |    * 1000000 + 0.5) / 1000000 AS p
      |FROM t JOIN tt USING (prev_type)
      |ORDER BY prev_type, next_type""".stripMargin) { (s, d) =>
    Sequences.markovTransitions(Tables.events(s, d),
      "user_id", "ts", "event_id", "event_type")
      .orderBy("prev_type", "next_type")
  }

  /** Top-20 five-event entry paths across users — the frequent-sequence
    * read on the activity stream.
    */
  val h83 = Q(
    "h83_top_paths",
    """WITH r AS (
      |  SELECT user_id, event_type,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS rn
      |  FROM events),
      |p AS (
      |  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
      |  FROM r WHERE rn <= 5 GROUP BY user_id),
      |c AS (SELECT path, count(*) AS n_users FROM p GROUP BY path),
      |k AS (
      |  SELECT *, row_number() OVER (ORDER BY n_users DESC, path) AS rnk
      |  FROM c)
      |SELECT path, CAST(n_users AS BIGINT) AS n_users
      |FROM k WHERE rnk <= 20
      |ORDER BY n_users DESC, path""".stripMargin) { (s, d) =>
    Sequences.topPaths(Tables.events(s, d),
      "user_id", "ts", "event_id", "event_type", len = 5, k = 20)
  }

  /** Weekly cohort retention matrix over events, anchored at 2024-01-01
    * (anchored integer week math — no engine week-numbering conventions).
    */
  val h84 = Q(
    "h84_retention_cohorts",
    """WITH uw AS (
      |  SELECT DISTINCT user_id AS u,
      |    date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7 AS wk
      |  FROM events),
      |f AS (SELECT u, min(wk) AS cohort_week FROM uw GROUP BY u),
      |sz AS (SELECT cohort_week, count(*) AS cohort_size FROM f
      |  GROUP BY cohort_week),
      |m AS (
      |  SELECT f.cohort_week, uw.wk - f.cohort_week AS week_offset,
      |    count(*) AS n_users
      |  FROM uw JOIN f USING (u) GROUP BY 1, 2)
      |SELECT CAST(m.cohort_week AS BIGINT) AS cohort_week,
      |  CAST(week_offset AS BIGINT) AS week_offset,
      |  CAST(n_users AS BIGINT) AS n_users,
      |  CAST(cohort_size AS BIGINT) AS cohort_size,
      |  floor(CAST(n_users AS DOUBLE) / CAST(cohort_size AS DOUBLE)
      |    * 10000 + 0.5) / 10000 AS retention
      |FROM m JOIN sz USING (cohort_week)
      |ORDER BY cohort_week, week_offset""".stripMargin) { (s, d) =>
    Retention.cohortRetention(Tables.events(s, d), "user_id", "ts",
      "2024-01-01")
      .orderBy("cohort_week", "week_offset")
  }

  /** Two-step SCD2 evolution: the h73 merge (effective 2026-06-01)
    * followed by a second batch (effective 2026-09-01) that re-changes the
    * already-changed keys (closing versions the FIRST merge opened) and
    * changes a fresh key class (closing original versions). The oracle
    * replays both full-outer merges — the history-accumulation semantics a
    * single-merge test cannot see. The streaming composition (per-batch
    * scd2Merge through an exactly-once foreachBatch loop, h61's pattern)
    * is asserted equivalent in StreamingSpec.
    */
  val h85 = Q(
    "h85_scd2_evolution",
    """WITH snap AS (
      |  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
      |  FROM customer),
      |upd1 AS (
      |  SELECT c_custkey, c_name, c_nationkey, c_acctbal + 100.0 AS c_acctbal,
      |    'MOVED' AS c_mktsegment FROM snap WHERE c_custkey % 10 = 3
      |  UNION ALL
      |  SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment
      |  FROM snap WHERE c_custkey % 10 = 7
      |  UNION ALL
      |  SELECT c_custkey + 10000000, 'NEW ' || c_name, c_nationkey,
      |    c_acctbal, c_mktsegment FROM snap WHERE c_custkey % 97 = 0),
      |j1 AS (
      |  SELECT d.c_custkey AS dk, d.c_name AS dn, d.c_nationkey AS dnk,
      |    d.c_acctbal AS dab, d.c_mktsegment AS dms,
      |    u.c_custkey AS uk, u.c_name AS un, u.c_nationkey AS unk,
      |    u.c_acctbal AS uab, u.c_mktsegment AS ums,
      |    (d.c_custkey IS NOT NULL AND u.c_custkey IS NOT NULL AND NOT (
      |      d.c_name IS NOT DISTINCT FROM u.c_name AND
      |      d.c_nationkey IS NOT DISTINCT FROM u.c_nationkey AND
      |      d.c_acctbal IS NOT DISTINCT FROM u.c_acctbal AND
      |      d.c_mktsegment IS NOT DISTINCT FROM u.c_mktsegment)) AS chg
      |  FROM snap d FULL OUTER JOIN upd1 u ON d.c_custkey = u.c_custkey),
      |m1 AS (
      |  SELECT dk AS c_custkey, dn AS c_name, dnk AS c_nationkey,
      |    dab AS c_acctbal, dms AS c_mktsegment,
      |    '2026-01-01' AS valid_from, '2026-06-01' AS valid_to,
      |    false AS is_current
      |  FROM j1 WHERE chg
      |  UNION ALL
      |  SELECT uk, un, unk, uab, ums, '2026-06-01', NULL, true FROM j1 WHERE chg
      |  UNION ALL
      |  SELECT dk, dn, dnk, dab, dms, '2026-01-01', NULL, true
      |  FROM j1 WHERE dk IS NOT NULL AND NOT chg
      |  UNION ALL
      |  SELECT uk, un, unk, uab, ums, '2026-06-01', NULL, true
      |  FROM j1 WHERE dk IS NULL),
      |upd2 AS (
      |  SELECT c_custkey, c_name, c_nationkey, c_acctbal + 150.0 AS c_acctbal,
      |    'MOVED2' AS c_mktsegment FROM snap WHERE c_custkey % 10 = 3
      |  UNION ALL
      |  SELECT c_custkey, c_name, c_nationkey, c_acctbal, 'PROMO'
      |  FROM snap WHERE c_custkey % 10 = 4),
      |cur AS (SELECT * FROM m1 WHERE is_current),
      |hist AS (SELECT * FROM m1 WHERE NOT is_current),
      |j2 AS (
      |  SELECT d.c_custkey AS dk, d.c_name AS dn, d.c_nationkey AS dnk,
      |    d.c_acctbal AS dab, d.c_mktsegment AS dms, d.valid_from AS dvf,
      |    u.c_custkey AS uk, u.c_name AS un, u.c_nationkey AS unk,
      |    u.c_acctbal AS uab, u.c_mktsegment AS ums,
      |    (d.c_custkey IS NOT NULL AND u.c_custkey IS NOT NULL AND NOT (
      |      d.c_name IS NOT DISTINCT FROM u.c_name AND
      |      d.c_nationkey IS NOT DISTINCT FROM u.c_nationkey AND
      |      d.c_acctbal IS NOT DISTINCT FROM u.c_acctbal AND
      |      d.c_mktsegment IS NOT DISTINCT FROM u.c_mktsegment)) AS chg
      |  FROM cur d FULL OUTER JOIN upd2 u ON d.c_custkey = u.c_custkey),
      |m2 AS (
      |  SELECT dk AS c_custkey, dn AS c_name, dnk AS c_nationkey,
      |    dab AS c_acctbal, dms AS c_mktsegment,
      |    dvf AS valid_from, '2026-09-01' AS valid_to, false AS is_current
      |  FROM j2 WHERE chg
      |  UNION ALL
      |  SELECT uk, un, unk, uab, ums, '2026-09-01', NULL, true FROM j2 WHERE chg
      |  UNION ALL
      |  SELECT dk, dn, dnk, dab, dms, dvf, NULL, true
      |  FROM j2 WHERE dk IS NOT NULL AND NOT chg
      |  UNION ALL
      |  SELECT uk, un, unk, uab, ums, '2026-09-01', NULL, true
      |  FROM j2 WHERE dk IS NULL)
      |SELECT c_custkey, c_name, c_nationkey, c_acctbal, c_mktsegment,
      |  valid_from, valid_to, is_current
      |FROM (SELECT * FROM hist UNION ALL SELECT * FROM m2)
      |ORDER BY c_custkey, valid_from""".stripMargin) { (s, d) =>
    val snap = Tables.customer(s, d)
    val attrs = Seq("c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    val upd2 = snap.filter(col("c_custkey") % 10 === 3)
      .withColumn("c_acctbal", col("c_acctbal") + 150.0)
      .withColumn("c_mktsegment", lit("MOVED2"))
      .unionByName(snap.filter(col("c_custkey") % 10 === 4)
        .withColumn("c_mktsegment", lit("PROMO")))
    val m1 = Cdc.scd2Merge(Cdc.scd2Init(snap, "2026-01-01"),
      GroupH7.customerUpdates(snap), "c_custkey", attrs, "2026-06-01")
    Cdc.scd2Merge(m1, upd2, "c_custkey", attrs, "2026-09-01")
      .orderBy("c_custkey", "valid_from")
  }

  val all: Seq[Q] = Seq(h81, h82, h83, h84, h85)
}
