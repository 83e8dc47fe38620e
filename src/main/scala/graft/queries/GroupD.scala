package graft.queries

import graft.Tables
import graft.extensions.Det
import org.apache.spark.sql.functions._

/** Group D — joins (SURVEY.md §2.4 D). The reference's star schema implies
  * equi-joins on `customer_id`/`product_id` (reference
  * data_processing.py:325, ReadMe.md:22) but delegates execution; here they
  * are native Catalyst joins.
  *
  * Scale strategy (100 TB posture):
  *   - fact ⋈ small dim (part, nation, region) → explicit `broadcast()`:
  *     no shuffle of the fact side, ever.
  *   - fact ⋈ large dim (orders ⋈ customer at real scale) → leave strategy
  *     to Catalyst/AQE: sort-merge with both sides hash-partitioned on the
  *     key; AQE converts to broadcast when the built side is actually small.
  *   - semi/anti joins ship only the join keys of the build side.
  */
object GroupD {

  /** Fact ⋈ dimension inner join, aggregated per segment. */
  val d1 = Q(
    "d1_fact_dim_inner",
    """SELECT c_mktsegment, count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"), Det.exactSum(col("o_totalprice")).as("revenue"))
      .orderBy("c_mktsegment")
  }

  /** Explicit broadcast of a bounded dim (part: 200·sf rows — the analogue
    * of the reference's 900-product dim, SURVEY §7.4.11): the lineitem side
    * never shuffles.
    */
  val d2 = Q(
    "d2_broadcast_dim",
    """SELECT p_brand, count(*) AS n_lines,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n_lines"), Det.exactSum(col("l_quantity")).as("total_qty"))
      .orderBy("p_brand")
  }

  /** Left outer: customers keep rows with zero orders (count(o_orderkey)
    * skips nulls → 0 for order-less customers in both engines).
    */
  val d3 = Q(
    "d3_left_outer",
    """SELECT c_custkey, count(o_orderkey) AS n_orders
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("n_orders"))
      .orderBy("c_custkey")
  }

  /** Left semi ≙ EXISTS — only customer columns flow downstream; the build
    * side contributes nothing but its key set.
    */
  val d4 = Q(
    "d4_left_semi",
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Left anti ≙ NOT EXISTS. */
  val d5 = Q(
    "d5_left_anti",
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
      .orderBy("c_custkey")
  }

  /** Multiway star join: one shuffle-join chain lineitem→orders→customer,
    * then broadcast hops through the tiny nation/region hierarchy. This is
    * the canonical 100 TB plan: the two big tables co-shuffle once on the
    * orderkey, everything after is map-side.
    */
  val d6 = Q(
    "d6_multiway_star",
    """SELECT r_name, count(*) AS n_lines,
      |  floor(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) * 100 + 0.5) / 100 AS revenue
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |GROUP BY r_name
      |ORDER BY r_name""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n_lines"),
        Det.floorRound(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))).cast("decimal(18,4)")).cast("double"), 2).as("revenue"))
      .orderBy("r_name")
  }

  /** Full outer join of two aggregates with genuinely unmatched rows on
    * BOTH sides: per-user event counts (user ids are a prefix of the
    * customer key space) vs per-customer high-value order counts (a sparse
    * subset of all customers). At scale this is one co-partitioned
    * shuffle join of two pre-aggregated (already small) sides — the
    * aggregation-before-join ordering is the point: joining raw fact
    * tables first would shuffle every row.
    */
  val d7 = Q(
    "d7_full_outer",
    """WITH ev AS (
      |  SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id),
      |big AS (
      |  SELECT o_custkey, count(*) AS n_big_orders FROM orders
      |  WHERE o_totalprice > 400000 GROUP BY o_custkey)
      |SELECT coalesce(ev.user_id, big.o_custkey) AS key, n_events, n_big_orders
      |FROM ev FULL OUTER JOIN big ON ev.user_id = big.o_custkey
      |ORDER BY key""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d).groupBy("user_id")
      .agg(count(lit(1)).as("n_events"))
    val big = Tables.orders(s, d).filter(col("o_totalprice") > 400000)
      .groupBy("o_custkey").agg(count(lit(1)).as("n_big_orders"))
    ev.join(big, col("user_id") === col("o_custkey"), "full_outer")
      .select(coalesce(col("user_id"), col("o_custkey")).as("key"),
        col("n_events"), col("n_big_orders"))
      .orderBy("key")
  }

  /** Correlated LATERAL subquery with ORDER BY + LIMIT — per-nation top-2
    * customers by balance, through the delegated `spark.sql` surface (the
    * lateral shape e13's EXISTS forms don't cover). Catalyst decorrelates
    * the limit into a per-key rank — the plan is ONE equi join plus a
    * keyed window, never a per-outer-row re-execution; at 100 TB the
    * inner table shuffles once on the correlation key. `round()` on the
    * raw 2-dp balance is identity (Q contract).
    */
  val d8 = {
    val sql =
      """SELECT n.n_name, t.c_custkey, round(t.c_acctbal, 2) AS acctbal
        |FROM nation n,
        |LATERAL (SELECT c_custkey, c_acctbal FROM customer c
        |  WHERE c.c_nationkey = n.n_nationkey
        |  ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
        |ORDER BY n.n_name, acctbal DESC, t.c_custkey""".stripMargin
    Q("d8_lateral_topk", sql) { (s, d) =>
      Tables.nation(s, d).createOrReplaceTempView("nation")
      Tables.customer(s, d).createOrReplaceTempView("customer")
      s.sql(sql)
    }
  }

  val all: Seq[Q] = Seq(d1, d2, d3, d4, d5, d6, d7, d8)
}
