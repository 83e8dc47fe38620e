package graft.queries

import graft.Tables
import graft.extensions.{Det, Segmentation, Stats}
import org.apache.spark.sql.functions._

/** Group H (continued) — round-6 batch 7: customer-base segmentation and
  * market-concentration analytics over the transactional star. The scale
  * story is [[graft.extensions.Ranking]]'s two-phase global ordering: none
  * of these queries ever puts corpus-sized data through a single-partition
  * window, while the oracles use the plain global-window SQL DuckDB can
  * afford at oracle scale.
  */
object GroupH11 {

  /** RFM quintile segmentation of the customer base as of the day after
    * the fixture's last order date (Segmentation.rfmSegments). The oracle
    * is the textbook `ntile(5) OVER (ORDER BY …)` triple; the Spark side
    * computes identical buckets from two-phase global ranks in pure
    * integer math — no corpus-sized single-partition window.
    */
  val h89 = Q(
    "h89_rfm_segments",
    """WITH m AS (
      |  SELECT o_custkey AS entity_id,
      |    date_diff('day', CAST(max(o_orderdate) AS DATE),
      |      DATE '1998-12-01') AS recency_days,
      |    count(*) AS frequency,
      |    sum(CAST(o_totalprice AS DECIMAL(18,2))) AS mon
      |  FROM orders GROUP BY o_custkey),
      |s AS (
      |  SELECT *,
      |    CAST(ntile(5) OVER (ORDER BY recency_days DESC, entity_id) AS INTEGER) AS r_score,
      |    CAST(ntile(5) OVER (ORDER BY frequency, entity_id) AS INTEGER) AS f_score,
      |    CAST(ntile(5) OVER (ORDER BY mon, entity_id) AS INTEGER) AS m_score
      |  FROM m)
      |SELECT entity_id, CAST(recency_days AS INTEGER) AS recency_days,
      |  frequency, CAST(mon AS DOUBLE) AS monetary,
      |  r_score, f_score, m_score,
      |  r_score * 100 + f_score * 10 + m_score AS rfm
      |FROM s ORDER BY entity_id""".stripMargin) { (s, d) =>
    Segmentation.rfmSegments(Tables.orders(s, d),
        "o_custkey", "o_orderdate", "o_totalprice", "1998-12-01")
      .orderBy("entity_id")
  }

  /** Pareto/ABC classification of parts by lifetime revenue
    * (Segmentation.paretoAbc): cumulative-share classes at 80%/95%,
    * reported at class grain. The running decimal sum is two-phase
    * (range-partition + prefix offsets); the oracle's `ROWS UNBOUNDED
    * PRECEDING` window over the same unique order produces the identical
    * exact decimals, so the class boundaries agree bit-for-bit.
    */
  val h90 = Q(
    "h90_pareto_abc",
    """WITH rev AS (
      |  SELECT l_partkey AS key,
      |    sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS v
      |  FROM lineitem GROUP BY l_partkey),
      |t AS (SELECT sum(v) AS tot FROM rev),
      |r AS (
      |  SELECT key, v, tot,
      |    sum(v) OVER (ORDER BY v DESC, key ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM rev, t),
      |c AS (
      |  SELECT key, v, tot,
      |    CASE WHEN CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) <= 0.80 THEN 'A'
      |         WHEN CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE) <= 0.95 THEN 'B'
      |         ELSE 'C' END AS abc_class
      |  FROM r)
      |SELECT abc_class, count(*) AS n_parts,
      |  CAST(sum(v) AS DOUBLE) AS class_value,
      |  floor(CAST(sum(v) AS DOUBLE) / CAST(max(tot) AS DOUBLE) * 1000000 + 0.5)
      |    / 1000000 AS value_share
      |FROM c GROUP BY abc_class ORDER BY abc_class""".stripMargin) { (s, d) =>
    val rev = Tables.lineitem(s, d)
      .groupBy(col("l_partkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as("v"))
    Segmentation.paretoAbc(rev, "l_partkey", col("v"))
      .groupBy("abc_class")
      .agg(count(lit(1)).as("n_parts"),
        sum("value_dec").as("_cv"), max("total_dec").as("_t"))
      .select(col("abc_class"), col("n_parts"),
        col("_cv").cast("double").as("class_value"),
        Det.floorRound(col("_cv").cast("double") / col("_t").cast("double"), 6)
          .as("value_share"))
      .orderBy("abc_class")
  }

  /** Supplier-revenue concentration per nation (Stats.concentration):
    * Herfindahl–Hirschman index and Gini coefficient from exact decimal
    * moment sums — the "is this market captured by few suppliers" screen.
    * Every sum is order-independent decimal arithmetic; HHI and Gini are
    * one final IEEE division each, so both engines agree bit-for-bit.
    */
  val h91 = Q(
    "h91_concentration",
    """WITH rev AS (
      |  SELECT l_suppkey, sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS v
      |  FROM lineitem GROUP BY l_suppkey),
      |j AS (
      |  SELECT n_name, s_suppkey AS key, v
      |  FROM rev JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey),
      |r AS (
      |  SELECT n_name, key, v, row_number() OVER (
      |    PARTITION BY n_name ORDER BY v, key) AS rk
      |  FROM j)
      |SELECT n_name, count(*) AS n_entities,
      |  CAST(sum(v) AS DOUBLE) AS total_value,
      |  floor(CAST(sum(v * v) AS DOUBLE)
      |    / (CAST(sum(v) AS DOUBLE) * CAST(sum(v) AS DOUBLE))
      |    * 1000000 + 0.5) / 1000000 AS hhi,
      |  floor(CAST(2 * sum(rk * v) - (count(*) + 1) * sum(v) AS DOUBLE)
      |    / CAST(count(*) * sum(v) AS DOUBLE)
      |    * 1000000 + 0.5) / 1000000 AS gini
      |FROM r GROUP BY n_name ORDER BY n_name""".stripMargin) { (s, d) =>
    val rev = Tables.lineitem(s, d)
      .groupBy(col("l_suppkey"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as("v"))
    val perSupplier = rev
      .join(broadcast(Tables.supplier(s, d)),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("s_suppkey").as("key"), col("v"))
    Stats.concentration(perSupplier, "n_name", "v", "key")
      .select(col("n_name"), col("n_entities"), col("total_value"),
        Det.floorRound(col("hhi"), 6).as("hhi"),
        Det.floorRound(col("gini"), 6).as("gini"))
      .orderBy("n_name")
  }

  val all: Seq[Q] = Seq(h89, h90, h91)
}
