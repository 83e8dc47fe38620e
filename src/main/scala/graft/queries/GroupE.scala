package graft.queries

import graft.Tables
import graft.extensions.Det
import org.apache.spark.sql.functions._

/** Group E — aggregations (SURVEY.md §2.4 E).
  *
  * The reference delegates all aggregation to external SQL engines
  * (reference `ReadMe.md:85-94`); here they are native Catalyst
  * `HashAggregateExec` plans. All aggregates run partial (map-side) then
  * final after a shuffle on the grouping keys — the shape that scales
  * linearly with input at 100 TB because only partial states shuffle.
  */
object GroupE {

  /** TPC-H Q1 shape: scan→filter→hash-agg→sort. The filter and the 7-column
    * projection both push into the parquet scan (verified via explain:
    * PushedFilters + ReadSchema).
    *
    * Money sums run on DECIMAL: the source columns are exact 2-dp values, so
    * decimal sums are exact integer arithmetic — order-independent, hence
    * identical across engines, partitionings, AND data scales (a double sum
    * re-ordered by partial aggregation drifts by ~n·|x|·ε, which at 1e12-row
    * groups exceeds the 0.005 the display rounding can absorb). Averages
    * derive from the exact sums and round via floor(x·10⁴+0.5)/10⁴, which is
    * deterministic on identical doubles — `round()` is not: Spark rounds the
    * shortest decimal repr, DuckDB the binary value (observed divergence in
    * e6 before its fix).
    */
  val e1 = Q(
    "e1_groupby_sum_avg",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  floor(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) * 100 + 0.5) / 100 AS sum_disc_price,
      |  floor(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) * 10000 + 0.5) / 10000 AS avg_qty,
      |  floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) * 10000 + 0.5) / 10000 AS avg_price,
      |  floor(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*) * 10000 + 0.5) / 10000 AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, d) =>
    val qty = Det.exactSum(col("l_quantity"))
    val price = Det.exactSum(col("l_extendedprice"))
    val disc = Det.exactSum(col("l_discount"))
    val n = count(lit(1))
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        qty.as("sum_qty"),
        price.as("sum_base_price"),
        Det.floorRound(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
          .cast("decimal(18,4)")).cast("double"), 2).as("sum_disc_price"),
        Det.floorRound(qty / n, 4).as("avg_qty"),
        Det.floorRound(price / n, 4).as("avg_price"),
        Det.floorRound(disc / n, 4).as("avg_disc"),
        n.as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** count(distinct) — Catalyst expands to a two-phase aggregate; at scale the
    * distinct keys shuffle once (Expand + partial agg), never collect().
    */
  val e2 = Q(
    "e2_count_distinct",
    """SELECT l_returnflag,
      |  count(DISTINCT l_partkey) AS n_parts,
      |  count(DISTINCT l_suppkey) AS n_supps,
      |  count(*) AS n_rows
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        count(lit(1)).as("n_rows"))
      .orderBy("l_returnflag")
  }

  /** ROLLUP over nation→region hierarchy (customer ⋈ nation ⋈ region).
    * Dims are tiny (25 / 5 rows) → broadcast joins, no shuffle for the join.
    */
  val e3 = Q(
    "e3_rollup",
    """SELECT n_name, r_name,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal,
      |  count(*) AS n_cust
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)
      |ORDER BY n_name NULLS FIRST, r_name NULLS FIRST""".stripMargin) { (s, d) =>
    // Spark 4's DetectAmbiguousSelfJoin misfires on rollup-over-join (the
    // Expand duplicates child attributes); the plan is genuinely unambiguous
    // (customer/nation/region are distinct relations). Analysis is eager at
    // Dataset construction, so the lint is disabled only for the duration of
    // this builder and the previous value restored — no session-wide leak.
    val key = "spark.sql.analyzer.failAmbiguousSelfJoin"
    val prev = s.conf.getOption(key)
    s.conf.set(key, "false")
    try {
      Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .select("r_name", "n_name", "c_acctbal")
        .rollup("r_name", "n_name")
        .agg(Det.exactSum(col("c_acctbal")).as("total_bal"), count(lit(1)).as("n_cust"))
        .select("n_name", "r_name", "total_bal", "n_cust")
        .orderBy(col("n_name").asc_nulls_first, col("r_name").asc_nulls_first)
    } finally prev match {
      case Some(v) => s.conf.set(key, v)
      case None    => s.conf.unset(key)
    }
  }

  /** CUBE on two low-cardinality order attributes. */
  val e4 = Q(
    "e4_cube",
    """SELECT o_orderstatus, o_orderpriority,
      |  count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .cube("o_orderstatus", "o_orderpriority")
      .agg(count(lit(1)).as("n_orders"), Det.exactSum(col("o_totalprice")).as("total_price"))
      .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
  }

  /** GROUP BY … HAVING — the HAVING predicate runs post-aggregate (cheap)
    * while the aggregate itself stays partial+final.
    */
  val e5 = Q(
    "e5_having",
    """SELECT o_custkey, count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
      |FROM orders
      |GROUP BY o_custkey
      |HAVING count(*) >= 8
      |ORDER BY o_custkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("n_orders"), Det.exactSum(col("o_totalprice")).as("spend"))
      .filter(col("n_orders") >= 8)
      .orderBy("o_custkey")
  }

  /** Exact interpolated percentiles per group. The oracle does NOT use
    * DuckDB's `quantile_cont`: its interpolation arithmetic differs from
    * Spark's `lower + (higher-lower)*frac` in the last ulp, which flips a
    * cent exactly at a .xx5 rounding boundary (observed at sf0.001). The
    * oracle instead picks the two bounding order statistics by row_number
    * and applies literally Spark's formula — identical IEEE ops → identical
    * doubles. (Engine-specific approx sketches can never cross-match at all.)
    */
  val e6 = Q(
    "e6_percentiles",
    """WITH ranked AS (
      |  SELECT l_returnflag AS flag, l_extendedprice AS v,
      |    row_number() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice) - 1 AS idx,
      |    count(*) OVER (PARTITION BY l_returnflag) AS n
      |  FROM lineitem),
      |pick AS (
      |  SELECT flag, n,
      |    max(CASE WHEN idx = CAST(floor(0.25*(n-1)) AS BIGINT) THEN v END) AS lo25,
      |    max(CASE WHEN idx = CAST(ceil(0.25*(n-1)) AS BIGINT) THEN v END) AS hi25,
      |    max(CASE WHEN idx = CAST(floor(0.5*(n-1)) AS BIGINT) THEN v END) AS lo50,
      |    max(CASE WHEN idx = CAST(ceil(0.5*(n-1)) AS BIGINT) THEN v END) AS hi50,
      |    max(CASE WHEN idx = CAST(floor(0.9*(n-1)) AS BIGINT) THEN v END) AS lo90,
      |    max(CASE WHEN idx = CAST(ceil(0.9*(n-1)) AS BIGINT) THEN v END) AS hi90
      |  FROM ranked GROUP BY flag, n)
      |SELECT flag AS l_returnflag,
      |  floor((lo25 + (hi25 - lo25) * (0.25*(n-1) - floor(0.25*(n-1)))) * 100 + 0.5) / 100 AS p25,
      |  floor((lo50 + (hi50 - lo50) * (0.5*(n-1) - floor(0.5*(n-1)))) * 100 + 0.5) / 100 AS p50,
      |  floor((lo90 + (hi90 - lo90) * (0.9*(n-1) - floor(0.9*(n-1)))) * 100 + 0.5) / 100 AS p90,
      |  n
      |FROM pick
      |ORDER BY l_returnflag""".stripMargin) { (s, d) =>
    // one array-percentile aggregate: a single per-group value buffer serves
    // all three quantiles (three scalar percentile() calls each build their
    // own state — measured 3× the cost at sf0.1)
    Tables.lineitem(s, d)
      .groupBy("l_returnflag")
      .agg(
        expr("percentile(l_extendedprice, array(0.25D, 0.5D, 0.9D))").as("__ps"),
        count(lit(1)).as("n"))
      .select(
        col("l_returnflag"),
        (floor(element_at(col("__ps"), 1) * 100 + 0.5) / 100).as("p25"),
        (floor(element_at(col("__ps"), 2) * 100 + 0.5) / 100).as("p50"),
        (floor(element_at(col("__ps"), 3) * 100 + 0.5) / 100).as("p90"),
        col("n"))
      .orderBy("l_returnflag")
  }

  /** Pivot on a known low-cardinality domain (event_type) — Spark's
    * `groupBy().pivot(values)` with explicit values (no extra
    * domain-discovery job); oracle is the equivalent conditional-sum spread.
    */
  val e7 = Q(
    "e7_pivot_event_types",
    """SELECT user_id,
      |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
      |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
      |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
      |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
      |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { (s, d) =>
    val types = Seq("click", "error", "purchase", "signup", "view")
    Tables.events(s, d)
      .groupBy("user_id")
      .pivot("event_type", types)
      .count()
      .na.fill(0L, types)
      .select(col("user_id") +: types.map(t => col(t).cast("long").as(t)): _*)
      .orderBy("user_id")
  }

  /** TPC-H Q17-shape correlated scalar subquery, run through the delegated
    * SQL surface (`spark.sql` over temp views — the reference's promise at
    * `ReadMe.md:85-94` is full analytical SQL on the lakehouse tables).
    * Catalyst decorrelates the per-part average into one grouped aggregate
    * joined back (PlanSpec pins the rewrite: no per-row subquery node
    * survives in the physical plan). Inner and outer money math follow the
    * exact-decimal contract so both engines agree bit-for-bit.
    */
  val e8 = Q(
    "e8_correlated_scalar_subquery",
    """SELECT floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
      |        / 7.0 * 100 + 0.5) / 100 AS avg_yearly,
      |  count(*) AS n_rows
      |FROM lineitem l
      |JOIN part p ON p.p_partkey = l.l_partkey
      |WHERE p.p_size <= 15
      |  AND l.l_quantity < (
      |    SELECT CAST(0.2 AS DOUBLE) *
      |      (CAST(sum(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*))
      |    FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem")
    Tables.part(s, d).createOrReplaceTempView("part")
    s.sql(
      """SELECT floor(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |        / 7.0 * 100 + 0.5) / 100 AS avg_yearly,
        |  count(*) AS n_rows
        |FROM lineitem l
        |JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE p.p_size <= 15
        |  AND l.l_quantity < (
        |    SELECT CAST(0.2 AS DOUBLE) *
        |      (CAST(sum(CAST(l2.l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*))
        |    FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey)""".stripMargin)
  }

  /** Nested IN-subqueries (orders ← customers ← nations): Catalyst plans
    * them as left-semi joins (PlanSpec-pinned), never a per-row probe.
    */
  val e9 = Q(
    "e9_in_subquery",
    """SELECT o_orderpriority, count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
      |FROM orders
      |WHERE o_custkey IN (
      |  SELECT c_custkey FROM customer
      |  WHERE c_acctbal > 5000.0 AND c_nationkey IN (
      |    SELECT n_nationkey FROM nation WHERE n_regionkey <= 2))
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, d) =>
    Tables.orders(s, d).createOrReplaceTempView("orders")
    Tables.customer(s, d).createOrReplaceTempView("customer")
    Tables.nation(s, d).createOrReplaceTempView("nation")
    s.sql(
      """SELECT o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
        |FROM orders
        |WHERE o_custkey IN (
        |  SELECT c_custkey FROM customer
        |  WHERE c_acctbal > 5000.0 AND c_nationkey IN (
        |    SELECT n_nationkey FROM nation WHERE n_regionkey <= 2))
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
  }

  /** Explicit GROUPING SETS — the general form rollup (e3) and cube (e4)
    * are sugar for: per-(segment, priority) cells, per-priority subtotals,
    * and the grand total, in one Expand + single aggregation pass (no
    * re-reading the fact per set).
    */
  val e10 = {
    val sql =
      """SELECT c_mktsegment, o_orderpriority, count(*) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |GROUP BY GROUPING SETS ((c_mktsegment, o_orderpriority), (o_orderpriority), ())
        |ORDER BY c_mktsegment NULLS FIRST, o_orderpriority NULLS FIRST""".stripMargin
    Q("e10_grouping_sets", sql) { (s, d) =>
      Tables.orders(s, d).createOrReplaceTempView("orders")
      Tables.customer(s, d).createOrReplaceTempView("customer")
      s.sql(sql)
    }
  }

  /** Pearson correlation from EXACT sums — the determinism-contract answer
    * to `corr()` (whose running-moment doubles are aggregation-order
    * dependent and engine-internal): all six moments are exact integer/
    * decimal aggregates (order-independent), the correlation is one final
    * double formula over them — identical IEEE ops in identical order in
    * every engine (sqrt is correctly rounded per IEEE-754). At 100 TB this
    * is also the mergeable form: partial moment sums combine exactly.
    */
  val e11 = Q(
    "e11_exact_corr",
    """WITH a AS (
      |  SELECT event_type, count(*) AS n,
      |    CAST(sum(CAST(hour(ts) AS BIGINT)) AS BIGINT) AS sx,
      |    CAST(sum(CAST(hour(ts) AS BIGINT) * CAST(hour(ts) AS BIGINT)) AS BIGINT) AS sxx,
      |    sum(CAST(value AS DECIMAL(18,2))) AS sy,
      |    sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS syy,
      |    sum(CAST(value AS DECIMAL(18,2)) * CAST(hour(ts) AS DECIMAL(10,0))) AS sxy
      |  FROM events GROUP BY event_type)
      |SELECT event_type, n,
      |  floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |    / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |         * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
      |    * 1000000.0 + 0.5) / 1000000.0 AS corr_hour_value
      |FROM a ORDER BY event_type""".stripMargin) { (s, d) =>
    val x = hour(col("ts")).cast("long")
    val y = col("value").cast("decimal(18,2)")
    val a = Tables.events(s, d).groupBy("event_type").agg(
      count(lit(1)).as("n"),
      sum(x).as("sx"),
      sum(x * x).as("sxx"),
      sum(y).as("sy"),
      sum(y * y).as("syy"),
      sum(y * hour(col("ts")).cast("decimal(10,0)")).as("sxy"))
    def dbl(c: String) = col(c).cast("double")
    val num = dbl("n") * dbl("sxy") - dbl("sx") * dbl("sy")
    val den = sqrt((dbl("n") * dbl("sxx") - dbl("sx") * dbl("sx")) *
      (dbl("n") * dbl("syy") - dbl("sy") * dbl("sy")))
    a.select(col("event_type"), col("n"),
      Det.floorRound(num / den, 6).as("corr_hour_value"))
      .orderBy("event_type")
  }

  /** Z-score tail detection from exact moment sums: per-type mean/sd are
    * double formulas over exact decimal aggregates (deterministic, unlike
    * stddev's running doubles), broadcast-joined back, and rows beyond
    * +2.5σ emitted with their score. The value distribution is
    * exponential-shaped, so only the high tail exists.
    */
  val e12 = Q(
    "e12_zscore_outliers",
    """WITH s AS (
      |  SELECT event_type, count(*) AS n,
      |    sum(CAST(value AS DECIMAL(18,2))) AS sy,
      |    sum(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS syy
      |  FROM events GROUP BY event_type),
      |st AS (
      |  SELECT event_type,
      |    CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
      |    sqrt(CAST(syy AS DOUBLE) / CAST(n AS DOUBLE)
      |       - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))) AS sd
      |  FROM s)
      |SELECT e.event_id, e.event_type, round(e.value, 2) AS value,
      |  floor((CAST(e.value AS DOUBLE) - st.mean) / st.sd * 10000 + 0.5) / 10000 AS z
      |FROM events e JOIN st ON e.event_type = st.event_type
      |WHERE (CAST(e.value AS DOUBLE) - st.mean) / st.sd > 2.5
      |ORDER BY e.event_id""".stripMargin) { (s, d) =>
    val y = col("value").cast("decimal(18,2)")
    val stats = Tables.events(s, d).groupBy("event_type").agg(
      count(lit(1)).as("n"), sum(y).as("sy"), sum(y * y).as("syy"))
    def dbl(c: String) = col(c).cast("double")
    val mean = (dbl("sy") / dbl("n")).as("mean")
    val sd = sqrt(dbl("syy") / dbl("n") -
      (dbl("sy") / dbl("n")) * (dbl("sy") / dbl("n"))).as("sd")
    val st = stats.select(col("event_type"), mean, sd)
    val z = (col("value").cast("double") - col("mean")) / col("sd")
    Tables.events(s, d).join(broadcast(st), "event_type")
      .filter(z > 2.5)
      .select(col("event_id"), col("event_type"),
        round(col("value"), 2).as("value"), Det.floorRound(z, 4).as("z"))
      .orderBy("event_id")
  }

  /** EXISTS + NOT EXISTS correlated subqueries through the delegated SQL
    * surface — the remaining decorrelation shapes next to e8's scalar and
    * e9's IN forms. Catalyst plans EXISTS as a left-semi and NOT EXISTS as
    * a left-anti join (PlanSpec pins both; no per-row probe survives):
    * customers holding an urgent order but no high-value one.
    */
  val e13 = {
    val sql =
      """SELECT c_custkey, c_name, round(c_acctbal, 2) AS acctbal
        |FROM customer c
        |WHERE EXISTS (
        |    SELECT 1 FROM orders o
        |    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders o2
        |    WHERE o2.o_custkey = c.c_custkey AND o2.o_totalprice > 300000.0)
        |ORDER BY c_custkey""".stripMargin
    Q("e13_exists_subquery", sql) { (s, d) =>
      Tables.customer(s, d).createOrReplaceTempView("customer")
      Tables.orders(s, d).createOrReplaceTempView("orders")
      s.sql(sql)
    }
  }

  /** Wide→long reshape (melt / UNPIVOT) of a per-nation supplier rollup —
    * the inverse of e7's pivot, via the native `Dataset.unpivot` (Catalyst
    * `Expand`: each input row emits one row per metric in a single
    * projection, no shuffle beyond the rollup's own aggregate exchange; at
    * 100 TB the reshape is free relative to the aggregate). The oracle is
    * the portable UNION ALL formulation. All three metrics are cast to
    * double before unpivoting (UNPIVOT requires a common value type):
    * the decimal-exact balance sum, the count, and a comparison-based max.
    */
  val e14 = Q(
    "e14_unpivot_metrics",
    """WITH agg AS (
      |  SELECT n.n_name,
      |    CAST(sum(CAST(s.s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_bal,
      |    CAST(count(*) AS DOUBLE) AS n_supp,
      |    max(s.s_acctbal) AS max_bal
      |  FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
      |  GROUP BY n.n_name)
      |SELECT n_name, metric, val FROM (
      |  SELECT n_name, 'max_bal' AS metric, max_bal AS val FROM agg
      |  UNION ALL
      |  SELECT n_name, 'n_supp', n_supp FROM agg
      |  UNION ALL
      |  SELECT n_name, 'total_bal', total_bal FROM agg)
      |ORDER BY n_name, metric""".stripMargin) { (s, d) =>
    Tables.supplier(s, d)
      .join(Tables.nation(s, d), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(
        sum(col("s_acctbal").cast("decimal(18,2)")).cast("double")
          .as("total_bal"),
        count(lit(1)).cast("double").as("n_supp"),
        max("s_acctbal").as("max_bal"))
      .unpivot(Array(col("n_name")),
        Array(col("max_bal"), col("n_supp"), col("total_bal")),
        "metric", "val")
      .orderBy("n_name", "metric")
  }

  /** TPC-H Q3 (shipping priority) shape through the engine: selective
    * dim filter broadcast into a two-join star, revenue as the exact
    * decimal `extprice·(1−discount)` sum, global top-10 by (revenue desc,
    * date, key) — which must plan as TakeOrderedAndProject (per-partition
    * heap + driver merge of 10 rows), never a full global sort. Revenue
    * doubles order identically in both engines because they render the
    * same exact decimals.
    */
  val e15 = Q(
    "e15_topn_join_agg",
    """SELECT l_orderkey,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))
      |    * (1 - CAST(l_discount AS DECIMAL(3,2)))) AS DOUBLE) AS revenue,
      |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate_s,
      |  o_orderpriority
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1996-06-01'
      |  AND l_shipdate > TIMESTAMP '1996-06-01'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, orderdate_s, l_orderkey
      |LIMIT 10""".stripMargin) { (s, d) =>
    Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
      .join(Tables.orders(s, d)
        .filter(col("o_orderdate") < lit("1996-06-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.lineitem(s, d)
        .filter(col("l_shipdate") > lit("1996-06-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(sum(col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1) - col("l_discount").cast("decimal(3,2)"))).cast("double")
        .as("revenue"))
      .select(col("l_orderkey"), col("revenue"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate_s"),
        col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("orderdate_s"), col("l_orderkey"))
      .limit(10)
  }

  val all: Seq[Q] =
    Seq(e1, e2, e3, e4, e5, e6, e7, e8, e9, e10, e11, e12, e13, e14, e15)
}
