package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Group G — scalar function surface (SURVEY.md §2.4 G): string, date, math,
  * CASE, and JSON extraction. All whole-stage-codegen'd built-ins — no UDFs
  * anywhere (SURVEY §7.5), so these stay inside one codegen span over the
  * parquet scan.
  */
object GroupG {

  /** String functions: upper/lower/substr/concat/trim/length. */
  val g1 = Q(
    "g1_string_funcs",
    """SELECT c_custkey,
      |  upper(c_name) AS name_up,
      |  lower(c_mktsegment) AS seg_lo,
      |  substr(c_name, 1, 8) AS name_pfx,
      |  c_name || ':' || c_mktsegment AS name_seg,
      |  trim('  ' || c_name || ' ') AS name_trim,
      |  length(c_name) AS name_len
      |FROM customer
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    Tables.customer(s, d)
      .select(
        col("c_custkey"),
        upper(col("c_name")).as("name_up"),
        lower(col("c_mktsegment")).as("seg_lo"),
        substring(col("c_name"), 1, 8).as("name_pfx"),
        concat(col("c_name"), lit(":"), col("c_mktsegment")).as("name_seg"),
        trim(concat(lit("  "), col("c_name"), lit(" "))).as("name_trim"),
        length(col("c_name")).cast("long").as("name_len"))
      .orderBy("c_custkey")
  }

  /** Date/time functions: year/month/date_trunc/datediff on order dates. */
  val g2 = Q(
    "g2_date_funcs",
    """SELECT o_orderkey,
      |  year(o_orderdate) AS yr,
      |  month(o_orderdate) AS mo,
      |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
      |  date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin) { (s, d) =>
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("month_start"),
        datediff(lit("2002-01-01").cast("date"), col("o_orderdate").cast("date"))
          .cast("long").as("days_to_2002"))
      .orderBy("o_orderkey")
  }

  /** Math + CASE WHEN. discount_amt is emitted as integer cents via an
    * explicit floor(x*100 + 0.5) — Spark's round() decimalizes the shortest
    * string repr (623.295→623.30) while DuckDB rounds the binary value
    * (623.294999…→623.29); the shared floor formula is bit-identical in both.
    */
  val g3 = Q(
    "g3_math_case",
    """SELECT l_orderkey, l_linenumber,
      |  CAST(floor(l_extendedprice * l_discount * 100 + 0.5) AS BIGINT) AS discount_cents,
      |  round(abs(l_discount - 0.05), 4) AS disc_dev,
      |  CASE WHEN l_quantity >= 40 THEN 'bulk'
      |       WHEN l_quantity >= 15 THEN 'mid'
      |       ELSE 'small' END AS qty_class
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber""".stripMargin) { (s, d) =>
    Tables.lineitem(s, d)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        floor(col("l_extendedprice") * col("l_discount") * 100 + 0.5)
          .cast("long").as("discount_cents"),
        round(abs(col("l_discount") - 0.05), 4).as("disc_dev"),
        when(col("l_quantity") >= 40, "bulk")
          .when(col("l_quantity") >= 15, "mid")
          .otherwise("small").as("qty_class"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** JSON extraction from the `events.props` JSON-string column. */
  val g4 = Q(
    "g4_json_extract",
    """SELECT event_id,
      |  props->>'$.k' AS k_str,
      |  CAST(props->>'$.k' AS BIGINT) AS k_num
      |FROM events
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .select(
        col("event_id"),
        get_json_object(col("props"), "$.k").as("k_str"),
        get_json_object(col("props"), "$.k").cast("bigint").as("k_num"))
      .orderBy("event_id")
  }

  /** Edit distance (classic Levenshtein DP — identical integer results in
    * every engine): the standard fuzzy-match scalar for name/record
    * deduplication, here scoring how far each part's type string is from
    * its container label.
    */
  val g5 = Q(
    "g5_edit_distance",
    """SELECT p_partkey,
      |  CAST(levenshtein(lower(p_name), lower(p_type)) AS BIGINT) AS name_type_dist,
      |  CAST(levenshtein(lower(p_brand), lower(p_type)) AS BIGINT) AS brand_type_dist
      |FROM part
      |ORDER BY p_partkey""".stripMargin) { (s, d) =>
    Tables.part(s, d)
      .select(col("p_partkey"),
        levenshtein(lower(col("p_name")), lower(col("p_type"))).cast("long")
          .as("name_type_dist"),
        levenshtein(lower(col("p_brand")), lower(col("p_type"))).cast("long")
          .as("brand_type_dist"))
      .orderBy("p_partkey")
  }

  /** Regex scalar pair — capture-group extraction + boolean match — on the
    * raw JSON props string, restricted to the Java↔RE2-identical regex
    * subset (same posture as the h29 scrubber: character classes,
    * quantifiers, one capture group; no lookaround or backrefs, which RE2
    * engines reject and Java accepts). `regexp_extract` of a failed match
    * is the empty string in both engines.
    */
  val g6 = Q(
    "g6_regex_extract",
    """SELECT event_id,
      |  regexp_extract(props, '"k":\s*([0-9]+)', 1) AS k_digits,
      |  CASE WHEN regexp_matches(props, '[0-9]{2,}') THEN 1 ELSE 0 END AS has_multidigit
      |FROM events
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    Tables.events(s, d)
      .select(col("event_id"),
        regexp_extract(col("props"), "\"k\":\\s*([0-9]+)", 1).as("k_digits"),
        when(col("props").rlike("[0-9]{2,}"), 1).otherwise(0).as("has_multidigit"))
      .orderBy("event_id")
  }

  val all: Seq[Q] = Seq(g1, g2, g3, g4, g5, g6)
}
