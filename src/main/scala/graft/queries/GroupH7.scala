package graft.queries

import graft.Tables
import graft.extensions.{Cdc, Layout, Linkage, Sketches}
import org.apache.spark.sql.functions._

/** Group H (continued) — round-6 batch 2: lakehouse table-maintenance and
  * estimation operators. SCD2 merge (the incremental alternative to the
  * reference's nightly dimension overwrite), blocked fuzzy record linkage,
  * count-min-sketch frequency estimation, and z-order layout stats for
  * multi-dimensional file skipping. Scale notes live on the extension
  * objects; every query follows the Q determinism contract.
  */
object GroupH7 {

  /** The deterministic customer update batch shared by h73/h81: keys ≡3
    * (mod 10) changed (acctbal +100, segment MOVED), keys ≡7 (mod 10)
    * identical no-ops, keys ≡0 (mod 97) shifted +10M as inserts.
    */
  private[queries] def customerUpdates(snap: org.apache.spark.sql.DataFrame) =
    snap.filter(col("c_custkey") % 10 === 3)
      .withColumn("c_acctbal", col("c_acctbal") + 100.0)
      .withColumn("c_mktsegment", lit("MOVED"))
      .unionByName(snap.filter(col("c_custkey") % 10 === 7))
      .unionByName(snap.filter(col("c_custkey") % 97 === 0)
        .withColumn("c_custkey", col("c_custkey") + 10000000L)
        .withColumn("c_name", concat(lit("NEW "), col("c_name"))))

  /** SCD2 merge of a deterministic update batch into the customer
    * dimension: keys ≡3 (mod 10) arrive changed (acctbal +100, segment
    * MOVED) → close + reopen; keys ≡7 (mod 10) arrive identical → no-op
    * (idempotence path); keys ≡0 (mod 97) arrive shifted +10M → inserts.
    * The oracle replays the full-outer merge case-by-case.
    */
  val h73 = Q(
    "h73_scd2_merge",
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
      |  FROM snap d FULL OUTER JOIN upd u ON d.c_custkey = u.c_custkey)
      |SELECT dk AS c_custkey, dn AS c_name, dnk AS c_nationkey,
      |  dab AS c_acctbal, dms AS c_mktsegment, '2026-01-01' AS valid_from,
      |  '2026-06-01' AS valid_to, false AS is_current
      |FROM j WHERE chg
      |UNION ALL
      |SELECT uk, un, unk, uab, ums, '2026-06-01', NULL, true FROM j WHERE chg
      |UNION ALL
      |SELECT dk, dn, dnk, dab, dms, '2026-01-01', NULL, true
      |FROM j WHERE dk IS NOT NULL AND NOT chg
      |UNION ALL
      |SELECT uk, un, unk, uab, ums, '2026-06-01', NULL, true
      |FROM j WHERE dk IS NULL
      |ORDER BY c_custkey, valid_from""".stripMargin) { (s, d) =>
    val snap = Tables.customer(s, d)
    val attrs = Seq("c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    Cdc.scd2Merge(Cdc.scd2Init(snap, "2026-01-01"), customerUpdates(snap),
      "c_custkey", attrs, "2026-06-01")
      .orderBy("c_custkey", "valid_from")
  }

  /** Blocked fuzzy record linkage over part names: candidates restricted
    * to (p_type, p_size) blocks, levenshtein ≤ 4 verify on the joined
    * stream — the Σ|block|² two-phase shape, never |n|².
    */
  val h74 = Q(
    "h74_blocked_fuzzy_match",
    """SELECT a.p_partkey AS id_a, b.p_partkey AS id_b, a.p_type, a.p_size,
      |  a.p_name AS name_a, b.p_name AS name_b,
      |  CAST(levenshtein(lower(a.p_name), lower(b.p_name)) AS BIGINT) AS dist
      |FROM part a JOIN part b ON a.p_type = b.p_type
      |  AND a.p_size = b.p_size AND a.p_partkey < b.p_partkey
      |WHERE levenshtein(lower(a.p_name), lower(b.p_name)) <= 4
      |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
    Linkage.blockedFuzzyPairs(Tables.part(s, d), "p_partkey", "p_name",
      Seq("p_type", "p_size"), maxDist = 4)
      .orderBy("id_a", "id_b")
  }

  /** Count-min sketch (4×256, md5-derived buckets) over document tokens:
    * exact top-20 heavy hitters with their sketch estimates and the
    * one-sided overestimate. The oracle rebuilds the identical sketch.
    */
  val h75 = Q(
    "h75_count_min_hitters",
    """WITH toks AS (
      |  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |                            t -> len(t) > 0)) AS tok
      |  FROM documents),
      |js AS (SELECT unnest(generate_series(0, 3)) AS j),
      |cells AS (
      |  SELECT j,
      |    CAST('0x' || substr(md5(concat(j, ':', tok)), 1, 4) AS BIGINT)
      |      % 256 AS bucket,
      |    count(*) AS cnt
      |  FROM toks CROSS JOIN js GROUP BY 1, 2),
      |top AS (
      |  SELECT tok, cnt AS exact_cnt FROM (
      |    SELECT tok, count(*) AS cnt,
      |      row_number() OVER (ORDER BY count(*) DESC, tok) AS rn
      |    FROM toks GROUP BY tok)
      |  WHERE rn <= 20),
      |est AS (
      |  SELECT t.tok, t.exact_cnt, min(c.cnt) AS est_cnt
      |  FROM top t CROSS JOIN js
      |  JOIN cells c ON c.j = js.j AND c.bucket =
      |    CAST('0x' || substr(md5(concat(js.j, ':', t.tok)), 1, 4) AS BIGINT)
      |      % 256
      |  GROUP BY t.tok, t.exact_cnt)
      |SELECT tok, CAST(exact_cnt AS BIGINT) AS exact_cnt,
      |  CAST(est_cnt AS BIGINT) AS est_cnt,
      |  CAST(est_cnt - exact_cnt AS BIGINT) AS overestimate
      |FROM est ORDER BY exact_cnt DESC, tok""".stripMargin) { (s, d) =>
    Sketches.countMinHeavyHitters(Tables.documents(s, d), "text",
      depth = 4, width = 256, k = 20)
      .orderBy(col("exact_cnt").desc, col("tok"))
  }

  /** Z-order layout stats over orders on a 16×16 (custkey mod, price
    * bucket) grid → 16 files by z-range; per-file min/max footer stats in
    * both dimensions are the multi-dimensional skipping report.
    */
  val h76 = Q(
    "h76_zorder_layout",
    """WITH b AS (
      |  SELECT o_custkey % 16 AS x16,
      |    CAST(least(floor(o_totalprice / 31250.0), 15.0) AS BIGINT) AS y16
      |  FROM orders),
      |z AS (
      |  SELECT x16, y16,
      |    ((x16 >> 0) & 1) * 1 + ((y16 >> 0) & 1) * 2 +
      |    ((x16 >> 1) & 1) * 4 + ((y16 >> 1) & 1) * 8 +
      |    ((x16 >> 2) & 1) * 16 + ((y16 >> 2) & 1) * 32 +
      |    ((x16 >> 3) & 1) * 64 + ((y16 >> 3) & 1) * 128 AS z
      |  FROM b)
      |SELECT z // 16 AS file_id, CAST(count(*) AS BIGINT) AS n_rows,
      |  min(z) AS z_min, max(z) AS z_max,
      |  min(x16) AS x_min, max(x16) AS x_max,
      |  min(y16) AS y_min, max(y16) AS y_max
      |FROM z GROUP BY 1
      |ORDER BY file_id""".stripMargin) { (s, d) =>
    val buckets = Tables.orders(s, d).select(
      (col("o_custkey") % 16).as("x16"),
      least(floor(col("o_totalprice") / 31250.0), lit(15.0)).cast("long")
        .as("y16"))
    Layout.zorderFileStats(buckets, "x16", "y16", bits = 4, nFiles = 16)
      .orderBy("file_id")
  }

  val all: Seq[Q] = Seq(h73, h74, h75, h76)
}
