package graft.queries

import graft.Tables
import graft.extensions.{Baskets, Graph, Provenance, Stats}
import org.apache.spark.sql.functions._

/** Group H (continued) — round-6 batch 3: snapshot change-data-feed,
  * weighted PageRank over the near-dup graph, chi-square independence, and
  * market-basket pair lift. Scale notes live on the extension objects;
  * every query follows the Q determinism contract.
  */
object GroupH8 {

  /** Change feed between the documents snapshot and a deterministically
    * mutated v2 (keys ≡0 mod 17 removed; surviving keys ≡0 mod 13 get
    * " v2" appended; keys ≡0 mod 29 re-inserted shifted +1M as adds). The
    * oracle rebuilds v2 and replays the row-hash full-outer diff.
    */
  val h77 = Q(
    "h77_snapshot_diff",
    """WITH v1 AS (
      |  SELECT doc_id, text, lang, source, n_chars FROM documents),
      |v2 AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END AS text,
      |    lang, source, n_chars
      |  FROM v1 WHERE doc_id % 17 <> 0
      |  UNION ALL
      |  SELECT doc_id + 1000000, 'NEW ' || text, lang, source, n_chars
      |  FROM v1 WHERE doc_id % 29 = 0),
      |h1 AS (
      |  SELECT doc_id, CAST('0x' || substr(md5(concat_ws(chr(31),
      |    coalesce(text, chr(30)), coalesce(lang, chr(30)),
      |    coalesce(source, chr(30)),
      |    coalesce(CAST(n_chars AS VARCHAR), chr(30)))), 1, 15) AS BIGINT)
      |    AS fp
      |  FROM v1),
      |h2 AS (
      |  SELECT doc_id, CAST('0x' || substr(md5(concat_ws(chr(31),
      |    coalesce(text, chr(30)), coalesce(lang, chr(30)),
      |    coalesce(source, chr(30)),
      |    coalesce(CAST(n_chars AS VARCHAR), chr(30)))), 1, 15) AS BIGINT)
      |    AS fp
      |  FROM v2),
      |j AS (
      |  SELECT coalesce(h1.doc_id, h2.doc_id) AS doc_id,
      |    h1.fp AS old_fp, h2.fp AS new_fp
      |  FROM h1 FULL OUTER JOIN h2 ON h1.doc_id = h2.doc_id)
      |SELECT doc_id,
      |  CASE WHEN old_fp IS NULL THEN 'added'
      |       WHEN new_fp IS NULL THEN 'removed'
      |       ELSE 'changed' END AS change_type,
      |  old_fp, new_fp
      |FROM j
      |WHERE old_fp IS NULL OR new_fp IS NULL OR old_fp <> new_fp
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val v1 = Tables.documents(s, d)
    val v2 = v1.filter(col("doc_id") % 17 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 13 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")))
      .unionByName(v1.filter(col("doc_id") % 29 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L)
        .withColumn("text", concat(lit("NEW "), col("text"))))
    Provenance.snapshotDiff(v1, v2, "doc_id",
      Seq("text", "lang", "source", "n_chars"))
      .orderBy("doc_id")
  }

  /** Weighted PageRank over the h41 SimHash near-dup graph, edge weight =
    * 3 − hamming (exact copies pull 3× the authority of borderline
    * pairs). The oracle replays the graph plus 3 unrolled fixed-point
    * iterations with weighted integer contributions.
    */
  val h78 = Q(
    "h78_weighted_pagerank",
    GroupH6.DupGraphCtes +
      """,
      |edges AS (
      |  SELECT id_a AS src, id_b AS dst, CAST(3 - hamming AS BIGINT) AS w
      |  FROM cand
      |  UNION ALL SELECT id_b, id_a, CAST(3 - hamming AS BIGINT) FROM cand),
      |wdeg AS (SELECT src, CAST(sum(w) AS BIGINT) AS wdeg FROM edges GROUP BY src),
      |s0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS score FROM wdeg),
      |s1 AS (
      |  SELECT e.dst AS node,
      |    150000 + CAST(floor(0.85 * CAST(sum((s.score * e.w) // d.wdeg) AS DOUBLE)) AS BIGINT) AS score
      |  FROM edges e JOIN wdeg d ON d.src = e.src JOIN s0 s ON s.node = e.src
      |  GROUP BY e.dst),
      |s2 AS (
      |  SELECT e.dst AS node,
      |    150000 + CAST(floor(0.85 * CAST(sum((s.score * e.w) // d.wdeg) AS DOUBLE)) AS BIGINT) AS score
      |  FROM edges e JOIN wdeg d ON d.src = e.src JOIN s1 s ON s.node = e.src
      |  GROUP BY e.dst),
      |s3 AS (
      |  SELECT e.dst AS node,
      |    150000 + CAST(floor(0.85 * CAST(sum((s.score * e.w) // d.wdeg) AS DOUBLE)) AS BIGINT) AS score
      |  FROM edges e JOIN wdeg d ON d.src = e.src JOIN s2 s ON s.node = e.src
      |  GROUP BY e.dst)
      |SELECT node AS doc_id, score AS wpr_micro,
      |  CAST(score AS DOUBLE) / 1000000.0 AS weighted_pagerank
      |FROM s3 ORDER BY doc_id""".stripMargin) { (s, d) =>
    val pairs = DupGraph.pairs(s, d)
      .withColumn("w", lit(3) - col("hamming"))
    Graph.weightedPageRank(pairs, "id_a", "id_b", "w", iterations = 3)
      .select(col("node").as("doc_id"), col("wpr_micro"),
        col("weighted_pagerank"))
      .orderBy("doc_id")
  }

  /** Chi-square independence of event_type × 6-hour band: the
    * did-the-mix-shift check. Micro-nat-style integer term sums make the
    * statistic engine-exact.
    */
  val h79 = Q(
    "h79_chi_square",
    """WITH c AS (
      |  SELECT event_type, CAST(hour(ts) // 6 AS BIGINT) AS hour_band,
      |    count(*) AS observed
      |  FROM events GROUP BY 1, 2),
      |rt AS (SELECT event_type, CAST(sum(observed) AS BIGINT) AS row_tot
      |  FROM c GROUP BY event_type),
      |ct AS (SELECT hour_band, CAST(sum(observed) AS BIGINT) AS col_tot
      |  FROM c GROUP BY hour_band),
      |n AS (SELECT CAST(sum(observed) AS BIGINT) AS n FROM c),
      |t AS (
      |  SELECT rt.event_type, ct.hour_band, coalesce(c.observed, 0) AS observed,
      |    CAST(row_tot * col_tot AS DOUBLE) / CAST(n AS DOUBLE) AS e
      |  FROM rt CROSS JOIN ct
      |  LEFT JOIN c ON c.event_type = rt.event_type AND c.hour_band = ct.hour_band
      |  CROSS JOIN n),
      |t2 AS (
      |  SELECT event_type, hour_band, CAST(observed AS BIGINT) AS observed,
      |    floor(e * 10000 + 0.5) / 10000 AS expected,
      |    CAST(floor((CAST(observed AS DOUBLE) - e) * (CAST(observed AS DOUBLE) - e)
      |      / e * 1000000.0 + 0.5) AS BIGINT) AS term_micro
      |  FROM t)
      |SELECT event_type, hour_band, observed, expected, term_micro,
      |  CAST(sum(term_micro) OVER () AS BIGINT) AS chi2_micro,
      |  CAST(sum(term_micro) OVER () AS DOUBLE) / 1000000.0 AS chi2
      |FROM t2 ORDER BY event_type, hour_band""".stripMargin) { (s, d) =>
    Stats.chiSquareIndependence(
      Tables.events(s, d).select(col("event_type"),
        expr("hour(ts) div 6").cast("long").as("hour_band")),
      "event_type", "hour_band")
      .orderBy("event_type", "hour_band")
  }

  /** Top-30 co-ordered part pairs by basket count with lift — the
    * transactional analog of h48's PMI collocations.
    */
  val h80 = Q(
    "h80_basket_lift",
    """WITH b AS (
      |  SELECT DISTINCT l_orderkey AS basket, l_partkey AS item
      |  FROM lineitem),
      |ic AS (SELECT item, count(*) AS c FROM b GROUP BY item),
      |nb AS (SELECT count(DISTINCT basket) AS n FROM b),
      |p AS (
      |  SELECT x.item AS item_a, y.item AS item_b, count(*) AS pair_cnt
      |  FROM b x JOIN b y ON x.basket = y.basket AND x.item < y.item
      |  GROUP BY 1, 2),
      |l AS (
      |  SELECT item_a, item_b, CAST(pair_cnt AS BIGINT) AS pair_cnt,
      |    CAST(ca.c AS BIGINT) AS c_a, CAST(cb.c AS BIGINT) AS c_b,
      |    floor(CAST(n AS DOUBLE) * CAST(pair_cnt AS DOUBLE)
      |      / (CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE)) * 10000 + 0.5)
      |      / 10000 AS lift
      |  FROM p JOIN ic ca ON ca.item = item_a JOIN ic cb ON cb.item = item_b
      |  CROSS JOIN nb),
      |r AS (
      |  SELECT *, row_number() OVER (ORDER BY pair_cnt DESC, item_a, item_b)
      |    AS rn FROM l)
      |SELECT item_a, item_b, pair_cnt, c_a, c_b, lift
      |FROM r WHERE rn <= 30
      |ORDER BY pair_cnt DESC, item_a, item_b""".stripMargin) { (s, d) =>
    Baskets.pairLift(Tables.lineitem(s, d), "l_orderkey", "l_partkey", 30)
  }

  val all: Seq[Q] = Seq(h77, h78, h79, h80)
}
