package graft.queries

import graft.Tables
import graft.extensions.{Graph, Mixing, Provenance, Similarity}
import org.apache.spark.sql.functions._

/** Group H (continued) — round-6 additions: graph analytics over the
  * near-dup pair graph (label propagation, triangle/clustering stats),
  * per-domain KL drift, the matryoshka progressive-retrieval funnel, and
  * content-defined dataset fingerprints for incremental runs. Scale notes
  * live on the extension objects; every query follows the Q determinism
  * contract.
  */
object GroupH6 {

  /** The h41/h65 SimHash near-dup graph construction as a reusable oracle
    * CTE prefix ending in `cand(id_a, id_b, hamming)` (id_a < id_b,
    * distinct, hamming ≤ 2 at 32-bit signatures, 4 bands).
    */
  private[queries] val DupGraphCtes =
    """WITH tok AS (
      |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |                                    t -> len(t) > 0)) AS t
      |  FROM documents),
      |js AS (SELECT unnest(generate_series(1, 32)) AS j),
      |votes AS (
      |  SELECT doc_id, j,
      |    sum(CASE WHEN substr(md5(t), j, 1) IN ('8','9','a','b','c','d','e','f')
      |        THEN 1 ELSE -1 END) AS v
      |  FROM tok CROSS JOIN js GROUP BY doc_id, j),
      |sig AS (
      |  SELECT doc_id,
      |    CAST(sum(CASE WHEN v >= 0 THEN (CAST(1 AS BIGINT) << (32 - j))
      |             ELSE 0 END) AS BIGINT) AS sig
      |  FROM votes GROUP BY doc_id),
      |bk AS (
      |  SELECT doc_id, sig, b AS band, (sig >> (b * 8)) & 255 AS key
      |  FROM sig, UNNEST(generate_series(0, 3)) AS t(b)),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
      |    CAST(bit_count(xor(a.sig, b.sig)) AS INT) AS hamming
      |  FROM bk a JOIN bk b ON a.band = b.band AND a.key = b.key
      |    AND a.doc_id < b.doc_id
      |  WHERE bit_count(xor(a.sig, b.sig)) <= 2)""".stripMargin

  private def dupPairs(s: org.apache.spark.sql.SparkSession, d: String) =
    DupGraph.pairs(s, d)

  /** Label propagation over the near-dup graph: every 5th doc is a trusted
    * seed labeled with its `source`; two deterministic voting rounds spread
    * the labels to unlabeled neighbors (most neighbor votes, ties to the
    * smallest label). The oracle replays the h41 graph plus both unrolled
    * rounds.
    */
  val h66 = Q(
    "h66_label_propagation",
    DupGraphCtes +
      """,
      |edges AS (
      |  SELECT id_a AS src, id_b AS dst FROM cand
      |  UNION ALL SELECT id_b, id_a FROM cand),
      |seeds AS (
      |  SELECT doc_id AS node, source AS label FROM documents
      |  WHERE doc_id % 5 = 0),
      |v1 AS (
      |  SELECT e.dst, l.label, count(*) AS votes
      |  FROM edges e JOIN seeds l ON l.node = e.src
      |  GROUP BY e.dst, l.label),
      |w1 AS (
      |  SELECT dst AS node, label FROM (
      |    SELECT *, row_number() OVER (PARTITION BY dst
      |      ORDER BY votes DESC, label) AS rn FROM v1)
      |  WHERE rn = 1),
      |l1 AS (
      |  SELECT node, label, true AS is_seed FROM seeds
      |  UNION ALL
      |  SELECT node, label, false FROM w1
      |  WHERE node NOT IN (SELECT node FROM seeds)),
      |v2 AS (
      |  SELECT e.dst, l.label, count(*) AS votes
      |  FROM edges e JOIN l1 l ON l.node = e.src
      |  GROUP BY e.dst, l.label),
      |w2 AS (
      |  SELECT dst AS node, label FROM (
      |    SELECT *, row_number() OVER (PARTITION BY dst
      |      ORDER BY votes DESC, label) AS rn FROM v2)
      |  WHERE rn = 1),
      |l2 AS (
      |  SELECT node, label, true AS is_seed FROM seeds
      |  UNION ALL
      |  SELECT node, label, false FROM w2
      |  WHERE node NOT IN (SELECT node FROM seeds))
      |SELECT node, label, is_seed FROM l2 ORDER BY node""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    Graph.labelPropagation(dupPairs(s, d), "id_a", "id_b",
      docs.filter(col("doc_id") % 5 === 0), "doc_id", "source",
      iterations = 2)
      .orderBy("node")
  }

  /** Per-node triangle count + local clustering coefficient over the
    * near-dup graph — clique-y duplicate neighborhoods (template farms)
    * versus chains of borderline pairs. The oracle replays the simpler
    * id-ordered wedge join; the engine enumerates via degree-ordered
    * orientation ([[graft.extensions.Graph.orientByDegree]]) — per-node
    * counts are enumeration-order-independent, so the two agree exactly.
    */
  val h67 = Q(
    "h67_dup_graph_triangles",
    DupGraphCtes +
      """,
      |deg AS (
      |  SELECT node, count(*) AS degree FROM (
      |    SELECT id_a AS node FROM cand
      |    UNION ALL SELECT id_b FROM cand)
      |  GROUP BY node),
      |tri AS (
      |  SELECT e1.id_a AS x, e1.id_b AS y, e2.id_b AS z
      |  FROM cand e1
      |  JOIN cand e2 ON e2.id_a = e1.id_b
      |  JOIN cand e3 ON e3.id_a = e1.id_a AND e3.id_b = e2.id_b),
      |pn AS (
      |  SELECT node, count(*) AS triangles FROM (
      |    SELECT x AS node FROM tri
      |    UNION ALL SELECT y FROM tri
      |    UNION ALL SELECT z FROM tri)
      |  GROUP BY node)
      |SELECT d.node, d.degree,
      |  CAST(coalesce(p.triangles, 0) AS BIGINT) AS triangles,
      |  CASE WHEN d.degree < 2 THEN 0.0
      |       ELSE floor(2.0 * CAST(coalesce(p.triangles, 0) AS DOUBLE)
      |         / (CAST(d.degree AS DOUBLE) * CAST(d.degree - 1 AS DOUBLE))
      |         * 10000 + 0.5) / 10000 END AS clustering
      |FROM deg d LEFT JOIN pn p USING (node)
      |ORDER BY d.node""".stripMargin) { (s, d) =>
    Graph.triangleStats(dupPairs(s, d), "id_a", "id_b")
      .orderBy("node")
  }

  /** Per-domain (source) KL divergence from the corpus unigram mixture —
    * exact micro-nat integer sums, engine-identical.
    */
  val h68 = Q(
    "h68_domain_kl",
    """WITH dt AS (
      |  SELECT domain, t AS tok, count(*) AS m FROM (
      |    SELECT source AS domain,
      |      unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |                         t -> len(t) > 0)) AS t
      |    FROM documents)
      |  GROUP BY domain, tok),
      |corpus AS (SELECT tok, CAST(sum(m) AS BIGINT) AS c FROM dt GROUP BY tok),
      |domtot AS (SELECT domain, CAST(sum(m) AS BIGINT) AS nd FROM dt GROUP BY domain),
      |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM corpus),
      |terms AS (
      |  SELECT domain, m, nd,
      |    CAST(floor(ln(
      |      (CAST(m AS DOUBLE) / CAST(nd AS DOUBLE)) /
      |      (CAST(c AS DOUBLE) / CAST(n AS DOUBLE))) * 1000000.0 + 0.5)
      |      AS BIGINT) AS q
      |  FROM dt JOIN corpus USING (tok) JOIN domtot USING (domain) CROSS JOIN tot)
      |SELECT domain, CAST(max(nd) AS BIGINT) AS n_tokens,
      |  CAST(count(*) AS BIGINT) AS vocab,
      |  CAST(sum(m * q) AS BIGINT) AS kl_q,
      |  CAST(sum(m * q) AS DOUBLE) / (CAST(max(nd) AS DOUBLE) * 1000000.0) AS kl_nats
      |FROM terms GROUP BY domain
      |ORDER BY domain""".stripMargin) { (s, d) =>
    Mixing.domainKl(Tables.documents(s, d), "source", "text")
      .orderBy("domain")
  }

  /** Matryoshka progressive retrieval: 16-dim prefix cosine prefilter to
    * top-20, full 64-dim re-rank to top-5. Both stages fully deterministic
    * (rounded score + id tiebreak), so the oracle replays the entire funnel
    * — no recall-only signal needed.
    */
  val h69 = Q(
    "h69_matryoshka_topk",
    """WITH q AS (
      |  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
      |  WHERE vec_id < 16),
      |c AS (SELECT vec_id AS neighbor_id, embedding AS cv FROM embeddings),
      |pre AS (
      |  SELECT query_id, neighbor_id, qv, cv,
      |    floor(
      |      list_aggregate(list_transform(generate_series(1, 16),
      |        i -> qv[i]::DOUBLE * cv[i]::DOUBLE), 'sum')
      |      / (sqrt(list_aggregate(list_transform(generate_series(1, 16),
      |           i -> qv[i]::DOUBLE * qv[i]::DOUBLE), 'sum'))
      |         * sqrt(list_aggregate(list_transform(generate_series(1, 16),
      |             i -> cv[i]::DOUBLE * cv[i]::DOUBLE), 'sum')))
      |      * 10000 + 0.5) / 10000 AS cos_prefix
      |  FROM q JOIN c ON neighbor_id <> query_id),
      |surv AS (
      |  SELECT * FROM (
      |    SELECT *, row_number() OVER (PARTITION BY query_id
      |      ORDER BY cos_prefix DESC, neighbor_id) AS prn FROM pre)
      |  WHERE prn <= 20),
      |rr AS (
      |  SELECT query_id, neighbor_id, cos_prefix,
      |    floor(
      |      list_aggregate(list_transform(generate_series(1, 64),
      |        i -> qv[i]::DOUBLE * cv[i]::DOUBLE), 'sum')
      |      / (sqrt(list_aggregate(list_transform(generate_series(1, 64),
      |           i -> qv[i]::DOUBLE * qv[i]::DOUBLE), 'sum'))
      |         * sqrt(list_aggregate(list_transform(generate_series(1, 64),
      |             i -> cv[i]::DOUBLE * cv[i]::DOUBLE), 'sum')))
      |      * 10000 + 0.5) / 10000 AS cos
      |  FROM surv),
      |ranked AS (
      |  SELECT query_id, neighbor_id, cos_prefix, cos,
      |    CAST(row_number() OVER (PARTITION BY query_id
      |      ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
      |  FROM rr)
      |SELECT query_id, rank, neighbor_id, cos_prefix, cos
      |FROM ranked WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin) { (s, d) =>
    val embs = Tables.embeddings(s, d)
    Similarity.matryoshkaTopK(embs, embs.filter(col("vec_id") < 16),
      "vec_id", "embedding", dPrefix = 16, m = 20, k = 5)
      .withColumn("rank", col("rank").cast("long"))
      .select("query_id", "rank", "neighbor_id", "cos_prefix", "cos")
      .orderBy("query_id", "rank")
  }

  /** Content-defined dataset fingerprints per (source, lang) slice —
    * layout-independent version ids for incremental reprocessing.
    */
  val h70 = Q(
    "h70_dataset_fingerprint",
    """SELECT source, lang, CAST(count(*) AS BIGINT) AS n_rows,
      |  bit_xor(CAST('0x' || substr(md5(concat_ws(chr(31),
      |    coalesce(CAST(doc_id AS VARCHAR), chr(30)),
      |    coalesce(text, chr(30)),
      |    coalesce(CAST(n_chars AS VARCHAR), chr(30)))), 1, 15) AS BIGINT))
      |    AS content_fp
      |FROM documents
      |GROUP BY source, lang
      |ORDER BY source, lang""".stripMargin) { (s, d) =>
    Provenance.datasetFingerprint(Tables.documents(s, d),
      Seq("source", "lang"), Seq("doc_id", "text", "n_chars"))
      .orderBy("source", "lang")
  }

  /** Shuffle-skew diagnostic: top-10 heaviest event keys with shares and
    * cumulative share — the profile read before choosing plain vs salted
    * aggregation. Per-key count + TakeOrderedAndProject; no global sort.
    */
  val h71 = Q(
    "h71_heavy_key_profile",
    """WITH pk AS (
      |  SELECT user_id AS key, count(*) AS cnt FROM events GROUP BY user_id),
      |tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM pk),
      |top AS (SELECT key, cnt FROM pk ORDER BY cnt DESC, key LIMIT 10),
      |r AS (
      |  SELECT key, cnt,
      |    CAST(row_number() OVER (ORDER BY cnt DESC, key) AS BIGINT) AS rank,
      |    sum(cnt) OVER (ORDER BY cnt DESC, key
      |      ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM top)
      |SELECT rank, key, cnt,
      |  floor(CAST(cnt AS DOUBLE) / CAST(total AS DOUBLE) * 1000000 + 0.5)
      |    / 1000000 AS share,
      |  floor(CAST(cum AS DOUBLE) / CAST(total AS DOUBLE) * 1000000 + 0.5)
      |    / 1000000 AS cum_share
      |FROM r CROSS JOIN tot
      |ORDER BY rank""".stripMargin) { (s, d) =>
    graft.extensions.Skew.heavyKeyProfile(Tables.events(s, d), "user_id", 10)
      .orderBy("rank")
  }

  /** Length-curriculum decile buckets over document token counts via the
    * mergeable histogram sketch — integer bin/rank math only, no global
    * sort, engine-exact.
    */
  val h72 = Q(
    "h72_length_deciles",
    """WITH toks AS (
      |  SELECT CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
      |    t -> len(t) > 0)) AS BIGINT) AS v
      |  FROM documents),
      |vals AS (
      |  SELECT v, CAST(floor(CAST(v AS DOUBLE) / 8.0) AS INT) AS b FROM toks),
      |bins AS (SELECT b, count(*) AS c FROM vals GROUP BY b),
      |cum AS (
      |  SELECT b, sum(c) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) AS cum,
      |    (SELECT sum(c) FROM bins) AS total
      |  FROM bins),
      |bnds AS (
      |  SELECT d, min(b) AS bb
      |  FROM cum CROSS JOIN (SELECT unnest(generate_series(1, 9)) AS d)
      |  WHERE cum * 10 >= total * d GROUP BY d),
      |arr AS (SELECT list_sort(list(bb)) AS bbs FROM bnds),
      |asg AS (
      |  SELECT v, CAST(1 + len(list_filter(bbs, x -> b > x)) AS BIGINT) AS decile
      |  FROM vals CROSS JOIN arr)
      |SELECT decile, CAST(count(*) AS BIGINT) AS n_rows,
      |  min(v) AS min_val, max(v) AS max_val, CAST(sum(v) AS BIGINT) AS sum_val
      |FROM asg GROUP BY decile
      |ORDER BY decile""".stripMargin) { (s, d) =>
    import graft.extensions.{Histograms, TextOps}
    Histograms.decileBuckets(
      Tables.documents(s, d).select(
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens")),
      "n_tokens", 8.0)
      .orderBy("decile")
  }

  val all: Seq[Q] = Seq(h66, h67, h68, h69, h70, h71, h72)
}
