package graft.queries

import graft.Tables
import graft.extensions.{Det, Multimodal, Retrieval}
import graft.streaming.StreamJoins
import org.apache.spark.sql.functions._

/** Group H (continued) — round-5 additions: BM25 keyword retrieval (the
  * inverted-index search path next to the dense-ANN operators), real-bytes
  * image decoding through the multimodal codec boundary, and the batch twin
  * of the stream-static enrichment join. Scale notes live on the extension
  * objects; every query follows the Q determinism contract.
  */
object GroupH4 {

  /** BM25 top-20 for a fixed 3-term keyword query. The oracle replays the
    * exact micro-unit contribution formula (identical double op tree from
    * integer tf/df/N/len inputs; BIGINT sum; one display division) — see
    * [[graft.extensions.Retrieval]].
    */
  val h51 = Q(
    "h51_bm25_topk",
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '\s+'), t -> len(t) > 0) AS l
      |  FROM documents),
      |d AS (SELECT doc_id, l, len(l) AS len FROM toks WHERE len(l) > 0),
      |stats AS (SELECT count(*) AS n_docs, CAST(sum(len) AS BIGINT) AS sum_len FROM d),
      |post AS (
      |  SELECT doc_id, len, term, count(*) AS tf FROM (
      |    SELECT doc_id, len, unnest(l) AS term FROM d)
      |  WHERE term IN ('spark', 'join', 'window')
      |  GROUP BY doc_id, len, term),
      |dfs AS (SELECT term, count(*) AS df FROM post GROUP BY term),
      |contrib AS (
      |  SELECT doc_id,
      |    CAST(floor(
      |      ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) *
      |      ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * len /
      |        (CAST(sum_len AS DOUBLE) / n_docs)))) * 1000000.0 + 0.5) AS BIGINT) AS q
      |  FROM post JOIN dfs USING (term) CROSS JOIN stats)
      |SELECT doc_id, count(*) AS n_terms,
      |  CAST(sum(q) AS BIGINT) AS score_q,
      |  CAST(sum(q) AS DOUBLE) / 1000000.0 AS score
      |FROM contrib GROUP BY doc_id
      |ORDER BY score_q DESC, doc_id LIMIT 20""".stripMargin) { (s, d) =>
    Retrieval.bm25TopK(Tables.documents(s, d), "doc_id", "text",
      Seq("spark", "join", "window"), k = 20)
  }

  /** Real image bytes through the multimodal boundary: a deterministic BMP
    * fixture (REAL 24bpp byte layout — bottom-up rows, 4-byte padding) is
    * written to a parquet `binary` column, read back, and decoded by
    * [[graft.extensions.Multimodal.BmpCodec]] parsing actual headers and
    * pixel rows. The oracle never sees a byte: it recomputes dims and the
    * pixel-byte sum from the generating arithmetic, so any header/stride/
    * padding bug in encode OR decode breaks the hash match.
    */
  val h52 = Q(
    "h52_image_decode",
    """WITH m AS (
      |  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h
      |  FROM documents),
      |px AS (
      |  SELECT doc_id, w, h,
      |    unnest(generate_series(0, 3 * w * h - 1)) AS j
      |  FROM m)
      |SELECT doc_id AS media_id,
      |  CAST(w AS BIGINT) AS width,
      |  CAST(h AS BIGINT) AS height,
      |  CAST(54 + ((3 * w + 3) // 4) * 4 * h AS BIGINT) AS n_bytes,
      |  CAST(sum((doc_id * 31 + j * 7) % 256) AS BIGINT) AS sum_bytes
      |FROM px
      |GROUP BY doc_id, w, h
      |ORDER BY media_id""".stripMargin) { (s, d) =>
    val media = Multimodal.toBmpMedia(Tables.documents(s, d), "doc_id")
    val sfTag = d.replaceAll("[^A-Za-z0-9._-]", "_")
    val fixture = s"${System.getProperty("java.io.tmpdir")}/graft_bmp_fixture_" +
      s"${sfTag}_pid${ProcessHandle.current().pid()}"
    Multimodal.imageStats(Multimodal.roundTripParquet(media, fixture))
      .toDF()
      .orderBy("media_id")
  }

  /** Batch twin of the stream-static enrichment join
    * ([[graft.streaming.StreamJoins.enrichWithCustomer]] — stateless
    * broadcast join, re-used verbatim by the streaming test): events
    * enriched with the customer dim, rolled up per (segment, event_type).
    */
  val h53 = Q(
    "h53_stream_static_enrich",
    """SELECT c_mktsegment, event_type, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      |FROM events JOIN customer ON user_id = c_custkey
      |GROUP BY c_mktsegment, event_type
      |ORDER BY c_mktsegment, event_type""".stripMargin) { (s, d) =>
    StreamJoins.enrichWithCustomer(Tables.events(s, d), Tables.customer(s, d))
      .groupBy("c_mktsegment", "event_type")
      .agg(count(lit(1)).as("n"), Det.exactSum(col("value")).as("total_value"))
      .orderBy("c_mktsegment", "event_type")
  }

  /** Hybrid retrieval: reciprocal-rank fusion of the h51 BM25 ranking with
    * an h2-machinery dense cosine ranking (query = vec 7's embedding), the
    * standard two-retriever fusion. Ranks are exact integers on both sides,
    * contributions micro-quantized, the fused score an integer sum — see
    * [[graft.extensions.Retrieval.hybridRrfTopK]] for the bounded-pool
    * scale argument.
    */
  val h54 = Q(
    "h54_hybrid_rrf",
    """WITH toks AS (
      |  SELECT doc_id,
      |    list_filter(string_split_regex(lower(text), '\s+'), t -> len(t) > 0) AS l
      |  FROM documents),
      |d AS (SELECT doc_id, l, len(l) AS len FROM toks WHERE len(l) > 0),
      |stats AS (SELECT count(*) AS n_docs, CAST(sum(len) AS BIGINT) AS sum_len FROM d),
      |post AS (
      |  SELECT doc_id, len, term, count(*) AS tf FROM (
      |    SELECT doc_id, len, unnest(l) AS term FROM d)
      |  WHERE term IN ('spark', 'join', 'window')
      |  GROUP BY doc_id, len, term),
      |dfs AS (SELECT term, count(*) AS df FROM post GROUP BY term),
      |contrib AS (
      |  SELECT doc_id,
      |    CAST(floor(
      |      ln((n_docs - df + 0.5) / (df + 0.5) + 1.0) *
      |      ((tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * len /
      |        (CAST(sum_len AS DOUBLE) / n_docs)))) * 1000000.0 + 0.5) AS BIGINT) AS q
      |  FROM post JOIN dfs USING (term) CROSS JOIN stats),
      |bm AS (SELECT doc_id, CAST(sum(q) AS BIGINT) AS score_q FROM contrib GROUP BY doc_id),
      |sp AS (SELECT * FROM (
      |  SELECT doc_id AS id,
      |    CAST(row_number() OVER (ORDER BY score_q DESC, doc_id) AS BIGINT) AS r_sparse
      |  FROM bm) WHERE r_sparse <= 100),
      |qv AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 7),
      |norms AS (
      |  SELECT vec_id,
      |    sqrt(list_aggregate(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE), 'sum')) AS nrm
      |  FROM embeddings),
      |scored AS (
      |  SELECT c.vec_id AS id,
      |    floor(list_aggregate(
      |      list_transform(generate_series(1, len(qv)), i -> qv[i]::DOUBLE * c.embedding[i]::DOUBLE),
      |      'sum') / (nq.nrm * nc.nrm) * 10000 + 0.5) / 10000 AS cos
      |  FROM embeddings c CROSS JOIN qv
      |  JOIN norms nq ON nq.vec_id = 7
      |  JOIN norms nc ON nc.vec_id = c.vec_id
      |  WHERE c.vec_id <> 7),
      |de AS (SELECT * FROM (
      |  SELECT id, CAST(row_number() OVER (ORDER BY cos DESC, id) AS BIGINT) AS r_dense
      |  FROM scored) WHERE r_dense <= 100),
      |fused AS (
      |  SELECT id, r_sparse, r_dense,
      |    coalesce(CAST(floor(1000000000.0 / (60.0 + r_sparse) + 0.5) AS BIGINT), 0) +
      |    coalesce(CAST(floor(1000000000.0 / (60.0 + r_dense) + 0.5) AS BIGINT), 0) AS rrf_q
      |  FROM sp FULL OUTER JOIN de USING (id))
      |SELECT id, r_sparse, r_dense, rrf_q,
      |  CAST(rrf_q AS DOUBLE) / 1000000000.0 AS rrf
      |FROM fused
      |ORDER BY rrf_q DESC, id LIMIT 20""".stripMargin) { (s, d) =>
    Retrieval.hybridRrfTopK(Tables.documents(s, d), Tables.embeddings(s, d),
      Seq("spark", "join", "window"), queryVecId = 7L, k = 20)
  }

  val all: Seq[Q] = Seq(h51, h52, h53, h54)
}
