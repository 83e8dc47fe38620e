package graft.queries

import graft.Tables
import graft.extensions.{Chunking, Det, LmScore, Skew, TextAnalysis}
import graft.streaming.StreamDedup
import org.apache.spark.sql.functions._

/** Group H (continued) — round-5 queries: the context-chunking / sequence-
  * packing / span-dedup stage ([[graft.extensions.Chunking]]) that turns a
  * document corpus into fixed-budget training examples. Scale notes live on
  * the extension object; every query follows the Q determinism contract
  * (integer/string outputs only — no doubles anywhere in this group).
  *
  * Oracle tokenization mirrors the repo-wide contract (TextOps.tokens):
  * lowercase, split on `\s+`, drop empties.
  */
object GroupH3 {

  private val dTok =
    """list_filter(string_split_regex(lower(text), '\s+'), t -> len(t) > 0)"""

  /** Overlapping fixed-window context chunks (window=32, stride=24). */
  val h42 = Q(
    "h42_context_chunks",
    s"""WITH toks AS (
      |  SELECT doc_id, $dTok AS l FROM documents),
      |n AS (SELECT doc_id, l, len(l) AS n FROM toks WHERE len(l) > 0),
      |c AS (SELECT doc_id, l, n, unnest(generate_series(0, (n - 1) // 24)) AS i
      |  FROM n)
      |SELECT doc_id,
      |  CAST(i AS INT) AS chunk_idx,
      |  CAST(least(32, n - i * 24) AS INT) AS n_toks,
      |  array_to_string(list_slice(l, i * 24 + 1, i * 24 + 32), ' ') AS chunk_text
      |FROM c
      |ORDER BY doc_id, chunk_idx""".stripMargin) { (s, d) =>
    Chunking.chunks(Tables.documents(s, d), "doc_id", "text",
        window = 32, stride = 24)
      .orderBy("doc_id", "chunk_idx")
  }

  /** Deterministic sequence packing into ~256-token bins (md5-sharded —
    * no global order; see Chunking.packBins scale notes).
    */
  val h43 = Q(
    "h43_sequence_packing",
    s"""WITH t AS (
      |  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
      |    CAST(len($dTok) AS INT) AS n_toks
      |  FROM documents),
      |f AS (SELECT doc_id, substring(h, 1, 1) AS shard, h, n_toks
      |  FROM t WHERE n_toks > 0),
      |w AS (SELECT doc_id, shard, n_toks,
      |  CAST(row_number() OVER (PARTITION BY shard ORDER BY h, doc_id) AS INT) AS pos,
      |  sum(n_toks) OVER (PARTITION BY shard ORDER BY h, doc_id
      |    ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM f)
      |SELECT doc_id, shard, pos, n_toks, CAST((cum - 1) // 256 AS INT) AS bin
      |FROM w
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    Chunking.packBins(Tables.documents(s, d), "doc_id", "text", budget = 256)
      .orderBy("doc_id")
  }

  /** Span-level exact dedup (16-token spans) with document reassembly. */
  val h44 = Q(
    "h44_span_dedup",
    s"""WITH toks AS (
      |  SELECT doc_id, $dTok AS l FROM documents),
      |n AS (SELECT doc_id, l, len(l) AS n FROM toks WHERE len(l) > 0),
      |spans AS (
      |  SELECT doc_id, CAST(i AS INT) AS chunk_idx,
      |    array_to_string(list_slice(l, i * 16 + 1, i * 16 + 16), ' ') AS chunk_text
      |  FROM (SELECT doc_id, l, n, unnest(generate_series(0, (n - 1) // 16)) AS i
      |        FROM n)),
      |w AS (SELECT doc_id, chunk_idx, chunk_text,
      |  row_number() OVER (PARTITION BY md5(chunk_text)
      |    ORDER BY doc_id, chunk_idx) AS rn
      |  FROM spans),
      |agg AS (
      |  SELECT doc_id,
      |    count(*) AS n_spans,
      |    CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |    array_to_string(
      |      list(chunk_text ORDER BY chunk_idx) FILTER (WHERE rn = 1),
      |      ' ') AS txt
      |  FROM w GROUP BY doc_id)
      |SELECT doc_id, n_spans, n_kept,
      |  CASE WHEN n_kept > 0 THEN txt ELSE NULL END AS text_clean
      |FROM agg
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    Chunking.spanDedup(Tables.documents(s, d), "doc_id", "text",
        spanTokens = 16)
      .orderBy("doc_id")
  }

  /** Event-firehose throttle: first event per (user, type, minute) — the
    * batch twin of StreamDedup.firstPerKeyStream (StreamingSpec asserts the
    * stream form matches this under ordered arrival).
    */
  val h45 = Q(
    "h45_stream_dedup_throttle",
    """WITH k AS (
      |  SELECT user_id, event_type, date_trunc('minute', ts) AS minute,
      |    event_id, ts, value
      |  FROM events),
      |w AS (SELECT *, row_number() OVER (
      |    PARTITION BY user_id, event_type, minute
      |    ORDER BY ts, event_id) AS rn
      |  FROM k)
      |SELECT user_id, event_type,
      |  strftime(minute, '%Y-%m-%d %H:%M:%S') AS minute_s,
      |  event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_s, value
      |FROM w WHERE rn = 1
      |ORDER BY user_id, event_type, minute_s""".stripMargin) { (s, d) =>
    StreamDedup.firstPerKeyBatch(Tables.events(s, d))
      .select(col("user_id"), col("event_type"),
        date_format(col("minute"), "yyyy-MM-dd HH:mm:ss").as("minute_s"),
        col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
        col("value"))
      .orderBy("user_id", "event_type", "minute_s")
  }

  /** Corpus vocabulary table (count-ordered ids, min frequency 5) — the
    * tokenizer-training precursor. The global row_number window runs over
    * the already-aggregated vocabulary (cardinality ≪ corpus), so its
    * single-partition sort is bounded by vocab size, not data size.
    */
  val h46 = Q(
    "h46_vocabulary",
    """WITH tok AS (
      |  SELECT doc_id,
      |    unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |                       t -> len(t) > 0)) AS token
      |  FROM documents),
      |c AS (
      |  SELECT token, count(*) AS n_total, count(DISTINCT doc_id) AS n_docs
      |  FROM tok GROUP BY token HAVING count(*) >= 5)
      |SELECT CAST(row_number() OVER (ORDER BY n_total DESC, token) AS INT) AS vocab_id,
      |  token, n_total, n_docs
      |FROM c
      |ORDER BY vocab_id""".stripMargin) { (s, d) =>
    TextAnalysis.vocabulary(Tables.documents(s, d), "doc_id", "text", 5)
      .orderBy("vocab_id")
  }

  /** Bigram conditional LM score per doc (MLE P(w2|w1), self-scored corpus
    * — no unseen bigrams by construction). Same fixed-point determinism
    * scheme as h39: ln of an identical int/int double quotient, micro-unit
    * integer sums, one final double division.
    */
  val h47 = Q(
    "h47_bigram_lm_score",
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
      |                             t -> len(t) > 0) AS l
      |  FROM documents),
      |bg0 AS (
      |  SELECT doc_id, unnest(list_transform(generate_series(1, len(l) - 1),
      |    i -> l[i] || ' ' || l[i + 1])) AS bg
      |  FROM toks WHERE len(l) >= 2),
      |dbg AS (SELECT doc_id, bg, count(*) AS m FROM bg0 GROUP BY doc_id, bg),
      |cb AS (SELECT bg, CAST(sum(m) AS BIGINT) AS c_bg FROM dbg GROUP BY bg),
      |cw AS (SELECT split_part(bg, ' ', 1) AS w1, CAST(sum(c_bg) AS BIGINT) AS c_w
      |  FROM cb GROUP BY 1),
      |lp AS (
      |  SELECT cb.bg,
      |    CAST(floor(ln(CAST(c_bg AS DOUBLE) / CAST(c_w AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS q
      |  FROM cb JOIN cw ON split_part(cb.bg, ' ', 1) = cw.w1)
      |SELECT doc_id,
      |  CAST(sum(m) AS BIGINT) AS n_bigrams,
      |  CAST(sum(m * q) AS BIGINT) AS sum_q,
      |  CAST(sum(m * q) AS DOUBLE) / (CAST(sum(m) AS DOUBLE) * 1000000.0) AS avg_logprob
      |FROM dbg JOIN lp USING (bg)
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    LmScore.bigramScores(Tables.documents(s, d), "doc_id", "text")
      .orderBy("doc_id")
  }

  /** PMI collocations, top-30 by count (integer-exact ranking; PMI
    * displayed floor-rounded, identical op tree in both engines).
    */
  val h48 = Q(
    "h48_pmi_collocations",
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
      |                             t -> len(t) > 0) AS l
      |  FROM documents),
      |t AS (SELECT unnest(l) AS tok FROM toks),
      |ct AS (SELECT tok, count(*) AS c FROM t GROUP BY tok),
      |nt AS (SELECT CAST(sum(c) AS BIGINT) AS n_tok FROM ct),
      |bg0 AS (
      |  SELECT unnest(list_transform(generate_series(1, len(l) - 1),
      |    i -> l[i] || ' ' || l[i + 1])) AS bg
      |  FROM toks WHERE len(l) >= 2),
      |nb AS (SELECT count(*) AS n_bg FROM bg0),
      |cb AS (SELECT bg, count(*) AS c_bg FROM bg0 GROUP BY bg
      |  HAVING count(*) >= 5)
      |SELECT cb.bg, cb.c_bg,
      |  floor(ln(
      |    (CAST(c_bg AS DOUBLE) / CAST(n_bg AS DOUBLE)) /
      |      ((CAST(c1.c AS DOUBLE) / CAST(n_tok AS DOUBLE)) *
      |        (CAST(c2.c AS DOUBLE) / CAST(n_tok AS DOUBLE)))) * 10000 + 0.5)
      |    / 10000 AS pmi
      |FROM cb
      |CROSS JOIN nt CROSS JOIN nb
      |JOIN ct c1 ON split_part(cb.bg, ' ', 1) = c1.tok
      |JOIN ct c2 ON split_part(cb.bg, ' ', 2) = c2.tok
      |ORDER BY c_bg DESC, bg LIMIT 30""".stripMargin) { (s, d) =>
    TextAnalysis.pmiCollocations(Tables.documents(s, d), "doc_id", "text",
      minCount = 5L, k = 30)
  }

  /** Per-doc token-distribution entropy (fixed-point exact). */
  val h49 = Q(
    "h49_token_entropy",
    """WITH toks AS (
      |  SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |                                    t -> len(t) > 0)) AS tok
      |  FROM documents),
      |tc AS (SELECT doc_id, tok, count(*) AS m FROM toks GROUP BY doc_id, tok),
      |n AS (SELECT doc_id, CAST(sum(m) AS BIGINT) AS n FROM tc GROUP BY doc_id),
      |q AS (
      |  SELECT tc.doc_id, tc.m, n.n,
      |    CAST(floor(ln(CAST(m AS DOUBLE) / CAST(n AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS q
      |  FROM tc JOIN n USING (doc_id))
      |SELECT doc_id, max(n) AS n_tokens,
      |  CAST(sum(m * q) AS BIGINT) AS sum_q,
      |  -CAST(sum(m * q) AS DOUBLE) / (CAST(max(n) AS DOUBLE) * 1000000.0) AS entropy
      |FROM q GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    TextAnalysis.tokenEntropy(Tables.documents(s, d), "doc_id", "text")
      .orderBy("doc_id")
  }

  /** Salted skew-safe equi-join under the gate (companion to h37's salted
    * aggregation): lineitem⋈part through Skew.saltedJoin — probe rows
    * salted, build side replicated per salt, join on (key, salt) — must be
    * row-for-row identical to the plain join the oracle runs. This is the
    * 100 TB answer when a hot-key side is too big to broadcast and AQE's
    * skew handling doesn't reach the join shape.
    */
  val h50 = Q(
    "h50_salted_join",
    """SELECT p.p_brand, count(*) AS n,
      |  CAST(sum(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
      |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
      |GROUP BY p.p_brand
      |ORDER BY p.p_brand""".stripMargin) { (s, d) =>
    val li = Tables.lineitem(s, d).select(col("l_partkey").as("pk"), col("l_quantity"))
    val pt = Tables.part(s, d).select(col("p_partkey").as("pk"), col("p_brand"))
    Skew.saltedJoin(li, pt, Seq("pk"), buckets = 8)
      .groupBy("p_brand")
      .agg(count(lit(1)).as("n"), Det.exactSum(col("l_quantity")).as("total_qty"))
      .orderBy("p_brand")
  }

  val all: Seq[Q] = Seq(h42, h43, h44, h45, h46, h47, h48, h49, h50)
}
