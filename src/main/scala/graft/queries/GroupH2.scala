package graft.queries

import graft.Tables
import graft.extensions.{Det, Histograms, Repetition, Sampling, Scrub, Vectors}
import org.apache.spark.sql.functions._

/** Group H (continued) — training-data pipeline operators added in round 4:
  * PII scrubbing, Gopher-style repetition metrics, deterministic stratified
  * and per-group sampling, embedding quantization, histogram quantile
  * sketches, and exact per-label centroids. Scale notes live on each
  * extension object; every query here follows the Q determinism contract.
  */
object GroupH2 {

  /** PII scrub + audit counts. The synthetic corpus carries no organic PII,
    * so the contact blob is derived deterministically from customer columns
    * (same adapt-the-fixture pattern as h14's binary payloads) — the
    * OPERATOR under test is the engine-portable regex scrub, which both
    * engines run over identical inputs.
    */
  val h29 = Q(
    "h29_pii_scrub",
    """WITH blob AS (
      |  SELECT c_custkey,
      |    c_name || ' contact: user' || CAST(c_custkey AS VARCHAR) ||
      |    '@example.com or +1-555-' ||
      |    lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0') ||
      |    ' seg ' || c_mktsegment AS t
      |  FROM customer)
      |SELECT c_custkey,
      |  regexp_replace(
      |    regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      |    '\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g') AS scrubbed,
      |  CAST(len(regexp_extract_all(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS INT) AS n_emails,
      |  CAST(len(regexp_extract_all(t, '\+?[0-9]{1,2}-[0-9]{3}-[0-9]{4}')) AS INT) AS n_phones
      |FROM blob
      |ORDER BY c_custkey""".stripMargin) { (s, d) =>
    val blob = concat(col("c_name"), lit(" contact: user"),
      col("c_custkey").cast("string"), lit("@example.com or +1-555-"),
      lpad(pmod(col("c_custkey"), lit(10000)).cast("string"), 4, "0"),
      lit(" seg "), col("c_mktsegment"))
    Tables.customer(s, d)
      .select(col("c_custkey"), blob.as("t"))
      .select(col("c_custkey"), Scrub.scrubPii(col("t")).as("scrubbed"),
        Scrub.emailCount(col("t")).as("n_emails"),
        Scrub.phoneCount(col("t")).as("n_phones"))
      .orderBy("c_custkey")
  }

  /** Gopher-style repetition quality metrics per document. */
  val h30 = Q(
    "h30_repetition_metrics",
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
      |    t -> len(t) > 0) AS l
      |  FROM documents),
      |tok AS (SELECT doc_id, unnest(l) AS tok FROM toks),
      |tc AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY doc_id, tok),
      |ts AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
      |  count(*) AS n_types, max(c) AS top_count FROM tc GROUP BY doc_id),
      |bg0 AS (SELECT doc_id, unnest(list_transform(generate_series(1, len(l) - 1),
      |  i -> l[i] || ' ' || l[i + 1])) AS bg FROM toks WHERE len(l) >= 2),
      |bc AS (SELECT doc_id, bg, count(*) AS c FROM bg0 GROUP BY doc_id, bg),
      |bs AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
      |  count(*) AS n_distinct_bigrams FROM bc GROUP BY doc_id)
      |SELECT d.doc_id,
      |  coalesce(ts.n_tokens, 0) AS n_tokens,
      |  coalesce(ts.n_types, 0) AS n_types,
      |  floor(CAST(ts.n_types AS DOUBLE) / CAST(ts.n_tokens AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS ttr,
      |  floor(CAST(ts.top_count AS DOUBLE) / CAST(ts.n_tokens AS DOUBLE) * 1000000.0 + 0.5) / 1000000.0 AS top_frac,
      |  floor((1.0 - CAST(bs.n_distinct_bigrams AS DOUBLE) / CAST(bs.n_bigrams AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS dup_bigram_frac
      |FROM documents d
      |LEFT JOIN ts ON d.doc_id = ts.doc_id
      |LEFT JOIN bs ON d.doc_id = bs.doc_id
      |ORDER BY d.doc_id""".stripMargin) { (s, d) =>
    // metrics is scan-side (zero exchanges; one output row per doc). The
    // repartition is the same materialization barrier as h17's: the display
    // sort range-samples its child, which would run the regex tokenization
    // twice; one exchange of the doc-sized metric rows runs it once.
    Repetition.metrics(Tables.documents(s, d), "doc_id", "text")
      .repartition(col("doc_id"))
      .orderBy("doc_id")
  }

  /** Deterministic stratified sample of events: per-type keep rates as md5
    * bucket cutoffs (purchase 100%, signup ~80%, click 50%, view 25%,
    * error 12.5%) — the downsample-the-noise / keep-the-signal shape of a
    * training-data pipeline, reproducible in any engine.
    */
  val h31 = Q(
    "h31_stratified_sample",
    """SELECT event_id, event_type FROM events
      |WHERE substring(md5(CAST(event_id AS VARCHAR)), 1, 2) <
      |  CASE event_type WHEN 'purchase' THEN 'zz' WHEN 'signup' THEN 'cd'
      |       WHEN 'click' THEN '80' WHEN 'view' THEN '40'
      |       WHEN 'error' THEN '20' ELSE '00' END
      |ORDER BY event_id""".stripMargin) { (s, d) =>
    Sampling.stratified(Tables.events(s, d), "event_id", "event_type",
      Seq("purchase" -> 256, "signup" -> 205, "click" -> 128,
        "view" -> 64, "error" -> 32))
      .select("event_id", "event_type")
      .orderBy("event_id")
  }

  /** Exactly-50-per-type deterministic sample (md5 pseudorandom order,
    * id tiebreak) — WindowGroupLimit keeps the per-group rank two-phase.
    */
  val h32 = Q(
    "h32_group_sample_topk",
    """SELECT event_type, rk, event_id FROM (
      |  SELECT event_type, event_id,
      |    row_number() OVER (PARTITION BY event_type
      |      ORDER BY md5(CAST(event_id AS VARCHAR)), event_id) AS rk
      |  FROM events) t
      |WHERE rk <= 50
      |ORDER BY event_type, rk""".stripMargin) { (s, d) =>
    Sampling.groupTopK(Tables.events(s, d), "event_type", "event_id", 50)
      .select(col("event_type"), col("rk").cast("long").as("rk"), col("event_id"))
      .orderBy("event_type", "rk")
  }

  /** Global-range int8 scalar quantization of the embedding corpus,
    * verified via per-vector code checksums.
    */
  val h33 = Q(
    "h33_quantize_embeddings",
    """WITH x AS (
      |  SELECT vec_id, i AS pos, embedding[i]::DOUBLE AS v
      |  FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(i)),
      |mm AS (SELECT pos, min(v) AS mn, max(v) AS mx FROM x GROUP BY pos),
      |codes AS (
      |  SELECT vec_id,
      |    CASE WHEN mx = mn THEN 0
      |         ELSE CAST(floor((v - mn) * 255.0 / (mx - mn)) AS INT) END AS code
      |  FROM x JOIN mm USING (pos))
      |SELECT vec_id, CAST(sum(code) AS BIGINT) AS q_sum,
      |  min(code) AS q_min, max(code) AS q_max
      |FROM codes GROUP BY vec_id
      |ORDER BY vec_id""".stripMargin) { (s, d) =>
    Vectors.quantizeScalar(Tables.embeddings(s, d), "vec_id", "embedding")
      .select(col("vid").as("vec_id"), col("q_sum"), col("q_min"), col("q_max"))
      .orderBy("vec_id")
  }

  /** Histogram-sketch p50/p90 of event value per type (16-unit bins):
    * the mergeable, engine-exact alternative to interpolated percentiles.
    */
  val h34 = Q(
    "h34_histogram_quantiles",
    """WITH b AS (
      |  SELECT event_type, CAST(floor(value / 16.0) AS INT) AS b, count(*) AS c
      |  FROM events GROUP BY event_type, b),
      |cum AS (
      |  SELECT event_type, b, c,
      |    sum(c) OVER (PARTITION BY event_type ORDER BY b) AS cum,
      |    sum(c) OVER (PARTITION BY event_type) AS total
      |  FROM b)
      |SELECT event_type, CAST(max(total) AS BIGINT) AS n,
      |  min(CASE WHEN cum * 2 >= total THEN b END) * CAST(16.0 AS DOUBLE) AS p50_lo,
      |  min(CASE WHEN cum * 10 >= total * 9 THEN b END) * CAST(16.0 AS DOUBLE) AS p90_lo
      |FROM cum GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    Histograms.quantileEstimates(Tables.events(s, d), "event_type", "value", 16.0)
      .select(col("grp").as("event_type"), col("n"), col("p50_lo"), col("p90_lo"))
      .orderBy("event_type")
  }

  /** Exact fixed-point per-label embedding centroids (class prototypes) —
    * bit-identical across engines via micro-unit integer sums.
    */
  val h35 = Q(
    "h35_label_centroids",
    """WITH x AS (
      |  SELECT label, CAST(i - 1 AS INT) AS pos,
      |    CAST(floor(embedding[i]::DOUBLE * 1000000.0 + 0.5) AS BIGINT) AS q
      |  FROM embeddings, UNNEST(generate_series(1, len(embedding))) AS t(i))
      |SELECT label, pos,
      |  CAST(CAST(sum(q) AS DOUBLE) / (CAST(count(*) AS DOUBLE) * 1000000.0) AS FLOAT) AS comp,
      |  count(*) AS n
      |FROM x GROUP BY label, pos
      |ORDER BY label, pos""".stripMargin) { (s, d) =>
    Vectors.groupCentroids(Tables.embeddings(s, d), "label", "embedding")
      .select(col("grp").as("label"), col("pos"), col("comp"), col("n"))
      .orderBy("label", "pos")
  }

  /** Stream-stream interval join (click→purchase attribution) run in batch
    * under the hard gate — the same `StreamJoins.clickPurchaseAttribution`
    * body the MemoryStream suite drives (watermarks are no-ops in batch).
    * State posture in streaming: both sides expire once the watermark
    * passes the attribution horizon, so join state is bounded.
    */
  val h36 = Q(
    "h36_click_purchase_attribution",
    """WITH c AS (
      |  SELECT user_id, event_id AS c_event_id, ts AS c_ts FROM events
      |  WHERE event_type = 'click'),
      |p AS (
      |  SELECT user_id AS p_user_id, event_id AS p_event_id, ts AS p_ts
      |  FROM events WHERE event_type = 'purchase')
      |SELECT user_id, c_event_id,
      |  strftime(c_ts, '%Y-%m-%d %H:%M:%S') AS c_ts_s,
      |  p_event_id,
      |  strftime(p_ts, '%Y-%m-%d %H:%M:%S') AS p_ts_s
      |FROM c JOIN p ON user_id = p_user_id
      |  AND p_ts >= c_ts AND p_ts <= c_ts + INTERVAL '30 minutes'
      |ORDER BY user_id, c_event_id, p_event_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    graft.streaming.StreamJoins.clickPurchaseAttribution(
      ev.filter(col("event_type") === "click"),
      ev.filter(col("event_type") === "purchase"))
      .select(col("user_id"), col("c_event_id"),
        date_format(col("c_ts"), "yyyy-MM-dd HH:mm:ss").as("c_ts_s"),
        col("p_event_id"),
        date_format(col("p_ts"), "yyyy-MM-dd HH:mm:ss").as("p_ts_s"))
      .orderBy("user_id", "c_event_id", "p_event_id")
  }

  /** Salted two-stage aggregation under the hard gate: the skew-mitigation
    * shape (no single-reducer hot key) must be RESULT-identical to the
    * plain groupBy — exact decimal sums make it bit-identical to the
    * oracle's plain GROUP BY in any engine.
    */
  val h37 = Q(
    "h37_salted_type_stats",
    """SELECT event_type,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
      |  count(*) AS count_rows
      |FROM events GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, d) =>
    graft.extensions.Skew.saltedSumCount(Tables.events(s, d),
      Seq("event_type"), "value", buckets = 32, exactScale = Some(2))
      .select(col("event_type"), col("sum_value").as("sum_value"),
        col("count_rows"))
      .orderBy("event_type")
  }

  /** Data-quality column profile — the audit report step of a training
    * pipeline: per column (over a normalized string projection so every
    * type shares one metric space): row/non-null/distinct counts and
    * lexicographic min/max. ONE scan: a `stack` generator reshapes the row
    * into (col_name, value) pairs feeding a single partial-aggregated
    * grouped aggregation — at 100 TB this beats one pass per column (6
    * scans) and beats a single multi-DISTINCT aggregate (whose Expand
    * replicates the whole scan ×columns for ALL metrics; here only the
    * stacked pairs shuffle, combined map-side). Doubles are normalized
    * through DECIMAL(18,2) before stringification — engine-portable repr,
    * unlike raw double formatting; timestamps to second-precision strings
    * (the profile is DEFINED over these normalized representations).
    */
  val h38 = Q(
    "h38_column_profile",
    """WITH s AS (
      |  SELECT CAST(event_id AS VARCHAR) AS event_id,
      |    strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts,
      |    CAST(user_id AS VARCHAR) AS user_id, event_type,
      |    CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) AS value, props
      |  FROM events)
      |SELECT * FROM (
      |  SELECT 'event_id' AS col_name, count(*) AS n_rows,
      |    count(event_id) AS n_nonnull, count(DISTINCT event_id) AS n_distinct,
      |    min(event_id) AS min_s, max(event_id) AS max_s FROM s
      |  UNION ALL SELECT 'ts', count(*), count(ts), count(DISTINCT ts),
      |    min(ts), max(ts) FROM s
      |  UNION ALL SELECT 'user_id', count(*), count(user_id),
      |    count(DISTINCT user_id), min(user_id), max(user_id) FROM s
      |  UNION ALL SELECT 'event_type', count(*), count(event_type),
      |    count(DISTINCT event_type), min(event_type), max(event_type) FROM s
      |  UNION ALL SELECT 'value', count(*), count(value),
      |    count(DISTINCT value), min(value), max(value) FROM s
      |  UNION ALL SELECT 'props', count(*), count(props),
      |    count(DISTINCT props), min(props), max(props) FROM s) t
      |ORDER BY col_name""".stripMargin) { (s, d) =>
    val norm = Tables.events(s, d).select(
      col("event_id").cast("string").as("event_id"),
      date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts"),
      col("user_id").cast("string").as("user_id"),
      col("event_type"),
      col("value").cast("decimal(18,2)").cast("string").as("value"),
      col("props"))
    // Two explicit aggregate levels (round 22): the single-groupBy form
    // (countDistinct + min/max) plans min/max(string) as PARTIAL functions
    // of the corpus-level distinct expand — and min over strings has no
    // fixed-width mutable buffer, so the whole 6×N stacked relation went
    // through a SortAggregate (sorted on both sides of the exchange).
    // Counting per (col, v) first is a plain HashAggregate; the string
    // min/max then run over the distinct-value relation only. Identical
    // results: sum of group counts = count(*) (null groups included),
    // conditional sums/counts reproduce count(v)/count(DISTINCT v)'s
    // null handling, min/max ignore the null group like the originals.
    norm
      .select(expr("""stack(6,
        |'event_id', event_id, 'ts', ts, 'user_id', user_id,
        |'event_type', event_type, 'value', value, 'props', props)
        |AS (col_name, v)""".stripMargin))
      .groupBy("col_name", "v")
      .agg(count(lit(1)).as("__cnt"))
      .groupBy("col_name")
      .agg(sum(col("__cnt")).as("n_rows"),
        coalesce(sum(when(col("v").isNotNull, col("__cnt"))), lit(0L))
          .as("n_nonnull"),
        count(when(col("v").isNotNull, lit(1))).as("n_distinct"),
        min(col("v")).as("min_s"), max(col("v")).as("max_s"))
      .orderBy("col_name")
  }

  /** Corpus-trained unigram LM quality score per document (fixed-point
    * exact sums; CCNet-style perplexity-proxy filtering).
    */
  val h39 = Q(
    "h39_unigram_lm_score",
    """WITH toks AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
      |    t -> len(t) > 0) AS l
      |  FROM documents),
      |tok AS (SELECT doc_id, unnest(l) AS tok FROM toks),
      |dt AS (SELECT doc_id, tok, count(*) AS m FROM tok GROUP BY doc_id, tok),
      |vc AS (SELECT tok, CAST(sum(m) AS BIGINT) AS c FROM dt GROUP BY tok),
      |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n_total FROM vc),
      |lp AS (
      |  SELECT tok,
      |    CAST(floor(ln(CAST(c AS DOUBLE) / CAST(n_total AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS q
      |  FROM vc, tot)
      |SELECT dt.doc_id, CAST(sum(m) AS BIGINT) AS n_tokens,
      |  CAST(sum(m * q) AS BIGINT) AS sum_q,
      |  CAST(sum(m * q) AS DOUBLE) / (CAST(sum(m) AS DOUBLE) * 1000000.0) AS avg_logprob
      |FROM dt JOIN lp USING (tok)
      |GROUP BY dt.doc_id
      |ORDER BY dt.doc_id""".stripMargin) { (s, d) =>
    graft.extensions.LmScore.unigramScores(Tables.documents(s, d), "doc_id", "text")
      .orderBy("doc_id")
  }

  /** Session-scoped funnel conversion (click → purchase within the same
    * gap session, purchase at-or-after the first click).
    */
  val h40 = Q(
    "h40_funnel_conversion",
    """WITH g AS (
      |  SELECT user_id, event_id, ts, event_type,
      |    CASE WHEN lag(ts) OVER w IS NULL THEN 1
      |         WHEN date_diff('second', lag(ts) OVER w, ts) > 1800 THEN 1
      |         ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT user_id, event_id, ts, event_type,
      |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_n
      |  FROM g),
      |f AS (
      |  SELECT user_id, session_n, ts, event_type,
      |    min(CASE WHEN event_type = 'click' THEN ts END)
      |      OVER (PARTITION BY user_id, session_n) AS first_click
      |  FROM s)
      |SELECT user_id, CAST(session_n AS BIGINT) AS session_n,
      |  count(*) AS n_events,
      |  CAST(max(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS INT) AS has_from,
      |  CAST(max(CASE WHEN event_type = 'purchase' AND ts >= first_click
      |       THEN 1 ELSE 0 END) AS INT) AS converted
      |FROM f GROUP BY user_id, session_n
      |ORDER BY user_id, session_n""".stripMargin) { (s, d) =>
    graft.extensions.Funnel.sessionConversion(Tables.events(s, d),
      "user_id", "ts", "event_type", 1800L, "click", "purchase")
      .orderBy("user_id", "session_n")
  }

  /** SimHash-banded near-dup pairs over 32-bit integer signatures (md5
    * supplies 32 vote nibbles; 16 bits is near-degenerate on a topically
    * uniform corpus — see Dedup.simhashLongs). Width-8 bands give 256-way
    * bucket keys with exact recall for hamming ≤ 3 by pigeonhole; the
    * Hamming verify is one `bit_count(xor)` on the join stream BEFORE the
    * distinct, so only verified pairs shuffle.
    */
  val h41 = Q(
    "h41_simhash_near_dup",
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
      |  WHERE bit_count(xor(a.sig, b.sig)) <= 2)
      |SELECT id_a, id_b, hamming FROM cand
      |ORDER BY id_a, id_b""".stripMargin) { (s, d) =>
    // h41 IS the shared pair-graph construction (same parameters), so it
    // routes through DupGraph like its four graph-analytics consumers:
    // per-call simhashNearDupPairs everywhere, the materialized graph
    // under Bench's opt-in
    DupGraph.pairs(s, d).orderBy("id_a", "id_b")
  }

  val all: Seq[Q] = Seq(h29, h30, h31, h32, h33, h34, h35, h36, h37, h38,
    h39, h40, h41)
}
