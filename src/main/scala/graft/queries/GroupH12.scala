package graft.queries

import graft.Tables
import graft.extensions.{Attribution, Quality}
import org.apache.spark.sql.functions._

/** Group H (continued) — round-6 batch 8: data-quality expectations and
  * multi-touch attribution. Scale notes live on the extension objects.
  */
object GroupH12 {

  /** Data-quality expectation report over the star (Quality.check): six
    * rules across three sources — per source ONE scan of conditional
    * aggregates, reshaped to rule rows by the `stack` generator (no
    * per-rule scans). Cross-table rules (referential integrity, cross-field
    * date order) enter as pre-joined violation flags through the same path.
    */
  val h92 = Q(
    "h92_dq_expectations",
    """WITH li AS (
      |  SELECT count(*) AS total,
      |    CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_qty_null,
      |    CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 0.5 THEN 1 ELSE 0 END) AS BIGINT) AS v_disc_range
      |  FROM lineitem),
      |o AS (
      |  SELECT count(*) AS total,
      |    CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS v_price_pos,
      |    CAST(sum(CASE WHEN o_orderdate > TIMESTAMP '1998-12-01' THEN 1 ELSE 0 END) AS BIGINT) AS v_future_date
      |  FROM orders),
      |ref AS (
      |  SELECT count(*) AS total,
      |    CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_orphan,
      |    CAST(sum(CASE WHEN o_orderkey IS NOT NULL
      |             AND l_shipdate < o_orderdate THEN 1 ELSE 0 END) AS BIGINT) AS v_ship_before_order
      |  FROM lineitem LEFT JOIN orders ON l_orderkey = o_orderkey)
      |SELECT rule_id, violations, total,
      |  floor(CAST(violations AS DOUBLE) / CAST(total AS DOUBLE) * 1000000 + 0.5)
      |    / 1000000 AS violation_rate
      |FROM (
      |  SELECT 'li_quantity_not_null' AS rule_id, v_qty_null AS violations, total FROM li
      |  UNION ALL SELECT 'li_discount_in_range', v_disc_range, total FROM li
      |  UNION ALL SELECT 'o_totalprice_positive', v_price_pos, total FROM o
      |  UNION ALL SELECT 'o_orderdate_not_future', v_future_date, total FROM o
      |  UNION ALL SELECT 'li_orderkey_resolves', v_orphan, total FROM ref
      |  UNION ALL SELECT 'li_ship_after_order', v_ship_before_order, total FROM ref)
      |ORDER BY rule_id""".stripMargin) { (s, d) =>
    import graft.extensions.Quality.Expectation
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    val liRules = Quality.check(li, Seq(
      Expectation("li_quantity_not_null", col("l_quantity").isNull),
      Expectation("li_discount_in_range",
        col("l_discount") < 0 || col("l_discount") > 0.5)))
    val oRules = Quality.check(o, Seq(
      Expectation("o_totalprice_positive", col("o_totalprice") <= 0),
      Expectation("o_orderdate_not_future",
        col("o_orderdate") > lit("1998-12-01").cast("timestamp"))))
    val joined = li.join(o, col("l_orderkey") === col("o_orderkey"), "left")
    val refRules = Quality.check(joined, Seq(
      Expectation("li_orderkey_resolves", col("o_orderkey").isNull),
      Expectation("li_ship_after_order",
        col("o_orderkey").isNotNull && col("l_shipdate") < col("o_orderdate"))))
    liRules.unionAll(oRules).unionAll(refRules).orderBy("rule_id")
  }

  /** Linear multi-touch attribution by position
    * (Attribution.linearByPosition): purchases credit every same-user
    * click in the trailing 24 h equally; the report splits credited value
    * by first/middle/last touch position. Banded user+time-bucket join —
    * never a cross product; exact integer credit math.
    */
  val h93 = Q(
    "h93_touch_attribution",
    """WITH c AS (
      |  SELECT user_id, event_id AS c_event_id, ts AS c_ts FROM events
      |  WHERE event_type = 'click'),
      |p AS (
      |  SELECT user_id, event_id AS p_event_id, ts AS p_ts,
      |    CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase'),
      |paired AS (
      |  SELECT p.user_id, p_event_id, c_event_id, c_ts, cents
      |  FROM p JOIN c ON p.user_id = c.user_id
      |    AND c_ts >= p_ts - INTERVAL '24 hours' AND c_ts <= p_ts),
      |ranked AS (
      |  SELECT *,
      |    count(*) OVER (PARTITION BY p_event_id) AS n,
      |    row_number() OVER (PARTITION BY p_event_id
      |      ORDER BY c_ts, c_event_id) AS rk
      |  FROM paired)
      |SELECT CASE WHEN rk = 1 THEN 'first'
      |            WHEN rk = n THEN 'last'
      |            ELSE 'middle' END AS position,
      |  count(*) AS n_touches,
      |  CAST(sum((cents * 10000) // n) AS BIGINT) AS credit_micro,
      |  CAST(sum((cents * 10000) // n) AS DOUBLE) / 1000000.0 AS credit_value
      |FROM ranked GROUP BY 1 ORDER BY position""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    Attribution.linearByPosition(
        ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts").as("c_ts"), col("event_id").as("c_event_id")),
        ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("p_event_id"),
            col("value")),
        "user_id", "c_ts", "c_event_id", "p_ts", "p_event_id", "value",
        windowSeconds = 24L * 3600)
      .orderBy("position")
  }

  /** k-NN label voting — the classification step a labeled corpus supports
    * once similarity search exists: each query vector takes the majority
    * label of its 5 nearest neighbors (Similarity.bruteForceTopK — the
    * exact recall baseline; at real scale the candidate generator swaps
    * for ivfTopK with the same vote tail). Vote counts are integers; the
    * winner is row_number over (votes desc, label asc) — fully ordered, so
    * both engines elect the same label including ties.
    */
  val h94 = Q(
    "h94_knn_label_vote",
    """WITH q AS (SELECT vec_id AS query_id, embedding AS qv FROM embeddings
      |  WHERE vec_id >= 8 AND vec_id < 28),
      |c AS (SELECT vec_id AS neighbor_id, embedding AS cv, label FROM embeddings),
      |norms AS (
      |  SELECT vec_id,
      |    sqrt(list_aggregate(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE), 'sum')) AS nrm
      |  FROM embeddings),
      |scored AS (
      |  SELECT query_id, neighbor_id, label,
      |    floor(list_aggregate(
      |      list_transform(generate_series(1, len(qv)), i -> qv[i]::DOUBLE * cv[i]::DOUBLE),
      |      'sum') / (nq.nrm * nc.nrm) * 10000 + 0.5) / 10000 AS cos
      |  FROM q JOIN c ON query_id <> neighbor_id
      |  JOIN norms nq ON nq.vec_id = query_id
      |  JOIN norms nc ON nc.vec_id = neighbor_id),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY query_id
      |    ORDER BY cos DESC, neighbor_id) AS rank
      |  FROM scored),
      |votes AS (
      |  SELECT query_id, label, count(*) AS votes
      |  FROM ranked WHERE rank <= 5 GROUP BY query_id, label),
      |won AS (
      |  SELECT query_id, label AS pred_label, votes,
      |    row_number() OVER (PARTITION BY query_id
      |      ORDER BY votes DESC, label) AS w
      |  FROM votes)
      |SELECT query_id, pred_label, votes FROM won WHERE w = 1
      |ORDER BY query_id""".stripMargin) { (s, d) =>
    import org.apache.spark.sql.expressions.Window
    val embs = Tables.embeddings(s, d)
    val topk = graft.extensions.Similarity.bruteForceTopK(
      embs, embs.filter(col("vec_id") >= 8 && col("vec_id") < 28),
      "vec_id", "embedding", 5)
    val labels = embs.select(col("vec_id").as("neighbor_id"), col("label"))
    topk.join(broadcast(labels), "neighbor_id")
      .groupBy("query_id", "label")
      .agg(count(lit(1)).as("votes"))
      .withColumn("w", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("votes").desc, col("label"))))
      .filter(col("w") === 1)
      .select(col("query_id"), col("label").as("pred_label"), col("votes"))
      .orderBy("query_id")
  }

  /** Robust outlier screen per event type: median and MAD (median absolute
    * deviation) via the e6 exact-interpolated-percentile device — Spark's
    * `percentile` and the oracle's hand-rolled `lo + (hi−lo)·frac` compute
    * identical IEEE chains — then the modified z-score
    * `0.6745·(v−med)/mad > 3.5` counted with identical per-row ops. The
    * classical mean/σ screen (e12) breaks under the heavy tail this data
    * has; MAD is the robust form. Two aggregation passes + a broadcast
    * join back; scale-safe.
    */
  val h95 = Q(
    "h95_robust_outliers_mad",
    """WITH ev AS (
      |  SELECT event_type, event_id, value AS v FROM events
      |  WHERE value IS NOT NULL),
      |ranked AS (
      |  SELECT event_type, v,
      |    row_number() OVER (PARTITION BY event_type ORDER BY v) - 1 AS idx,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM ev),
      |medp AS (
      |  SELECT event_type, n,
      |    max(CASE WHEN idx = CAST(floor(0.5*(n-1)) AS BIGINT) THEN v END) AS lo,
      |    max(CASE WHEN idx = CAST(ceil(0.5*(n-1)) AS BIGINT) THEN v END) AS hi
      |  FROM ranked GROUP BY event_type, n),
      |med AS (
      |  SELECT event_type, n,
      |    lo + (hi - lo) * (0.5*(n-1) - floor(0.5*(n-1))) AS med
      |  FROM medp),
      |dev AS (
      |  SELECT e.event_type, e.v, m.med, m.n, abs(e.v - m.med) AS dv
      |  FROM ev e JOIN med m USING (event_type)),
      |dranked AS (
      |  SELECT event_type, med, n, dv,
      |    row_number() OVER (PARTITION BY event_type ORDER BY dv) - 1 AS idx
      |  FROM dev),
      |madp AS (
      |  SELECT event_type, med, n,
      |    max(CASE WHEN idx = CAST(floor(0.5*(n-1)) AS BIGINT) THEN dv END) AS lo,
      |    max(CASE WHEN idx = CAST(ceil(0.5*(n-1)) AS BIGINT) THEN dv END) AS hi
      |  FROM dranked GROUP BY event_type, med, n),
      |mad AS (
      |  SELECT event_type, med, n,
      |    lo + (hi - lo) * (0.5*(n-1) - floor(0.5*(n-1))) AS mad
      |  FROM madp)
      |SELECT d.event_type, m.n,
      |  floor(m.med * 10000 + 0.5) / 10000 AS median_v,
      |  floor(m.mad * 10000 + 0.5) / 10000 AS mad_v,
      |  CAST(sum(CASE WHEN m.mad > 0
      |    AND abs(0.6745 * (d.v - m.med) / m.mad) > 3.5
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
      |FROM dev d JOIN mad m USING (event_type)
      |GROUP BY d.event_type, m.n, m.med, m.mad
      |ORDER BY d.event_type""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
      .filter(col("value").isNotNull)
      .select(col("event_type"), col("value").as("v"))
    val med = ev.groupBy("event_type")
      .agg(expr("percentile(v, 0.5D)").as("med"), count(lit(1)).as("n"))
    val dev = ev.join(broadcast(med), "event_type")
      .withColumn("dv", abs(col("v") - col("med")))
    val mad = dev.groupBy("event_type")
      .agg(expr("percentile(dv, 0.5D)").as("mad"))
    dev.join(broadcast(mad), "event_type")
      .groupBy(col("event_type"), col("n"), col("med"), col("mad"))
      .agg(sum(when(col("mad") > 0 &&
        abs(lit(0.6745) * (col("v") - col("med")) / col("mad")) > 3.5, 1L)
        .otherwise(0L)).as("n_outliers"))
      .select(col("event_type"), col("n"),
        graft.extensions.Det.floorRound(col("med"), 4).as("median_v"),
        graft.extensions.Det.floorRound(col("mad"), 4).as("mad_v"),
        col("n_outliers"))
      .orderBy("event_type")
  }

  /** Zipf rank-frequency slope of the corpus vocabulary: least-squares fit
    * of ln(freq) against ln(rank) over the top-100 terms — the one-number
    * "is this natural language" screen (natural text ≈ −1). Per-term log
    * products quantize to micro-unit integers (the h68/h55 device) so the
    * regression moment sums are exact; the closed-form slope is then ONE
    * fixed IEEE chain over identical doubles. The top-100 is bounded by
    * construction (TakeOrdered 100 rows), so the rank window is never
    * corpus-sized.
    */
  val h96 = Q(
    "h96_zipf_slope",
    """WITH tok AS (
      |  SELECT doc_id,
      |    unnest(list_filter(string_split_regex(lower(text), '\s+'),
      |                       t -> len(t) > 0)) AS token
      |  FROM documents),
      |c AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
      |top AS (SELECT token, cnt FROM c ORDER BY cnt DESC, token LIMIT 100),
      |r AS (SELECT cnt, row_number() OVER (ORDER BY cnt DESC, token) AS rank
      |      FROM top),
      |m AS (SELECT count(*) AS n,
      |  CAST(sum(CAST(floor(ln(rank) * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS sx,
      |  CAST(sum(CAST(floor(ln(cnt) * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS sy,
      |  CAST(sum(CAST(floor(ln(rank) * ln(cnt) * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS sxy,
      |  CAST(sum(CAST(floor(ln(rank) * ln(rank) * 1000000 + 0.5) AS BIGINT)) AS BIGINT) AS sx2
      |  FROM r)
      |SELECT n AS n_terms,
      |  floor((n * (CAST(sxy AS DOUBLE) / 1000000)
      |      - (CAST(sx AS DOUBLE) / 1000000) * (CAST(sy AS DOUBLE) / 1000000))
      |    / (n * (CAST(sx2 AS DOUBLE) / 1000000)
      |      - (CAST(sx AS DOUBLE) / 1000000) * (CAST(sx AS DOUBLE) / 1000000))
      |    * 1000000 + 0.5) / 1000000 AS zipf_slope
      |FROM m""".stripMargin) { (s, d) =>
    import graft.extensions.TextOps
    val tok = Tables.documents(s, d)
      .select(explode(TextOps.tokens(col("text"))).as("token"))
    val top = tok.groupBy("token").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token")).limit(100)
    val r = top.withColumn("rank", row_number().over(
      org.apache.spark.sql.expressions.Window
        .orderBy(col("cnt").desc, col("token"))))
    def mic(c: org.apache.spark.sql.Column) =
      sum(floor(c * 1000000 + 0.5).cast("long"))
    val m = r.agg(count(lit(1)).as("n"),
      mic(log(col("rank"))).as("sx"), mic(log(col("cnt"))).as("sy"),
      mic(log(col("rank")) * log(col("cnt"))).as("sxy"),
      mic(log(col("rank")) * log(col("rank"))).as("sx2"))
    val dx = col("sx").cast("double") / 1000000
    val dy = col("sy").cast("double") / 1000000
    m.select(col("n").as("n_terms"),
      graft.extensions.Det.floorRound(
        (col("n") * (col("sxy").cast("double") / 1000000) - dx * dy) /
        (col("n") * (col("sx2").cast("double") / 1000000) - dx * dx), 6)
        .as("zipf_slope"))
  }

  /** Forward as-of join (AsOf.asOfJoinForward): each click picks up its
    * NEXT same-user purchase at-or-after — the time-to-convert join —
    * via the union + one-descending-window construction: one shuffle,
    * O(1) window state, no per-key cross product (the lateral form the
    * oracle uses would explode at scale).
    */
  val h97 = Q(
    "h97_next_conversion",
    """WITH l AS (
      |  SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'),
      |r AS (
      |  SELECT user_id, event_id, ts, value FROM events
      |  WHERE event_type = 'purchase')
      |SELECT l.user_id, l.event_id,
      |  strftime(l.ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
      |  m.p_event_id AS next_event_id,
      |  strftime(m.p_ts, '%Y-%m-%d %H:%M:%S') AS next_ts_s,
      |  CAST(date_diff('second', l.ts, m.p_ts) AS BIGINT) AS wait_s
      |FROM l LEFT JOIN LATERAL (
      |  SELECT r.event_id AS p_event_id, r.ts AS p_ts
      |  FROM r
      |  WHERE r.user_id = l.user_id AND r.ts >= l.ts
      |  ORDER BY r.ts ASC, r.event_id DESC LIMIT 1) m ON TRUE
      |ORDER BY l.event_id""".stripMargin) { (s, d) =>
    val ev = Tables.events(s, d)
    graft.extensions.AsOf.asOfJoinForward(
        ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("event_id"), col("ts")),
        ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts")),
        Seq("user_id"), "ts", "event_id", Seq("event_id", "ts"))
      .select(col("user_id"), col("event_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_s"),
        col("next_event_id"),
        date_format(col("next_ts"), "yyyy-MM-dd HH:mm:ss").as("next_ts_s"),
        (unix_timestamp(col("next_ts")) - unix_timestamp(col("ts")))
          .as("wait_s"))
      .orderBy("event_id")
  }

  /** Deterministic salted pseudonymization (Scrub.pseudonymize): customer
    * keys tokenize to 16-hex md5 tokens in BOTH orders and customer, the
    * join runs ON THE TOKENS, and the per-segment rollup proves referential
    * integrity survives tokenization (counts identical to the raw-key
    * join). Pure scan-stage projections; md5 is the engine-portable
    * Splits/Sampling device.
    */
  val h98 = Q(
    "h98_pseudonymized_join",
    """WITH c AS (
      |  SELECT substr(md5('pepper:' || CAST(c_custkey AS VARCHAR)), 1, 16) AS token,
      |    c_mktsegment
      |  FROM customer),
      |o AS (
      |  SELECT substr(md5('pepper:' || CAST(o_custkey AS VARCHAR)), 1, 16) AS token,
      |    o_orderkey
      |  FROM orders)
      |SELECT c_mktsegment, count(*) AS n_orders,
      |  count(DISTINCT c.token) AS n_customers
      |FROM c JOIN o ON c.token = o.token
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin) { (s, d) =>
    import graft.extensions.Scrub
    val c = Tables.customer(s, d).select(
      Scrub.pseudonymize(col("c_custkey"), "pepper").as("token"),
      col("c_mktsegment"))
    val o = Tables.orders(s, d).select(
      Scrub.pseudonymize(col("o_custkey"), "pepper").as("token"),
      col("o_orderkey"))
    c.join(o, "token")
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(col("token")).as("n_customers"))
      .orderBy("c_mktsegment")
  }

  /** Real video bytes through the multimodal boundary (h52's posture
    * extended with the frame axis): a deterministic raw-DIB AVI fixture —
    * REAL RIFF/AVI container layout: LIST nesting, bottom-up 4-byte-padded
    * frame rows, idx1 index — is written to a parquet `binary` column, read
    * back, and decoded by [[graft.extensions.Multimodal.AviCodec]] parsing
    * actual headers and frame chunks, sampling every 2nd frame. The oracle
    * never sees a byte: it recomputes dims, frame counts, the closed-form
    * container size (232 + n_frames·(24 + row·h) for even frame sizes), and
    * the sampled-frame pixel-byte sum from the generating arithmetic, so
    * any header, stride, frame-boundary, or sampling bug in encode OR
    * decode breaks the hash match.
    */
  val h99 = Q(
    "h99_video_decode",
    """WITH m AS (
      |  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h,
      |    2 + doc_id % 3 AS nf
      |  FROM documents),
      |fr AS (
      |  SELECT doc_id, w, h, nf,
      |    unnest(generate_series(0, nf - 1, 2)) AS k
      |  FROM m),
      |px AS (
      |  SELECT doc_id, w, h, nf, k,
      |    unnest(generate_series(0, 3 * w * h - 1)) AS j
      |  FROM fr)
      |SELECT doc_id AS media_id,
      |  CAST(w AS BIGINT) AS width,
      |  CAST(h AS BIGINT) AS height,
      |  CAST(nf AS BIGINT) AS n_frames,
      |  CAST(count(DISTINCT k) AS BIGINT) AS n_sampled,
      |  CAST(232 + nf * (24 + ((3 * w + 3) // 4) * 4 * h) AS BIGINT) AS n_bytes,
      |  CAST(sum((doc_id * 31 + k * 11 + j * 7) % 256) AS BIGINT) AS sum_bytes
      |FROM px
      |GROUP BY doc_id, w, h, nf
      |ORDER BY media_id""".stripMargin) { (s, d) =>
    import graft.extensions.Multimodal
    val media = Multimodal.toAviMedia(Tables.documents(s, d), "doc_id")
    val sfTag = d.replaceAll("[^A-Za-z0-9._-]", "_")
    val fixture = s"${System.getProperty("java.io.tmpdir")}/graft_avi_fixture_" +
      s"${sfTag}_pid${ProcessHandle.current().pid()}"
    Multimodal.videoStats(Multimodal.roundTripParquet(media, fixture), frameStride = 2)
      .toDF()
      .orderBy("media_id")
  }

  /** Video RESIZE oracle-checked end-to-end (round 11, h99's sibling): the
    * raw-DIB AVI fixture round-trips parquet, is resampled to 3×2 per frame
    * ([[graft.extensions.Multimodal.resizeVideos]] — container re-encode at
    * the source fps), then decoded + frame-sampled by the same
    * [[graft.extensions.Multimodal.videoStats]] pass. The oracle replays
    * the nearest-neighbor mapping in pure integer SQL: target byte j of
    * frame k reads source byte ((y·h/2)·w + (x·w/3))·3 + c, so the summed
    * pixel law pins the resample formula, the re-encoded container layout
    * (232 + 48·n_frames), and the decode — any off-by-one in sx/sy, frame
    * boundaries, or header arithmetic breaks the hash.
    */
  val h100 = Q(
    "h100_video_resize",
    """WITH m AS (
      |  SELECT doc_id, 4 + doc_id % 5 AS w, 3 + doc_id % 4 AS h,
      |    2 + doc_id % 3 AS nf
      |  FROM documents),
      |fr AS (
      |  SELECT doc_id, w, h, nf,
      |    unnest(generate_series(0, nf - 1, 2)) AS k
      |  FROM m),
      |px AS (
      |  SELECT doc_id, w, h, nf, k,
      |    unnest(generate_series(0, 17)) AS j
      |  FROM fr),
      |src AS (
      |  SELECT doc_id, nf, k,
      |    ((((j // 3) // 3) * h // 2) * w + ((j // 3) % 3) * w // 3) * 3
      |      + j % 3 AS sj
      |  FROM px)
      |SELECT doc_id AS media_id,
      |  CAST(3 AS BIGINT) AS width,
      |  CAST(2 AS BIGINT) AS height,
      |  CAST(nf AS BIGINT) AS n_frames,
      |  CAST(count(DISTINCT k) AS BIGINT) AS n_sampled,
      |  CAST(232 + nf * 48 AS BIGINT) AS n_bytes,
      |  CAST(sum((doc_id * 31 + k * 11 + sj * 7) % 256) AS BIGINT) AS sum_bytes
      |FROM src
      |GROUP BY doc_id, nf
      |ORDER BY media_id""".stripMargin) { (s, d) =>
    import graft.extensions.Multimodal
    val media = Multimodal.toAviMedia(Tables.documents(s, d), "doc_id")
    // own fixture path, NOT h99's: Bench's watchdog abandons a timed-out
    // query thread that may still be writing, so two queries sharing one
    // mutable path could race overwrite-vs-scan
    val sfTag = d.replaceAll("[^A-Za-z0-9._-]", "_")
    val fixture = s"${System.getProperty("java.io.tmpdir")}/graft_avi_resize_fixture_" +
      s"${sfTag}_pid${ProcessHandle.current().pid()}"
    val resized = Multimodal.resizeVideos(
      Multimodal.roundTripParquet(media, fixture), targetW = 3, targetH = 2)
    Multimodal.videoStats(resized, frameStride = 2)
      .toDF()
      .orderBy("media_id")
  }

  /** Audio decode + sample-rate conversion oracle-checked end-to-end
    * (round 11 — completes the per-modality oracle matrix beside
    * h52/h99/h100): a deterministic mono PCM16 WAV fixture (real canonical
    * RIFF/WAVE bytes) round-trips parquet, is 2:1 downsampled
    * ([[graft.extensions.Multimodal.resampleAudio]] — nearest-frame pick,
    * canonical re-encode), and decoded by
    * [[graft.extensions.Multimodal.audioStats]]. The oracle replays the
    * kept-sample law in pure integer SQL (out frame i ← source sample 2i,
    * value (id·13 + 2i·7) mod 65536 − 32768) plus the re-encoded header
    * size, pinning resample, header arithmetic, and sign-extended decode
    * in one hash.
    */
  val h101 = Q(
    "h101_audio_resample",
    """WITH m AS (
      |  SELECT doc_id, 50 + doc_id % 50 AS n FROM documents),
      |s AS (
      |  SELECT doc_id, n,
      |    unnest(generate_series(0, n // 2 - 1)) AS i
      |  FROM m)
      |SELECT doc_id AS media_id,
      |  CAST(4000 AS BIGINT) AS sample_rate,
      |  CAST(1 AS BIGINT) AS channels,
      |  CAST(n // 2 AS BIGINT) AS n_frames,
      |  CAST(44 + (n // 2) * 2 AS BIGINT) AS n_bytes,
      |  CAST(sum((doc_id * 13 + i * 2 * 7) % 65536 - 32768) AS BIGINT) AS sum_samples
      |FROM s
      |GROUP BY doc_id, n
      |ORDER BY media_id""".stripMargin) { (s, d) =>
    import graft.extensions.Multimodal
    val media = Multimodal.toWavMedia(Tables.documents(s, d), "doc_id")
    val sfTag = d.replaceAll("[^A-Za-z0-9._-]", "_")
    val fixture = s"${System.getProperty("java.io.tmpdir")}/graft_wav_fixture_" +
      s"${sfTag}_pid${ProcessHandle.current().pid()}"
    Multimodal.audioStats(Multimodal.resampleAudio(
        Multimodal.roundTripParquet(media, fixture), targetRate = 4000))
      .toDF()
      .orderBy("media_id")
  }

  /** The MJPEG (compressed-stream) video path oracle-gated end-to-end
    * (round 12 — closes the one modality branch h99/h100 left to a
    * spec-only pin): a deterministic MJPG-handler AVI fixture — each '00dc'
    * chunk a REAL ImageIO-encoded JPEG of an integer pixel law — round-trips
    * parquet and is decoded by the production path
    * ([[graft.extensions.Multimodal.AviCodec]]'s container walk → chunk
    * slice → ImageIO JPEG decode → BGR plane). JPEG's lossy DCT has no
    * closed integer form a SQL oracle can replay, so the oracle-checkable
    * quantity is an EQUALITY COUNT ([[graft.extensions.Multimodal
    * .mjpegVerifyStats]]): each sampled frame's in-container decode is
    * compared byte-for-byte against the plane decoded from an independently
    * regenerated encoding of the same logical frame (ImageIO JPEG encode is
    * deterministic for fixed pixels within a JDK — both sides run in the
    * same JVM). The oracle replays the dims/frame-count law and pins
    * n_matched = n_sampled: a one-byte chunk-slice error makes the sliced
    * JPEG undecodable (the query throws) or its plane unequal (hash
    * mismatch), so container offsets, lengths, the MJPEG branch, and the
    * plane extraction are all under the gate.
    */
  val h102 = Q(
    "h102_mjpeg_decode",
    """WITH m AS (
      |  SELECT doc_id, 2 + doc_id % 3 AS nf FROM documents)
      |SELECT doc_id AS media_id,
      |  CAST(8 + doc_id % 5 AS BIGINT) AS width,
      |  CAST(6 + doc_id % 4 AS BIGINT) AS height,
      |  CAST(nf AS BIGINT) AS n_frames,
      |  CAST((nf + 1) // 2 AS BIGINT) AS n_sampled,
      |  CAST((nf + 1) // 2 AS BIGINT) AS n_matched
      |FROM m
      |ORDER BY media_id""".stripMargin) { (s, d) =>
    import graft.extensions.Multimodal
    val media = Multimodal.toMjpegMedia(Tables.documents(s, d), "doc_id")
    val sfTag = d.replaceAll("[^A-Za-z0-9._-]", "_")
    val fixture = s"${System.getProperty("java.io.tmpdir")}/graft_mjpeg_fixture_" +
      s"${sfTag}_pid${ProcessHandle.current().pid()}"
    Multimodal.mjpegVerifyStats(
        // wide: the verify pass decodes + re-encodes + decodes a JPEG per
        // sampled frame through ImageIO — the one read-back whose per-row
        // work repays the widen exchange (measured 2.4 s single-task)
        Multimodal.roundTripParquet(media, fixture, wide = true),
        frameStride = 2)
      .toDF()
      .orderBy("media_id")
  }

  /** Temperature-scaled source mixing (Mixing.temperatureMixture at
    * α = 0.5) — the multilingual up-sampling recipe: p_i ∝ q_i^0.5 over
    * token shares, with the per-source up-sample factor p_i/q_i. The
    * whole chain is oracle-exact: shares quantize to micro-units BEFORE
    * the exponentiation, α = 0.5 goes through sqrt (correctly rounded by
    * IEEE 754, so both engines produce bit-identical doubles — ln/pow only
    * promise libm last-ulp behavior), and the normalization + ratio are
    * pure integer division. One scan-side token count, one tiny groupBy,
    * two broadcast totals rows.
    */
  val h103 = Q(
    "h103_temperature_mixing",
    """WITH tok AS (
      |  SELECT source,
      |    len(list_filter(string_split_regex(lower(text), '\s+'),
      |                    t -> len(t) > 0)) AS n
      |  FROM documents),
      |per AS (
      |  SELECT source, count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS n_tokens
      |  FROM tok GROUP BY source),
      |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t FROM per),
      |sh AS (
      |  SELECT source, n_docs, n_tokens,
      |    CAST(floor(CAST(n_tokens AS DOUBLE) * 1000000
      |      / CAST(t AS DOUBLE) + 0.5) AS BIGINT) AS share_q
      |  FROM per, tot
      |  WHERE CAST(floor(CAST(n_tokens AS DOUBLE) * 1000000
      |      / CAST(t AS DOUBLE) + 0.5) AS BIGINT) > 0),
      |pq AS (
      |  SELECT *, CAST(floor(sqrt(CAST(share_q AS DOUBLE) / 1000000)
      |    * 1000000 + 0.5) AS BIGINT) AS pow_q
      |  FROM sh),
      |z AS (SELECT CAST(sum(pow_q) AS BIGINT) AS z FROM pq)
      |SELECT source, n_docs, n_tokens, share_q,
      |  CAST((pow_q * 1000000) // z AS BIGINT) AS p_q,
      |  CAST((((pow_q * 1000000) // z) * 1000000) // share_q AS BIGINT) AS upsample_q,
      |  CAST(CAST((pow_q * 1000000) // z AS BIGINT) AS DOUBLE) / 1000000 AS p,
      |  CAST(CAST((((pow_q * 1000000) // z) * 1000000) // share_q AS BIGINT) AS DOUBLE)
      |    / 1000000 AS upsample
      |FROM pq, z
      |ORDER BY source""".stripMargin) { (s, d) =>
    graft.extensions.Mixing.temperatureMixture(
        Tables.documents(s, d), "source", "text", alpha = 0.5)
      .orderBy("source")
  }

  /** Margin-based bitext/parallel-pair mining
    * ([[graft.extensions.Similarity.marginMining]], k = 4): the embeddings
    * table split into two sides by label parity stands in for the
    * two-language corpora; each even-label vector gets its best odd-label
    * match scored by the Artetxe–Schwenk ratio margin (cosine over the mean
    * of both sides' top-4 neighborhoods) with a mutual-best flag. The whole
    * chain is oracle-exact: the cosine is the h2 sequentially-accumulated
    * double, quantized once to 10⁻⁴ units, and the margin is pure positive
    * integer arithmetic (CASE-guarded), so DuckDB replays it bit-for-bit.
    */
  val h104 = Q(
    "h104_bitext_margin",
    """WITH s AS (SELECT vec_id AS src_id, embedding AS sv FROM embeddings WHERE label % 2 = 0),
      |t AS (SELECT vec_id AS tgt_id, embedding AS tv FROM embeddings WHERE label % 2 = 1),
      |norms AS (
      |  SELECT vec_id,
      |    sqrt(list_aggregate(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE), 'sum')) AS nrm
      |  FROM embeddings),
      |scored AS (
      |  SELECT src_id, tgt_id,
      |    CAST(floor(list_aggregate(
      |      list_transform(generate_series(1, len(sv)), i -> sv[i]::DOUBLE * tv[i]::DOUBLE),
      |      'sum') / (ns.nrm * nt.nrm) * 10000 + 0.5) AS BIGINT) AS cq
      |  FROM s CROSS JOIN t
      |  JOIN norms ns ON ns.vec_id = src_id
      |  JOIN norms nt ON nt.vec_id = tgt_id),
      |rf AS (SELECT *, row_number() OVER (PARTITION BY src_id ORDER BY cq DESC, tgt_id) AS rn
      |  FROM scored),
      |rb AS (SELECT *, row_number() OVER (PARTITION BY tgt_id ORDER BY cq DESC, src_id) AS rn
      |  FROM scored),
      |kx AS (SELECT src_id, CAST(sum(cq) AS BIGINT) AS sx, count(*) AS nx
      |  FROM rf WHERE rn <= 4 GROUP BY src_id),
      |ky AS (SELECT tgt_id, CAST(sum(cq) AS BIGINT) AS sy, count(*) AS ny
      |  FROM rb WHERE rn <= 4 GROUP BY tgt_id),
      |bf AS (SELECT src_id, tgt_id, cq FROM rf WHERE rn = 1),
      |bb AS (SELECT tgt_id, src_id AS b_src FROM rb WHERE rn = 1),
      |m AS (
      |  SELECT bf.src_id, bf.tgt_id, cq, sx, nx, sy, ny, b_src,
      |    CASE WHEN cq > 0 AND (sx * ny + sy * nx) > 0
      |      THEN CAST((2 * cq * nx * ny * 1000000) // (sx * ny + sy * nx) AS BIGINT)
      |    END AS margin_q
      |  FROM bf JOIN kx USING (src_id) JOIN ky USING (tgt_id) JOIN bb USING (tgt_id))
      |SELECT src_id, tgt_id, CAST(cq AS DOUBLE) / 10000 AS cos,
      |  margin_q, CAST(margin_q AS DOUBLE) / 1000000 AS margin,
      |  (b_src = src_id) AS is_mutual
      |FROM m
      |ORDER BY src_id""".stripMargin) { (s, d) =>
    val embs = Tables.embeddings(s, d)
    graft.extensions.Similarity.marginMining(
        embs.filter(col("label") % 2 === 0), embs.filter(col("label") % 2 === 1),
        "vec_id", "embedding", k = 4)
      .orderBy("src_id")
  }

  /** Cumulative corpus-diversity curve
    * ([[graft.extensions.TextAnalysis.noveltyCurve]], 10 buckets): per
    * ingestion bucket, the share of its distinct 3-gram shingles first seen
    * there — the diminishing-novelty diagnostic a data-acquisition team
    * reads before paying for the next crawl slice. Consumes the shared
    * exploded shingle relation (the h5/h6/h62 pattern); bucket assignment
    * is scan-side integer math over a broadcast bounds row, and the curve
    * is two map-side-partial shingle-keyed aggregates — both engines replay
    * the identical integer chain.
    */
  val h105 = Q(
    "h105_novelty_curve",
    """WITH tok AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
      |                             t -> len(t) > 0) AS toks
      |  FROM documents),
      |base AS (SELECT doc_id, toks FROM tok WHERE len(toks) >= 3),
      |sh AS (
      |  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 2),
      |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
      |  FROM base),
      |bounds AS (SELECT min(doc_id) AS lo, max(doc_id) AS hi FROM sh),
      |b AS (
      |  SELECT CAST(least(9, (doc_id - lo) // ((hi - lo) // 10 + 1)) AS BIGINT) AS bucket, shingle
      |  FROM sh, bounds),
      |occ AS (SELECT bucket, count(*) AS n_occurrences FROM b GROUP BY bucket),
      |d AS (SELECT DISTINCT bucket, shingle FROM b),
      |nd AS (SELECT bucket, count(*) AS n_distinct FROM d GROUP BY bucket),
      |fs AS (SELECT bucket, count(*) AS n_first_seen FROM (
      |  SELECT shingle, min(bucket) AS bucket FROM d GROUP BY shingle) GROUP BY bucket)
      |SELECT occ.bucket, n_occurrences, n_distinct,
      |  coalesce(n_first_seen, 0) AS n_first_seen,
      |  CAST(floor(CAST(coalesce(n_first_seen, 0) AS DOUBLE)
      |    / CAST(n_distinct AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS novelty_q,
      |  CAST(CAST(floor(CAST(coalesce(n_first_seen, 0) AS DOUBLE)
      |    / CAST(n_distinct AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS DOUBLE)
      |    / 1000000 AS novelty
      |FROM occ JOIN nd USING (bucket) LEFT JOIN fs USING (bucket)
      |ORDER BY bucket""".stripMargin) { (s, d) =>
    graft.extensions.TextAnalysis.noveltyCurveFromShingles(
        DupGraph.shingleRows(s, d), "doc_id", "shingle", nBuckets = 10)
      .orderBy("bucket")
  }

  /** Token-budget PPS sampling ([[graft.extensions.Splits.ppsSample]],
    * n = 100 over token counts, bucketWidth = 64 so the two-level prefix
    * scan actually exercises multiple buckets at every SF): systematic
    * probability-proportional-to-size selection over the cumulative token
    * mass — pure integer math end to end, so the oracle's single-window
    * cumsum replays the distributed two-level scan exactly (integer
    * addition reassociates freely; the per-bucket offsets + partitioned
    * within-bucket windows produce the identical cum column).
    */
  val h106 = Q(
    "h106_pps_sample",
    """WITH tok AS (
      |  SELECT doc_id AS id,
      |    CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
      |                         t -> len(t) > 0)) AS BIGINT) AS w
      |  FROM documents),
      |c AS (
      |  SELECT id, w,
      |    CAST(sum(w) OVER (ORDER BY id ROWS BETWEEN UNBOUNDED PRECEDING
      |      AND CURRENT ROW) AS BIGINT) AS cum
      |  FROM tok),
      |t AS (SELECT CAST(sum(w) AS BIGINT) AS total FROM tok),
      |s AS (SELECT greatest(1, total // 100) AS step FROM t)
      |SELECT id AS doc_id, w AS n_tokens, cum AS cum_tokens,
      |  CAST((cum - w) // step + 1 AS BIGINT) AS pick_idx,
      |  CAST(cum // step - (cum - w) // step AS BIGINT) AS n_hits
      |FROM c, s
      |WHERE w > 0 AND cum // step > (cum - w) // step
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    graft.extensions.Splits.ppsSample(
        docs, "doc_id",
        size(graft.extensions.TextOps.tokens(col("text"))), n = 100,
        bucketWidth = 64L)
      .select(col("id").as("doc_id"), col("w").as("n_tokens"),
        col("cum").as("cum_tokens"), col("pick_idx"), col("n_hits"))
      .orderBy("doc_id")
  }

  /** Quality-first token-budget fill ([[graft.extensions.Splits
    * .budgetFill]] over [[graft.extensions.TextAnalysis.qualityScore]],
    * budget = 10,000 tokens): the greedy "fill N tokens with the
    * highest-quality documents" training-mix selection — documents in
    * descending composite-quality order (id tiebreak) until the budget is
    * exhausted, boundary doc included. The prefix sum is the same
    * distributed two-level scan as h106 with descending score BANDS as
    * buckets; the oracle replays h11's exact quality chain plus one SQL
    * cumsum — integer token counts reassociate freely, so the band
    * decomposition is exactly equal.
    */
  val h107 = Q(
    "h107_budget_fill",
    """WITH tok AS (
      |  SELECT doc_id, text, list_filter(string_split_regex(lower(text), '\s+'),
      |                                   t -> len(t) > 0) AS toks
      |  FROM documents),
      |m AS (
      |  SELECT doc_id,
      |    CAST(len(toks) AS BIGINT) AS n_tokens,
      |    floor(length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
      |      / greatest(length(text), 1)::DOUBLE * 10000 + 0.5) / 10000 AS alpha_ratio,
      |    floor(len(list_filter(toks, t -> list_contains(['the','a','and','of','to','in','is','it','for','on'], t)))
      |      / greatest(len(toks), 1)::DOUBLE * 10000 + 0.5) / 10000 AS stopword_ratio
      |  FROM tok),
      |q AS (
      |  SELECT doc_id, n_tokens,
      |    CAST(floor((floor((least(n_tokens / 64.0, 1.0) * 0.5 + alpha_ratio * 0.3 +
      |          least(stopword_ratio * 4.0, 1.0) * 0.2) * 10000 + 0.5) / 10000)
      |      * 10000 + 0.5) AS BIGINT) AS score_q
      |  FROM m),
      |c AS (
      |  SELECT doc_id, n_tokens, score_q,
      |    CAST(sum(n_tokens) OVER (ORDER BY score_q DESC, doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |  FROM q)
      |SELECT doc_id, n_tokens, score_q, cum
      |FROM c
      |WHERE n_tokens > 0 AND cum - n_tokens < 10000
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    import graft.extensions.{Splits, TextAnalysis}
    val q = TextAnalysis.qualityScore(Tables.documents(s, d), "doc_id", "text")
    Splits.budgetFill(q, "doc_id", col("n_tokens"), col("quality_score"),
        budget = 10000L, bandWidth = 100)
      .select(col("id").as("doc_id"), col("w").as("n_tokens"),
        col("score_q"), col("cum"))
      .orderBy("doc_id")
  }

  val all: Seq[Q] =
    Seq(h92, h93, h94, h95, h96, h97, h98, h99, h100, h101, h102, h103, h104,
      h105, h106, h107)
}
