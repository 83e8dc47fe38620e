package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Group H (continued) — round-18 batch: the TRAINED-model pillar (a
  * gradient-descent quality classifier and a Naive Bayes language
  * identifier, both trained in-engine under the hash gate — the h114
  * multi-round-trainer posture generalized from argmax rounds to gradient
  * rounds), the deterministic per-epoch serving shuffle, and the
  * production-newline gate for line-level boilerplate removal. Scale notes
  * live on [[graft.extensions.Classifier]],
  * [[graft.extensions.TextAnalysis.nbLangId]], and
  * [[graft.extensions.Chunking.epochShuffle]].
  */
object GroupH15 {

  private val dTok =
    """list_filter(string_split_regex(lower(text), '\s+'), t -> len(t) > 0)"""

  // ---------------------------------------------------------------- h116
  private[queries] val lrBuckets = 256
  private[queries] val lrSteps = 12

  /** One unrolled full-batch gradient step for the h116 oracle: per-doc
    * margin over the previous weights, hard-sigmoid error, feature-keyed
    * gradient sum, sign-split truncating update (`//` on negatives floors
    * in DuckDB but truncates in Spark's driver arithmetic — splitting on
    * sign makes both compute `trunc(g / 2N)`). MATERIALIZED on the weight
    * relations: each is referenced by both the next z and the next update.
    */
  private[queries] def lrStep(r: Int): String =
    s"""z$r AS (SELECT f.doc_id, sum(w.wq) AS zq
      |  FROM feat f JOIN w${r - 1} w USING (j) GROUP BY f.doc_id),
      |e$r AS MATERIALIZED (
      |  SELECT l.doc_id,
      |    least(1000000, greatest(0, (z.zq + 2000000) // 4)) - l.y * 1000000 AS err
      |  FROM lab l JOIN z$r z USING (doc_id)),
      |g$r AS (SELECT f.j, sum(e.err) AS g
      |  FROM feat f JOIN e$r e USING (doc_id) GROUP BY f.j),
      |w$r AS MATERIALIZED (
      |  SELECT w.j, w.wq - (CASE WHEN coalesce(g.g, 0) >= 0
      |      THEN coalesce(g.g, 0) // (2 * n.n)
      |      ELSE -((-coalesce(g.g, 0)) // (2 * n.n)) END) AS wq
      |  FROM w${r - 1} w LEFT JOIN g$r g USING (j) CROSS JOIN n)""".stripMargin

  /** The shared h116 training unroll — every CTE from tokenization through
    * the final per-doc margin `zf` — so consumers of the SAME deployed
    * model (h116's scores, h123's calibration) replay ONE training
    * trajectory instead of drifting copies.
    */
  private[queries] def lrTrainCtes: String = {
    val steps = (1 to lrSteps).map(lrStep).mkString(",\n")
    s"""toks AS (SELECT doc_id, $dTok AS t FROM documents),
      |bi AS (
      |  SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 1),
      |    i -> t[i] || ' ' || t[i + 1])) AS bg
      |  FROM toks WHERE len(t) >= 2),
      |feat AS MATERIALIZED (
      |  SELECT DISTINCT doc_id,
      |    CAST('0x' || substr(md5(bg), 1, 4) AS BIGINT) % $lrBuckets AS j
      |  FROM bi
      |  UNION ALL
      |  SELECT DISTINCT doc_id, $lrBuckets AS j FROM bi),
      |lab AS MATERIALIZED (
      |  SELECT doc_id,
      |    CASE WHEN len(list_filter(t, x -> x = 'spark')) >= 2 THEN 1 ELSE 0 END AS y
      |  FROM toks WHERE len(t) >= 2),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lab),
      |w0 AS (SELECT CAST(unnest(generate_series(0, $lrBuckets)) AS BIGINT) AS j,
      |  CAST(0 AS BIGINT) AS wq),
      |$steps,
      |zf AS (SELECT f.doc_id, sum(w.wq) AS zq
      |  FROM feat f JOIN w$lrSteps w USING (j) GROUP BY f.doc_id)""".stripMargin
  }

  private def lrOracle: String =
    s"""WITH $lrTrainCtes
      |SELECT l.doc_id, l.y,
      |  CAST(least(1000000, greatest(0, (z.zq + 2000000) // 4)) AS BIGINT) AS score_q,
      |  CAST(least(1000000, greatest(0, (z.zq + 2000000) // 4)) >= 500000 AS INT) AS pred
      |FROM lab l JOIN zf z USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  /** Trained quality classifier
    * ([[graft.extensions.Classifier.qualityLrScores]]): hashed-bigram
    * logistic regression (hard-sigmoid link, fixed-point micro-unit
    * weights), trained with 12 full-batch gradient steps against the
    * deterministic seed rule "high quality = the token 'spark' appears ≥ 2
    * times" (weak supervision — the rule is NOT a feature, so the model
    * must learn it from collision-hashed bigram presence; it reaches ~0.85
    * training accuracy from a 0.47 majority floor at sf0.01). The oracle
    * unrolls all 12 gradient steps bit-for-bit.
    */
  val h116 = Q("h116_quality_classifier", lrOracle) { (s, d) =>
    graft.extensions.Classifier.qualityLrScores(
        Tables.documents(s, d), "doc_id", "text",
        toks => size(filter(toks, t => t === "spark")) >= 2,
        nBuckets = lrBuckets, steps = lrSteps)
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------- h117
  /** Trained char-trigram Naive Bayes language ID
    * ([[graft.extensions.TextAnalysis.nbLangId]]) — the model-based
    * replacement for h10's marker-word ceiling: add-one-smoothed
    * multinomial NB over character trigrams of the normalized text HASHED
    * into a fixed 2¹⁶-bucket feature space (round 19 — bounds the sparse
    * model at |langs|·65536 rows independent of charset, the langid.py /
    * h116 device), self-trained on the corpus' `lang` labels, scored with
    * micro-nat integer log-probability sums (exact, order-independent),
    * ties to the alphabetically-first language. The oracle replays
    * training (per-doc bucket histogram → counted sparse cells + one
    * per-language zero-mass constant → priors) and scoring.
    */
  private val nbBuckets = 65536

  val h117 = Q(
    "h117_langid_nb",
    s"""WITH base AS (
      |  SELECT doc_id, lang AS lang_true,
      |    trim(regexp_replace(lower(text), '\\s+', ' ', 'g')) AS t
      |  FROM documents
      |  WHERE len(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) >= 3),
      |occ AS (
      |  SELECT doc_id, lang_true,
      |    CAST(CAST('0x' || substr(md5(substr(t, CAST(i AS INT), 3)), 1, 4)
      |      AS BIGINT) % $nbBuckets AS INT) AS b
      |  FROM (SELECT doc_id, lang_true, t,
      |          unnest(generate_series(1, len(t) - 2)) AS i FROM base)),
      |db AS MATERIALIZED (
      |  SELECT doc_id, lang_true, b, count(*) AS cnt FROM occ GROUP BY 1, 2, 3),
      |counts AS MATERIALIZED (SELECT lang_true AS lang, b, sum(cnt) AS c
      |  FROM db GROUP BY 1, 2),
      |v AS (SELECT count(DISTINCT b) AS v FROM counts),
      |zc AS (SELECT lang,
      |    CAST(floor(ln(1.0 / CAST(tl + v AS DOUBLE)) * 1e6 + 0.5)
      |      AS BIGINT) AS zq,
      |    CAST(tl + v AS DOUBLE) AS denom
      |  FROM (SELECT lang, sum(c) AS tl FROM counts GROUP BY lang)
      |  CROSS JOIN v),
      |model AS MATERIALIZED (
      |  SELECT c.lang, c.b,
      |    CAST(floor(ln(CAST(c.c + 1 AS DOUBLE) / z.denom) * 1e6 + 0.5)
      |      AS BIGINT) AS lq
      |  FROM counts c JOIN zc z USING (lang)),
      |dt AS MATERIALIZED (
      |  SELECT doc_id, lang_true, CAST(sum(cnt) AS BIGINT) AS n_occ
      |  FROM db GROUP BY 1, 2),
      |dc AS (SELECT lang_true AS lang, count(*) AS nl FROM dt GROUP BY 1),
      |nd AS (SELECT sum(nl) AS nd FROM dc),
      |priors AS (SELECT lang,
      |    CAST(floor(ln(CAST(nl AS DOUBLE) / CAST(nd AS DOUBLE)) * 1e6 + 0.5)
      |      AS BIGINT) AS pq
      |  FROM dc CROSS JOIN nd),
      |matched AS (
      |  SELECT d.doc_id, d.lang_true, m.lang,
      |    sum(d.cnt * m.lq) AS mq, sum(d.cnt) AS nm
      |  FROM db d JOIN model m USING (b)
      |  GROUP BY 1, 2, 3),
      |perlang AS (
      |  SELECT dt.doc_id, dt.lang_true, z.lang,
      |    CAST(coalesce(m.mq, 0) + (dt.n_occ - coalesce(m.nm, 0)) * z.zq
      |      + p.pq AS BIGINT) AS score_q
      |  FROM dt CROSS JOIN zc z
      |  LEFT JOIN matched m ON m.doc_id = dt.doc_id AND m.lang = z.lang
      |  JOIN priors p ON p.lang = z.lang),
      |ranked AS (
      |  SELECT doc_id, lang_true, lang, score_q,
      |    row_number() OVER (PARTITION BY doc_id
      |      ORDER BY score_q DESC, lang) AS rk
      |  FROM perlang)
      |SELECT doc_id, lang_true, lang AS pred_lang, score_q,
      |  CAST(lang = lang_true AS INT) AS is_match
      |FROM ranked WHERE rk = 1
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    graft.extensions.TextAnalysis.nbLangId(
        Tables.documents(s, d), "doc_id", "text", "lang",
        nBuckets = nbBuckets)
      .orderBy("doc_id")
  }

  // ---------------------------------------------------------------- h118
  /** Deterministic epoch shuffle
    * ([[graft.extensions.Chunking.epochShuffle]], epoch seed 17, 16
    * shards): the reproducible global training-order permutation — every
    * epoch reads a different order (new seed → new md5 keys), any epoch
    * replays exactly (pure function of ids + seed). The oracle replays the
    * key/shard/rank/offset construction; `global_pos` is a bijection onto
    * 0..N−1 (pinned in ChunkingSpec).
    */
  val h118 = Q(
    "h118_epoch_shuffle",
    """WITH k AS (
      |  SELECT doc_id, md5('17:' || CAST(doc_id AS VARCHAR)) AS k
      |  FROM documents),
      |s AS (SELECT doc_id, k,
      |    CAST(CAST('0x' || substr(k, 1, 4) AS BIGINT) % 16 AS INT) AS shard
      |  FROM k),
      |p AS (SELECT doc_id, shard,
      |    CAST(row_number() OVER (PARTITION BY shard ORDER BY k, doc_id) AS BIGINT) AS pos
      |  FROM s),
      |o AS (SELECT shard, count(*) AS n FROM p GROUP BY shard),
      |off AS (SELECT shard,
      |    coalesce(sum(n) OVER (ORDER BY shard
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS offs
      |  FROM o)
      |SELECT p.doc_id, p.shard, p.pos,
      |  CAST(off.offs + p.pos - 1 AS BIGINT) AS global_pos
      |FROM p JOIN off USING (shard)
      |ORDER BY global_pos""".stripMargin) { (s, d) =>
    graft.extensions.Chunking.epochShuffle(
        Tables.documents(s, d), "doc_id", epochSeed = 17L, shards = 16)
      .orderBy("global_pos")
  }

  // ---------------------------------------------------------------- h119
  /** Line-level boilerplate removal over REAL newline structure — the
    * production-path gate h113's 12-token wrap adapter could not provide
    * (the fixture has no newlines, so the newline structure is derived
    * in-query, but REALISTICALLY: a shared header line, a BLANK line, a
    * per-doc variable line width 5–12 from the doc-id hash, and a shared
    * footer). [[graft.extensions.Dedup.boilerplateLines]] runs with its
    * production default `splitRegex = "\n"` and must (a) skip the blank
    * segment, (b) drop the header/footer in EVERY document (df = N), (c)
    * drop cross-document duplicate body lines (the dup-doc channel), and
    * (d) reassemble the rest in order — all under the hash gate.
    */
  val h119 = Q(
    "h119_boilerplate_newlines",
    s"""WITH toks AS (SELECT doc_id, $dTok AS l FROM documents),
      |base AS (SELECT doc_id, l, CAST(len(l) AS BIGINT) AS n,
      |    5 + CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) AS BIGINT) % 8 AS w
      |  FROM toks WHERE len(l) > 0),
      |built AS (SELECT doc_id,
      |    '== acme corp header ==' || chr(10) || chr(10) ||
      |    array_to_string(list_transform(generate_series(1, ((n - 1) // w) + 1),
      |      i -> array_to_string(list_slice(l, (i - 1) * w + 1, i * w), ' ')), chr(10)) ||
      |    chr(10) || '(c) acme corp footer' AS text
      |  FROM base),
      |segs AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM built),
      |lines AS (
      |  SELECT doc_id, CAST(i AS BIGINT) AS i, ls[CAST(i AS INT)] AS line
      |  FROM (SELECT doc_id, ls, unnest(generate_series(1, len(ls))) AS i FROM segs)
      |  WHERE len(trim(ls[CAST(i AS INT)])) > 0),
      |fp AS (SELECT doc_id, i, line,
      |    md5(trim(regexp_replace(lower(line), '\\s+', ' ', 'g'))) AS fp
      |  FROM lines),
      |bp AS (SELECT fp FROM (SELECT DISTINCT doc_id, fp FROM fp)
      |  GROUP BY fp HAVING count(*) >= 2),
      |marked AS (SELECT f.doc_id, f.i, f.line, b.fp IS NOT NULL AS is_bp
      |  FROM fp f LEFT JOIN bp b USING (fp)),
      |agg AS (
      |  SELECT doc_id, count(*) AS n_lines,
      |    CAST(sum(CASE WHEN NOT is_bp THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |    string_agg(CASE WHEN NOT is_bp THEN line END, chr(10) ORDER BY i) AS txt
      |  FROM marked GROUP BY doc_id)
      |SELECT doc_id, n_lines, n_kept,
      |  CASE WHEN n_kept > 0 THEN txt END AS text_clean
      |FROM agg ORDER BY doc_id""".stripMargin) { (s, d) =>
    val multiline = Tables.documents(s, d)
      .select(col("doc_id"),
        graft.extensions.TextOps.tokens(col("text")).as("__toks"),
        (conv(substring(md5(col("doc_id").cast("string")), 1, 4), 16, 10)
          .cast("long") % 8 + 5).cast("int").as("__w"))
      .filter(size(col("__toks")) > 0)
      .select(col("doc_id"),
        concat(
          lit("== acme corp header ==\n\n"),
          array_join(transform(
            sequence(lit(0), expr("int((size(__toks) - 1) div __w)")),
            i => array_join(
              slice(col("__toks"), i * col("__w") + 1, col("__w")), " ")),
            "\n"),
          lit("\n(c) acme corp footer")).as("text"))
    graft.extensions.Dedup.boilerplateLines(multiline, "doc_id", "text",
        minDf = 2)
      .orderBy("doc_id")
  }

  /** THE export-manifest oracle chain — packing (budget 256) → epoch order
    * (seed 29, 16 logical shards) → output shards (4 sequences each) → one
    * manifest row per shard — emitted once here and reused by every
    * manifest-consuming oracle (h120, h122's export stage, h125's two
    * versioned builds), the [[lrTrainCtes]] share-don't-copy rule: this
    * diff's pos int→long fix had to touch each hand-maintained copy
    * separately, which is exactly the drift hazard. Every CTE is prefixed
    * `p`; `src` must expose (doc_id, text). `withDfp` adds the per-doc
    * content hash to the XOR fingerprint (the
    * [[graft.extensions.Chunking.exportManifestVersioned]] form h125
    * diffs on); the parameters themselves stay hardcoded because the
    * three consumers deliberately share one configuration.
    */
  private[queries] def manifestCtes(p: String, src: String,
      withDfp: Boolean): String = {
    val dfpSel = if (withDfp) ", md5(text) AS dfp" else ""
    val dfpCol = if (withDfp) "dfp, " else ""
    val dfpHash =
      if (withDfp) "\n      |      coalesce(dfp, chr(30))," else ""
    s"""${p}t AS (
      |  SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h$dfpSel,
      |    CAST(len($dTok) AS INT) AS n_toks
      |  FROM $src),
      |${p}f AS (SELECT doc_id, substr(h, 1, 1) AS shard, h, ${dfpCol}n_toks
      |  FROM ${p}t WHERE n_toks > 0),
      |${p}packed AS (SELECT doc_id, shard, ${dfpCol}n_toks,
      |    CAST(((sum(n_toks) OVER (PARTITION BY shard ORDER BY h, doc_id
      |      ROWS UNBOUNDED PRECEDING)) - 1) // 256 AS INT) AS bin
      |  FROM ${p}f),
      |${p}pseq AS MATERIALIZED (SELECT doc_id, ${dfpCol}n_toks,
      |    shard || ':' || CAST(bin AS VARCHAR) AS seq_id
      |  FROM ${p}packed),
      |${p}seqs AS (SELECT DISTINCT seq_id FROM ${p}pseq),
      |${p}k AS (SELECT seq_id, md5('29:' || seq_id) AS k FROM ${p}seqs),
      |${p}s2 AS (SELECT seq_id, k,
      |    CAST(CAST('0x' || substr(k, 1, 4) AS BIGINT) % 16 AS INT) AS oshard
      |  FROM ${p}k),
      |${p}p2 AS (SELECT seq_id, oshard,
      |    CAST(row_number() OVER (PARTITION BY oshard ORDER BY k, seq_id)
      |      AS BIGINT) AS pos
      |  FROM ${p}s2),
      |${p}o2 AS (SELECT oshard, count(*) AS n FROM ${p}p2 GROUP BY oshard),
      |${p}off AS (SELECT oshard,
      |    coalesce(sum(n) OVER (ORDER BY oshard
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS offs
      |  FROM ${p}o2),
      |${p}gp AS (SELECT p2.seq_id,
      |    CAST(off.offs + p2.pos - 1 AS BIGINT) AS global_pos
      |  FROM ${p}p2 p2 JOIN ${p}off off USING (oshard)),
      |${p}a AS (SELECT d.doc_id, ${if (withDfp) "d.dfp, " else ""}d.n_toks,
      |    d.seq_id, g.global_pos,
      |    CAST(g.global_pos // 4 AS BIGINT) AS out_shard
      |  FROM ${p}pseq d JOIN ${p}gp g USING (seq_id)),
      |${p}m AS (
      |  SELECT out_shard,
      |    CAST(count(DISTINCT seq_id) AS BIGINT) AS n_seqs,
      |    CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(n_toks) AS BIGINT) AS n_tokens,
      |    bit_xor(CAST('0x' || substr(md5(concat_ws(chr(31),
      |      coalesce(CAST(doc_id AS VARCHAR), chr(30)),$dfpHash
      |      coalesce(seq_id, chr(30)),
      |      coalesce(CAST(global_pos AS VARCHAR), chr(30)))), 1, 15) AS BIGINT))
      |      AS content_fp
      |  FROM ${p}a GROUP BY out_shard)""".stripMargin
  }

  // ---------------------------------------------------------------- h120
  /** Training-shard export manifest
    * ([[graft.extensions.Chunking.exportManifest]], budget 256, epoch seed
    * 29, 16 logical shards, 4 sequences per output shard): h43's packed
    * sequences take h118's epoch order, land in numbered output shards
    * (`global_pos div 4`), and each shard emits one manifest row — counts
    * plus the h70 XOR-Merkle content fingerprint over (doc, sequence,
    * epoch position). The WebDataset/TFRecord-manifest shape a training
    * loader consumes; idempotent re-export and conservation pinned in
    * PropertySpec. The oracle replays packing, epoch order, shard
    * assignment, and the 60-bit XOR fingerprint.
    */
  val h120 = Q(
    "h120_export_manifest",
    s"""WITH ${manifestCtes("", "documents", withDfp = false)}
      |SELECT out_shard, n_seqs, n_docs, n_tokens, content_fp
      |FROM m
      |ORDER BY out_shard""".stripMargin) { (s, d) =>
    graft.extensions.Chunking.exportManifest(
        Tables.documents(s, d), "doc_id", "text",
        epochSeed = 29L, budget = 256, shardSize = 4L, shards = 16)
      .orderBy("out_shard")
  }

  // ---------------------------------------------------------------- h121
  private val mhBuckets = 256
  private val mhSteps = 8

  /** One unrolled gradient step for ALL THREE h121 heads — the h116 lrStep
    * shape with the weight/error/gradient relations carrying one COLUMN per
    * head (the (head, bucket)-keyed aggregate, laid out wide).
    */
  private def mhStep(r: Int): String = {
    def upd(k: Int) =
      s"""w.wq$k - (CASE WHEN coalesce(g.g$k, 0) >= 0
        |      THEN coalesce(g.g$k, 0) // (2 * n.n)
        |      ELSE -((-coalesce(g.g$k, 0)) // (2 * n.n)) END) AS wq$k""".stripMargin
    def err(k: Int) =
      s"least(1000000, greatest(0, (z.zq$k + 2000000) // 4)) - l.y$k * 1000000 AS e$k"
    s"""z$r AS (SELECT f.doc_id, sum(w.wq0) AS zq0, sum(w.wq1) AS zq1,
      |    sum(w.wq2) AS zq2
      |  FROM feat f JOIN w${r - 1} w USING (j) GROUP BY f.doc_id),
      |e$r AS MATERIALIZED (
      |  SELECT l.doc_id, ${err(0)}, ${err(1)}, ${err(2)}
      |  FROM lab l JOIN z$r z USING (doc_id)),
      |g$r AS (SELECT f.j, sum(e.e0) AS g0, sum(e.e1) AS g1, sum(e.e2) AS g2
      |  FROM feat f JOIN e$r e USING (doc_id) GROUP BY f.j),
      |w$r AS MATERIALIZED (
      |  SELECT w.j, ${upd(0)},
      |    ${upd(1)},
      |    ${upd(2)}
      |  FROM w${r - 1} w LEFT JOIN g$r g USING (j) CROSS JOIN n)""".stripMargin
  }

  private def mhOracle: String = {
    val steps = (1 to mhSteps).map(mhStep).mkString(",\n")
    def sig(k: Int) =
      s"CAST(least(1000000, greatest(0, (z.zq$k + 2000000) // 4)) AS BIGINT) AS s$k"
    s"""WITH toks AS (SELECT doc_id, $dTok AS t FROM documents),
      |bi AS (
      |  SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 1),
      |    i -> t[i] || ' ' || t[i + 1])) AS bg
      |  FROM toks WHERE len(t) >= 2),
      |feat AS MATERIALIZED (
      |  SELECT DISTINCT doc_id,
      |    CAST('0x' || substr(md5(bg), 1, 4) AS BIGINT) % $mhBuckets AS j
      |  FROM bi
      |  UNION ALL
      |  SELECT DISTINCT doc_id, $mhBuckets AS j FROM bi),
      |lab AS MATERIALIZED (
      |  SELECT doc_id,
      |    CASE WHEN len(list_filter(t, x -> x = 'data')) >= 2 THEN 1 ELSE 0 END AS y0,
      |    CASE WHEN len(t) >= 56 THEN 1 ELSE 0 END AS y1,
      |    CASE WHEN len(list_filter(t, x -> x = 'spark')) >= 2 THEN 1 ELSE 0 END AS y2
      |  FROM toks WHERE len(t) >= 2),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lab),
      |w0 AS (SELECT CAST(unnest(generate_series(0, $mhBuckets)) AS BIGINT) AS j,
      |  CAST(0 AS BIGINT) AS wq0, CAST(0 AS BIGINT) AS wq1,
      |  CAST(0 AS BIGINT) AS wq2),
      |$steps,
      |zf AS (SELECT f.doc_id, sum(w.wq0) AS zq0, sum(w.wq1) AS zq1,
      |    sum(w.wq2) AS zq2
      |  FROM feat f JOIN w$mhSteps w USING (j) GROUP BY f.doc_id),
      |sc AS (SELECT l.doc_id, l.y0, l.y1, l.y2, ${sig(0)}, ${sig(1)}, ${sig(2)}
      |  FROM lab l JOIN zf z USING (doc_id))
      |SELECT doc_id,
      |  y0 AS y_datarich, y1 AS y_longform, y2 AS y_quality,
      |  s0 AS score_q_datarich, s1 AS score_q_longform, s2 AS score_q_quality,
      |  CASE WHEN s0 >= s1 AND s0 >= s2 THEN 'datarich'
      |       WHEN s1 >= s2 THEN 'longform'
      |       ELSE 'quality' END AS pred_head
      |FROM sc
      |ORDER BY doc_id""".stripMargin
  }

  /** One-vs-rest policy filter bank
    * ([[graft.extensions.Classifier.multiPolicyScores]]): THREE heads —
    * datarich ('data' ≥ 2), longform (≥ 56 tokens), quality ('spark' ≥ 2,
    * the h116 rule) — trained over SHARED hashed-bigram features with 8
    * full-batch gradient steps in ONE pass structure per step (the gradient
    * aggregate carries all heads' error sums per bucket), scored with an
    * argmax routing decision (ties toward the alphabetically-first head;
    * the head ORDER is alphabetical, so the oracle's first-max CASE chain
    * is the same rule). The oracle unrolls every step for every head
    * bit-for-bit; ClassifierSpec pins each head's weights equal to an
    * independent single-rule training.
    */
  val h121 = Q("h121_policy_bank", mhOracle) { (s, d) =>
    graft.extensions.Classifier.multiPolicyScores(
        Tables.documents(s, d), "doc_id", "text",
        Seq(
          "datarich" -> (toks => size(filter(toks,
            (t: org.apache.spark.sql.Column) => t === "data")) >= 2),
          "longform" -> (toks => size(toks) >= 56),
          "quality" -> (toks => size(filter(toks,
            (t: org.apache.spark.sql.Column) => t === "spark")) >= 2)),
        nBuckets = mhBuckets, steps = mhSteps)
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(h116, h117, h118, h119, h120, h121)
}
