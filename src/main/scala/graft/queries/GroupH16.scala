package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Group H (continued) — round-20 batch: the COMPOSITION layer over the
  * per-operator surface. h123 calibrates the h116 trained gate (confusion
  * table + operating point), h124 profiles the LSH banding trade before a
  * dedup run commits to one, h125 re-exports only changed training shards
  * (h77's snapshot-diff posture over h120's Merkle manifest), and h122
  * (below) chains the whole LLM curation pipeline under one hash gate.
  * Scale notes live on [[graft.extensions.Classifier.calibrate]],
  * [[graft.extensions.Dedup.lshPlan]],
  * [[graft.extensions.Chunking.incrementalExport]], and
  * [[graft.extensions.Pipeline]].
  */
object GroupH16 {

  private val dTok =
    """list_filter(string_split_regex(lower(text), '\s+'), t -> len(t) > 0)"""

  // ---------------------------------------------------------------- h123
  private val calThresholds = 20
  private val calStepQ = 1000000L / calThresholds

  /** Calibration / operating-point selection for the h116 gate
    * ([[graft.extensions.Classifier.calibrate]]): the SAME training
    * trajectory as h116 (identical featurize/steps/seed rule — the oracle
    * reuses h116's unrolled CTEs verbatim, so the two queries describe one
    * deployed model), then the integer confusion table of
    * `pred = score_q >= thr` at 21 evenly spaced micro-unit thresholds,
    * with truncating micro-unit precision/recall/F1 and a `best` flag on
    * the F1-argmax row (ties to the smallest threshold). Scores bucket by
    * threshold INDEX scan-side (`score_q div step ≥ i ⇔ score_q ≥ i·step`),
    * so one corpus aggregate yields every threshold's cells.
    */
  val h123 = Q(
    "h123_gate_calibration",
    s"""WITH ${GroupH15.lrTrainCtes},
      |sc AS (
      |  SELECT l.doc_id, l.y,
      |    least(1000000, greatest(0, (z.zq + 2000000) // 4)) AS score_q
      |  FROM lab l JOIN zf z USING (doc_id)),
      |hist AS (
      |  SELECT score_q // $calStepQ AS b,
      |    CAST(sum(y) AS BIGINT) AS pos,
      |    CAST(count(*) - sum(y) AS BIGINT) AS neg
      |  FROM sc GROUP BY 1),
      |tot AS (SELECT CAST(sum(pos) AS BIGINT) AS p,
      |  CAST(sum(neg) AS BIGINT) AS nn FROM hist),
      |idx AS (SELECT CAST(unnest(generate_series(0, $calThresholds)) AS BIGINT) AS i),
      |conf AS (
      |  SELECT i.i,
      |    CAST(coalesce(sum(h.pos), 0) AS BIGINT) AS tp,
      |    CAST(coalesce(sum(h.neg), 0) AS BIGINT) AS fp
      |  FROM idx i LEFT JOIN hist h ON h.b >= i.i
      |  GROUP BY i.i),
      |cells AS (
      |  SELECT i * $calStepQ AS thr_q, tp, fp,
      |    t.p - tp AS fn, t.nn - fp AS tn
      |  FROM conf CROSS JOIN tot t),
      |scored AS (
      |  SELECT thr_q, tp, fp, fn, tn,
      |    CASE WHEN tp + fp = 0 THEN 1000000
      |         ELSE (tp * 1000000) // (tp + fp) END AS prec_q,
      |    CASE WHEN tp + fn = 0 THEN 1000000
      |         ELSE (tp * 1000000) // (tp + fn) END AS rec_q,
      |    CASE WHEN 2 * tp + fp + fn = 0 THEN 0
      |         ELSE (2 * tp * 1000000) // (2 * tp + fp + fn) END AS f1_q
      |  FROM cells)
      |SELECT thr_q, tp, fp, fn, tn, prec_q, rec_q, f1_q,
      |  CAST(row_number() OVER (ORDER BY f1_q DESC, thr_q) = 1 AS INT) AS best
      |FROM scored
      |ORDER BY thr_q""".stripMargin) { (s, d) =>
    graft.extensions.Classifier.calibrate(
        Tables.documents(s, d), "doc_id", "text",
        toks => size(filter(toks, t => t === "spark")) >= 2,
        nBuckets = GroupH15.lrBuckets, steps = GroupH15.lrSteps,
        thresholds = calThresholds)
      .orderBy("thr_q")
  }

  // ---------------------------------------------------------------- h124
  /** LSH parameter planner ([[graft.extensions.Dedup.lshPlan]]): for every
    * banding of the 16-hash MinHash signature, the empirical candidate-
    * pair volume (Σ per-cell C(n,2) — the verify work the bucket join
    * would materialize) next to the exact integer recall at the θ = 1/2
    * verify threshold. The oracle replays the h5 signature construction,
    * every banding's bucket stats, and the rational recall arithmetic.
    */
  val h124 = Q(
    "h124_lsh_planner",
    s"""WITH tok AS (SELECT doc_id, $dTok AS toks FROM documents),
      |base AS (SELECT doc_id, toks FROM tok WHERE len(toks) >= 3),
      |sh AS (
      |  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 2),
      |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
      |  FROM base),
      |ks AS (SELECT unnest(generate_series(0, 15)) AS k),
      |mh AS (
      |  SELECT doc_id, k, min(md5(k::VARCHAR || ':' || shingle)) AS m
      |  FROM sh CROSS JOIN ks GROUP BY doc_id, k),
      |cfg AS (SELECT unnest([1, 2, 4, 8, 16]) AS r),
      |sig AS (
      |  SELECT c.r, doc_id, k // c.r AS band,
      |    md5(string_agg(m, '' ORDER BY k)) AS bucket
      |  FROM mh CROSS JOIN cfg c GROUP BY c.r, doc_id, k // c.r),
      |cells AS (SELECT r, band, bucket, count(*) AS n
      |  FROM sig GROUP BY 1, 2, 3),
      |stats AS (
      |  SELECT r, CAST(count(*) AS BIGINT) AS n_buckets,
      |    CAST(sum(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_hot_buckets,
      |    CAST(sum((n * (n - 1)) // 2) AS BIGINT) AS cand_pairs
      |  FROM cells GROUP BY r),
      |rec AS (
      |  SELECT r, CAST(16 // r AS INT) AS bands,
      |    CAST(((65536 - CAST(list_aggregate(list_transform(
      |      generate_series(1, 16 // r), x -> CAST(pow(2, r) AS BIGINT) - 1),
      |      'product') AS BIGINT)) * 1000000 + 32768) // 65536 AS BIGINT)
      |      AS recall_q
      |  FROM cfg)
      |SELECT rec.bands, CAST(s.r AS INT) AS rows_per_band, s.n_buckets,
      |  s.n_hot_buckets, s.cand_pairs, rec.recall_q
      |FROM stats s JOIN rec ON rec.r = s.r
      |ORDER BY rows_per_band""".stripMargin) { (s, d) =>
    // rides the shared token relation (DupGraph memoizes it under Bench's
    // materialize opt-in; Verify builds it fresh) — the planner's whole
    // point is to profile BEFORE the dedup run, over the same tokenized
    // corpus that run will consume. Round 22: per-row native signatures.
    graft.extensions.Dedup.lshPlanFromTokens(
        DupGraph.tokenRows(s, d), "doc_id", "toks")
      .orderBy("rows_per_band")
  }

  // ---------------------------------------------------------------- h125
  private def manifestRowFp(p: String, as: String): String =
    s"""SELECT out_shard, CAST('0x' || substr(md5(concat_ws(chr(31),
      |    coalesce(CAST(n_seqs AS VARCHAR), chr(30)),
      |    coalesce(CAST(n_docs AS VARCHAR), chr(30)),
      |    coalesce(CAST(n_tokens AS VARCHAR), chr(30)),
      |    coalesce(CAST(content_fp AS VARCHAR), chr(30)))), 1, 15) AS BIGINT)
      |    AS $as
      |  FROM ${p}m""".stripMargin

  /** Incremental shard re-export
    * ([[graft.extensions.Chunking.incrementalExport]]): between the
    * documents snapshot and h77's deterministically mutated v2, emit only
    * the output shards whose VERSIONED manifest row changed — membership,
    * epoch order, counts, or document content (the content hash rides the
    * packing scan so even a token-count-preserving edit flips exactly its
    * shards). The oracle replays both manifest builds (packing, epoch
    * order, shard assignment, 60-bit XOR with the content hash) and the
    * h77-style row-hash full-outer diff.
    */
  val h125 = Q(
    "h125_incremental_export",
    s"""WITH v1 AS (SELECT doc_id, text FROM documents),
      |v2 AS (
      |  SELECT doc_id,
      |    CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END AS text
      |  FROM v1 WHERE doc_id % 17 <> 0
      |  UNION ALL
      |  SELECT doc_id + 1000000, 'NEW ' || text
      |  FROM v1 WHERE doc_id % 29 = 0),
      |${GroupH15.manifestCtes("x", "v1", withDfp = true)},
      |${GroupH15.manifestCtes("y", "v2", withDfp = true)},
      |d1 AS (${manifestRowFp("x", "old_fp")}),
      |d2 AS (${manifestRowFp("y", "new_fp")}),
      |j AS (
      |  SELECT coalesce(d1.out_shard, d2.out_shard) AS out_shard,
      |    d1.old_fp, d2.new_fp
      |  FROM d1 FULL OUTER JOIN d2 ON d1.out_shard = d2.out_shard)
      |SELECT out_shard,
      |  CASE WHEN old_fp IS NULL THEN 'added'
      |       WHEN new_fp IS NULL THEN 'removed'
      |       ELSE 'changed' END AS change_type,
      |  old_fp, new_fp
      |FROM j
      |WHERE old_fp IS NULL OR new_fp IS NULL OR old_fp <> new_fp
      |ORDER BY out_shard""".stripMargin) { (s, d) =>
    val v1 = Tables.documents(s, d).select(col("doc_id"), col("text"))
    val v2 = v1.filter(col("doc_id") % 17 =!= 0)
      .withColumn("text",
        when(col("doc_id") % 13 === 0, concat(col("text"), lit(" v2")))
          .otherwise(col("text")))
      .unionByName(v1.filter(col("doc_id") % 29 === 0)
        .withColumn("doc_id", col("doc_id") + 1000000L)
        .withColumn("text", concat(lit("NEW "), col("text"))))
    graft.extensions.Chunking.incrementalExport(v1, v2, "doc_id", "text",
        epochSeed = 29L, budget = 256, shardSize = 4L, shards = 16)
      .orderBy("out_shard")
  }

  // ---------------------------------------------------------------- h122
  private def splitCase(idExpr: String): String =
    s"""CASE WHEN substr(md5(CAST($idExpr AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
       |         WHEN substr(md5(CAST($idExpr AS VARCHAR)), 1, 2) < 'e6' THEN 'valid'
       |         ELSE 'test' END""".stripMargin

  private val pipeSteps = 8

  private def h122Oracle: String = {
    val steps = (1 to pipeSteps).map(GroupH15.lrStep).mkString(",\n")
    s"""WITH RECURSIVE
      |tok AS (SELECT doc_id, text, source, $dTok AS toks FROM documents),
      |hits AS (
      |  SELECT doc_id,
      |    [
      |      {'h': len(list_filter(toks, t -> list_contains(['der','die','das','und','ist','ein','eine','nicht','mit','zu'], t))), 'lang': 'de'},
      |      {'h': len(list_filter(toks, t -> list_contains(['the','a','and','of','to','in','is','it','for','on'], t))), 'lang': 'en'},
      |      {'h': len(list_filter(toks, t -> list_contains(['el','la','de','que','y','los','las','un','una','en'], t))), 'lang': 'es'},
      |      {'h': len(list_filter(toks, t -> list_contains(['le','la','les','et','des','une','est','dans','que','pour'], t))), 'lang': 'fr'},
      |      {'h': len(list_filter(toks, t -> list_contains(['de5','shi4','bu4','le5','wo3','zai4','you3','ta1','men5','zhe4'], t))), 'lang': 'zh'}
      |    ] AS scores
      |  FROM tok),
      |flat AS (SELECT doc_id, unnest(scores) AS s FROM hits),
      |lang AS (
      |  SELECT doc_id,
      |    CASE WHEN h > 0 THEN lang ELSE 'und' END AS lang_guess
      |  FROM (SELECT doc_id, s.lang AS lang, s.h AS h,
      |          row_number() OVER (PARTITION BY doc_id ORDER BY s.h DESC, s.lang) AS rn
      |        FROM flat) WHERE rn = 1),
      |m AS (
      |  SELECT doc_id,
      |    CAST(len(toks) AS BIGINT) AS n_tokens,
      |    floor(len(list_filter(toks, t -> list_contains(['the','a','and','of','to','in','is','it','for','on'], t)))
      |      / greatest(len(toks), 1)::DOUBLE * 10000 + 0.5) / 10000 AS stopword_ratio,
      |    floor(length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
      |      / greatest(length(text), 1)::DOUBLE * 10000 + 0.5) / 10000 AS alpha_ratio
      |  FROM tok),
      |q AS (
      |  SELECT doc_id, n_tokens,
      |    floor((least(n_tokens / 64.0, 1.0) * 0.5 + alpha_ratio * 0.3 +
      |          least(stopword_ratio * 4.0, 1.0) * 0.2) * 10000 + 0.5) / 10000
      |      AS quality_score
      |  FROM m),
      |ck AS (
      |  SELECT l.doc_id FROM lang l JOIN q ON l.doc_id = q.doc_id
      |  WHERE l.lang_guess = 'en' AND q.quality_score >= 0.5
      |    AND q.n_tokens BETWEEN 10 AND 100000),
      |clean AS MATERIALIZED (
      |  SELECT t.doc_id, t.text, t.source, t.toks FROM tok t JOIN ck USING (doc_id)),
      |cfp AS (SELECT doc_id,
      |    md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
      |  FROM clean),
      |reps AS MATERIALIZED (
      |  SELECT c.* FROM clean c
      |  JOIN (SELECT fp, min(doc_id) AS doc_id FROM cfp GROUP BY fp) k
      |    USING (doc_id)),
      |rbase AS (SELECT doc_id, toks FROM reps WHERE len(toks) >= 3),
      |sh AS (
      |  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 2),
      |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
      |  FROM rbase),
      |ks AS (SELECT unnest(generate_series(0, 15)) AS k),
      |mh AS (
      |  SELECT doc_id, k, min(md5(k::VARCHAR || ':' || shingle)) AS m
      |  FROM sh CROSS JOIN ks GROUP BY doc_id, k),
      |sig AS (
      |  SELECT doc_id, k // 4 AS band, md5(string_agg(m, '' ORDER BY k)) AS bucket
      |  FROM mh GROUP BY doc_id, k // 4),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM sig a JOIN sig b ON a.band = b.band AND a.bucket = b.bucket
      |    AND a.doc_id < b.doc_id),
      |ds AS (SELECT DISTINCT doc_id, shingle FROM sh),
      |sizes AS (SELECT doc_id, count(*) AS n FROM ds GROUP BY doc_id),
      |inter AS (
      |  SELECT c.id_a, c.id_b, count(*) AS i
      |  FROM cand c
      |  JOIN ds x ON x.doc_id = c.id_a
      |  JOIN ds y ON y.doc_id = c.id_b AND y.shingle = x.shingle
      |  GROUP BY c.id_a, c.id_b),
      |pairs AS MATERIALIZED (
      |  SELECT id_a, id_b,
      |    CAST(floor(CAST(i AS DOUBLE) / (sa.n + sb.n - i) * 10000 + 0.5)
      |      AS BIGINT) AS jacc_q
      |  FROM inter
      |  JOIN sizes sa ON id_a = sa.doc_id
      |  JOIN sizes sb ON id_b = sb.doc_id
      |  WHERE floor(CAST(i AS DOUBLE) / (sa.n + sb.n - i) * 10000 + 0.5) >= 5000),
      |kept AS MATERIALIZED (
      |  SELECT r.* FROM reps r
      |  WHERE r.doc_id NOT IN
      |    (SELECT DISTINCT id_b FROM pairs WHERE jacc_q >= 8000)),
      |ksplit AS (SELECT doc_id, ${splitCase("doc_id")} AS split FROM kept),
      |lp AS (SELECT p.id_a, p.id_b FROM pairs p
      |  JOIN kept a ON a.doc_id = p.id_a
      |  JOIN kept b ON b.doc_id = p.id_b),
      |edges AS (
      |  SELECT id_a AS u, id_b AS v FROM lp
      |  UNION SELECT id_b, id_a FROM lp),
      |reach(u, v) AS (
      |  SELECT u, v FROM edges
      |  UNION
      |  SELECT r.u, e.v FROM reach r JOIN edges e ON e.u = r.v WHERE e.v <> r.u),
      |comp AS (SELECT u AS doc_id, least(u, min(v)) AS comp
      |  FROM reach GROUP BY u),
      |clab AS (SELECT c.doc_id, c.comp, s.split
      |  FROM comp c JOIN ksplit s USING (doc_id)),
      |leaky AS (SELECT comp FROM clab GROUP BY comp
      |  HAVING min(split) <> max(split)),
      |moves AS MATERIALIZED (
      |  SELECT doc_id FROM clab JOIN leaky USING (comp) WHERE split <> 'train'),
      |eff AS (
      |  SELECT s.doc_id,
      |    CASE WHEN mv.doc_id IS NOT NULL THEN 'train' ELSE s.split END AS split
      |  FROM ksplit s LEFT JOIN moves mv USING (doc_id)),
      |bi AS (
      |  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 1),
      |    i -> toks[i] || ' ' || toks[i + 1])) AS bg
      |  FROM kept WHERE len(toks) >= 2),
      |feat AS MATERIALIZED (
      |  SELECT DISTINCT doc_id,
      |    CAST('0x' || substr(md5(bg), 1, 4) AS BIGINT) % 256 AS j
      |  FROM bi
      |  UNION ALL
      |  SELECT DISTINCT doc_id, 256 AS j FROM bi),
      |lab AS MATERIALIZED (
      |  SELECT doc_id,
      |    CASE WHEN len(list_filter(toks, x -> x = 'spark')) >= 2 THEN 1 ELSE 0 END AS y
      |  FROM kept WHERE len(toks) >= 2),
      |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM lab),
      |w0 AS (SELECT CAST(unnest(generate_series(0, 256)) AS BIGINT) AS j,
      |  CAST(0 AS BIGINT) AS wq),
      |$steps,
      |zf AS (SELECT f.doc_id, sum(w.wq) AS zq
      |  FROM feat f JOIN w$pipeSteps w USING (j) GROUP BY f.doc_id),
      |gate AS (
      |  SELECT l.doc_id FROM lab l JOIN zf z USING (doc_id)
      |  WHERE least(1000000, greatest(0, (z.zq + 2000000) // 4)) >= 500000),
      |gated AS MATERIALIZED (SELECT k.* FROM kept k JOIN gate USING (doc_id)),
      |train AS MATERIALIZED (
      |  SELECT g.* FROM gated g JOIN eff e USING (doc_id)
      |  WHERE e.split = 'train'),
      |${GroupH15.manifestCtes("m", "train", withDfp = false)},
      |manifest AS MATERIALIZED (
      |  SELECT out_shard, n_docs, n_tokens FROM mm),
      |st0 AS (SELECT CAST(count(*) AS BIGINT) AS d,
      |  CAST(coalesce(sum(coalesce(len(toks), 0)), 0) AS BIGINT) AS t FROM tok),
      |st1 AS (SELECT CAST(count(*) AS BIGINT) AS d,
      |  CAST(coalesce(sum(coalesce(len(toks), 0)), 0) AS BIGINT) AS t FROM clean),
      |st2 AS (SELECT CAST(count(*) AS BIGINT) AS d,
      |  CAST(coalesce(sum(coalesce(len(toks), 0)), 0) AS BIGINT) AS t FROM reps),
      |st3 AS (SELECT CAST(count(*) AS BIGINT) AS d,
      |  CAST(coalesce(sum(coalesce(len(toks), 0)), 0) AS BIGINT) AS t FROM kept),
      |st6 AS (SELECT CAST(count(*) AS BIGINT) AS d,
      |  CAST(coalesce(sum(coalesce(len(toks), 0)), 0) AS BIGINT) AS t FROM gated),
      |st8 AS (SELECT CAST(count(*) AS BIGINT) AS d,
      |  CAST(coalesce(sum(coalesce(len(toks), 0)), 0) AS BIGINT) AS t FROM train),
      |stm AS (SELECT CAST(coalesce(sum(n_docs), 0) AS BIGINT) AS d,
      |  CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS t FROM manifest),
      |d3 AS (SELECT CAST(count(*) AS BIGINT) AS v FROM pairs WHERE jacc_q >= 8000),
      |d4 AS (SELECT CAST(count(*) AS BIGINT) AS v FROM ksplit WHERE split = 'train'),
      |d5 AS (SELECT CAST(count(*) AS BIGINT) AS v FROM moves),
      |d7 AS (SELECT CAST(count(*) AS BIGINT) AS v
      |  FROM (SELECT DISTINCT source FROM gated)),
      |d9 AS (SELECT CAST(count(*) AS BIGINT) AS v FROM manifest)
      |SELECT * FROM (
      |  SELECT 0 AS stage_idx, 'input' AS stage, st0.d AS docs_in,
      |    st0.d AS docs_out, st0.t AS tokens_in, st0.t AS tokens_out,
      |    CAST(0 AS BIGINT) AS detail FROM st0
      |  UNION ALL SELECT 1, 'clean', st0.d, st1.d, st0.t, st1.t, 0
      |    FROM st0, st1
      |  UNION ALL SELECT 2, 'exact_dedup', st1.d, st2.d, st1.t, st2.t, 0
      |    FROM st1, st2
      |  UNION ALL SELECT 3, 'near_dedup', st2.d, st3.d, st2.t, st3.t, d3.v
      |    FROM st2, st3, d3
      |  UNION ALL SELECT 4, 'split', st3.d, st3.d, st3.t, st3.t, d4.v
      |    FROM st3, d4
      |  UNION ALL SELECT 5, 'leak_repair', st3.d, st3.d, st3.t, st3.t, d5.v
      |    FROM st3, d5
      |  UNION ALL SELECT 6, 'quality_gate', st3.d, st6.d, st3.t, st6.t, 0
      |    FROM st3, st6
      |  UNION ALL SELECT 7, 'mix_weights', st6.d, st6.d, st6.t, st6.t, d7.v
      |    FROM st6, d7
      |  UNION ALL SELECT 8, 'train_select', st6.d, st8.d, st6.t, st8.t, 0
      |    FROM st6, st8
      |  UNION ALL SELECT 9, 'export', st8.d, stm.d, st8.t, stm.t, d9.v
      |    FROM st8, stm, d9)
      |ORDER BY stage_idx""".stripMargin
  }

  /** The COMPOSED LLM corpus-curation pipeline
    * ([[graft.extensions.Pipeline.curateCorpus]]) — clean → exact dedup →
    * near dedup (shared pair table, strict 0.8 keep threshold) → hash
    * split → leakage repair (same pair table at the permissive 0.5
    * threshold, move-to-train closure) → trained quality gate (8 gradient
    * steps, the h116 seed rule) → domain mixture → effective-train
    * selection → pack + epoch order + export manifest. Output is the
    * 10-row per-stage audit ledger (docs/tokens in/out + detail). The
    * oracle replays EVERY stage end-to-end as one CTE chain — the h22,
    * h16, h21, h112, h116, h57, and h120 oracles composed, each stage
    * reading the previous stage's relation.
    */
  val h122 = Q("h122_curation_pipeline", h122Oracle) { (s, d) =>
    graft.extensions.Pipeline.curateCorpus(
        Tables.documents(s, d), "doc_id", "text", "source",
        toks => size(filter(toks, t => t === "spark")) >= 2,
        steps = pipeSteps)
      .orderBy("stage_idx")
  }

  // ---------------------------------------------------------------- h126
  /** Epoch-capped token-budget allocation
    * ([[graft.extensions.Mixing.epochCappedBudget]]): the mixture SOLVE
    * after h57's measurement — budget = ONE corpus epoch of tokens, cap =
    * 1.1 epochs per domain, split uniformly with capped domains' shortfall
    * water-filled to the rest in closed form (sorted-prefix predicate +
    * exact integer remainder rule — no doubles anywhere). With the
    * fixture's ±15% domain sizes, both branches populate: small domains
    * cap at 1.1× their own tokens, large ones absorb the shortfall. The
    * oracle replays the sort, the prefix predicate, and the remainder
    * distribution integer-for-integer.
    */
  val h126 = Q(
    "h126_epoch_capped_mix",
    s"""WITH toks AS (SELECT source AS domain,
      |    coalesce(len($dTok), 0) AS n FROM documents),
      |pd AS (SELECT domain, CAST(sum(n) AS BIGINT) AS n_tokens
      |  FROM toks GROUP BY domain),
      |b AS (SELECT CAST(coalesce(sum(n_tokens), 0) AS BIGINT) AS b FROM pd),
      |capd AS (SELECT domain, n_tokens,
      |    CAST((n_tokens // 1000000) * 1100000 +
      |      ((n_tokens % 1000000) * 1100000) // 1000000 AS BIGINT)
      |      AS cap_tokens
      |  FROM pd),
      |nd AS (SELECT CAST(count(*) AS BIGINT) AS d FROM capd),
      |rk AS (SELECT domain, n_tokens, cap_tokens,
      |    CAST(row_number() OVER (ORDER BY cap_tokens, domain) AS BIGINT) AS i,
      |    CAST(coalesce(sum(cap_tokens) OVER (ORDER BY cap_tokens, domain
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS prefix
      |  FROM capd),
      |cp AS (SELECT rk.*,
      |    (cap_tokens * (nd.d - i + 1) < b.b - prefix) AS capped
      |  FROM rk CROSS JOIN nd CROSS JOIN b),
      |tot AS (SELECT
      |    CAST(coalesce(sum(CASE WHEN capped THEN cap_tokens END), 0)
      |      AS BIGINT) AS capped_sum,
      |    CAST(coalesce(sum(CASE WHEN capped THEN 1 ELSE 0 END), 0)
      |      AS BIGINT) AS k
      |  FROM cp),
      |alloc AS (
      |  SELECT cp.domain, cp.n_tokens, cp.cap_tokens,
      |    CASE WHEN cp.capped THEN cp.cap_tokens
      |         ELSE (b.b - t.capped_sum) // (nd.d - t.k) +
      |           (CASE WHEN cp.i - t.k <= (b.b - t.capped_sum) % (nd.d - t.k)
      |            THEN 1 ELSE 0 END)
      |    END AS allocated,
      |    CAST(cp.capped AS INT) AS capped
      |  FROM cp CROSS JOIN tot t CROSS JOIN nd CROSS JOIN b)
      |SELECT domain, n_tokens, cap_tokens,
      |  CAST(allocated AS BIGINT) AS allocated,
      |  CAST(CASE WHEN n_tokens > 0
      |       THEN (allocated // n_tokens) * 1000000 +
      |            ((allocated % n_tokens) * 1000000) // n_tokens
      |       ELSE 0 END AS BIGINT) AS epochs_q,
      |  capped
      |FROM alloc ORDER BY domain""".stripMargin) { (s, d) =>
    val perDomain = Tables.documents(s, d)
      .select(col("source").as("domain"),
        coalesce(size(graft.extensions.TextOps.tokens(col("text")))
          .cast("long"), lit(0L)).as("n"))
      .groupBy("domain").agg(sum(col("n")).as("n_tokens"))
    // the budget is an external business input ("train for B tokens") —
    // here ONE corpus epoch, read driver-side (a 1-value aggregate; the
    // oracle recomputes the same exact integer in-SQL)
    val budget = perDomain
      .agg(coalesce(sum(col("n_tokens")), lit(0L))).head().getLong(0)
    graft.extensions.Mixing.epochCappedBudget(perDomain, "domain",
        "n_tokens", budget, maxEpochsQ = 1100000L)
      .orderBy("domain")
  }

  val all: Seq[Q] = Seq(h122, h123, h124, h125, h126)
}
