package graft.queries

import graft.Tables
import graft.extensions.{Mixing, Similarity, TextAnalysis}
import org.apache.spark.sql.functions._

/** Group H (continued) — corpus-selection and tokenizer-prep operators:
  * DSIR importance weighting, SemDeDup embedding-cluster dedup, domain
  * mixture rebalancing, BPE first-merge pair statistics, and the per-domain
  * percentile quality gate. Scale notes live on the extension objects;
  * every query follows the Q determinism contract.
  */
object GroupH5 {

  /** DSIR importance weights (target = English subset, raw = full corpus)
    * over 4096 hashed-unigram buckets. The oracle replays the bucketing
    * (md5 prefix), the add-one-smoothed log-ratio (identical double op
    * tree), and the exact micro-unit integer sums.
    */
  val h55 = Q(
    "h55_dsir_weights",
    """WITH toks AS (
      |  SELECT doc_id, lang = 'en' AS in_target,
      |    list_filter(string_split_regex(lower(text), '\s+'), t -> len(t) > 0) AS l
      |  FROM documents),
      |dt AS (
      |  SELECT doc_id, in_target, substr(md5(term), 1, 3) AS bucket, count(*) AS m
      |  FROM (SELECT doc_id, in_target, unnest(l) AS term FROM toks)
      |  GROUP BY doc_id, in_target, bucket),
      |lm AS (
      |  SELECT bucket, CAST(sum(m) AS BIGINT) AS cr,
      |    CAST(sum(CASE WHEN in_target THEN m ELSE 0 END) AS BIGINT) AS ct
      |  FROM dt GROUP BY bucket),
      |tot AS (SELECT CAST(sum(cr) AS BIGINT) AS nr, CAST(sum(ct) AS BIGINT) AS nt FROM lm),
      |ratio AS (
      |  SELECT bucket,
      |    CAST(floor(ln(
      |      ((CAST(ct AS DOUBLE) + 1.0) / (CAST(nt AS DOUBLE) + 4096.0)) /
      |      ((CAST(cr AS DOUBLE) + 1.0) / (CAST(nr AS DOUBLE) + 4096.0)))
      |      * 1000000.0 + 0.5) AS BIGINT) AS q
      |  FROM lm CROSS JOIN tot)
      |SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_tokens,
      |  CAST(sum(m * q) AS BIGINT) AS weight_q,
      |  CAST(sum(m * q) AS DOUBLE) / (CAST(sum(m) AS DOUBLE) * 1000000.0) AS avg_logratio
      |FROM dt JOIN ratio USING (bucket)
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    Mixing.dsirWeights(Tables.documents(s, d), "doc_id", "text",
      col("lang") === "en")
      .orderBy("doc_id")
  }

  /** SemDeDup: the h15 fixed-point k-means clusters (16 centroids, 2
    * iterations — the oracle replays them bit-for-bit), then within-cluster
    * near-dup pruning at cosine ≥ 0.3 with lowest-id-wins. Output is the
    * full corpus disposition (every vector, its cluster, kept/dropped).
    */
  val h56 = Q(
    "h56_semdedup",
    """WITH norms AS (
      |  SELECT vec_id, embedding,
      |    sqrt(list_aggregate(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE), 'sum')) AS nrm
      |  FROM embeddings),
      |cent0 AS (
      |  SELECT vec_id AS cid, embedding AS centroid
      |  FROM embeddings ORDER BY vec_id LIMIT 16),
      |sim0 AS (
      |  SELECT n.vec_id, c.cid,
      |    list_aggregate(list_transform(generate_series(1, len(n.embedding)),
      |      i -> n.embedding[i]::DOUBLE * c.centroid[i]::DOUBLE), 'sum')
      |      / (n.nrm * sqrt(list_aggregate(list_transform(c.centroid,
      |           x -> x::DOUBLE * x::DOUBLE), 'sum'))) AS acos
      |  FROM norms n CROSS JOIN cent0 c),
      |asg0 AS (
      |  SELECT vec_id, cid FROM (
      |    SELECT vec_id, cid,
      |      row_number() OVER (PARTITION BY vec_id ORDER BY acos DESC, cid) AS rn
      |    FROM sim0) WHERE rn = 1),
      |cent1 AS (
      |  SELECT cid, list(CAST(comp AS REAL) ORDER BY dim) AS centroid FROM (
      |    SELECT a.cid, u.i AS dim,
      |      CAST(sum(CAST(floor(v.embedding[u.i]::DOUBLE * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
      |        / (CAST(count(*) AS DOUBLE) * 1000000.0) AS comp
      |    FROM asg0 a
      |    JOIN embeddings v ON v.vec_id = a.vec_id,
      |    unnest(generate_series(1, len(v.embedding))) AS u(i)
      |    GROUP BY a.cid, u.i)
      |  GROUP BY cid),
      |sim1 AS (
      |  SELECT n.vec_id, c.cid,
      |    list_aggregate(list_transform(generate_series(1, len(n.embedding)),
      |      i -> n.embedding[i]::DOUBLE * c.centroid[i]::DOUBLE), 'sum')
      |      / (n.nrm * sqrt(list_aggregate(list_transform(c.centroid,
      |           x -> x::DOUBLE * x::DOUBLE), 'sum'))) AS acos
      |  FROM norms n CROSS JOIN cent1 c),
      |asg1 AS (
      |  SELECT vec_id, cid FROM (
      |    SELECT vec_id, cid,
      |      row_number() OVER (PARTITION BY vec_id ORDER BY acos DESC, cid) AS rn
      |    FROM sim1) WHERE rn = 1),
      |cent2 AS (
      |  SELECT cid, list(CAST(comp AS REAL) ORDER BY dim) AS centroid FROM (
      |    SELECT a.cid, u.i AS dim,
      |      CAST(sum(CAST(floor(v.embedding[u.i]::DOUBLE * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
      |        / (CAST(count(*) AS DOUBLE) * 1000000.0) AS comp
      |    FROM asg1 a
      |    JOIN embeddings v ON v.vec_id = a.vec_id,
      |    unnest(generate_series(1, len(v.embedding))) AS u(i)
      |    GROUP BY a.cid, u.i)
      |  GROUP BY cid),
      |simf AS (
      |  SELECT n.vec_id, c.cid,
      |    list_aggregate(list_transform(generate_series(1, len(n.embedding)),
      |      i -> n.embedding[i]::DOUBLE * c.centroid[i]::DOUBLE), 'sum')
      |      / (n.nrm * sqrt(list_aggregate(list_transform(c.centroid,
      |           x -> x::DOUBLE * x::DOUBLE), 'sum'))) AS acos
      |  FROM norms n CROSS JOIN cent2 c),
      |assigned AS (
      |  SELECT vec_id, cid FROM (
      |    SELECT vec_id, cid,
      |      row_number() OVER (PARTITION BY vec_id ORDER BY acos DESC, cid) AS rn
      |    FROM simf) WHERE rn = 1),
      |dups AS (
      |  SELECT DISTINCT b.vec_id AS dup_id
      |  FROM assigned a JOIN assigned b ON a.cid = b.cid AND a.vec_id < b.vec_id
      |  JOIN norms x ON x.vec_id = a.vec_id
      |  JOIN norms y ON y.vec_id = b.vec_id
      |  WHERE floor(list_aggregate(list_transform(generate_series(1, len(x.embedding)),
      |      i -> x.embedding[i]::DOUBLE * y.embedding[i]::DOUBLE), 'sum')
      |      / (x.nrm * y.nrm) * 10000 + 0.5) / 10000 >= 0.3)
      |SELECT a.vec_id, a.cid, d.dup_id IS NULL AS is_kept
      |FROM assigned a LEFT JOIN dups d ON a.vec_id = d.dup_id
      |ORDER BY a.vec_id""".stripMargin) { (s, d) =>
    Similarity.semanticDedup(Tables.embeddings(s, d), "vec_id", "embedding",
      minCosine = 0.3, nCentroids = 16, kmeansIters = 2)
      .orderBy("vec_id")
  }

  /** DSIR Gumbel top-k resampling: the h55 weights driven through the
    * actual selection procedure (top-100 by log-weight + md5-derived
    * Gumbel noise). The oracle replays the hex-decode, the Gumbel double
    * op tree, and the micro-unit integer ordering.
    */
  val h60 = Q(
    "h60_dsir_resample",
    """WITH toks AS (
      |  SELECT doc_id, lang = 'en' AS in_target,
      |    list_filter(string_split_regex(lower(text), '\s+'), t -> len(t) > 0) AS l
      |  FROM documents),
      |dt AS (
      |  SELECT doc_id, in_target, substr(md5(term), 1, 3) AS bucket, count(*) AS m
      |  FROM (SELECT doc_id, in_target, unnest(l) AS term FROM toks)
      |  GROUP BY doc_id, in_target, bucket),
      |lm AS (
      |  SELECT bucket, CAST(sum(m) AS BIGINT) AS cr,
      |    CAST(sum(CASE WHEN in_target THEN m ELSE 0 END) AS BIGINT) AS ct
      |  FROM dt GROUP BY bucket),
      |tot AS (SELECT CAST(sum(cr) AS BIGINT) AS nr, CAST(sum(ct) AS BIGINT) AS nt FROM lm),
      |ratio AS (
      |  SELECT bucket,
      |    CAST(floor(ln(
      |      ((CAST(ct AS DOUBLE) + 1.0) / (CAST(nt AS DOUBLE) + 4096.0)) /
      |      ((CAST(cr AS DOUBLE) + 1.0) / (CAST(nr AS DOUBLE) + 4096.0)))
      |      * 1000000.0 + 0.5) AS BIGINT) AS q
      |  FROM lm CROSS JOIN tot),
      |w AS (
      |  SELECT doc_id, CAST(sum(m) AS BIGINT) AS n_tokens,
      |    CAST(sum(m * q) AS BIGINT) AS weight_q
      |  FROM dt JOIN ratio USING (bucket)
      |  GROUP BY doc_id),
      |keyed AS (
      |  SELECT doc_id, n_tokens, weight_q,
      |    CAST(floor((CAST(weight_q AS DOUBLE) / 1000000.0 +
      |      -ln(-ln((CAST(
      |        (ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 48 -
      |          CASE WHEN ascii(substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) >= 97 THEN 39 ELSE 0 END) * 16 +
      |        (ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 48 -
      |          CASE WHEN ascii(substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) >= 97 THEN 39 ELSE 0 END)
      |        AS DOUBLE) + 0.5) / 256.0))) * 1000000.0 + 0.5) AS BIGINT) AS score_q
      |  FROM w)
      |SELECT doc_id, n_tokens, weight_q, score_q,
      |  CAST(score_q AS DOUBLE) / 1000000.0 AS score
      |FROM keyed
      |ORDER BY score_q DESC, doc_id LIMIT 100""".stripMargin) { (s, d) =>
    Mixing.dsirResample(Tables.documents(s, d), "doc_id", "text",
      col("lang") === "en", k = 100)
  }

  /** Domain token mixture + uniform-target sampling weights. */
  val h57 = Q(
    "h57_domain_mixture",
    """WITH toks AS (
      |  SELECT source AS domain,
      |    coalesce(len(list_filter(string_split_regex(lower(text), '\s+'),
      |                             t -> len(t) > 0)), 0) AS n
      |  FROM documents),
      |pd AS (
      |  SELECT domain, count(*) AS n_docs, CAST(sum(n) AS BIGINT) AS n_tokens
      |  FROM toks GROUP BY domain),
      |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS t, count(*) AS s FROM pd)
      |SELECT domain, n_docs, n_tokens,
      |  CAST(floor(CAST(n_tokens AS DOUBLE) * 1000000.0 / CAST(t AS DOUBLE) + 0.5) AS BIGINT) AS share_q,
      |  CAST(floor(CAST(t AS DOUBLE) * 1000000.0 /
      |    (CAST(s AS DOUBLE) * CAST(n_tokens AS DOUBLE)) + 0.5) AS BIGINT) AS weight_q,
      |  CAST(CAST(floor(CAST(t AS DOUBLE) * 1000000.0 /
      |    (CAST(s AS DOUBLE) * CAST(n_tokens AS DOUBLE)) + 0.5) AS BIGINT) AS DOUBLE)
      |    / 1000000.0 AS weight
      |FROM pd CROSS JOIN tot
      |ORDER BY domain""".stripMargin) { (s, d) =>
    Mixing.domainMixture(Tables.documents(s, d), "source", "text")
      .orderBy("domain")
  }

  /** BPE first-merge candidates: top-30 within-token adjacent char pairs. */
  val h58 = Q(
    "h58_bpe_pair_stats",
    """WITH toks AS (
      |  SELECT list_filter(string_split_regex(lower(text), '\s+'),
      |                     t -> len(t) > 0) AS l
      |  FROM documents),
      |t AS (SELECT unnest(l) AS tok FROM toks),
      |p AS (
      |  SELECT substr(tok, i, 2) AS pair
      |  FROM t, unnest(generate_series(1, len(tok) - 1)) AS u(i)
      |  WHERE len(tok) >= 2)
      |SELECT pair, count(*) AS n
      |FROM p GROUP BY pair
      |ORDER BY n DESC, pair LIMIT 30""".stripMargin) { (s, d) =>
    TextAnalysis.bpePairStats(Tables.documents(s, d), "text", k = 30)
  }

  /** Per-domain percentile quality gate: keep the top half of each source
    * by the h11 quality score (integer rank math, no percent_rank doubles).
    */
  val h59 = Q(
    "h59_percentile_gate",
    """WITH tok AS (
      |  SELECT doc_id, text, source,
      |    list_filter(string_split_regex(lower(text), '\s+'), t -> len(t) > 0) AS toks
      |  FROM documents),
      |m AS (
      |  SELECT doc_id, source,
      |    CAST(len(toks) AS BIGINT) AS n_tokens,
      |    floor(len(list_filter(toks, t -> list_contains(['the','a','and','of','to','in','is','it','for','on'], t)))
      |      / greatest(len(toks), 1)::DOUBLE * 10000 + 0.5) / 10000 AS stopword_ratio,
      |    floor(length(regexp_replace(lower(text), '[^a-z]', '', 'g'))
      |      / greatest(length(text), 1)::DOUBLE * 10000 + 0.5) / 10000 AS alpha_ratio
      |  FROM tok),
      |qs AS (
      |  SELECT doc_id, source AS domain,
      |    floor((least(n_tokens / 64.0, 1.0) * 0.5 + alpha_ratio * 0.3 +
      |          least(stopword_ratio * 4.0, 1.0) * 0.2) * 10000 + 0.5) / 10000
      |      AS quality_score
      |  FROM m),
      |r AS (
      |  SELECT doc_id, domain, quality_score,
      |    CAST(row_number() OVER (PARTITION BY domain
      |      ORDER BY quality_score DESC, doc_id) AS BIGINT) AS rank_in_domain,
      |    CAST(count(*) OVER (PARTITION BY domain) AS BIGINT) AS n_in_domain
      |  FROM qs)
      |SELECT doc_id, domain, quality_score, rank_in_domain, n_in_domain
      |FROM r WHERE rank_in_domain * 2 <= n_in_domain
      |ORDER BY domain, rank_in_domain""".stripMargin) { (s, d) =>
    TextAnalysis.percentileGate(Tables.documents(s, d), "doc_id", "text", "source")
      .orderBy("domain", "rank_in_domain")
  }

  /** Incremental dedup: the odd-id half of `documents` arrives as a new
    * batch against the even-id half as the accumulated corpus; admit only
    * batch docs that are neither exact nor verified near-dups of the corpus
    * or of a lower-id batch doc. The oracle replays the full chain: exact
    * collapse + anti, union with precedence flags, MinHash 16 / LSH 4×4
    * banding, (ord, id) row-order domination, exact-Jaccard verify.
    */
  val h61 = Q(
    "h61_incremental_dedup",
    """WITH ex AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0),
      |inc AS (SELECT doc_id, text FROM documents WHERE doc_id % 2 = 1),
      |infp AS (
      |  SELECT doc_id, text,
      |    md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
      |  FROM inc),
      |reps AS (
      |  SELECT i.doc_id, i.text, i.fp
      |  FROM infp i
      |  JOIN (SELECT fp, min(doc_id) AS doc_id FROM infp GROUP BY fp) k
      |    ON i.doc_id = k.doc_id),
      |exfp AS (
      |  SELECT DISTINCT md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) AS fp
      |  FROM ex),
      |fresh AS (
      |  SELECT r.doc_id, r.text FROM reps r
      |  WHERE NOT EXISTS (SELECT 1 FROM exfp e WHERE e.fp = r.fp)),
      |u AS (
      |  SELECT doc_id, text, 0 AS ord FROM ex
      |  UNION ALL
      |  SELECT doc_id, text, 1 AS ord FROM fresh),
      |tok AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
      |                             t -> len(t) > 0) AS toks
      |  FROM u),
      |base AS (SELECT doc_id, toks FROM tok WHERE len(toks) >= 3),
      |sh AS (
      |  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 2),
      |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
      |  FROM base),
      |ks AS (SELECT unnest(generate_series(0, 15)) AS k),
      |mh AS (
      |  SELECT doc_id, k, min(md5(k::VARCHAR || ':' || shingle)) AS m
      |  FROM sh CROSS JOIN ks GROUP BY doc_id, k),
      |sig AS (
      |  SELECT doc_id, k // 4 AS band, md5(string_agg(m, '' ORDER BY k)) AS bucket
      |  FROM mh GROUP BY doc_id, k // 4),
      |sigo AS (SELECT s.doc_id, s.band, s.bucket, uu.ord FROM sig s JOIN u uu USING (doc_id)),
      |cand AS (
      |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |  FROM sigo a JOIN sigo b ON a.band = b.band AND a.bucket = b.bucket
      |  WHERE b.ord = 1 AND (a.ord, a.doc_id) < (b.ord, b.doc_id)),
      |ds AS (SELECT DISTINCT doc_id, shingle FROM sh),
      |sizes AS (SELECT doc_id, count(*) AS n FROM ds GROUP BY doc_id),
      |inter AS (
      |  SELECT c.id_a, c.id_b, count(*) AS i
      |  FROM cand c
      |  JOIN ds x ON x.doc_id = c.id_a
      |  JOIN ds y ON y.doc_id = c.id_b AND y.shingle = x.shingle
      |  GROUP BY c.id_a, c.id_b),
      |drop_ids AS (
      |  SELECT DISTINCT id_b FROM inter
      |  JOIN sizes sa ON id_a = sa.doc_id
      |  JOIN sizes sb ON id_b = sb.doc_id
      |  WHERE floor(CAST(i AS DOUBLE) / (sa.n + sb.n - i) * 10000 + 0.5) / 10000 >= 0.5)
      |SELECT f.doc_id FROM fresh f
      |WHERE NOT EXISTS (SELECT 1 FROM drop_ids d WHERE d.id_b = f.doc_id)
      |ORDER BY f.doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    // existing-corpus side via the (optionally Bench-materialized) index —
    // identical plan to incrementalDedup when built per call, and the
    // documented materialize-once daily-run posture when Bench opts in
    graft.extensions.Dedup.incrementalDedupFromIndex(
      DupGraph.h61CorpusIndex(s, d),
      docs.filter(col("doc_id") % 2 === 1),
      "doc_id", "text", minJaccard = 0.5)
      .orderBy("doc_id")
  }

  /** Per-doc n-gram novelty (fraction of distinct 3-shingles with corpus
    * df = 1 — the corpus-overlap/memorization-risk profile).
    */
  val h62 = Q(
    "h62_ngram_novelty",
    """WITH tok AS (
      |  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
      |                             t -> len(t) > 0) AS toks
      |  FROM documents),
      |base AS (SELECT doc_id, toks FROM tok WHERE len(toks) >= 3),
      |sh AS (
      |  SELECT doc_id, unnest(list_transform(generate_series(1, len(toks) - 2),
      |    i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS shingle
      |  FROM base),
      |ds AS (SELECT DISTINCT doc_id, shingle FROM sh),
      |dfs AS (SELECT shingle, count(*) AS df FROM ds GROUP BY shingle)
      |SELECT doc_id,
      |  CAST(count(*) AS BIGINT) AS n_shingles,
      |  CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
      |  floor(CAST(sum(CASE WHEN df = 1 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(count(*) AS DOUBLE) * 10000 + 0.5) / 10000 AS novelty
      |FROM ds JOIN dfs USING (shingle)
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    // consume the shared exploded shingle relation (the h5/h6 pattern) —
    // per-call identical to noveltyScores; in Bench the tokenize+shingle
    // prefix is the materialized table every shingle consumer shares
    TextAnalysis.noveltyScoresFromShingles(
      DupGraph.shingleRows(s, d), "doc_id", "shingle")
      .orderBy("doc_id")
  }

  /** Bag-of-words (order-insensitive) dedup disposition: md5 over the
    * sorted token multiset, cluster stats, lowest-id-wins keep flag. Catches
    * shuffled/re-templated copies that the h1 order-sensitive fingerprint
    * misses. Token sort order is binary codepoint in both engines (tokens
    * are lowercased, so no collation surface). NULL-text docs keep a
    * sentinel fingerprint in both engines so the disposition is total.
    */
  val h63 = Q(
    "h63_bag_dedup",
    """WITH fp AS (
      |  SELECT doc_id,
      |    coalesce(md5(array_to_string(list_sort(
      |      list_filter(string_split_regex(lower(text), '\s+'),
      |                  t -> len(t) > 0)), ' ')), '__null_text__') AS bag_fp
      |  FROM documents),
      |cl AS (
      |  SELECT bag_fp, count(*) AS cluster_size, min(doc_id) AS keeper
      |  FROM fp GROUP BY bag_fp)
      |SELECT f.doc_id, f.bag_fp, cl.cluster_size, f.doc_id = cl.keeper AS kept
      |FROM fp f JOIN cl USING (bag_fp)
      |ORDER BY f.doc_id""".stripMargin) { (s, d) =>
    graft.extensions.Dedup.bagDedup(Tables.documents(s, d), "doc_id", "text")
      .orderBy("doc_id")
  }

  /** Hard-negative mining: exact top-5 most-similar different-label
    * neighbors per query vector (contrastive-training negatives). The
    * oracle replays the h2 cosine machinery plus the label-mismatch join
    * condition; ranks are total-ordered by (cos desc, neighbor_id).
    */
  val h64 = Q(
    "h64_hard_negatives",
    """WITH q AS (
      |  SELECT vec_id AS query_id, embedding AS qv, label AS query_label
      |  FROM embeddings WHERE vec_id < 16),
      |c AS (
      |  SELECT vec_id AS neighbor_id, embedding AS cv, label AS neighbor_label
      |  FROM embeddings),
      |norms AS (
      |  SELECT vec_id,
      |    sqrt(list_aggregate(list_transform(embedding, x -> x::DOUBLE * x::DOUBLE), 'sum')) AS nrm
      |  FROM embeddings),
      |scored AS (
      |  SELECT query_id, query_label, neighbor_id, neighbor_label,
      |    floor(list_aggregate(
      |      list_transform(generate_series(1, len(qv)), i -> qv[i]::DOUBLE * cv[i]::DOUBLE),
      |      'sum') / (nq.nrm * nc.nrm) * 10000 + 0.5) / 10000 AS cos
      |  FROM q JOIN c ON neighbor_label <> query_label
      |  JOIN norms nq ON nq.vec_id = query_id
      |  JOIN norms nc ON nc.vec_id = neighbor_id),
      |ranked AS (
      |  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
      |    ORDER BY cos DESC, neighbor_id) AS BIGINT) AS rank
      |  FROM scored)
      |SELECT query_id, query_label, rank, neighbor_id, neighbor_label, cos
      |FROM ranked WHERE rank <= 5
      |ORDER BY query_id, rank""".stripMargin) { (s, d) =>
    val embs = Tables.embeddings(s, d)
    Similarity.hardNegatives(embs, embs.filter(col("vec_id") < 16),
      "vec_id", "embedding", "label", 5)
      .withColumn("rank", col("rank").cast("long"))
      .orderBy("query_id", "rank")
  }

  /** PageRank over the h41 SimHash near-dup pair graph: authority scores
    * that pick the canonical doc per duplicate neighborhood. The oracle
    * replays the h41 graph construction, then 3 unrolled fixed-point
    * iterations (integer contributions via floor division, one damping
    * double op per node per round).
    */
  val h65 = Q(
    "h65_dup_graph_pagerank",
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
      |  WHERE bit_count(xor(a.sig, b.sig)) <= 2),
      |edges AS (
      |  SELECT id_a AS src, id_b AS dst FROM cand
      |  UNION ALL SELECT id_b, id_a FROM cand),
      |deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
      |s0 AS (SELECT src AS node, CAST(1000000 AS BIGINT) AS score FROM deg),
      |s1 AS (
      |  SELECT e.dst AS node,
      |    150000 + CAST(floor(0.85 * CAST(sum(s.score // d.deg) AS DOUBLE)) AS BIGINT) AS score
      |  FROM edges e JOIN deg d ON d.src = e.src JOIN s0 s ON s.node = e.src
      |  GROUP BY e.dst),
      |s2 AS (
      |  SELECT e.dst AS node,
      |    150000 + CAST(floor(0.85 * CAST(sum(s.score // d.deg) AS DOUBLE)) AS BIGINT) AS score
      |  FROM edges e JOIN deg d ON d.src = e.src JOIN s1 s ON s.node = e.src
      |  GROUP BY e.dst),
      |s3 AS (
      |  SELECT e.dst AS node,
      |    150000 + CAST(floor(0.85 * CAST(sum(s.score // d.deg) AS DOUBLE)) AS BIGINT) AS score
      |  FROM edges e JOIN deg d ON d.src = e.src JOIN s2 s ON s.node = e.src
      |  GROUP BY e.dst)
      |SELECT node AS doc_id, score AS pr_micro,
      |  CAST(score AS DOUBLE) / 1000000.0 AS pagerank
      |FROM s3 ORDER BY doc_id""".stripMargin) { (s, d) =>
    val pairs = DupGraph.pairs(s, d)
    graft.extensions.Dedup.pageRank(pairs, "id_a", "id_b", iterations = 3)
      .select(col("node").as("doc_id"), col("pr_micro"), col("pagerank"))
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(h55, h56, h57, h58, h59, h60, h61, h62, h63, h64, h65)
}
