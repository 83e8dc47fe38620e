package graft.queries

import graft.Tables
import graft.extensions.Dedup
import org.apache.spark.sql.functions._

/** Group H (continued) — round-17 batch: split-leakage REPAIR (the
  * resolution step after h111's audit) and line-level boilerplate removal
  * (the CCNet §4.1 pre-filter). Scale notes live on
  * [[graft.extensions.Dedup]].
  */
object GroupH14 {

  private val dTok =
    """list_filter(string_split_regex(lower(text), '\s+'), t -> len(t) > 0)"""

  private def splitCase(idExpr: String): String =
    s"""CASE WHEN substr(md5(CAST($idExpr AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
       |         WHEN substr(md5(CAST($idExpr AS VARCHAR)), 1, 2) < 'e6' THEN 'valid'
       |         ELSE 'test' END""".stripMargin

  /** Split-leakage repair ([[graft.extensions.Dedup.splitRepair]],
    * move-to-train policy) over BOTH duplicate channels — the exact
    * fingerprint star edges ([[graft.extensions.Dedup.exactDupPairs]])
    * unioned with the shared MinHash-verified near-dup pair table: every
    * member of a duplicate CONNECTED COMPONENT that spans a train/valid/
    * test boundary moves to train (component closure is what makes the
    * repair idempotent — patching only the cross pairs' endpoints can
    * manufacture new cross pairs out of previously same-split ones). The
    * oracle replays the exact star edges, h16's verified-pair chain, the
    * transitive closure (recursive CTE, the h23 pattern), and the policy.
    */
  val h112 = Q(
    "h112_split_repair",
    s"""WITH RECURSIVE fp AS (
      |  SELECT doc_id, md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fp
      |  FROM documents),
      |exact_pairs AS (
      |  SELECT k.rep AS id_a, f.doc_id AS id_b
      |  FROM fp f JOIN (SELECT fp, min(doc_id) AS rep FROM fp GROUP BY fp) k
      |    USING (fp)
      |  WHERE f.doc_id <> k.rep),
      |reps AS (
      |  SELECT d.doc_id, d.text
      |  FROM documents d
      |  JOIN (SELECT fp, min(doc_id) AS doc_id FROM fp GROUP BY fp) k
      |    ON d.doc_id = k.doc_id),
      |tok AS (
      |  SELECT doc_id, $dTok AS toks
      |  FROM reps),
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
      |vp AS (
      |  SELECT id_a, id_b FROM inter
      |  JOIN sizes sa ON id_a = sa.doc_id
      |  JOIN sizes sb ON id_b = sb.doc_id
      |  WHERE floor(CAST(i AS DOUBLE) / (sa.n + sb.n - i) * 10000 + 0.5) / 10000 >= 0.5),
      |allp AS (SELECT id_a, id_b FROM exact_pairs
      |  UNION SELECT id_a, id_b FROM vp),
      |edges AS (
      |  SELECT id_a AS u, id_b AS v FROM allp
      |  UNION SELECT id_b, id_a FROM allp),
      |reach(u, v) AS (
      |  SELECT u, v FROM edges
      |  UNION
      |  SELECT r.u, e.v FROM reach r JOIN edges e ON e.u = r.v WHERE e.v <> r.u),
      |comp AS (SELECT u AS doc_id, least(u, min(v)) AS comp
      |  FROM reach GROUP BY u),
      |lab AS (
      |  SELECT doc_id, comp,
      |    ${splitCase("doc_id")} AS split
      |  FROM comp),
      |leaky AS (SELECT comp FROM lab GROUP BY comp
      |  HAVING min(split) <> max(split))
      |SELECT doc_id, split AS split_old, 'train' AS split_new,
      |  'move' AS action
      |FROM lab JOIN leaky USING (comp)
      |WHERE split <> 'train'
      |ORDER BY doc_id""".stripMargin) { (s, d) =>
    val docs = Tables.documents(s, d)
    Dedup.splitRepair(
        Dedup.exactDupPairs(docs, "doc_id", "text")
          .unionByName(DupGraph.verifiedPairs(s, d)),
        policy = "move_to_train")
      .orderBy("doc_id")
  }

  /** Line-level boilerplate removal
    * ([[graft.extensions.Dedup.boilerplateLines]], minDf = 2): drop every
    * line appearing in ≥ 2 distinct documents — the CCNet §4.1 pre-filter
    * that strips headers/footers/nav chrome before doc-level dedup. The
    * fixture's documents carry no newlines (one long token stream), so the
    * query derives its line structure first — wrap at 12 tokens per line,
    * the adapter an operator consumer would replace with real newline
    * splitting on a crawl corpus — and the oracle replays the wrap, the
    * per-line document frequency, the drop-ALL-occurrences rule, and the
    * ordered reassembly.
    */
  val h113 = Q(
    "h113_boilerplate_lines",
    s"""WITH toks AS (
      |  SELECT doc_id, $dTok AS l FROM documents),
      |n AS (SELECT doc_id, l, CAST(len(l) AS BIGINT) AS n FROM toks
      |  WHERE len(l) > 0),
      |lines AS (
      |  SELECT doc_id, CAST(i AS BIGINT) AS i,
      |    array_to_string(list_slice(l, (i - 1) * 12 + 1, (i - 1) * 12 + 12), ' ') AS line
      |  FROM (SELECT doc_id, l, n, unnest(generate_series(1, ((n - 1) // 12) + 1)) AS i
      |        FROM n)),
      |df AS (
      |  SELECT line, count(DISTINCT doc_id) AS df FROM lines GROUP BY line),
      |bp AS (SELECT line FROM df WHERE df >= 2),
      |marked AS (
      |  SELECT l.doc_id, l.i, l.line, b.line IS NOT NULL AS is_bp
      |  FROM lines l LEFT JOIN bp b ON b.line = l.line),
      |agg AS (
      |  SELECT doc_id, count(*) AS n_lines,
      |    CAST(sum(CASE WHEN NOT is_bp THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
      |    string_agg(CASE WHEN NOT is_bp THEN line END, chr(10) ORDER BY i) AS txt
      |  FROM marked GROUP BY doc_id)
      |SELECT doc_id, n_lines, n_kept,
      |  CASE WHEN n_kept > 0 THEN txt END AS text_clean
      |FROM agg ORDER BY doc_id""".stripMargin) { (s, d) =>
    val wrapped = Tables.documents(s, d)
      .select(col("doc_id"),
        graft.extensions.TextOps.tokens(col("text")).as("__toks"))
      .filter(size(col("__toks")) > 0)
      .select(col("doc_id"),
        array_join(
          transform(sequence(lit(0), expr("int((size(__toks) - 1) div 12)")),
            i => array_join(slice(col("__toks"), i * 12 + 1, lit(12)), " ")),
          "\n").as("text"))
    Dedup.boilerplateLines(wrapped, "doc_id", "text", minDf = 2)
      .orderBy("doc_id")
  }

  /** One unrolled BPE learning round for the h114 oracle: pair counts over
    * the round's vocabulary symbols, the frequency-argmax pair (ties →
    * lexicographically smallest), greedy-leftmost application via overlap
    * ISLANDS (consecutive match positions take every other slot — matches
    * of a pair with distinct symbols can never be adjacent, so the island
    * rule only bites on same-symbol runs like "aaaa" → "aa aa"), and the
    * positional reconstruction of the next round's symbols. MATERIALIZED
    * is load-bearing: each round references its predecessor three times,
    * and inlined CTEs would expand 3^nMerges-fold.
    */
  private def bpeRound(r: Int): String =
    s"""pos$r AS MATERIALIZED (
      |  SELECT tok, freq, CAST(u.i AS BIGINT) AS p, syms[u.i] AS sym,
      |    CASE WHEN u.i < len(syms) THEN syms[u.i + 1] END AS nxt
      |  FROM v$r, unnest(generate_series(1, len(syms))) AS u(i)),
      |pc$r AS (SELECT sym AS x, nxt AS y, sum(freq) AS cnt
      |  FROM pos$r WHERE nxt IS NOT NULL GROUP BY sym, nxt),
      |top$r AS MATERIALIZED (SELECT x, y, x || y AS xy, CAST(cnt AS BIGINT) AS cnt
      |  FROM pc$r ORDER BY cnt DESC, x, y LIMIT 1),
      |m$r AS (SELECT pos$r.tok AS tok, p FROM pos$r, top$r WHERE sym = x AND nxt = y),
      |isl$r AS (SELECT tok, p, p - row_number() OVER (PARTITION BY tok ORDER BY p) AS grp
      |  FROM m$r),
      |take$r AS MATERIALIZED (SELECT tok, p FROM (
      |    SELECT tok, p, p - min(p) OVER (PARTITION BY tok, grp) AS off FROM isl$r)
      |  WHERE off % 2 = 0),
      |v${r + 1} AS MATERIALIZED (
      |  -- LEFT JOIN ON TRUE, not CROSS JOIN: when the corpus exhausts early
      |  -- (no pair left, top$r empty) a cross join would EMPTY this and
      |  -- every later vocabulary — the Spark trainer keeps the last
      |  -- segmentation on early stop, and the fertility oracle must too
      |  SELECT q.tok, q.freq,
      |    list(CASE WHEN t.p IS NOT NULL THEN tp.xy ELSE q.sym END ORDER BY q.p) AS syms
      |  FROM pos$r q
      |  LEFT JOIN top$r tp ON TRUE
      |  LEFT JOIN take$r t ON t.tok = q.tok AND t.p = q.p
      |  LEFT JOIN take$r c ON c.tok = q.tok AND c.p = q.p - 1
      |  WHERE c.p IS NULL
      |  GROUP BY q.tok, q.freq)""".stripMargin

  private val bpeMerges = 8

  /** The shared h114/h115 oracle prefix: the character-seeded vocabulary
    * and all `bpeMerges` unrolled learning rounds — h114 selects the merge
    * table off the `top<r>` CTEs, h115 the final segmentation `v<n+1>`.
    */
  private def bpeRoundsPrefix: String = {
    val base =
      s"""v1 AS MATERIALIZED (
        |  SELECT tok, freq, list_transform(generate_series(1, length(tok)), i -> tok[i]) AS syms
        |  FROM (SELECT tok, count(*) AS freq
        |        FROM (SELECT unnest($dTok) AS tok FROM documents)
        |        GROUP BY tok))""".stripMargin
    val rounds = (1 to bpeMerges).map(bpeRound).mkString(",\n")
    s"WITH $base,\n$rounds"
  }

  private def bpeOracle: String = {
    val finals = (1 to bpeMerges).map(r =>
      s"SELECT $r AS merge_rank, x AS l_sym, y AS r_sym, xy AS merged, cnt AS pair_count FROM top$r")
      .mkString("\nUNION ALL ")
    s"$bpeRoundsPrefix\n$finals\nORDER BY merge_rank"
  }

  private def bpeEncodeOracle: String =
    s"""$bpeRoundsPrefix,
      |tokdoc AS (SELECT doc_id, unnest($dTok) AS tok FROM documents),
      |pieces AS (SELECT tok, CAST(len(syms) AS BIGINT) AS np FROM v${bpeMerges + 1})
      |SELECT doc_id, count(*) AS n_tokens, CAST(sum(np) AS BIGINT) AS n_pieces,
      |  floor(CAST(sum(np) AS DOUBLE) / count(*) * 10000 + 0.5) / 10000 AS fertility
      |FROM tokdoc JOIN pieces USING (tok)
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  /** BPE merge learning ([[graft.extensions.TextAnalysis.bpeLearn]],
    * 8 rounds): the multi-round tokenizer-training loop h46's single
    * pair-count diagnostic feeds — per round, the frequency-argmax
    * adjacent symbol pair over the corpus VOCABULARY (one corpus token
    * aggregate up front; every round is vocabulary-sized) merged
    * greedy-leftmost into the symbols, emitting the learned merge table
    * in priority order. The oracle unrolls all 8 rounds relationally
    * (pair counts → top-1 → overlap islands → positional rebuild) and
    * agrees with the Spark fold bit-for-bit, later rounds learning
    * composite merges (e.g. p+ar→par at sf0.001).
    */
  val h114 = Q("h114_bpe_merge_learning", bpeOracle) { (s, d) =>
    graft.extensions.TextAnalysis.bpeLearn(
        Tables.documents(s, d), "text", nMerges = bpeMerges)
      .orderBy("merge_rank")
  }

  /** BPE encoding profile ([[graft.extensions.TextAnalysis.bpeEncode]]
    * under the h114 8-round vocabulary): per document, token count, piece
    * count, and tokenizer FERTILITY (pieces per token) — the standard
    * tokenizer-fit metric per source/domain (high fertility = text the
    * learned merges don't compress, the signal behind vocabulary-size and
    * data-mix decisions). Shares the trainer's final vocabulary
    * segmentation, so the oracle is the same unrolled round chain reading
    * `v9` instead of the merge table, plus one token join + per-doc
    * aggregate.
    */
  val h115 = Q("h115_bpe_fertility", bpeEncodeOracle) { (s, d) =>
    graft.extensions.TextAnalysis.bpeEncode(
        Tables.documents(s, d), "doc_id", "text", nMerges = bpeMerges)
      .orderBy("doc_id")
  }

  val all: Seq[Q] = Seq(h112, h113, h114, h115)
}
