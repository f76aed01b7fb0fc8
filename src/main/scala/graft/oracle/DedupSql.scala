package graft.oracle

import SqlFragments._
import graft.functions.Rounding

/** DuckDB oracle SQL for [[graft.operators.Dedup]]. */
object DedupSql {

  val oracle: Map[String, String] = Map(
    "q18_exact_dedup" ->
      s"""SELECT md5(${normTextSql("text")}) AS text_hash,
         |       min(doc_id) AS canonical_id,
         |       count(*) AS n_docs,
         |       array_to_string(list_sort(list(doc_id)), ',') AS doc_ids_csv
         |FROM documents GROUP BY 1""".stripMargin,

    "q19_minhash_bands" ->
      s"""WITH $minhashBandsSql
         |SELECT doc_id, band_id, band_hash FROM bands""".stripMargin,

    "q20_neardup_pairs" -> oracleQ20,

    "q50_dedup_clusters" ->
      s"""WITH RECURSIVE pairs AS (
         |  SELECT * FROM (
         |${oracleQ20}
         |  ) WHERE jaccard >= 0.5),
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM pairs
         |  UNION ALL
         |  SELECT doc_b AS src, doc_a AS dst FROM pairs),
         |reach(a, b) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b),
         |labels AS (SELECT a AS doc_id, min(b) AS label FROM reach GROUP BY 1)
         |SELECT label AS canonical_id, count(*) AS n_docs,
         |       string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS member_csv
         |FROM labels GROUP BY 1
         |HAVING count(*) > 1""".stripMargin,

    // q126: q50's label CTE joined to per-doc token counts, rolled up
    // by cluster size — the canonical-keep savings table
    "q126_dedup_impact" ->
      s"""WITH RECURSIVE pairs AS (
         |  SELECT * FROM (
         |${oracleQ20}
         |  ) WHERE jaccard >= 0.5),
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM pairs
         |  UNION ALL
         |  SELECT doc_b AS src, doc_a AS dst FROM pairs),
         |reach(a, b) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b),
         |labels AS (SELECT a AS doc_id, min(b) AS label FROM reach GROUP BY 1),
         |tk AS (
         |  SELECT doc_id,
         |         CAST(len(${tokensSql("lower(trim(text))")}) AS BIGINT) AS n_tok
         |  FROM documents),
         |cl AS (
         |  SELECT label, CAST(count(*) AS BIGINT) AS sz,
         |         CAST(sum(CASE WHEN l.doc_id <> label THEN n_tok ELSE 0 END)
         |           AS BIGINT) AS rm_tok
         |  FROM labels l JOIN tk USING (doc_id)
         |  GROUP BY 1 HAVING count(*) > 1)
         |SELECT sz AS cluster_size, CAST(count(*) AS BIGINT) AS n_clusters,
         |       CAST(sum(sz - 1) AS BIGINT) AS docs_removed,
         |       CAST(sum(rm_tok) AS BIGINT) AS tokens_removed
         |FROM cl GROUP BY 1""".stripMargin,

    // q137: q20's verified pairs rolled up to unordered (source,
    // source) counts — least/greatest normalize the pair key
    "q137_dup_affinity" ->
      s"""WITH pairs AS (
         |  SELECT * FROM (
         |${oracleQ20}
         |  ) WHERE jaccard >= ${graft.operators.Dedup.CLUSTER_JACCARD}),
         |src AS (SELECT doc_id, source FROM documents)
         |SELECT least(sa.source, sb.source) AS source_a,
         |       greatest(sa.source, sb.source) AS source_b,
         |       CAST(count(*) AS BIGINT) AS n_pairs
         |FROM pairs p
         |JOIN src sa ON sa.doc_id = p.doc_a
         |JOIN src sb ON sb.doc_id = p.doc_b
         |GROUP BY 1, 2""".stripMargin,

    // q140: the q20 pairs swept over the τ grid — grid rows with no
    // surviving pairs still emit (0, 0); bare decimal literals type
    // as DECIMAL in DuckDB, so the grid casts to DOUBLE explicitly
    "q140_dedup_curve" -> {
      val grid = graft.operators.Dedup.TAU_GRID
        .map(t => s"CAST($t AS DOUBLE)").mkString(", ")
      s"""WITH pairs AS (
         |  SELECT * FROM (
         |${oracleQ20}
         |  )),
         |g AS (SELECT unnest([$grid]) AS tau),
         |hits AS (
         |  SELECT g.tau, p.doc_a, p.doc_b
         |  FROM pairs p JOIN g ON p.jaccard >= g.tau),
         |pc AS (SELECT tau, CAST(count(*) AS BIGINT) AS n_pairs
         |       FROM hits GROUP BY 1),
         |dc AS (SELECT tau, CAST(count(DISTINCT doc_b) AS BIGINT) AS n_docs_dropped
         |       FROM hits GROUP BY 1)
         |SELECT g.tau,
         |       CAST(coalesce(pc.n_pairs, 0) AS BIGINT) AS n_pairs,
         |       CAST(coalesce(dc.n_docs_dropped, 0) AS BIGINT) AS n_docs_dropped
         |FROM g LEFT JOIN pc ON pc.tau = g.tau
         |       LEFT JOIN dc ON dc.tau = g.tau""".stripMargin
    },

    // q50's label CTE left-joined back onto the corpus: kept iff the
    // doc IS its cluster canonical (unclustered docs are their own)
    "q92_dedup_keep" ->
      s"""WITH RECURSIVE pairs AS (
         |  SELECT * FROM (
         |${oracleQ20}
         |  ) WHERE jaccard >= 0.5),
         |edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM pairs
         |  UNION ALL
         |  SELECT doc_b AS src, doc_a AS dst FROM pairs),
         |reach(a, b) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT r.a, e.dst FROM reach r JOIN edges e ON e.src = r.b),
         |labels AS (SELECT a AS doc_id, min(b) AS label FROM reach GROUP BY 1)
         |SELECT d.doc_id,
         |       COALESCE(l.label, d.doc_id) AS canonical_id,
         |       CAST(COALESCE(l.label, d.doc_id) = d.doc_id AS INTEGER) AS kept,
         |       d.source, d.n_chars
         |FROM documents d LEFT JOIN labels l USING (doc_id)""".stripMargin,

    // cross-corpus probe: new batch (src_id >= 10) against the
    // standing corpus, candidates only inside shared band buckets
    "q95_incremental_dedup" ->
      s"""WITH ${SqlFragments.minhashBandsSql},
         |srcs AS (
         |  SELECT doc_id, CAST(substr(source, 4) AS INTEGER) AS src_id
         |  FROM documents),
         |cand AS (
         |  SELECT DISTINCT nb.doc_id AS new_doc_id, ob.doc_id AS existing_doc_id
         |  FROM bands nb
         |  JOIN srcs ns ON ns.doc_id = nb.doc_id AND ns.src_id >= 10
         |  JOIN bands ob ON ob.band_id = nb.band_id
         |              AND ob.band_hash = nb.band_hash
         |  JOIN srcs os ON os.doc_id = ob.doc_id AND os.src_id < 10),
         |counts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
         |inter AS (
         |  SELECT c.new_doc_id, c.existing_doc_id, count(*) AS n_inter
         |  FROM cand c
         |  JOIN sh a ON a.doc_id = c.new_doc_id
         |  JOIN sh b ON b.doc_id = c.existing_doc_id AND b.s = a.s
         |  GROUP BY 1, 2),
         |scored AS (
         |  SELECT c.new_doc_id, c.existing_doc_id,
         |         floor((CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
         |                / (ca.n_sh + cb.n_sh - COALESCE(i.n_inter, 0)))
         |               * 10000.0 + 0.5) / 10000.0 AS jaccard
         |  FROM cand c
         |  LEFT JOIN inter i USING (new_doc_id, existing_doc_id)
         |  JOIN counts ca ON ca.doc_id = c.new_doc_id
         |  JOIN counts cb ON cb.doc_id = c.existing_doc_id)
         |SELECT * FROM scored WHERE jaccard >= 0.5""".stripMargin,

    "q21_simhash" ->
      s"""WITH toks AS (
         |  SELECT doc_id, ${tokensSql(normTextSql("text"))} AS tk
         |  FROM documents),
         |tokcnt AS (
         |  SELECT doc_id, t, count(*) AS cnt
         |  FROM toks, UNNEST(tk) AS u(t) GROUP BY 1, 2),
         |hashes AS (
         |  SELECT doc_id, cnt,
         |         CAST(('0x' || substr(md5(t), 1, 8)) AS BIGINT) AS h0
         |  FROM tokcnt),
         |bits AS (
         |  SELECT doc_id, j,
         |         sum(CASE WHEN (h0 >> j) & 1 = 1 THEN cnt ELSE -cnt END) AS w
         |  FROM hashes, (SELECT unnest(generate_series(0, 31)) AS j)
         |  GROUP BY 1, 2)
         |SELECT doc_id,
         |       CAST(sum(CASE WHEN w > 0
         |                THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS simhash
         |FROM bits GROUP BY 1""".stripMargin,

    // FastSS: candidates share a single-deletion signature, exact
    // levenshtein verify; a.name < b.name emits each pair once
    "q85_fuzzy_pairs" ->
      """WITH names AS (SELECT DISTINCT p_name AS name FROM part),
        |sigs AS (
        |  SELECT name, sig
        |  FROM names, UNNEST(list_distinct(list_prepend(name,
        |    list_transform(generate_series(1, len(name)),
        |      i -> substr(name, 1, i - 1) || substr(name, i + 1))))) AS t(sig)),
        |cand AS (
        |  SELECT DISTINCT a.name AS name_a, b.name AS name_b
        |  FROM sigs a JOIN sigs b
        |    ON a.sig = b.sig AND a.name < b.name)
        |SELECT name_a, name_b,
        |       CAST(levenshtein(name_a, name_b) AS INTEGER) AS dist
        |FROM cand WHERE levenshtein(name_a, name_b) <= 1""".stripMargin,

    // ExactSubstr-style duplicated 8-gram spans: positions whose gram
    // occurs >= 2 corpus-wide, merged into maximal runs (gap > N
    // breaks), covered = max-min+N per run; 0-rows docs keep zeros
    "q117_dup_spans" -> {
      val n = graft.operators.Dedup.SPAN_N
      s"""WITH toks AS (
         |  SELECT doc_id, ${tokensSql(normTextSql("text"))} AS tk
         |  FROM documents),
         |grams AS (
         |  SELECT doc_id, i - 1 AS pos,
         |         md5(array_to_string(tk[i:i+${n - 1}], ' ')) AS g
         |  FROM toks, UNNEST(generate_series(1, len(tk) - ${n - 1})) AS u(i)),
         |dup AS (SELECT g FROM grams GROUP BY 1 HAVING count(*) >= 2),
         |flagged AS (SELECT doc_id, pos FROM grams JOIN dup USING (g)),
         |brks AS (
         |  SELECT doc_id, pos,
         |         CASE WHEN pos - lag(pos) OVER w <= $n THEN 0 ELSE 1 END AS brk
         |  FROM flagged WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
         |islands AS (
         |  SELECT doc_id, pos,
         |         sum(brk) OVER (PARTITION BY doc_id ORDER BY pos
         |                        ROWS UNBOUNDED PRECEDING) AS island
         |  FROM brks),
         |spans AS (
         |  SELECT doc_id, island,
         |         CAST(max(pos) - min(pos) + $n AS BIGINT) AS covered
         |  FROM islands GROUP BY 1, 2),
         |per_doc_spans AS (
         |  SELECT doc_id, count(*) AS n_dup_spans,
         |         CAST(sum(covered) AS BIGINT) AS dup_tokens
         |  FROM spans GROUP BY 1),
         |per_doc AS (SELECT doc_id, CAST(len(tk) AS BIGINT) AS n_tokens FROM toks)
         |SELECT d.doc_id, d.n_tokens,
         |       COALESCE(s.n_dup_spans, 0) AS n_dup_spans,
         |       COALESCE(s.dup_tokens, 0) AS dup_tokens,
         |       CASE WHEN d.n_tokens > 0
         |            THEN ${Rounding.sql4("CAST(COALESCE(s.dup_tokens, 0) AS DOUBLE) / d.n_tokens")}
         |            ELSE 0.0 END AS dup_frac
         |FROM per_doc d LEFT JOIN per_doc_spans s USING (doc_id)""".stripMargin
    },

    // ExactSubstr scrub: canonical (min doc*2^20+pos) occurrence of
    // each duplicated gram protects its positions; positions covered
    // only by non-canonical occurrences drop; affected docs rebuild
    // in position order, untouched docs fingerprint as-is
    "q117b_span_scrub" -> {
      val n = graft.operators.Dedup.SPAN_N
      val base = graft.operators.Dedup.SCRUB_POS_BASE
      s"""WITH toks AS (
         |  SELECT doc_id, ${tokensSql(normTextSql("text"))} AS tk
         |  FROM documents),
         |grams AS (
         |  SELECT doc_id, i - 1 AS pos,
         |         md5(array_to_string(tk[i:i+${n - 1}], ' ')) AS g
         |  FROM toks, UNNEST(generate_series(1, len(tk) - ${n - 1})) AS u(i)),
         |dup AS (
         |  SELECT g, min(doc_id * $base + pos) AS canon_key
         |  FROM grams GROUP BY 1 HAVING count(*) >= 2),
         |covered AS (
         |  SELECT gr.doc_id,
         |         (gr.doc_id * $base + gr.pos = d.canon_key) AS is_canon,
         |         tp
         |  FROM grams gr JOIN dup d USING (g),
         |       UNNEST(generate_series(gr.pos, gr.pos + ${n - 1})) AS t(tp)),
         |drops AS (
         |  SELECT doc_id, tp FROM covered
         |  GROUP BY 1, 2 HAVING max(CAST(is_canon AS INT)) = 0),
         |affected AS (SELECT DISTINCT doc_id FROM drops),
         |toksp AS (
         |  SELECT t.doc_id, i - 1 AS pos, tk[i] AS tok
         |  FROM toks t JOIN affected USING (doc_id),
         |       UNNEST(generate_series(1, len(tk))) AS u(i)),
         |kept AS (
         |  SELECT x.doc_id, x.pos, x.tok FROM toksp x
         |  WHERE NOT EXISTS (SELECT 1 FROM drops d
         |                    WHERE d.doc_id = x.doc_id AND d.tp = x.pos)),
         |rebuilt AS (
         |  SELECT doc_id, count(*) AS n_kept,
         |         substr(md5(string_agg(tok, ' ' ORDER BY pos)), 1, 16) AS text_fp
         |  FROM kept GROUP BY 1),
         |scrubbed AS (
         |  SELECT t.doc_id, len(tk) AS n_tokens, COALESCE(r.n_kept, 0) AS n_kept,
         |         COALESCE(r.text_fp, substr(md5(''), 1, 16)) AS text_fp
         |  FROM toks t JOIN affected USING (doc_id)
         |  LEFT JOIN rebuilt r USING (doc_id)),
         |untouched AS (
         |  SELECT doc_id, len(tk) AS n_tokens, len(tk) AS n_kept,
         |         substr(md5(array_to_string(tk, ' ')), 1, 16) AS text_fp
         |  FROM toks
         |  WHERE doc_id NOT IN (SELECT doc_id FROM affected))
         |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         |       CAST(n_kept AS BIGINT) AS n_kept,
         |       CAST(n_tokens - n_kept AS BIGINT) AS n_dropped, text_fp
         |FROM (SELECT * FROM scrubbed UNION ALL SELECT * FROM untouched)""".stripMargin
    }
  )

  /** q20's full oracle — also embedded as a subquery by q50. */
  private lazy val oracleQ20: String =
    s"""WITH $minhashBandsSql,
         |cand AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a
         |  JOIN bands b ON a.band_id = b.band_id
         |    AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |counts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
         |inter AS (
         |  SELECT c.doc_a, c.doc_b, count(*) AS n_inter
         |  FROM cand c
         |  JOIN sh sa ON sa.doc_id = c.doc_a
         |  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.s = sa.s
         |  GROUP BY 1, 2)
         |SELECT c.doc_a, c.doc_b,
         |       floor(CAST(COALESCE(i.n_inter, 0) AS DOUBLE)
         |             / (ca.n_sh + cb.n_sh - COALESCE(i.n_inter, 0))
         |             * 10000.0 + 0.5) / 10000.0 AS jaccard
         |FROM cand c
         |LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
         |JOIN counts ca ON ca.doc_id = c.doc_a
         |JOIN counts cb ON cb.doc_id = c.doc_b""".stripMargin
}
