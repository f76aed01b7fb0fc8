package graft.oracle

import SqlFragments.{baseHashSql, normTextSql, shinglesSql, tokensSql}
import graft.functions.Rounding.{sql4, sql6}

/**
 * DuckDB oracles for [[graft.operators.Corpus]]. Float discipline:
 * every BM25 contribution is a single expression over exact integers
 * (tf, df, N) and an exactly-representable avgdl (integer sum /
 * integer count), written term-for-term like the Spark side, and the
 * three per-term contributions sum in the same declared order — so
 * both engines walk identical IEEE sequences before the 6-dp rank /
 * 4-dp emit rounding.
 */
object CorpusSql {

  private val toksSql =
    s"toks AS (SELECT doc_id, ${tokensSql("lower(trim(text))")} AS tk FROM documents)"

  private def splitBucketSql(e: String): String =
    s"${baseHashSql(s"CAST($e AS VARCHAR)")} % 100"

  /** BPE fragments shared by the q114/q115 oracles — twins of
    * [[graft.operators.Corpus.bpeTrain]]'s loop. */
  private def bpeSy(seg: String): String =
    s"list_filter(string_split($seg, '_'), s -> len(s) > 0)"

  private val bpeV0Cte: String =
    s"""v0 AS (
       |  SELECT w, freq,
       |         regexp_replace(w, '(.)', '_\\1', 'g') || '_' AS seg
       |  FROM (SELECT w, CAST(count(*) AS BIGINT) AS freq FROM (
       |          SELECT unnest(${tokensSql("lower(trim(text))")}) AS w
       |          FROM documents)
       |        GROUP BY 1))""".stripMargin

  private def bpeRoundCtes(r: Int): String =
    s"""p$r AS (
       |  SELECT pair, CAST(sum(freq) AS BIGINT) AS pf FROM (
       |    SELECT freq, sy[i] || ' ' || sy[i+1] AS pair
       |    FROM (SELECT freq, ${bpeSy("seg")} AS sy FROM v${r - 1}),
       |         UNNEST(generate_series(1, len(sy) - 1)) AS t(i))
       |  GROUP BY 1),
       |b$r AS (SELECT pair, pf FROM p$r ORDER BY pf DESC, pair ASC LIMIT 1),
       |v$r AS (
       |  SELECT w, freq,
       |         replace(seg, '_' || replace(b$r.pair, ' ', '_') || '_',
       |                      '_' || replace(b$r.pair, ' ', '') || '_') AS seg
       |  FROM v${r - 1}, b$r),
       |s$r AS (SELECT CAST(sum(freq * len(${bpeSy("seg")})) AS BIGINT)
       |          AS corpus_symbols FROM v$r)""".stripMargin

  /** The q64 BM25 scoring chain (shared verbatim by the q127 hybrid
    * fusion oracle so the lexical leg cannot drift from q64). */
  private val bm25Cte =
    s"""$toksSql,
       |dl AS (SELECT doc_id, CAST(len(tk) AS DOUBLE) AS dl FROM toks),
       |corpus AS (
       |  SELECT CAST(count(*) AS DOUBLE) AS bigN, avg(dl) AS avgdl FROM dl),
       |tf AS (
       |  SELECT doc_id, tok, CAST(count(*) AS DOUBLE) AS tf
       |  FROM toks, UNNEST(tk) AS u(tok)
       |  WHERE tok IN ('spark', 'join', 'window')
       |  GROUP BY 1, 2),
       |df AS (SELECT tok, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
       |contrib AS (
       |  SELECT t.doc_id, t.tok,
       |         ln(1.0 + (c.bigN - f.df + 0.5) / (f.df + 0.5))
       |           * (t.tf * (1.2 + 1.0))
       |           / (t.tf + 1.2 * (1.0 - 0.75 + 0.75 * d.dl / c.avgdl)) AS c
       |  FROM tf t
       |  JOIN df f USING (tok)
       |  JOIN dl d USING (doc_id)
       |  CROSS JOIN corpus c),
       |scored AS (
       |  SELECT doc_id,
       |         COALESCE(max(CASE WHEN tok = 'spark' THEN c END), 0.0)
       |         + COALESCE(max(CASE WHEN tok = 'join' THEN c END), 0.0)
       |         + COALESCE(max(CASE WHEN tok = 'window' THEN c END), 0.0) AS score
       |  FROM contrib GROUP BY 1),
       |bm25top AS (
       |  SELECT doc_id, floor(score * 10000.0 + 0.5) / 10000.0 AS bm25
       |  FROM scored
       |  ORDER BY floor(score * 1000000.0 + 0.5) / 1000000.0 DESC, doc_id ASC
       |  LIMIT 50)""".stripMargin

  /** The q131 card SQL, shared with q131b: `sketchSupport = None`
    * scores against the full bigram-universe model (the exact card);
    * `Some(s)` restricts the model to bigrams with count >=
    * ceil(n/s) — the two-pass Misra-Gries result is exactly this
    * frequency filter, so the oracle needs no sketch — and backs off
    * to c12 = 0 for out-of-model bigrams. */
  private def datasheetSql(sketchSupport: Option[Long]): String = {
    val c12Having = sketchSupport
      .map(su => s"\n         HAVING count(*) >= (SELECT ceil(CAST(count(*) AS DOUBLE) / $su.0) FROM bg)")
      .getOrElse("")
    val c12Join = sketchSupport
      .map(_ => "LEFT JOIN c12 USING (w1, w2)")
      .getOrElse("JOIN c12 USING (w1, w2)")
    val c12Expr = sketchSupport
      .map(_ => "COALESCE(c12.c12, 0)").getOrElse("c12.c12")

      import graft.operators.TextOps._
      val stops = GOPHER_STOPS.map(s => s"'$s'").mkString(",")
      val bullets = GOPHER_BULLET_PREFIXES
        .map(p => s"starts_with(line, '$p')").mkString(" OR ")
      val ellipses = GOPHER_ELLIPSIS_SUFFIXES
        .map(s => s"ends_with(line, '$s')").mkString(" OR ")
      val r4 = graft.functions.Rounding.sql4 _
      val r6 = graft.functions.Rounding.sql6 _
      s"""WITH base AS (
         |  SELECT doc_id, source, lang,
         |         CAST(len(${tokensSql("lower(trim(text))")}) AS BIGINT) AS n_tok,
         |         md5(${normTextSql("text")}) AS fp
         |  FROM documents),
         |canon AS (SELECT fp, min(doc_id) AS canon_doc FROM base GROUP BY 1),
         |gtoks AS (SELECT doc_id, ${tokensSql("lower(trim(text))")} AS tk
         |          FROM documents),
         |cap AS (
         |  SELECT max(CASE WHEN contains(text, chr(10)) THEN 1 ELSE 0 END)
         |           AS has_lines
         |  FROM documents),
         |glines AS (
         |  SELECT doc_id, CAST(count(*) AS DOUBLE) AS n_lines,
         |         CAST(sum(CASE WHEN $bullets THEN 1 ELSE 0 END) AS DOUBLE)
         |           AS n_bullet,
         |         CAST(sum(CASE WHEN $ellipses THEN 1 ELSE 0 END) AS DOUBLE)
         |           AS n_ellipsis
         |  FROM (SELECT doc_id, trim(l) AS line
         |        FROM documents, UNNEST(string_split(text, chr(10))) AS t(l)
         |        WHERE len(trim(l)) > 0)
         |  GROUP BY 1),
         |gstats AS (
         |  SELECT doc_id,
         |         len(tk) AS n_words,
         |         CAST(list_sum(list_transform(tk, t -> len(t))) AS DOUBLE)
         |           AS sum_len,
         |         CAST(len(list_filter(tk, t -> contains(t, '#')
         |                                    OR contains(t, '...'))) AS DOUBLE)
         |           AS n_sym,
         |         CAST(len(list_filter(tk, t -> regexp_matches(t, '[a-z]')))
         |              AS DOUBLE) AS n_alpha,
         |         len(list_distinct(list_filter(tk, t -> t IN ($stops))))
         |           AS n_stop_distinct
         |  FROM gtoks WHERE len(tk) > 0),
         |gpass AS (
         |  SELECT s.doc_id,
         |         CAST(s.n_words >= $GOPHER_MIN_WORDS
         |              AND s.n_words <= $GOPHER_MAX_WORDS
         |              AND ${r4("s.sum_len / s.n_words")} >= $GOPHER_MIN_WORDLEN
         |              AND ${r4("s.sum_len / s.n_words")} <= $GOPHER_MAX_WORDLEN
         |              AND ${r4("s.n_sym / s.n_words")} <= $GOPHER_MAX_SYMBOL_RATIO
         |              AND ${r4("s.n_alpha / s.n_words")} >= $GOPHER_MIN_ALPHA_RATIO
         |              AND s.n_stop_distinct >= $GOPHER_MIN_STOPS
         |              AND (c.has_lines = 0
         |                   OR (${r4("ls.n_bullet / ls.n_lines")}
         |                         <= $GOPHER_MAX_BULLET_FRAC
         |                       AND ${r4("ls.n_ellipsis / ls.n_lines")}
         |                         <= $GOPHER_MAX_ELLIPSIS_FRAC))
         |              AS INTEGER) AS gopher_pass
         |  FROM gstats s JOIN glines ls USING (doc_id), cap c),
         |ntoks AS (
         |  SELECT doc_id, ${tokensSql(normTextSql("text"))} AS tk FROM documents),
         |bg AS (
         |  SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
         |  FROM ntoks, UNNEST(generate_series(1, len(tk) - 1)) AS g(i)
         |  WHERE len(tk) >= 2),
         |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2$c12Having),
         |c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
         |v AS (SELECT count(DISTINCT w1) AS v FROM bg),
         |lmscored AS (
         |  SELECT bg.doc_id,
         |         CAST(${r6(s"ln(CAST($c12Expr + 1 AS DOUBLE) / CAST(c1.c1 + v.v AS DOUBLE))")}
         |              AS DECIMAL(20,6)) AS lp
         |  FROM bg $c12Join JOIN c1 USING (w1), v),
         |lm AS (
         |  SELECT doc_id,
         |         ${r4("CAST(sum(lp) AS DOUBLE) / count(*)")} AS avg_logp
         |  FROM lmscored GROUP BY 1),
         |perdoc AS (
         |  SELECT b.doc_id, b.source, b.lang, b.n_tok,
         |         CAST(b.doc_id <> c.canon_doc AS BIGINT) AS is_dup,
         |         COALESCE(g.gopher_pass, 0) AS gopher_pass,
         |         lm.avg_logp
         |  FROM base b
         |  JOIN canon c USING (fp)
         |  LEFT JOIN gpass g USING (doc_id)
         |  LEFT JOIN lm USING (doc_id)),
         |mix AS (
         |  SELECT source, lang, count(*) AS nl FROM perdoc GROUP BY 1, 2),
         |ent AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_langs,
         |         sum(CAST(${r6("(-(CAST(nl AS DOUBLE) / ns)) * ln(CAST(nl AS DOUBLE) / ns)")}
         |                  AS DECIMAL(20,6))) AS ent
         |  FROM (SELECT m.source, m.lang, m.nl, s.ns
         |        FROM mix m JOIN (SELECT source, sum(nl) AS ns FROM mix
         |                         GROUP BY 1) s USING (source))
         |  GROUP BY 1),
         |roll AS (
         |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |         CAST(sum(n_tok) AS BIGINT) AS n_tokens,
         |         CAST(sum(is_dup) AS BIGINT) AS n_dups,
         |         CAST(sum(gopher_pass) AS BIGINT) AS n_pass,
         |         sum(CAST(avg_logp AS DECIMAL(20,4))) AS slp,
         |         count(avg_logp) AS n_lm
         |  FROM perdoc GROUP BY 1)
         |SELECT r.source, r.n_docs, r.n_tokens, e.n_langs,
         |       ${r4("CAST(e.ent AS DOUBLE)")} AS lang_entropy,
         |       ${r4("CAST(r.n_dups AS DOUBLE) / r.n_docs")} AS dup_frac,
         |       ${r4("CAST(r.n_pass AS DOUBLE) / r.n_docs")} AS gopher_pass_frac,
         |       CASE WHEN r.n_lm > 0
         |            THEN ${r4("CAST(r.slp AS DOUBLE) / r.n_lm")}
         |            ELSE NULL END AS mean_logp
         |FROM roll r JOIN ent e USING (source)""".stripMargin
  }

  // Shared by q124 and its Bloom-prefiltered twin q124c: the Spark
  // plans differ (q124c prunes the train side through the sketch
  // before the shuffle join) but the emitted relation is identical.
  // q149/q149b: the band-index FOLD across the q144 fixture's
  // compaction — the oracle derives the bands straight from the NEW
  // snapshot (fold == derive is the maintenance invariant; band
  // signatures are pure per-doc functions). The shared band chain is
  // reused with its source retargeted at the rebuilt-snapshot CTE.
  private val q149Sql: String = {
    val m = graft.operators.Corpus.DELTA_SNAP_MOD
    val rv = graft.operators.Corpus.DELTA_REV_MOD
    val chain = SqlFragments.minhashBandsSql
      .replace("FROM documents", "FROM newsnap")
    s"""WITH newsnap AS (
       |  SELECT doc_id,
       |         CASE WHEN doc_id % $rv = 0 THEN text || ' rev2'
       |              ELSE text END AS text
       |  FROM documents WHERE doc_id % $m <> 3),
       |$chain
       |SELECT doc_id, band_id, band_hash FROM bands""".stripMargin
  }

  // q152/q152b: the LM counter fold across the q144/q149 compaction
  // — the oracle ignores the fold and derives the add-one bigram
  // model straight from the NEW snapshot (counts are additive over
  // docs, so fold == derive exactly wherever the old counters came
  // from; q94's CTE blocks on the rebuilt-snapshot CTE)
  private val q152Sql: String = {
    val m = graft.operators.Corpus.DELTA_SNAP_MOD
    val rv = graft.operators.Corpus.DELTA_REV_MOD
    s"""WITH newsnap AS (
       |  SELECT doc_id,
       |         CASE WHEN doc_id % $rv = 0 THEN text || ' rev2'
       |              ELSE text END AS text
       |  FROM documents WHERE doc_id % $m <> 3),
       |toks AS (
       |  SELECT doc_id, ${tokensSql(normTextSql("text"))} AS tk
       |  FROM newsnap),
       |bg AS (
       |  SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
       |  FROM toks, UNNEST(generate_series(1, len(tk) - 1)) AS g(i)
       |  WHERE len(tk) >= 2),
       |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
       |c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
       |v AS (SELECT count(*) AS v FROM c1)
       |SELECT w1, w2, c12, c1,
       |       ${graft.functions.Rounding.sql6(
                 "ln(CAST(c12 + 1 AS DOUBLE) / CAST(c1 + v.v AS DOUBLE))")}
       |         AS lp
       |FROM c12 JOIN c1 USING (w1), v""".stripMargin
  }

  private val q124Sql: String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |         ${baseHashSql("CAST(doc_id AS VARCHAR)")} % 100 AS bkt,
       |         ${tokensSql(normTextSql("text"))} AS tk
       |  FROM documents),
       |grams AS (
       |  SELECT DISTINCT doc_id, bkt, md5(g) AS h
       |  FROM toks, UNNEST(${shinglesSql("tk", 5)}) AS t(g)
       |  WHERE bkt < 80 OR bkt >= 90),
       |test_g AS (
       |  SELECT DISTINCT h FROM grams WHERE bkt >= 90),
       |train AS (
       |  SELECT doc_id, h FROM grams WHERE bkt < 80),
       |shared AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
       |  FROM train JOIN test_g USING (h) GROUP BY 1),
       |tot AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
       |  FROM train GROUP BY 1)
       |SELECT doc_id, n_grams, n_shared,
       |       ${sql4("CAST(n_shared AS DOUBLE) / n_grams")} AS shared_frac
       |FROM tot JOIN shared USING (doc_id)""".stripMargin

  val oracle: Map[String, String] = Map(

    "q64_bm25" ->
      s"""WITH $bm25Cte
         |SELECT doc_id, bm25 FROM bm25top""".stripMargin,

    // chunk i = tk[i*48+1 : i*48+64] (DuckDB list slices are 1-based,
    // end-inclusive and clip at the list end — same clipping as Spark
    // slice(tk, i*48+1, 64)); zero-token docs emit nothing
    "q65_doc_chunks" ->
      s"""WITH $toksSql
         |SELECT doc_id, CAST(ci AS INTEGER) AS chunk_id,
         |       CAST(len(tk[ci*48+1 : ci*48+64]) AS INTEGER) AS n_chunk_tokens,
         |       substr(md5(array_to_string(tk[ci*48+1 : ci*48+64], ' ')), 1, 16)
         |         AS chunk_fp
         |FROM toks, UNNEST(generate_series(0, CAST((len(tk) - 1) // 48 AS BIGINT)))
         |     AS g(ci)
         |WHERE len(tk) > 0""".stripMargin,

    "q108_chunk_dedup" ->
      s"""WITH $toksSql,
         |ch AS (
         |  SELECT doc_id, CAST(ci AS INTEGER) AS chunk_id,
         |         substr(md5(array_to_string(tk[ci*48+1 : ci*48+64], ' ')), 1, 16)
         |           AS chunk_fp
         |  FROM toks, UNNEST(generate_series(0, CAST((len(tk) - 1) // 48 AS BIGINT)))
         |       AS g(ci)
         |  WHERE len(tk) > 0),
         |dup AS (
         |  SELECT chunk_fp, count(*) AS n_copies FROM ch
         |  GROUP BY 1 HAVING count(*) > 1),
         |nd AS (
         |  SELECT chunk_fp, count(*) AS n_docs
         |  FROM (SELECT DISTINCT chunk_fp, doc_id FROM ch) GROUP BY 1),
         |canon AS (
         |  SELECT chunk_fp, doc_id AS canon_doc, chunk_id AS canon_chunk
         |  FROM (SELECT *, row_number() OVER (PARTITION BY chunk_fp
         |          ORDER BY doc_id ASC, chunk_id ASC) AS rk FROM ch)
         |  WHERE rk = 1)
         |SELECT d.chunk_fp, CAST(d.n_copies AS BIGINT) AS n_copies,
         |       CAST(nd.n_docs AS BIGINT) AS n_docs,
         |       canon.canon_doc, canon.canon_chunk
         |FROM dup d JOIN nd USING (chunk_fp) JOIN canon USING (chunk_fp)""".stripMargin,

    // keep = canonical occurrence per fingerprint (global min
    // (doc_id, chunk_id) — unique chunks keep themselves); each
    // surviving chunk contributes its first-48-token own-window
    // (chunk[1:48]); rebuilt token stream = own-windows in chunk_id
    // order; docs losing every chunk rebuild to '' (md5 of empty)
    "q108b_chunk_keep" ->
      s"""WITH $toksSql,
         |ch AS (
         |  SELECT doc_id, CAST(ci AS INTEGER) AS chunk_id,
         |         tk[ci*48+1 : ci*48+64] AS chunk,
         |         substr(md5(array_to_string(tk[ci*48+1 : ci*48+64], ' ')), 1, 16)
         |           AS chunk_fp
         |  FROM toks, UNNEST(generate_series(0, CAST((len(tk) - 1) // 48 AS BIGINT)))
         |       AS g(ci)
         |  WHERE len(tk) > 0),
         |keep AS (
         |  SELECT doc_id, chunk_id, chunk[1:48] AS own
         |  FROM (SELECT *, row_number() OVER (PARTITION BY chunk_fp
         |          ORDER BY doc_id ASC, chunk_id ASC) AS rk FROM ch)
         |  WHERE rk = 1),
         |reb AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         |         flatten(list(own ORDER BY chunk_id ASC)) AS toks2
         |  FROM keep GROUP BY 1),
         |base AS (
         |  SELECT doc_id, CAST((len(tk) - 1) // 48 + 1 AS BIGINT) AS n_chunks
         |  FROM toks WHERE len(tk) > 0)
         |SELECT b.doc_id, b.n_chunks,
         |       CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_kept,
         |       CAST(COALESCE(len(r.toks2), 0) AS BIGINT) AS n_tokens_kept,
         |       substr(md5(array_to_string(COALESCE(r.toks2, []), ' ')), 1, 16)
         |         AS text_fp
         |FROM base b LEFT JOIN reb r USING (doc_id)""".stripMargin,

    "q66_hash_split" ->
      s"""SELECT CASE WHEN ${splitBucketSql("doc_id")} < 80 THEN 'train'
         |            WHEN ${splitBucketSql("doc_id")} < 90 THEN 'val'
         |            ELSE 'test' END AS split,
         |       lang,
         |       CAST(count(*) AS BIGINT) AS n_docs,
         |       floor(avg(n_chars) * 10000.0 + 0.5) / 10000.0 AS avg_chars,
         |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
         |FROM documents
         |GROUP BY 1, 2""".stripMargin,

    "q67_hash_sample" ->
      s"""SELECT lang, doc_id, CAST(rk AS INTEGER) AS rk FROM (
         |  SELECT lang, doc_id, row_number() OVER (
         |    PARTITION BY lang
         |    ORDER BY ${baseHashSql("CAST(doc_id AS VARCHAR) || '_sample'")}
         |             ASC, doc_id ASC) AS rk
         |  FROM documents)
         |WHERE rk <= 5""".stripMargin,

    "q69_seq_pack" ->
      s"""WITH base AS (
         |  SELECT lang, doc_id,
         |         CAST(${baseHashSql("CAST(doc_id AS VARCHAR)")} % 8 AS INTEGER)
         |           AS shard,
         |         CAST(len(${tokensSql("lower(trim(text))")}) AS BIGINT) AS n_tokens
         |  FROM documents),
         |offs AS (
         |  SELECT lang, doc_id, shard, n_tokens,
         |         CAST(COALESCE(sum(n_tokens) OVER (
         |           PARTITION BY lang, shard ORDER BY doc_id ASC
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |           AS BIGINT) AS stream_offset
         |  FROM base)
         |SELECT lang, doc_id, shard, n_tokens, stream_offset,
         |       CAST(floor(stream_offset / 256.0) AS INTEGER) AS seq_id
         |FROM offs""".stripMargin,

    // q69c: the q69 offsets exploded over each doc's intersected
    // sequence range — pure integer span arithmetic, hash-exact
    "q69c_pack_spans" -> {
      val L = graft.operators.Corpus.SEQ_LEN
      s"""WITH base AS (
         |  SELECT lang, doc_id,
         |         CAST(${baseHashSql("CAST(doc_id AS VARCHAR)")} % 8 AS INTEGER)
         |           AS shard,
         |         CAST(len(${tokensSql("lower(trim(text))")}) AS BIGINT) AS n_tokens
         |  FROM documents),
         |offs AS (
         |  SELECT lang, doc_id, shard, n_tokens,
         |         CAST(COALESCE(sum(n_tokens) OVER (
         |           PARTITION BY lang, shard ORDER BY doc_id ASC
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |           AS BIGINT) AS stream_offset
         |  FROM base WHERE n_tokens >= 0),
         |spans AS (
         |  SELECT lang, shard, CAST(s AS INTEGER) AS seq_id, doc_id,
         |         CAST(s AS BIGINT) * $L AS lo,
         |         stream_offset, n_tokens
         |  FROM offs,
         |       UNNEST(generate_series(
         |         CAST(floor(stream_offset / $L.0) AS BIGINT),
         |         CAST(floor((stream_offset + n_tokens - 1) / $L.0) AS BIGINT)))
         |         AS t(s)
         |  WHERE n_tokens >= 1)
         |SELECT lang, shard, seq_id, doc_id,
         |       greatest(stream_offset, lo) - lo AS span_start,
         |       least(stream_offset + n_tokens, lo + $L)
         |         - greatest(stream_offset, lo) AS span_len,
         |       CAST(lo <= stream_offset AS INTEGER) AS doc_head,
         |       CAST(lo + $L >= stream_offset + n_tokens AS INTEGER) AS doc_tail
         |FROM spans""".stripMargin
    },

    // q69b: the q69 pack windows over the q115 BPE symbol counts —
    // the unrolled merge chain's vocabulary prices each doc's length
    "q69b_seq_pack_bpe" -> {
      val last = graft.operators.Corpus.BPE_ROUNDS
      s"""WITH $bpeV0Cte,
         |${(1 to last).map(bpeRoundCtes).mkString(",\n")},
         |segn AS (
         |  SELECT w, CAST(len(${bpeSy("seg")}) AS BIGINT) AS n_symbols
         |  FROM v$last),
         |tok AS (
         |  SELECT lang, doc_id, unnest(${tokensSql("lower(trim(text))")}) AS w
         |  FROM documents),
         |lens AS (
         |  SELECT t.lang, t.doc_id,
         |         CAST(sum(s.n_symbols) AS BIGINT) AS n_tokens
         |  FROM tok t JOIN segn s USING (w) GROUP BY 1, 2),
         |base AS (
         |  SELECT lang, doc_id, n_tokens,
         |         CAST(${baseHashSql("CAST(doc_id AS VARCHAR)")} % 8 AS INTEGER)
         |           AS shard
         |  FROM lens),
         |offs AS (
         |  SELECT lang, doc_id, shard, n_tokens,
         |         CAST(COALESCE(sum(n_tokens) OVER (
         |           PARTITION BY lang, shard ORDER BY doc_id ASC
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |           AS BIGINT) AS stream_offset
         |  FROM base)
         |SELECT lang, doc_id, shard, n_tokens, stream_offset,
         |       CAST(floor(stream_offset / 256.0) AS INTEGER) AS seq_id
         |FROM offs""".stripMargin
    },

    // lexical leg = the q64 chain verbatim (bm25Cte); dense leg =
    // cosine to the BM25 top-1 doc's embedding (q22's list arithmetic
    // verbatim); fusion = rank-only RRF, two IEEE divisions summed in
    // declared order — engine-identical by construction
    "q127_hybrid_rrf" -> {
      val c = graft.operators.Corpus
      s"""WITH $bm25Cte,
         |lex AS (
         |  SELECT doc_id, CAST(row_number() OVER (
         |           ORDER BY bm25 DESC, doc_id ASC) AS INTEGER) AS rk_lex
         |  FROM bm25top),
         |emb AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |qv AS (SELECT v AS qv FROM emb JOIN lex ON vec_id = lex.doc_id
         |       WHERE rk_lex = 1),
         |cosd AS (
         |  SELECT vec_id AS doc_id,
         |         ${sql6("""list_sum(list_transform(list_zip(qv, v), z -> z[1]*z[2]))
         |               / (sqrt(list_sum(list_transform(qv, x -> x*x)))
         |                  * sqrt(list_sum(list_transform(v, x -> x*x))))""")} AS cos
         |  FROM emb, qv),
         |dtop AS (
         |  SELECT doc_id, cos FROM cosd
         |  ORDER BY cos DESC, doc_id ASC LIMIT ${c.TOP_DOCS}),
         |dense AS (
         |  SELECT doc_id, CAST(row_number() OVER (
         |           ORDER BY cos DESC, doc_id ASC) AS INTEGER) AS rk_dense
         |  FROM dtop),
         |fused AS (
         |  SELECT doc_id, rk_lex, rk_dense,
         |         COALESCE(1.0 / (${c.RRF_K} + rk_lex), 0.0)
         |           + COALESCE(1.0 / (${c.RRF_K} + rk_dense), 0.0) AS rrf
         |  FROM lex FULL OUTER JOIN dense USING (doc_id))
         |SELECT doc_id, CAST(COALESCE(rk_lex, 0) AS INTEGER) AS rk_lex,
         |       CAST(COALESCE(rk_dense, 0) AS INTEGER) AS rk_dense,
         |       ${sql6("rrf")} AS rrf
         |FROM fused
         |ORDER BY ${sql6("rrf")} DESC, doc_id ASC
         |LIMIT ${c.RRF_TOP}""".stripMargin
    },

    // q127's fusion with the dense leg on the IVF path: lexical CTE
    // chain shared with q64/q127, cell assignment + probe shared with
    // the q42 oracle (cents interpolated from the Scala constants)
    "q127b_hybrid_rrf_ivf" -> {
      val c = graft.operators.Corpus
      s"""WITH $bm25Cte,
         |lex AS (
         |  SELECT doc_id, CAST(row_number() OVER (
         |           ORDER BY bm25 DESC, doc_id ASC) AS INTEGER) AS rk_lex
         |  FROM bm25top),
         |${SimilaritySql.embCte},
         |${SimilaritySql.ivfCentsCte},
         |cells AS (
         |  SELECT vec_id, v, cell FROM (
         |    SELECT *, row_number() OVER (
         |      PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS rk
         |    FROM (
         |      SELECT e.vec_id, e.v, c.cell,
         |             floor(list_sum(list_transform(list_zip(e.v, c.cv),
         |                     z -> (z[1]-z[2])*(z[1]-z[2])))
         |                   * 1000000.0 + 0.5) / 1000000.0 AS d2
         |      FROM emb e CROSS JOIN cents c))
         |  WHERE rk = 1),
         |qc AS (
         |  SELECT cells.cell, cells.vec_id AS q_id, cells.v AS qv
         |  FROM cells JOIN lex ON cells.vec_id = lex.doc_id
         |  WHERE lex.rk_lex = 1),
         |pairs AS (
         |  SELECT c.vec_id AS doc_id,
         |         floor(list_sum(list_transform(list_zip(qc.qv, c.v), z -> z[1]*z[2]))
         |               / (sqrt(list_sum(list_transform(qc.qv, x -> x*x)))
         |                  * sqrt(list_sum(list_transform(c.v, x -> x*x))))
         |               * 1000000.0 + 0.5) / 1000000.0 AS cos
         |  FROM cells c JOIN qc ON c.cell = qc.cell AND c.vec_id <> qc.q_id),
         |dense AS (
         |  SELECT doc_id, CAST(rk AS INTEGER) AS rk_dense
         |  FROM (SELECT *, row_number() OVER (
         |          ORDER BY cos DESC, doc_id ASC) AS rk
         |        FROM pairs)
         |  WHERE rk <= ${c.TOP_DOCS}),
         |fused AS (
         |  SELECT doc_id, rk_lex, rk_dense,
         |         COALESCE(1.0 / (${c.RRF_K} + rk_lex), 0.0)
         |           + COALESCE(1.0 / (${c.RRF_K} + rk_dense), 0.0) AS rrf
         |  FROM lex FULL OUTER JOIN dense USING (doc_id))
         |SELECT doc_id, CAST(COALESCE(rk_lex, 0) AS INTEGER) AS rk_lex,
         |       CAST(COALESCE(rk_dense, 0) AS INTEGER) AS rk_dense,
         |       ${sql6("rrf")} AS rrf
         |FROM fused
         |ORDER BY ${sql6("rrf")} DESC, doc_id ASC
         |LIMIT ${c.RRF_TOP}""".stripMargin
    },

    // naive single-window form — equal to the Spark side's two-level
    // prefix rank because the bucket is an hkey prefix (spec-pinned
    // on the Spark side); 100 // w is exact: every mixWeight divides
    // 100, so vtime is all-integer in both engines
    "q128_mix_schedule" -> {
      val c = graft.operators.Corpus
      s"""WITH keyed AS (
         |  SELECT doc_id, source,
         |         ${baseHashSql("CAST(doc_id AS VARCHAR) || '_sched'")} AS hkey,
         |         CASE WHEN source IN ('src0','src1','src2','src3') THEN 100
         |              WHEN source IN ('src4','src5','src6','src7') THEN 50
         |              ELSE 20 END AS w
         |  FROM documents),
         |ranked AS (
         |  SELECT doc_id, source, w,
         |         CAST(row_number() OVER (PARTITION BY source
         |           ORDER BY hkey, doc_id) AS BIGINT) AS src_rank
         |  FROM keyed),
         |head AS (
         |  SELECT doc_id, source, src_rank,
         |         CAST(src_rank * (100 // w) AS BIGINT) AS vtime
         |  FROM ranked
         |  ORDER BY vtime ASC, source ASC, doc_id ASC
         |  LIMIT ${c.SCHED_TAKE})
         |SELECT CAST(row_number() OVER (
         |         ORDER BY vtime ASC, source ASC, doc_id ASC) AS INTEGER) AS pos,
         |       vtime, source, doc_id, src_rank
         |FROM head""".stripMargin
    },

    // the q18 dup rule, q107 gopher conjunction and q94 LM chain
    // verbatim, rolled up per source; entropy terms and LM means ride
    // the r6/r4-quantize -> DECIMAL-sum pattern
    "q131_source_datasheet" -> datasheetSql(None),

    // q131b: the card with the LM leg scored against the top-gram
    // model — the oracle computes the heavy set as the plain
    // GROUP BY/HAVING frequency filter the two-pass Misra-Gries
    // recipe provably equals, and backs off to c12 = 0 elsewhere
    "q131b_datasheet_sketch_lm" ->
      datasheetSql(Some(graft.operators.Corpus.SHEET_LM_SUPPORT)),

    // budget share = BIGINT multiply + integer DIV (exact both
    // engines); capped is an all-integer compare; epochs is one IEEE
    // division clamped + r4
    "q133_epoch_plan" -> {
      val c = graft.operators.Corpus
      s"""WITH pt AS (
         |  SELECT source,
         |         CAST(sum(len(${tokensSql("lower(trim(text))")})) AS BIGINT)
         |           AS n_tokens,
         |         CAST(CASE WHEN source IN ('src0','src1','src2','src3') THEN 100
         |                   WHEN source IN ('src4','src5','src6','src7') THEN 50
         |                   ELSE 20 END AS BIGINT) AS weight
         |  FROM documents GROUP BY 1),
         |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS corpus_tokens,
         |               CAST(sum(weight) AS BIGINT) AS wsum FROM pt)
         |SELECT source, n_tokens, weight,
         |       (corpus_tokens * ${c.BUDGET_MULT} * weight) // wsum
         |         AS target_tokens,
         |       floor(least(CAST((corpus_tokens * ${c.BUDGET_MULT} * weight) // wsum
         |                        AS DOUBLE) / n_tokens, ${c.EPOCH_CAP}.0)
         |             * 10000.0 + 0.5) / 10000.0 AS epochs,
         |       least((corpus_tokens * ${c.BUDGET_MULT} * weight) // wsum,
         |             n_tokens * ${c.EPOCH_CAP}) AS tokens_served,
         |       CAST((corpus_tokens * ${c.BUDGET_MULT} * weight) // wsum
         |              > n_tokens * ${c.EPOCH_CAP} AS INTEGER) AS capped
         |FROM pt, tot""".stripMargin
    },

    // q139: α-tempered mixing weights — p one IEEE division of exact
    // BIGINT sums; p^α as exp(α·ln p) (the identical two-libm-call
    // sequence Spark runs) r6-quantized into DECIMAL before the
    // normalizing sum; grid literals cast to DOUBLE (bare decimals
    // type as DECIMAL in DuckDB)
    "q139_alpha_mix" -> {
      val grid = graft.operators.Corpus.ALPHA_GRID
        .map(a => s"CAST($a AS DOUBLE)").mkString(", ")
      def q6(e: String) =
        s"CAST(${graft.functions.Rounding.sql6(e)} AS DECIMAL(20,6))"
      s"""WITH masses AS (
         |  SELECT source,
         |         CAST(sum(len(${tokensSql(normTextSql("text"))})) AS BIGINT)
         |           AS n_tokens
         |  FROM documents GROUP BY 1
         |  HAVING sum(len(${tokensSql(normTextSql("text"))})) > 0),
         |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS corpus_tokens
         |        FROM masses),
         |g AS (SELECT unnest([$grid]) AS alpha),
         |pa AS (
         |  SELECT source, n_tokens, alpha,
         |         CAST(n_tokens AS DOUBLE) / corpus_tokens AS p,
         |         ${q6("exp(alpha * ln(CAST(n_tokens AS DOUBLE) / corpus_tokens))")}
         |           AS pa
         |  FROM masses, tot, g),
         |s AS (SELECT alpha, sum(pa) AS spa FROM pa GROUP BY 1)
         |SELECT source, alpha, n_tokens,
         |       ${graft.functions.Rounding.sql6("p")} AS p_raw,
         |       ${graft.functions.Rounding.sql6(
              "CAST(pa AS DOUBLE) / CAST(spa AS DOUBLE)")} AS weight,
         |       ${graft.functions.Rounding.sql6(
              "(CAST(pa AS DOUBLE) / CAST(spa AS DOUBLE)) / p")} AS boost
         |FROM pa JOIN s USING (alpha)""".stripMargin
    },

    "q70_source_mix" ->
      s"""WITH flags AS (
         |  SELECT source,
         |         CASE WHEN ${baseHashSql("CAST(doc_id AS VARCHAR) || '_mix'")} % 100 <
         |              CASE WHEN source IN ('src0','src1','src2','src3') THEN 100
         |                   WHEN source IN ('src4','src5','src6','src7') THEN 50
         |                   ELSE 20 END
         |              THEN 1 ELSE 0 END AS kept
         |  FROM documents)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_total,
         |       CAST(sum(kept) AS BIGINT) AS n_kept,
         |       floor(CAST(sum(kept) AS DOUBLE) / count(*) * 10000.0 + 0.5)
         |         / 10000.0 AS kept_frac
         |FROM flags
         |GROUP BY 1""".stripMargin,

    // 5-gram overlap vs the salted-hash benchmark set; grams distinct
    // per doc on both sides, so the join-then-count is exact
    "q81_decontaminate" ->
      s"""WITH toks AS (
         |  SELECT doc_id, ${tokensSql(normTextSql("text"))} AS tk
         |  FROM documents),
         |grams AS (
         |  SELECT DISTINCT doc_id, g
         |  FROM toks, UNNEST(${shinglesSql("tk", 5)}) AS t(g)),
         |bench AS (
         |  SELECT DISTINCT g FROM grams
         |  WHERE ${baseHashSql("CAST(doc_id AS VARCHAR) || '_bench'")} % 100 < 5),
         |corpus AS (
         |  SELECT * FROM grams
         |  WHERE ${baseHashSql("CAST(doc_id AS VARCHAR) || '_bench'")} % 100 >= 5),
         |shared AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
         |  FROM corpus JOIN bench USING (g) GROUP BY 1),
         |tot AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
         |  FROM corpus GROUP BY 1)
         |SELECT doc_id, n_grams, n_shared,
         |       ${sql4("CAST(n_shared AS DOUBLE) / n_grams")} AS shared_frac
         |FROM tot JOIN shared USING (doc_id)""".stripMargin,

    // q148: incremental decontamination — q81's report restricted to
    // the q144 fixture's snapshot delta (added + changed docs), bench
    // grams drawn from the NEW snapshot's bench slice
    "q148_delta_decon" -> {
      val m = graft.operators.Corpus.DELTA_SNAP_MOD
      val rv = graft.operators.Corpus.DELTA_REV_MOD
      s"""WITH newsnap AS (
         |  SELECT doc_id,
         |         CASE WHEN doc_id % $rv = 0 THEN text || ' rev2'
         |              ELSE text END AS text
         |  FROM documents WHERE doc_id % $m <> 4),
         |oldsnap AS (
         |  SELECT doc_id, md5(text) AS fp_o FROM documents
         |  WHERE doc_id % $m <> 3),
         |delta AS (
         |  SELECT n.doc_id, n.text FROM newsnap n
         |  LEFT JOIN oldsnap o USING (doc_id)
         |  WHERE o.fp_o IS NULL OR md5(n.text) <> o.fp_o),
         |bench AS (
         |  SELECT DISTINCT g
         |  FROM (SELECT doc_id, ${tokensSql(normTextSql("text"))} AS tk
         |        FROM newsnap
         |        WHERE ${baseHashSql("CAST(doc_id AS VARCHAR) || '_bench'")}
         |              % 100 < 5),
         |       UNNEST(${shinglesSql("tk", 5)}) AS t(g)),
         |corpus AS (
         |  SELECT DISTINCT doc_id, g
         |  FROM (SELECT doc_id, ${tokensSql(normTextSql("text"))} AS tk
         |        FROM delta
         |        WHERE ${baseHashSql("CAST(doc_id AS VARCHAR) || '_bench'")}
         |              % 100 >= 5),
         |       UNNEST(${shinglesSql("tk", 5)}) AS t(g)),
         |shared AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
         |  FROM corpus JOIN bench USING (g) GROUP BY 1),
         |tot AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
         |  FROM corpus GROUP BY 1)
         |SELECT doc_id, n_grams, n_shared,
         |       ${sql4("CAST(n_shared AS DOUBLE) / n_grams")} AS shared_frac
         |FROM tot JOIN shared USING (doc_id)""".stripMargin
    },

    // q149: the band-index FOLD across the q144 fixture's compaction
    // — the oracle derives the bands straight from the NEW snapshot
    // (fold == derive is the maintenance invariant; band signatures
    // are pure per-doc functions). The shared band chain is reused
    // with its source retargeted at the rebuilt-snapshot CTE.
    "q149_band_index_fold" -> q149Sql,

    // q149b: the SAME fold with the old index loaded from parquet —
    // fold == derive regardless of where the old index came from, so
    // the identical derive-from-new-snapshot SQL gates it; what
    // changes is only the bench floor (load-vs-derive)
    "q149b_band_index_fold_ix" -> q149Sql,

    // q152: the LM counter fold across the q144/q149 compaction —
    // the oracle ignores the fold and derives the add-one bigram
    // model straight from the NEW snapshot (counts are additive over
    // docs, so fold == derive exactly; q94's CTE blocks on the
    // rebuilt-snapshot CTE)
    "q152_lm_index_fold" -> q152Sql,

    // q152b: the SAME counter fold with the old index loaded from
    // parquet — additive counts make fold == derive wherever the old
    // counters came from, so the identical SQL gates it; only the
    // bench floor changes (tokenize-the-delta vs derive-the-corpus)
    "q152b_lm_index_fold_ix" -> q152Sql,

    // q153: delta docs scored against the STANDING model — the
    // oracle rebuilds both sides from text (model CTEs over the old
    // snapshot, bigram stream over the delta, LEFT joins + add-one
    // backoff for unseen grams, V = standing vocabulary)
    "q153_delta_lm_score" -> {
      val m = graft.operators.Corpus.DELTA_SNAP_MOD
      val rv = graft.operators.Corpus.DELTA_REV_MOD
      s"""WITH oldsnap AS (
         |  SELECT doc_id, text FROM documents WHERE doc_id % $m <> 4),
         |newsnap AS (
         |  SELECT doc_id,
         |         CASE WHEN doc_id % $rv = 0 THEN text || ' rev2'
         |              ELSE text END AS text
         |  FROM documents WHERE doc_id % $m <> 3),
         |delta AS (
         |  SELECT n.doc_id, n.text FROM newsnap n
         |  LEFT JOIN oldsnap o USING (doc_id)
         |  WHERE o.text IS NULL OR o.text <> n.text),
         |toks_m AS (
         |  SELECT doc_id, ${tokensSql(normTextSql("text"))} AS tk
         |  FROM oldsnap),
         |bg_m AS (
         |  SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
         |  FROM toks_m, UNNEST(generate_series(1, len(tk) - 1)) AS g(i)
         |  WHERE len(tk) >= 2),
         |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg_m GROUP BY 1, 2),
         |c1 AS (SELECT w1, count(*) AS c1 FROM bg_m GROUP BY 1),
         |v AS (SELECT count(*) AS v FROM c1),
         |toks_d AS (
         |  SELECT doc_id, ${tokensSql(normTextSql("text"))} AS tk
         |  FROM delta),
         |bg_d AS (
         |  SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
         |  FROM toks_d, UNNEST(generate_series(1, len(tk) - 1)) AS g(i)
         |  WHERE len(tk) >= 2),
         |scored AS (
         |  SELECT b.doc_id,
         |         CAST(${graft.functions.Rounding.sql6(
                     "ln(CAST(coalesce(c12.c12, 0) + 1 AS DOUBLE) / " +
                       "CAST(coalesce(c1.c1, 0) + v.v AS DOUBLE))")}
         |              AS DECIMAL(20,6)) AS lp
         |  FROM bg_d b
         |  LEFT JOIN c12 USING (w1, w2)
         |  LEFT JOIN c1 USING (w1), v),
         |agg AS (
         |  SELECT doc_id, count(*) AS n_bigrams, sum(lp) AS slp
         |  FROM scored GROUP BY 1)
         |SELECT doc_id, n_bigrams,
         |       ${graft.functions.Rounding.sql4("CAST(slp AS DOUBLE) / n_bigrams")} AS avg_logp,
         |       CAST(${graft.functions.Rounding.sql4("CAST(slp AS DOUBLE) / n_bigrams")}
         |            < ${graft.operators.TextOps.LM_FLAG_THRESH} AS INTEGER) AS flagged
         |FROM agg""".stripMargin
    },

    // q124: split hygiene — both engines join on md5(g), so even a
    // hash collision produces the identical verdict; split buckets
    // mirror Corpus.splitAssign (train <80, test >=90)
    "q124_split_contamination" -> q124Sql,

    // q124c: the Bloom-prefiltered twin emits EXACTLY q124's rows —
    // Bloom membership is one-sided (no false negatives) and the
    // exact verify join drops its false positives, so the SAME SQL
    // gates the optimized plan's equivalence
    "q124c_bloom_decon" -> q124Sql,

    // q147: token-budget selection — q94's corpus-LM score CTEs, a
    // flat (score desc, doc_id) rank + running token sum (the oracle
    // keeps the single window; the Spark side's two-level construction
    // is order-identical by the bucket-monotonicity argument), budget
    // boundary by the q119 shard-open rule
    "q147_budget_select" -> {
      val den = graft.operators.Corpus.BUDGET_DEN
      val sent = graft.operators.Corpus.BUDGET_SENTINEL
      s"""WITH toks AS (
         |  SELECT doc_id, ${tokensSql(normTextSql("text"))} AS tk
         |  FROM documents),
         |bg AS (
         |  SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
         |  FROM toks, UNNEST(generate_series(1, len(tk) - 1)) AS g(i)
         |  WHERE len(tk) >= 2),
         |c12 AS (SELECT w1, w2, count(*) AS c12 FROM bg GROUP BY 1, 2),
         |c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
         |v AS (SELECT count(DISTINCT w1) AS v FROM bg),
         |scored AS (
         |  SELECT bg.doc_id,
         |         CAST(${graft.functions.Rounding.sql6(
                     "ln(CAST(c12.c12 + 1 AS DOUBLE) / CAST(c1.c1 + v.v AS DOUBLE))")}
         |              AS DECIMAL(20,6)) AS lp
         |  FROM bg JOIN c12 USING (w1, w2) JOIN c1 USING (w1), v),
         |agg AS (
         |  SELECT doc_id,
         |         ${graft.functions.Rounding.sql4(
                     "CAST(sum(lp) AS DOUBLE) / count(*)")} AS avg_logp
         |  FROM scored GROUP BY 1),
         |base AS (
         |  SELECT d.doc_id,
         |         CAST(len(${tokensSql("lower(trim(d.text))")}) AS BIGINT)
         |           AS n_tok,
         |         coalesce(a.avg_logp, $sent) AS sc
         |  FROM documents d LEFT JOIN agg a USING (doc_id)),
         |tot AS (SELECT sum(n_tok) AS ttok FROM base),
         |ranked AS (
         |  SELECT doc_id, n_tok,
         |         CAST(row_number() OVER
         |           (ORDER BY sc DESC, doc_id ASC) AS BIGINT) AS sel_rank,
         |         CAST(sum(n_tok) OVER (ORDER BY sc DESC, doc_id ASC
         |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
         |  FROM base)
         |SELECT doc_id, sel_rank, n_tok, cum_tokens,
         |       CAST(cum_tokens - n_tok < (SELECT ttok // $den FROM tot)
         |            AS INTEGER) AS selected
         |FROM ranked""".stripMargin
    },

    // q136: split-leakage matrix — per-gram split membership flags
    // folded in one keyed agg; pairwise intersections are flag
    // products, the 3-row matrix a UNION ALL (Spark: stack)
    // q144: corpus snapshot delta — the fixture's two snapshots
    // rebuilt by the same mod rules, one doc_id-keyed FULL join,
    // flags from md5 compares, token masses as exact BIGINT sums
    "q144_corpus_delta" -> {
      val m = graft.operators.Corpus.DELTA_SNAP_MOD
      val rv = graft.operators.Corpus.DELTA_REV_MOD
      s"""WITH oldsnap AS (
         |  SELECT doc_id, source, md5(text) AS fp_o,
         |         CAST(len(${tokensSql("lower(trim(text))")}) AS BIGINT) AS tok_o
         |  FROM documents WHERE doc_id % $m <> 4),
         |newsnap AS (
         |  SELECT doc_id, source,
         |         md5(CASE WHEN doc_id % $rv = 0 THEN text || ' rev2'
         |                  ELSE text END) AS fp_n,
         |         CAST(len(${tokensSql(
                     s"lower(trim(CASE WHEN doc_id % $rv = 0 THEN text || ' rev2' ELSE text END))")})
         |              AS BIGINT) AS tok_n
         |  FROM documents WHERE doc_id % $m <> 3),
         |j AS (
         |  SELECT COALESCE(n.source, o.source) AS source,
         |         o.fp_o, n.fp_n, o.tok_o, n.tok_n
         |  FROM oldsnap o FULL JOIN newsnap n USING (doc_id))
         |SELECT source,
         |  CAST(sum(CASE WHEN fp_o IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_added,
         |  CAST(sum(CASE WHEN fp_n IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_removed,
         |  CAST(sum(CASE WHEN fp_o IS NOT NULL AND fp_n IS NOT NULL
         |                AND fp_o <> fp_n THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_changed,
         |  CAST(sum(CASE WHEN fp_o = fp_n THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_unchanged,
         |  CAST(sum(CASE WHEN fp_o IS NULL THEN tok_n
         |                WHEN fp_n IS NOT NULL AND fp_o <> fp_n THEN tok_n
         |                ELSE 0 END) AS BIGINT) AS tok_added,
         |  CAST(sum(CASE WHEN fp_n IS NULL THEN tok_o
         |                WHEN fp_o IS NOT NULL AND fp_o <> fp_n THEN tok_o
         |                ELSE 0 END) AS BIGINT) AS tok_removed,
         |  CAST(sum(CASE WHEN fp_o IS NULL THEN tok_n
         |                WHEN fp_n IS NOT NULL AND fp_o <> fp_n THEN tok_n
         |                ELSE 0 END)
         |     - sum(CASE WHEN fp_n IS NULL THEN tok_o
         |                WHEN fp_o IS NOT NULL AND fp_o <> fp_n THEN tok_o
         |                ELSE 0 END) AS BIGINT) AS tok_delta
         |FROM j GROUP BY 1""".stripMargin
    },

    // q145: the compaction fold on the q144 fixture — last-writer-
    // wins union (anti-join survivors + updates), digested per doc
    "q145_snapshot_fold" -> {
      val m = graft.operators.Corpus.DELTA_SNAP_MOD
      val rv = graft.operators.Corpus.DELTA_REV_MOD
      s"""WITH standing AS (
         |  SELECT doc_id, source, text FROM documents
         |  WHERE doc_id % $m <> 4),
         |updates AS (
         |  SELECT doc_id, source, text FROM documents WHERE doc_id % $m = 4
         |  UNION ALL
         |  SELECT doc_id, source, text || ' rev2' FROM documents
         |  WHERE doc_id % $m <> 4 AND doc_id % $rv = 0),
         |folded AS (
         |  SELECT s.doc_id, s.source, s.text FROM standing s
         |  WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.doc_id = s.doc_id)
         |  UNION ALL
         |  SELECT doc_id, source, text FROM updates)
         |SELECT doc_id, source, md5(text) AS fp,
         |       CAST(len(${tokensSql("lower(trim(text))")}) AS BIGINT)
         |         AS n_tokens
         |FROM folded""".stripMargin
    },

    "q136_split_leakage" ->
      s"""WITH grams AS (
         |  SELECT DISTINCT
         |         CASE WHEN bkt < 80 THEN 'train'
         |              WHEN bkt < 90 THEN 'val' ELSE 'test' END AS split,
         |         md5(g) AS h
         |  FROM (SELECT ${baseHashSql("CAST(doc_id AS VARCHAR)")} % 100 AS bkt,
         |               ${tokensSql(normTextSql("text"))} AS tk
         |        FROM documents),
         |       UNNEST(${shinglesSql("tk", 5)}) AS t(g)),
         |flags AS (
         |  SELECT h,
         |         max(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS tr,
         |         max(CASE WHEN split = 'val'   THEN 1 ELSE 0 END) AS va,
         |         max(CASE WHEN split = 'test'  THEN 1 ELSE 0 END) AS te
         |  FROM grams GROUP BY 1),
         |m AS (
         |  SELECT CAST(sum(tr) AS BIGINT) AS n_tr,
         |         CAST(sum(va) AS BIGINT) AS n_va,
         |         CAST(sum(te) AS BIGINT) AS n_te,
         |         CAST(sum(tr * va) AS BIGINT) AS s_tv,
         |         CAST(sum(tr * te) AS BIGINT) AS s_tt,
         |         CAST(sum(va * te) AS BIGINT) AS s_vt
         |  FROM flags),
         |mat AS (
         |  SELECT 'train' AS split_a, 'val' AS split_b,
         |         n_tr AS grams_a, n_va AS grams_b, s_tv AS shared_grams FROM m
         |  UNION ALL
         |  SELECT 'train', 'test', n_tr, n_te, s_tt FROM m
         |  UNION ALL
         |  SELECT 'val', 'test', n_va, n_te, s_vt FROM m)
         |SELECT split_a, split_b, grams_a, grams_b, shared_grams,
         |       ${sql4("CAST(shared_grams AS DOUBLE) / grams_a")} AS frac_a,
         |       ${sql4("CAST(shared_grams AS DOUBLE) / (grams_a + grams_b - shared_grams)")}
         |         AS jaccard
         |FROM mat WHERE grams_a > 0 AND grams_b > 0""".stripMargin,

    // q124b: the repair to q124's report — train docs over the
    // contamination threshold move to 'quarantine'
    "q124b_split_repair" -> {
      val frac = graft.operators.Corpus.CONTAM_FRAC
      s"""WITH toks AS (
         |  SELECT doc_id,
         |         ${baseHashSql("CAST(doc_id AS VARCHAR)")} % 100 AS bkt,
         |         ${tokensSql(normTextSql("text"))} AS tk
         |  FROM documents),
         |grams AS (
         |  SELECT DISTINCT doc_id, bkt, md5(g) AS h
         |  FROM toks, UNNEST(${shinglesSql("tk", 5)}) AS t(g)
         |  WHERE bkt < 80 OR bkt >= 90),
         |test_g AS (
         |  SELECT DISTINCT h FROM grams WHERE bkt >= 90),
         |train AS (
         |  SELECT doc_id, h FROM grams WHERE bkt < 80),
         |shared AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
         |  FROM train JOIN test_g USING (h) GROUP BY 1),
         |tot AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_grams
         |  FROM train GROUP BY 1),
         |flagged AS (
         |  SELECT doc_id FROM tot JOIN shared USING (doc_id)
         |  WHERE ${sql4("CAST(n_shared AS DOUBLE) / n_grams")} > $frac),
         |base AS (
         |  SELECT doc_id,
         |         CASE WHEN ${baseHashSql("CAST(doc_id AS VARCHAR)")} % 100 < 80
         |              THEN 'train'
         |              WHEN ${baseHashSql("CAST(doc_id AS VARCHAR)")} % 100 < 90
         |              THEN 'val' ELSE 'test' END AS split
         |  FROM documents)
         |SELECT b.doc_id,
         |       CASE WHEN b.split = 'train' AND f.doc_id IS NOT NULL
         |            THEN 'quarantine' ELSE b.split END AS split
         |FROM base b LEFT JOIN flagged f ON f.doc_id = b.doc_id""".stripMargin
    },

    // q125: dedup keep → Gopher word/line keep (same derived guard as
    // q107, stop-word gate at the corpus-calibrated Q125_MIN_STOPS so
    // the manifest is NON-EMPTY at gate scale) → train split → the
    // q119 shard windows over survivors
    "q125_training_manifest" -> q125Sql(decon = false),

    // q125b: the same manifest with the split-hygiene stage on — the
    // q124 contamination chain flags over-threshold train docs and the
    // train CTE anti-joins them out before sharding
    "q125b_manifest_decon" -> q125Sql(decon = true)
  ) ++ oracleTail

  private def q125Sql(decon: Boolean): String = {
      import graft.operators.TextOps._
      val t = graft.operators.Analytics.SHARD_TOKENS
      val stops = GOPHER_STOPS.map(s => s"'$s'").mkString(",")
      val bullets = GOPHER_BULLET_PREFIXES
        .map(p => s"starts_with(line, '$p')").mkString(" OR ")
      val ellipses = GOPHER_ELLIPSIS_SUFFIXES
        .map(s => s"ends_with(line, '$s')").mkString(" OR ")
      val flaggedCte =
        if (decon)
          s"""flagged AS (
             |  SELECT doc_id FROM (
             |${q124Sql}
             |  ) WHERE shared_frac > ${graft.operators.Corpus.CONTAM_FRAC}),
             |""".stripMargin
        else ""
      val deconPred =
        if (decon)
          "\n    AND NOT EXISTS (SELECT 1 FROM flagged f WHERE f.doc_id = d.doc_id)"
        else ""
      s"""WITH $flaggedCte cap AS (
         |  SELECT max(CASE WHEN contains(text, chr(10)) THEN 1 ELSE 0 END)
         |    AS has_lines FROM documents),
         |keyed AS (
         |  SELECT doc_id, source, text, md5(${normTextSql("text")}) AS h
         |  FROM documents),
         |canon AS (SELECT h, min(doc_id) AS doc_id FROM keyed GROUP BY 1),
         |dedup AS (
         |  SELECT k.doc_id, k.source, k.text
         |  FROM keyed k JOIN canon c ON c.h = k.h AND c.doc_id = k.doc_id),
         |toks AS (
         |  SELECT doc_id, ${tokensSql("lower(trim(text))")} AS tk FROM dedup),
         |lines AS (
         |  SELECT doc_id, trim(l) AS line
         |  FROM dedup, UNNEST(string_split(text, chr(10))) AS u(l)
         |  WHERE len(trim(l)) > 0),
         |ls AS (
         |  SELECT doc_id, CAST(count(*) AS DOUBLE) AS n_lines,
         |         CAST(sum(CASE WHEN $bullets THEN 1 ELSE 0 END) AS DOUBLE) AS n_bullet,
         |         CAST(sum(CASE WHEN $ellipses THEN 1 ELSE 0 END) AS DOUBLE) AS n_ellipsis
         |  FROM lines GROUP BY 1),
         |stats AS (
         |  SELECT doc_id,
         |         len(tk) AS n_words,
         |         CAST(list_sum(list_transform(tk, x -> len(x))) AS DOUBLE) AS sum_len,
         |         CAST(len(list_filter(tk, x -> contains(x, '#')
         |                                    OR contains(x, '...'))) AS DOUBLE) AS n_sym,
         |         CAST(len(list_filter(tk, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE) AS n_alpha,
         |         len(list_distinct(list_filter(tk, x -> x IN ($stops)))) AS n_stop_distinct
         |  FROM toks WHERE len(tk) > 0),
         |pass AS (
         |  SELECT s.doc_id
         |  FROM stats s JOIN ls USING (doc_id), cap c
         |  WHERE s.n_words >= $GOPHER_MIN_WORDS AND s.n_words <= $GOPHER_MAX_WORDS
         |    AND ${sql4("s.sum_len / s.n_words")} >= $GOPHER_MIN_WORDLEN
         |    AND ${sql4("s.sum_len / s.n_words")} <= $GOPHER_MAX_WORDLEN
         |    AND ${sql4("s.n_sym / s.n_words")} <= $GOPHER_MAX_SYMBOL_RATIO
         |    AND ${sql4("s.n_alpha / s.n_words")} >= $GOPHER_MIN_ALPHA_RATIO
         |    AND s.n_stop_distinct >= ${graft.operators.Corpus.Q125_MIN_STOPS}
         |    AND (c.has_lines = 0 OR
         |         (${sql4("ls.n_bullet / ls.n_lines")} <= $GOPHER_MAX_BULLET_FRAC
         |          AND ${sql4("ls.n_ellipsis / ls.n_lines")} <= $GOPHER_MAX_ELLIPSIS_FRAC))),
         |train AS (
         |  SELECT d.doc_id, d.source, d.text
         |  FROM dedup d JOIN pass p USING (doc_id)
         |  WHERE ${baseHashSql("CAST(d.doc_id AS VARCHAR)")} % 100 < 80$deconPred),
         |shard_toks AS (
         |  SELECT doc_id, source,
         |         CAST(len(${tokensSql("lower(trim(text))")}) AS BIGINT) AS n_tok,
         |         ${baseHashSql("doc_id::VARCHAR || '_shard'")} AS hkey
         |  FROM train),
         |cums AS (
         |  SELECT doc_id, source, n_tok,
         |         CAST(sum(n_tok) OVER (PARTITION BY source ORDER BY hkey, doc_id
         |                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
         |  FROM shard_toks)
         |SELECT source, CAST((cum - n_tok) // $t AS BIGINT) AS shard_id,
         |       count(*) AS n_docs,
         |       CAST(sum(n_tok) AS BIGINT) AS shard_tokens,
         |       min(doc_id) AS min_doc, max(doc_id) AS max_doc
         |FROM cums GROUP BY 1, 2""".stripMargin
  }

  // Map-literal size: the q125Sql split keeps the main literal under
  // scalac's method-size comfort zone; content-wise one flat map.
  // (def, not val: `oracle` above concatenates this during object
  // init, before a later-declared val would be assigned)
  private def oracleTail: Map[String, String] = Map(
    // tf/dl · ln(N/df) over exact integers — same IEEE sequence as the
    // Spark side, so the rank needs no rounding guard
    "q84_tfidf_topterms" ->
      s"""WITH toks AS (
         |  SELECT doc_id, ${tokensSql("lower(trim(text))")} AS tk FROM documents),
         |tf AS (
         |  SELECT doc_id, tok AS term, CAST(count(*) AS BIGINT) AS tf
         |  FROM toks, UNNEST(tk) AS u(tok) GROUP BY 1, 2),
         |dl AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
         |dfd AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS bigN FROM dl),
         |scored AS (
         |  SELECT t.doc_id, t.term,
         |         (CAST(t.tf AS DOUBLE) / d.dl)
         |           * ln(CAST(bigN AS DOUBLE) / f.df) AS score
         |  FROM tf t JOIN dl d USING (doc_id) JOIN dfd f USING (term)
         |  CROSS JOIN n),
         |ranked AS (
         |  SELECT doc_id, term, score, row_number() OVER (
         |    PARTITION BY doc_id ORDER BY score DESC, term ASC) AS rk
         |  FROM scored)
         |SELECT doc_id, CAST(rk AS INTEGER) AS rk, term,
         |       ${sql6("score")} AS tfidf
         |FROM ranked WHERE rk <= 3""".stripMargin,

    // A-ES weighted sample: same deterministic md5 draw and the same
    // single IEEE key sequence as the Spark side
    // q114: unrolled BPE merge rounds (the q76/q97 posture). Each
    // round mirrors the Spark side exactly: weighted adjacent-pair
    // count over the vocab, lexicographic-tie argmax, left-to-right
    // non-overlapping replace of '_a_b_' with '_ab_'.
    "q114_bpe_train" -> {
      val rounds = 1 to graft.operators.Corpus.BPE_ROUNDS
      s"""WITH $bpeV0Cte,
         |${rounds.map(bpeRoundCtes).mkString(",\n")}
         |${rounds.map(r =>
           s"SELECT $r AS round, b$r.pair, b$r.pf, s$r.corpus_symbols FROM b$r, s$r")
           .mkString("\nUNION ALL\n")}""".stripMargin
    },

    // q115: the trained tokenizer's encode side — the unrolled merge
    // chain's final vocabulary joins back onto the token stream.
    "q115_bpe_encode" -> {
      val last = graft.operators.Corpus.BPE_ROUNDS
      s"""WITH $bpeV0Cte,
         |${(1 to last).map(bpeRoundCtes).mkString(",\n")},
         |segn AS (
         |  SELECT w, len(${bpeSy("seg")}) AS n_symbols FROM v$last),
         |tok AS (
         |  SELECT doc_id, unnest(${tokensSql("lower(trim(text))")}) AS w
         |  FROM documents)
         |SELECT t.doc_id,
         |       CAST(count(*) AS BIGINT) AS n_words,
         |       CAST(sum(s.n_symbols) AS BIGINT) AS n_symbols,
         |       ${sql4("CAST(sum(s.n_symbols) AS DOUBLE) / count(*)")}
         |         AS symbols_per_word
         |FROM tok t JOIN segn s USING (w)
         |GROUP BY 1""".stripMargin
    },

    "q110_dsir_weights" -> {
      val B = graft.operators.Corpus.DSIR_BUCKETS
      val TGT = graft.operators.Corpus.DSIR_TARGET_SOURCES
        .map(s => s"'$s'").mkString(", ")
      s"""WITH toks2 AS (
         |  SELECT doc_id, source, ${tokensSql("lower(trim(text))")} AS tk
         |  FROM documents),
         |grams AS (
         |  SELECT doc_id, source, ${baseHashSql("g")} % $B AS b
         |  FROM toks2, UNNEST(list_concat(tk, ${shinglesSql("tk", 2)})) AS u(g)),
         |pdb AS (SELECT doc_id, b, count(*) AS n FROM grams GROUP BY 1, 2),
         |raw AS (SELECT b, count(*) AS c_r FROM grams GROUP BY 1),
         |tgt AS (SELECT b, count(*) AS c_t FROM grams
         |        WHERE source IN ($TGT) GROUP BY 1),
         |dim AS (
         |  SELECT raw.b, c_r, COALESCE(c_t, 0) AS c_t
         |  FROM raw LEFT JOIN tgt USING (b)),
         |tot AS (
         |  SELECT CAST(sum(c_r) AS BIGINT) AS n_r,
         |         CAST(sum(c_t) AS BIGINT) AS n_t FROM dim),
         |lam AS (
         |  SELECT b,
         |         CAST(${sql6(s"ln(CAST((c_t + 1) * (n_r + $B) AS DOUBLE) / CAST((c_r + 1) * (n_t + $B) AS DOUBLE))")}
         |              AS DECIMAL(20,6)) AS lam
         |  FROM dim, tot),
         |agg AS (
         |  SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_grams,
         |         ${sql4("CAST(sum(n * lam) AS DOUBLE) / CAST(sum(n) AS BIGINT)")} AS avg_llr
         |  FROM pdb JOIN lam USING (b) GROUP BY 1)
         |SELECT doc_id, n_grams, avg_llr,
         |       CAST(avg_llr > 0 AS INTEGER) AS selected
         |FROM agg""".stripMargin
    },

    // q141: per-source standing/incoming JS divergence over the DSIR
    // gram space — scaffold guarantees all B buckets contribute;
    // per-bucket contributions r6-quantize into the exact DECIMAL sum
    "q141_drift_report" -> {
      val B = graft.operators.Corpus.DSIR_BUCKETS
      val m = graft.operators.Corpus.DRIFT_INCR_MOD
      s"""WITH toks3 AS (
         |  SELECT source, CAST(doc_id % $m = ${m - 1} AS BIGINT) AS inc,
         |         ${tokensSql(normTextSql("text"))} AS tk
         |  FROM documents),
         |grams AS (
         |  SELECT source, inc, ${baseHashSql("g")} % $B AS b
         |  FROM toks3, UNNEST(list_concat(tk, ${shinglesSql("tk", 2)})) AS u(g)),
         |counts AS (
         |  SELECT source, b, CAST(sum(inc) AS BIGINT) AS c_i,
         |         CAST(sum(1 - inc) AS BIGINT) AS c_s
         |  FROM grams GROUP BY 1, 2),
         |scaffold AS (
         |  SELECT source, gs.b
         |  FROM (SELECT DISTINCT source FROM documents),
         |       (SELECT unnest(generate_series(0, ${B - 1})) AS b) gs),
         |f AS (
         |  SELECT s.source, s.b,
         |         COALESCE(c.c_i, 0) AS c_i, COALESCE(c.c_s, 0) AS c_s
         |  FROM scaffold s LEFT JOIN counts c
         |    ON c.source = s.source AND c.b = s.b),
         |tot3 AS (
         |  SELECT source, CAST(sum(c_i) AS BIGINT) AS n_i,
         |         CAST(sum(c_s) AS BIGINT) AS n_s
         |  FROM f GROUP BY 1),
         |contrib AS (
         |  SELECT f.source, n_s, n_i,
         |         CAST(${sql6(
              s"0.5 * (CAST(c_s + 1 AS DOUBLE) / (n_s + $B)) * " +
              s"ln((CAST(c_s + 1 AS DOUBLE) / (n_s + $B)) / " +
              s"((CAST(c_s + 1 AS DOUBLE) / (n_s + $B) + CAST(c_i + 1 AS DOUBLE) / (n_i + $B)) / 2.0)) + " +
              s"0.5 * (CAST(c_i + 1 AS DOUBLE) / (n_i + $B)) * " +
              s"ln((CAST(c_i + 1 AS DOUBLE) / (n_i + $B)) / " +
              s"((CAST(c_s + 1 AS DOUBLE) / (n_s + $B) + CAST(c_i + 1 AS DOUBLE) / (n_i + $B)) / 2.0))")}
         |           AS DECIMAL(20,6)) AS contrib
         |  FROM f JOIN tot3 ON tot3.source = f.source),
         |js AS (
         |  SELECT source, n_s AS n_grams_standing, n_i AS n_grams_incoming,
         |         ${sql6("CAST(sum(contrib) AS DOUBLE)")} AS js_div
         |  FROM contrib GROUP BY 1, 2, 3),
         |nd AS (
         |  SELECT source,
         |         CAST(sum(CASE WHEN doc_id % $m = ${m - 1} THEN 0 ELSE 1 END) AS BIGINT)
         |           AS n_docs_standing,
         |         CAST(sum(CASE WHEN doc_id % $m = ${m - 1} THEN 1 ELSE 0 END) AS BIGINT)
         |           AS n_docs_incoming
         |  FROM documents GROUP BY 1)
         |SELECT source, n_docs_standing, n_docs_incoming,
         |       n_grams_standing, n_grams_incoming, js_div
         |FROM js JOIN nd USING (source)""".stripMargin
    },

    // q110b: DSIR importance resampling — the q110 log-weight chain
    // plus the deterministic Gumbel-top-k draw (key = sum_llr −
    // ln(−ln u), the q98 md5 discipline in log space)
    "q110b_dsir_resample" -> {
      val B = graft.operators.Corpus.DSIR_BUCKETS
      val K = graft.operators.Corpus.DSIR_SAMPLE_K
      val TGT = graft.operators.Corpus.DSIR_TARGET_SOURCES
        .map(s => s"'$s'").mkString(", ")
      val u = s"(${baseHashSql("CAST(doc_id AS VARCHAR) || '_dsir'")} + 0.5)" +
        " / 268435456.0"
      s"""WITH toks2 AS (
         |  SELECT doc_id, source, ${tokensSql("lower(trim(text))")} AS tk
         |  FROM documents),
         |grams AS (
         |  SELECT doc_id, source, ${baseHashSql("g")} % $B AS b
         |  FROM toks2, UNNEST(list_concat(tk, ${shinglesSql("tk", 2)})) AS u(g)),
         |pdb AS (SELECT doc_id, b, count(*) AS n FROM grams GROUP BY 1, 2),
         |raw AS (SELECT b, count(*) AS c_r FROM grams GROUP BY 1),
         |tgt AS (SELECT b, count(*) AS c_t FROM grams
         |        WHERE source IN ($TGT) GROUP BY 1),
         |dim AS (
         |  SELECT raw.b, c_r, COALESCE(c_t, 0) AS c_t
         |  FROM raw LEFT JOIN tgt USING (b)),
         |tot AS (
         |  SELECT CAST(sum(c_r) AS BIGINT) AS n_r,
         |         CAST(sum(c_t) AS BIGINT) AS n_t FROM dim),
         |lam AS (
         |  SELECT b,
         |         CAST(${sql6(s"ln(CAST((c_t + 1) * (n_r + $B) AS DOUBLE) / CAST((c_r + 1) * (n_t + $B) AS DOUBLE))")}
         |              AS DECIMAL(20,6)) AS lam
         |  FROM dim, tot),
         |agg AS (
         |  SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_grams,
         |         sum(n * lam) AS sum_llr
         |  FROM pdb JOIN lam USING (b) GROUP BY 1),
         |keyed AS (
         |  SELECT doc_id, n_grams,
         |         CAST(sum_llr AS DOUBLE) - ln(-ln($u)) AS gkey_raw
         |  FROM agg)
         |SELECT doc_id, n_grams, ${sql6("gkey_raw")} AS gkey
         |FROM keyed ORDER BY gkey_raw DESC, doc_id ASC LIMIT $K""".stripMargin
    },

    "q98_weighted_sample" ->
      s"""WITH keyed AS (
         |  SELECT o_orderkey, o_totalprice,
         |         ln((${SqlFragments.baseHashSql(
                    "o_orderkey::VARCHAR || '_ws'")} + 0.5) / 268435456.0)
         |           / o_totalprice AS wkey_raw
         |  FROM orders)
         |SELECT o_orderkey, o_totalprice, ${sql6("wkey_raw")} AS wkey
         |FROM keyed
         |ORDER BY wkey_raw DESC, o_orderkey ASC
         |LIMIT ${graft.operators.Corpus.WSAMPLE_K}""".stripMargin,

    // the COMPOSED corpus-prep pipeline: replays every stage — exact
    // dedup, MinHash-LSH near-dup clustering, token floor, Gopher
    // repetition, bigram-LM scoring, decontamination — and assigns
    // each doc its first failing stage. CTEs reuse the shingle/band
    // chain (toks/sh/bands); repetition tokenizes its own rtoks.
    "q100_corpus_pipeline" -> {
      val K = graft.operators.Dedup.CLUSTER_JACCARD
      val jexpr = sql4("CAST(COALESCE(i.n_inter, 0) AS DOUBLE)" +
        " / (ca.n_sh + cb.n_sh - COALESCE(i.n_inter, 0))")
      val lmTerm = sql6("ln(CAST(c12.c12 + 1 AS DOUBLE) / CAST(c1.c1 + v.v AS DOUBLE))")
      val lmAvg = sql4("CAST(slp AS DOUBLE) / n_bigrams")
      s"""WITH RECURSIVE ${SqlFragments.minhashBandsSql},
         |ndc AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a
         |  JOIN bands b ON a.band_id = b.band_id
         |             AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id),
         |ndcounts AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY 1),
         |ndinter AS (
         |  SELECT c.doc_a, c.doc_b, count(*) AS n_inter
         |  FROM ndc c
         |  JOIN sh x ON x.doc_id = c.doc_a
         |  JOIN sh y ON y.doc_id = c.doc_b AND y.s = x.s
         |  GROUP BY 1, 2),
         |ndpairs AS (
         |  SELECT doc_a, doc_b FROM (
         |    SELECT c.doc_a, c.doc_b, $jexpr AS j
         |    FROM ndc c
         |    LEFT JOIN ndinter i USING (doc_a, doc_b)
         |    JOIN ndcounts ca ON ca.doc_id = c.doc_a
         |    JOIN ndcounts cb ON cb.doc_id = c.doc_b)
         |  WHERE j >= $K),
         |ndedges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM ndpairs
         |  UNION ALL SELECT doc_b, doc_a FROM ndpairs),
         |reach(a, b) AS (
         |  SELECT src, src FROM ndedges
         |  UNION
         |  SELECT r.a, e.dst FROM reach r JOIN ndedges e ON e.src = r.b),
         |neardup AS (
         |  SELECT a AS doc_id FROM reach GROUP BY 1 HAVING a <> min(b)),
         |exact AS (
         |  SELECT doc_id FROM (
         |    SELECT doc_id, min(doc_id) OVER (
         |      PARTITION BY md5(${SqlFragments.normTextSql("text")})) AS canon
         |    FROM documents)
         |  WHERE doc_id <> canon),
         |rtoks0 AS MATERIALIZED (
         |  SELECT doc_id, ${tokensSql("lower(trim(text))")} AS tk FROM documents),
         |rtoks AS MATERIALIZED (
         |  SELECT doc_id, i AS pos, tk[i] AS w
         |  FROM rtoks0, UNNEST(generate_series(1, len(tk))) AS u(i)),
         |rwagg AS (
         |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_words FROM rtoks GROUP BY 1),
         |rbagg AS (
         |  SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams, max(c) AS top_bg
         |  FROM (
         |    SELECT a.doc_id, a.w || ' ' || b.w AS g, count(*) AS c
         |    FROM rtoks a
         |    JOIN rtoks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
         |    GROUP BY 1, 2)
         |  GROUP BY 1),
         |rep AS (
         |  SELECT w.doc_id,
         |         COALESCE(${sql4("CAST(b.top_bg AS DOUBLE) / b.n_bigrams")}
         |           > ${graft.operators.TextOps.TOP_BIGRAM_REPETITIVE}, false)
         |           AS f_rep
         |  FROM rwagg w LEFT JOIN rbagg b ON b.doc_id = w.doc_id),
         |lmbg AS (
         |  SELECT doc_id, tk[i] AS w1, tk[i + 1] AS w2
         |  FROM toks, UNNEST(generate_series(1, len(tk) - 1)) AS g(i)
         |  WHERE len(tk) >= 2),
         |c12 AS (SELECT w1, w2, count(*) AS c12 FROM lmbg GROUP BY 1, 2),
         |c1 AS (SELECT w1, count(*) AS c1 FROM lmbg GROUP BY 1),
         |v AS (SELECT count(DISTINCT w1) AS v FROM lmbg),
         |lmagg AS (
         |  SELECT doc_id, count(*) AS n_bigrams,
         |         sum(CAST($lmTerm AS DECIMAL(20,6))) AS slp
         |  FROM lmbg JOIN c12 USING (w1, w2) JOIN c1 USING (w1), v
         |  GROUP BY 1),
         |lmflag AS (
         |  SELECT doc_id FROM lmagg
         |  WHERE $lmAvg < ${graft.operators.TextOps.LM_FLAG_THRESH}),
         |grams AS (
         |  SELECT DISTINCT doc_id, g
         |  FROM toks, UNNEST(${shinglesSql("tk", 5)}) AS t(g)),
         |bench AS (
         |  SELECT DISTINCT g FROM grams
         |  WHERE ${baseHashSql("CAST(doc_id AS VARCHAR) || '_bench'")} % 100
         |        < ${graft.operators.Corpus.BENCH_PCT}),
         |corpus AS (
         |  SELECT * FROM grams
         |  WHERE ${baseHashSql("CAST(doc_id AS VARCHAR) || '_bench'")} % 100
         |        >= ${graft.operators.Corpus.BENCH_PCT}),
         |contam AS (
         |  SELECT s.doc_id FROM
         |    (SELECT doc_id, count(*) AS n_shared
         |     FROM corpus JOIN bench USING (g) GROUP BY 1) s
         |  JOIN (SELECT doc_id, count(*) AS n_grams FROM corpus GROUP BY 1) t
         |    ON t.doc_id = s.doc_id
         |  WHERE ${sql4("CAST(s.n_shared AS DOUBLE) / t.n_grams")}
         |        > ${graft.operators.Corpus.CONTAM_FRAC})
         |SELECT d.doc_id, d.source,
         |       COALESCE(w.n_words, 0) AS n_tokens,
         |       CASE
         |         WHEN ${baseHashSql("CAST(d.doc_id AS VARCHAR) || '_bench'")} % 100
         |              < ${graft.operators.Corpus.BENCH_PCT} THEN 'eval_set'
         |         WHEN e.doc_id IS NOT NULL THEN 'exact_dup'
         |         WHEN n.doc_id IS NOT NULL THEN 'near_dup'
         |         WHEN COALESCE(w.n_words, 0) < ${graft.operators.Corpus.MIN_TOKENS}
         |           THEN 'too_short'
         |         WHEN COALESCE(r.f_rep, false) THEN 'repetitive'
         |         WHEN l.doc_id IS NOT NULL THEN 'low_lm'
         |         WHEN c.doc_id IS NOT NULL THEN 'contaminated'
         |         ELSE 'kept' END AS verdict
         |FROM documents d
         |LEFT JOIN exact e ON e.doc_id = d.doc_id
         |LEFT JOIN neardup n ON n.doc_id = d.doc_id
         |LEFT JOIN rwagg w ON w.doc_id = d.doc_id
         |LEFT JOIN rep r ON r.doc_id = d.doc_id
         |LEFT JOIN lmflag l ON l.doc_id = d.doc_id
         |LEFT JOIN contam c ON c.doc_id = d.doc_id""".stripMargin
    }
  )
}
