package graft.oracle

/**
 * DuckDB oracles for [[graft.operators.Privacy]]. The token is the
 * same salted-md5 prefix on both engines; class-size logic mirrors
 * the generalization ladder exactly (fine ≥ K → publish fine, merged
 * sub-K mass ≥ K → publish `<any>`, else redact + suppress).
 */
object PrivacySql {

  private val K = graft.operators.Privacy.K_ANON
  private val W = graft.operators.Privacy.BAND_WIDTH
  private val SALT = graft.operators.Privacy.TOKEN_SALT

  /** Twin of [[graft.operators.Privacy.scrubPii]]: the SAME pattern
    * strings (RE2-portable by contract — see PII_PATTERNS scaladoc),
    * chained in the same order; DuckDB needs the explicit 'g' flag
    * where Spark's regexp_replace is global by default. */
  private def scrubSql(e: String): String =
    graft.operators.Privacy.PII_PATTERNS.foldLeft(e) { case (acc, (p, r)) =>
      s"regexp_replace($acc, '$p', '$r', 'g')"
    }

  private def markerCountSql(s: String, marker: String): String =
    s"CAST((length($s) - length(replace($s, '$marker', ''))) / ${marker.length} AS BIGINT)"

  val oracle: Map[String, String] = Map(

    "q109_pii_scrub" ->
      s"""WITH planted AS (
         |  SELECT doc_id, text,
         |         text
         |           || repeat(' u' || CAST(doc_id AS VARCHAR) || '@mail.example.com',
         |                     CAST(doc_id % 3 AS INT))
         |           || repeat(' (5' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || ') 123-4567',
         |                     CAST(doc_id % 2 AS INT))
         |           || ' from 10.2.' || CAST(doc_id % 256 AS VARCHAR) || '.9'
         |           || repeat(' pay 4111 1111 1111 1111', CAST((doc_id + 1) % 2 AS INT))
         |           AS aug
         |  FROM documents),
         |scrubbed AS (
         |  SELECT doc_id, text, ${scrubSql("aug")} AS s FROM planted)
         |SELECT doc_id,
         |       ${markerCountSql("s", "<EMAIL>")} AS n_email,
         |       ${markerCountSql("s", "<PHONE>")} AS n_phone,
         |       ${markerCountSql("s", "<IP>")} AS n_ip,
         |       ${markerCountSql("s", "<CARD>")} AS n_card,
         |       CAST(${scrubSql("text")} = text AS INTEGER) AS clean_pass,
         |       substr(md5(s), 1, 16) AS scrub_fp
         |FROM scrubbed""".stripMargin,

    "q91_k_anonymity" ->
      s"""WITH c AS (
         |  SELECT substr(md5('$SALT' || CAST(c_custkey AS VARCHAR)), 1, 16)
         |           AS token,
         |         c_nationkey, c_mktsegment,
         |         CAST(floor(c_acctbal / $W) AS BIGINT) AS band
         |  FROM customer),
         |fine AS (
         |  SELECT c_nationkey, c_mktsegment, band, count(*) AS n_fine
         |  FROM c GROUP BY 1, 2, 3),
         |merged AS (
         |  SELECT c_nationkey, c_mktsegment,
         |         CAST(sum(n_fine) AS BIGINT) AS n_any
         |  FROM fine WHERE n_fine < $K GROUP BY 1, 2)
         |SELECT c.token,
         |       CASE WHEN f.n_fine >= $K OR m.n_any >= $K
         |            THEN CAST(c.c_nationkey AS VARCHAR)
         |            ELSE '<redacted>' END AS nation_out,
         |       CASE WHEN f.n_fine >= $K OR m.n_any >= $K
         |            THEN c.c_mktsegment ELSE '<redacted>' END AS segment_out,
         |       CASE WHEN f.n_fine >= $K THEN CAST(c.band AS VARCHAR)
         |            WHEN m.n_any >= $K THEN '<any>'
         |            ELSE '<redacted>' END AS acct_band,
         |       CAST(f.n_fine < $K AND COALESCE(m.n_any, 0) < $K AS INTEGER)
         |         AS suppressed
         |FROM c
         |JOIN fine f USING (c_nationkey, c_mktsegment, band)
         |LEFT JOIN merged m ON m.c_nationkey = c.c_nationkey
         |                  AND m.c_mktsegment = c.c_mktsegment""".stripMargin
  )
}
