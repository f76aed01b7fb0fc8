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

  val oracle: Map[String, String] = Map(

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
