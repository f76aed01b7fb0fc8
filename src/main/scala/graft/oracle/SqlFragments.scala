package graft.oracle

/**
 * Shared DuckDB SQL fragments mirroring [[graft.functions.VectorFns]]
 * and [[graft.operators.Dedup]] text primitives. Every fragment MUST
 * stay semantically identical to its Spark twin — these feed the
 * hash-match oracle.
 */
object SqlFragments {

  /** Twin of [[graft.operators.Dedup.normText]]. DuckDB regexp_replace
    * needs the 'g' flag to replace all matches (Spark's replaces all by
    * default). */
  def normTextSql(e: String): String =
    s"regexp_replace(lower(trim($e)), '\\s+', ' ', 'g')"

  /** Twin of [[graft.functions.VectorFns.tokens]]. */
  def tokensSql(e: String): String =
    s"list_filter(string_split_regex($e, '\\s+'), t -> len(t) > 0)"

  /** Twin of [[graft.functions.VectorFns.shingles]] for n=3 over a
    * token-list expression; empty when the list is shorter than 3
    * (generate_series over an empty range). DuckDB list slices are
    * 1-based and end-inclusive: tk[i:i+2] is 3 tokens. */
  def shingles3Sql(tk: String): String = shinglesSql(tk, 3)

  /** Twin of [[graft.functions.VectorFns.shingles]] for arbitrary `n`
    * over a token-list expression; empty when the list is shorter than
    * `n` (generate_series over an empty range). DuckDB list slices are
    * 1-based and end-inclusive: tk[i:i+n-1] is n tokens. */
  def shinglesSql(tk: String, n: Int): String =
    s"list_transform(generate_series(1, len($tk) - ${n - 1}), i -> array_to_string(($tk)[i:i+${n - 1}], ' '))"

  /** Twin of [[graft.operators.Dedup.baseHash]] (28-bit md5 prefix). */
  def baseHashSql(e: String): String =
    s"CAST(('0x' || substr(md5($e), 1, 7)) AS BIGINT)"

  /** Per-doc distinct 3-shingle CTE over `documents` → (doc_id, s). */
  val shingleSetSql: String =
    s"""toks AS (
       |  SELECT doc_id, ${tokensSql(normTextSql("text"))} AS tk
       |  FROM documents),
       |sh AS (
       |  SELECT DISTINCT doc_id, s
       |  FROM toks, UNNEST(${shingles3Sql("tk")}) AS t(s))""".stripMargin

  /** MinHash banding CTE chain (16 perms mod 2³¹-1, 4 bands of 4) →
    * bands(doc_id, band_id, band_hash). Constants MUST match
    * [[graft.operators.Dedup.minhashBands]]. */
  val minhashBandsSql: String = {
    val mins = (0 until 16)
      .map(i => s"min((h0 * ${2 * i + 1} + ${7919 * i + 13}) % 2147483647) AS s$i")
      .mkString(",\n           ")
    val sigList = (0 until 16).map(i => s"s$i").mkString("[", ", ", "]")
    s"""$shingleSetSql,
       |hashes AS (
       |  SELECT doc_id, ${baseHashSql("s")} AS h0 FROM sh),
       |sigs AS (
       |  SELECT doc_id,
       |           $mins
       |  FROM hashes GROUP BY 1),
       |bands AS (
       |  SELECT doc_id, CAST(b AS INTEGER) AS band_id,
       |         md5(concat_ws('_', sig[b*4+1], sig[b*4+2], sig[b*4+3], sig[b*4+4])) AS band_hash
       |  FROM (SELECT doc_id, $sigList AS sig FROM sigs),
       |       (SELECT unnest([0, 1, 2, 3]) AS b))""".stripMargin
  }
}
