package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the per-domain operator suites. Each `queries` entry is a
  * distributed DataFrame pipeline over the `/root/testdata` parquet
  * tables; `oracleSql` carries the DuckDB-equivalent SQL for the
  * driver's hash-match correctness gate (sf0.01).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++
      operators.Recommender.queries ++
      operators.Content.queries ++
      operators.Hybrid.queries ++
      operators.Dedup.queries ++
      operators.Similarity.queries ++
      operators.TextOps.queries ++
      operators.Multimodal.queries ++
      operators.Evaluation.queries ++
      operators.Sequential.queries ++
      operators.SeqRecommender.queries ++
      operators.Corpus.queries ++
      operators.Graph.queries ++
      operators.Analytics.queries ++
      operators.Privacy.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    oracle.RelationalSql.oracle ++
      oracle.RecommenderSql.oracle ++
      oracle.ContentHybridSql.oracle ++
      oracle.DedupSql.oracle ++
      oracle.SimilaritySql.oracle ++
      oracle.TextSql.oracle ++
      oracle.EvalSeqSql.oracle ++
      oracle.SeqRecSql.oracle ++
      oracle.CorpusSql.oracle ++
      oracle.GraphSql.oracle ++
      oracle.AnalyticsSql.oracle ++
      oracle.PrivacySql.oracle
}
