package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (SURVEY.md §2 + the
  * LLM-data-pipeline extensions); every key has a matching DuckDB oracle in
  * `oracleSql` unless the operator is not SQL-expressible.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Star join + decimal-exact revenue rollup (SURVEY §2.3/§2.7).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("j3_star_join")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreRelational.queries ++
      graft.queries.SqlSurface.queries ++
      graft.queries.CustomFns.queries ++
      graft.operators.Dedup.queries ++
      graft.operators.Dedup.queries2 ++
      graft.operators.Dedup.queries2b ++
      graft.operators.Dedup.queries3 ++
      graft.operators.Privacy.queries ++
      graft.operators.Retrieval.queries ++
      graft.operators.Similarity.queries ++
      graft.operators.Similarity.queries2 ++
      graft.operators.Ivf.queries ++
      graft.operators.Pq.queries ++
      graft.operators.TextAnalysis.queries ++
      graft.operators.Curation.queries ++
      graft.operators.Bpe.queries ++
      graft.operators.Unigram.queries ++
      graft.multimodal.Multimodal.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    graft.queries.CoreRelational.oracles ++
      graft.queries.SqlSurface.oracles ++
      graft.queries.CustomFns.oracles ++
      graft.operators.Dedup.oracles ++
      graft.operators.Dedup.oracles2 ++
      graft.operators.Dedup.oracles3 ++
      graft.operators.Privacy.oracles ++
      graft.operators.Retrieval.oracles ++
      graft.operators.Similarity.oracles ++
      graft.operators.Similarity.oracles2 ++
      graft.operators.Ivf.oracles ++
      graft.operators.Pq.oracles ++
      graft.operators.TextAnalysis.oracles ++
      graft.operators.Curation.oracles ++
      graft.operators.Bpe.oracles ++
      graft.operators.Unigram.oracles ++
      graft.multimodal.Multimodal.oracles
}
