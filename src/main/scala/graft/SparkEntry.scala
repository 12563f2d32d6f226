package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are contributed by operator modules:
  *  - [[graft.operators.Relational]]  — standard relational catalog (SURVEY §2B)
  *  - [[graft.ngsi]] / [[graft.streaming]] — reference-faithful NGSI pipelines (SURVEY §2A)
  *  - [[graft.operators.Dedup]] / [[graft.operators.Similarity]] /
  *    [[graft.operators.TextAnalysis]] / [[graft.operators.Multimodal]] — LLM-pipeline extensions
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Reference Example1 batch analog (keyBy id → window → min, SURVEY §2A #6-8):
    * per-user hourly windowed min/avg over the events stream table.
    */
  def entry(spark: SparkSession): DataFrame =
    Tables.load(spark, "/root/testdata/sf0.001", "events")
      .groupBy(window(col("ts"), "1 hour").getField("start").as("win_start"),
               col("user_id"))
      .agg(min(col("value")).as("min_value"),
           avg(col("value")).as("avg_value"),
           count(lit(1)).as("n_events"))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++
      operators.TextAnalysis.queries ++
      operators.Dedup.queries ++
      operators.Similarity.queries ++
      operators.Multimodal.queries ++
      operators.Curation.queries ++
      operators.Sketches.queries ++
      operators.Graph.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.Relational.oracles ++
      operators.TextAnalysis.oracles ++
      operators.Dedup.oracles ++
      operators.Similarity.oracles ++
      operators.Multimodal.oracles ++
      operators.Curation.oracles ++
      operators.Sketches.oracles ++
      operators.Graph.oracles
}
