package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Queries are contributed by operator packs (one per SURVEY.md §2 area);
  * each pack pairs every query with its DuckDB oracle SQL. COVERAGE.md maps
  * SURVEY §2 inventory rows → query names.
  */
object SparkEntry {

  /** All operator packs. Order is irrelevant (names are unique). */
  def packs: Seq[QueryPack] = Seq(
    graft.operators.Relational,
    graft.operators.Aggregates,
    graft.operators.Joins,
    graft.operators.Windows,
    graft.operators.Events,
    graft.operators.Skew,
    graft.sources.Formats,
    graft.functions.TextOps,
    graft.functions.DedupOps,
    graft.functions.SimilarityOps,
    graft.functions.MultimodalOps,
    graft.streaming.StreamQueries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.operators.Aggregates.q1PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    packs.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops (sketch-
    * based: approx distinct, minhash/simhash candidates) → rows-only check.
    */
  def oracleSql: Map[String, String] =
    packs.flatMap(_.oracle).toMap
}
