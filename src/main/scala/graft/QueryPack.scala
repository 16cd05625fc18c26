package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named bundle of operator queries plus their DuckDB oracle SQL.
  *
  * Every operator row in SURVEY.md §2 gets at least one query here; the
  * driver runs each query at sf0.01 and hash-compares against the oracle
  * SQL executed by DuckDB over the same parquet tables.
  *
  * Determinism rules used throughout (so Spark and DuckDB hash-match):
  *  - every query ends in a total ORDER BY over unique keys;
  *  - double aggregations go through DECIMAL so the sum is exact and
  *    order-independent, then cast back to double (`decSum` pattern);
  *  - output column names are lowercase and aliased identically on both
  *    sides (DuckDB lowercases unquoted identifiers).
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]
}

object QueryPack {
  import org.apache.spark.sql.{Column, SparkSession}
  import org.apache.spark.sql.expressions.WindowSpec
  import org.apache.spark.sql.functions.sum
  import org.apache.spark.sql.types.DecimalType

  /** Exact, order-independent sum of a double expression: per-row cast to
    * decimal(18,6) (deterministic), exact decimal accumulation, cast back.
    * Spark and DuckDB produce bit-identical doubles for this pattern.
    */
  def decSumSql(expr: String, alias: String): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(18,6))) AS DOUBLE) AS $alias"

  /** Exactness knob: `graft.sums.exact=true` (default under the gate
    * profile) routes double sums through decimal — bit-reproducible across
    * partitionings and engines, which the hash-equality correctness gate
    * requires, at ~3x the agg cost. `false` is the plain-double deployment
    * path (industry-standard last-ulp nondeterminism); Bench opts into it,
    * and `graft.profile=deployment` makes it the default
    * ([[graft.core.Profile]]).
    */
  def exactSums(spark: SparkSession): Boolean =
    graft.core.Profile.exactKnob(spark, "graft.sums.exact")

  /** SUM over doubles honoring the exactness knob. */
  def decSum(spark: SparkSession)(c: Column): Column =
    if (exactSums(spark)) sum(c.cast(DecimalType(18, 6))).cast("double")
    else sum(c)

  /** Windowed SUM honoring the exactness knob. */
  def decSumOver(spark: SparkSession)(c: Column, w: WindowSpec): Column =
    if (exactSums(spark)) sum(c.cast(DecimalType(18, 6))).over(w).cast("double")
    else sum(c).over(w)
}
