package graft.operators

import graft.QueryPack
import graft.core.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Skew-mitigation helpers (SURVEY.md §7.2 step 9).
  *
  * First line of defense is AQE (`spark.sql.adaptive.skewJoin.enabled`,
  * on in `core.Session`): it splits oversized SHUFFLE-JOIN partitions at
  * runtime. These helpers cover the cases AQE doesn't:
  *
  *  - [[saltedAggregate]]: a hot GROUP BY key. AQE cannot split an
  *    aggregation partition (all rows of a key must meet), but an
  *    associative agg can run in two stages: stage 1 groups on
  *    (key, salt) — hot keys fan out over `salts` reducers — stage 2
  *    re-aggregates per key. The classic MR-era trick, kept relevant at
  *    100 TB for power-law keys (and exactly how the reference's Combiner
  *    mitigated the same problem on the map side).
  *  - [[saltedJoin]]: a skewed equi-join where the small side is too big
  *    to broadcast whole but each key's rows fit in memory. The big side
  *    gets a random salt in [0, salts); the small side is replicated
  *    `salts`× with every salt value; the join key becomes (key, salt).
  *    Hot keys spread over `salts` tasks at the cost of replicating the
  *    small side.
  *
  * Both are semantically transparent — `SkewSpec` asserts equality with
  * the unsalted plans.
  */
object Skew extends QueryPack {

  /** Two-stage aggregation over a salted key. `aggs` must be associative
    * pairs: (partial agg over the raw column, final re-agg over the partial
    * result column). Result column names come from the final stage.
    */
  def saltedAggregate(
      df: DataFrame,
      key: Column,
      salts: Int,
      partial: Seq[Column],
      finalAgg: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt", pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val stage1 = salted.groupBy(key.as("__key"), col("__salt"))
      .agg(partial.head, partial.tail: _*)
    stage1.groupBy(col("__key"))
      .agg(finalAgg.head, finalAgg.tail: _*)
  }

  /** Salted equi-join: `big` salted randomly, `small` replicated ×salts.
    * Join type inner/left on `bigKey === smallKey`.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      bigKey: String,
      smallKey: String,
      salts: Int,
      joinType: String = "inner"): DataFrame = {
    val saltedBig = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)))
    val replicatedSmall = small.withColumn("__salt",
      explode(sequence(lit(0L), lit((salts - 1).toLong))))
    saltedBig.join(replicatedSmall,
        saltedBig(bigKey) === replicatedSmall(smallKey) &&
          saltedBig("__salt") === replicatedSmall("__salt"),
        joinType)
      .drop("__salt")
  }

  /** Driver-gated witness: salted two-stage aggregation over lineitem's
    * 3-value `l_returnflag` — a genuinely hot key set (20k rows per key at
    * sf0.01, millions at scale; AQE cannot split an agg partition). Partial
    * sums go through decimal so the result is bit-identical to the unsalted
    * plan regardless of how the salt scattered rows — which is exactly the
    * property the oracle (a PLAIN group-by) checks.
    */
  def saltedAggQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    saltedAggregate(
        Tables.lineitem(spark, dir),
        $"l_returnflag", salts = 8,
        partial = Seq(
          sum($"l_quantity".cast(DecimalType(18, 6))).as("p_qty"),
          count(lit(1)).as("p_n")),
        finalAgg = Seq(
          sum($"p_qty").cast("double").as("sum_qty"),
          sum($"p_n").as("n")))
      .select($"__key".as("l_returnflag"), $"sum_qty", $"n")
      .orderBy($"l_returnflag")
  }

  /** Driver-gated witness: salted replicated join lineitem⋈part on partkey
    * (small side replicated ×4, big side randomly salted), then a brand
    * rollup. The oracle is the plain join + group-by: salting must be
    * invisible in the result.
    */
  def saltedJoinQuery(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    saltedJoin(
        Tables.lineitem(spark, dir),
        Tables.part(spark, dir),
        bigKey = "l_partkey", smallKey = "p_partkey", salts = 4)
      .groupBy($"p_brand")
      .agg(count(lit(1)).as("n"),
        sum($"l_extendedprice".cast(DecimalType(18, 6))).cast("double").as("sum_price"))
      .orderBy($"p_brand")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "skew_salted_agg" -> (saltedAggQuery _),
    "skew_salted_join" -> (saltedJoinQuery _))

  override def oracle: Map[String, String] = Map(
    "skew_salted_agg" ->
      """SELECT l_returnflag,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "skew_salted_join" ->
      """SELECT p_brand, COUNT(*) AS n,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_price
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |GROUP BY p_brand ORDER BY p_brand""".stripMargin)
}
