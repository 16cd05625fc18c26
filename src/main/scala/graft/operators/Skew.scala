package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

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
object Skew {

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
}
