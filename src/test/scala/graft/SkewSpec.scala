package graft

import graft.core.Tables
import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Salting is semantically transparent: salted plans must equal their
  * unsalted originals exactly (decimal sums keep the comparison exact
  * under the different accumulation orders salting introduces).
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("salted two-stage aggregation equals direct aggregation") {
    val o = Tables.orders(spark, sfDir)
    val direct = o.groupBy($"o_orderstatus".as("__key"))
      .agg(count(lit(1)).as("n"),
        sum($"o_totalprice".cast(DecimalType(18, 6))).cast("double").as("sum_price"))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
    val salted = Skew.saltedAggregate(
      o, $"o_orderstatus", salts = 8,
      partial = Seq(count(lit(1)).as("pc"),
        sum($"o_totalprice".cast(DecimalType(18, 6))).as("ps")),
      finalAgg = Seq(sum($"pc").as("n"), sum($"ps").cast("double").as("sum_price")))
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getDouble(2)))).toMap
    assert(salted == direct)
  }

  test("salted join equals plain join") {
    val o = Tables.orders(spark, sfDir).select($"o_orderkey", $"o_custkey")
    val c = Tables.customer(spark, sfDir).select($"c_custkey", $"c_mktsegment")
    val plain = o.join(c, $"o_custkey" === $"c_custkey")
      .select($"o_orderkey", $"c_mktsegment")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val salted = Skew.saltedJoin(o, c, "o_custkey", "c_custkey", salts = 4)
      .select($"o_orderkey", $"c_mktsegment")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted == plain)
    assert(plain.nonEmpty)
  }
}
