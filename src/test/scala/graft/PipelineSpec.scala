package graft

import graft.core.Tables
import graft.operators.Pipeline
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The config-driven runner must produce the same plans as hand-written
  * DataFrame code — including Catalyst optimizations applying through it.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("configured pipeline equals hand-written equivalent") {
    val piped = Pipeline.run(spark, sfDir, Seq(
      "read:orders",
      "filter:o_totalprice > 100000.0",
      "agg:o_orderstatus|ValueCount:o_orderkey,DoubleValueSum:o_totalprice",
      "orderBy:o_orderstatus")).collect().map(_.toString)
    val direct = Tables.orders(spark, sfDir)
      .filter($"o_totalprice" > 100000.0)
      .groupBy($"o_orderstatus")
      .agg(count($"o_orderkey").as("cnt_o_orderkey"),
        sum($"o_totalprice".cast(DecimalType(18, 6))).cast("double").as("sum_o_totalprice"))
      .orderBy($"o_orderstatus").collect().map(_.toString)
    assert(piped.sameElements(direct))
  }

  test("configured filter is pushed down to the parquet scan") {
    val df = Pipeline.run(spark, sfDir, Seq(
      "read:lineitem",
      "filter:l_quantity > 45.0",
      "select:l_orderkey, l_quantity"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)"),
      s"configured filter not pushed into scan:\n$plan")
  }

  test("select supports expressions and aliases, limit caps rows") {
    val df = Pipeline.run(spark, sfDir, Seq(
      "read:documents",
      "select:doc_id, concat(lang, '-', source) AS tag",
      "orderBy:doc_id",
      "limit:7"))
    val rows = df.collect()
    assert(rows.length == 7)
    assert(rows.forall(_.getString(1).contains("-")))
  }

  test("unknown verbs fail loudly") {
    intercept[IllegalArgumentException] {
      Pipeline.run(spark, sfDir, Seq("read:orders", "frobnicate:x"))
    }
  }
}
