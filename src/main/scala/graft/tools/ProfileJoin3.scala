package graft.tools

import graft.core.{Session, Tables}
import org.apache.spark.sql.functions._

/** Dev scratch: A/B the 3-way join shapes (direct vs eager pre-agg). */
object ProfileJoin3 {
  def main(args: Array[String]): Unit = {
    val spark = Session.local(32, "profile-join3")
    spark.conf.set("graft.sums.exact", "false")
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"
    def run(label: String)(f: => org.apache.spark.sql.DataFrame): Unit = {
      f.write.format("noop").mode("overwrite").save() // warm
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"SEGMENT $label%-12s min=${times.min}%.2fs med=${times.sorted.apply(1)}%.2fs")
    }
    run("direct") {
      Tables.customer(spark, dir)
        .join(Tables.orders(spark, dir), $"c_custkey" === $"o_custkey")
        .join(Tables.lineitem(spark, dir), $"o_orderkey" === $"l_orderkey")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_lines"),
          sum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"))
        .orderBy($"c_mktsegment")
    }
    run("eager") {
      val perOrder = Tables.lineitem(spark, dir)
        .groupBy($"l_orderkey")
        .agg(count(lit(1)).as("nl"),
          sum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("rev"))
      Tables.customer(spark, dir)
        .join(Tables.orders(spark, dir), $"c_custkey" === $"o_custkey")
        .join(perOrder, $"o_orderkey" === $"l_orderkey")
        .groupBy($"c_mktsegment")
        .agg(sum($"nl").as("n_lines"), sum($"rev").as("revenue"))
        .orderBy($"c_mktsegment")
    }
    spark.stop()
  }
}
