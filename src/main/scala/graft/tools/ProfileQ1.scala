package graft.tools

import graft.core.{Session, Tables}
import org.apache.spark.sql.functions._

/** Dev scratch: decimal-exact vs double-sum Q1 cost. */
object ProfileQ1 {
  def main(args: Array[String]): Unit = {
    val spark = Session.local(32, "profile-q1")
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"
    def time[A](label: String)(f: => A): Unit = {
      f // warm
      val t0 = System.nanoTime(); f
      println(f"SEGMENT $label%-20s ${(System.nanoTime() - t0) / 1e9}%.2fs")
    }
    time("decimal q1") {
      graft.operators.Aggregates.q1PricingSummary(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    time("double q1") {
      Tables.lineitem(spark, dir)
        .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(sum($"l_quantity"), sum($"l_extendedprice"),
          sum($"l_extendedprice" * (lit(1.0) - $"l_discount")),
          avg($"l_quantity"), count(lit(1)))
        .orderBy($"l_returnflag", $"l_linestatus")
        .write.format("noop").mode("overwrite").save()
    }
    time("scan only") {
      Tables.lineitem(spark, dir).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
