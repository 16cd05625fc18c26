package graft.tools

import graft.core.{Session, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev scaling experiment (not part of the driver contract): replicate the
  * sf0.1 lineitem N× in memory (fresh orderkeys per copy so join/group
  * cardinalities scale too) and time the headline shapes at 1×/2×/4×/8×.
  * If a plan's time grows ~linearly (n log n for sort) the shape holds as
  * data outgrows any single partition — the local proxy for the 100 TB
  * claim. Results recorded in SCALE.md.
  */
object ProfileScale {
  def main(args: Array[String]): Unit = {
    val spark = Session.local(32, "profile-scale")
    spark.conf.set("graft.sums.exact", "false")
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"

    val li = Tables.lineitem(spark, dir)
    val maxKey = li.agg(max($"l_orderkey")).as[Long].head() + 1

    def lineitemX(n: Int): DataFrame =
      (0 until n).map { i =>
        li.withColumn("l_orderkey", $"l_orderkey" + lit(i * maxKey))
      }.reduce(_ unionByName _)

    def time(f: => Unit): Double = {
      f // warm
      val t0 = System.nanoTime(); f
      (System.nanoTime() - t0) / 1e9
    }

    Seq(1, 2, 4, 8).foreach { n =>
      val l = lineitemX(n)
      val rows = l.count()
      val tQ1 = time {
        l.filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(sum($"l_quantity"), sum($"l_extendedprice" * (lit(1.0) - $"l_discount")),
            count(lit(1)))
          .write.format("noop").mode("overwrite").save()
      }
      val tSort = time {
        l.select($"l_shipdate", $"l_orderkey", $"l_linenumber", $"l_quantity")
          .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber")
          .write.format("noop").mode("overwrite").save()
      }
      val tAgg = time {
        l.groupBy($"l_orderkey")
          .agg(count(lit(1)).as("nl"), sum($"l_extendedprice").as("s"))
          .write.format("noop").mode("overwrite").save()
      }
      println(f"SCALE x$n rows=$rows q1=$tQ1%.2fs sort=$tSort%.2fs agg_by_key=$tAgg%.2fs")
    }
    spark.stop()
  }
}
