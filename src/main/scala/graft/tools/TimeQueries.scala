package graft.tools

import graft.core.Session
import graft.SparkEntry

/** Dev scratch: time arbitrary registered queries across scale factors —
  * the per-operator scaling measurement behind SCALE.md's tables.
  *
  * Usage: runMain graft.tools.TimeQueries <name> [<name>...]
  * Dirs come from SPARK_GRAFT_SF_DIRS (comma-separated, default
  * sf0.01,sf0.1). Methodology matches Bench: noop sink, one warmup,
  * min-of-3, plain-double sums.
  */
object TimeQueries {
  def main(args: Array[String]): Unit = {
    val spark = Session.local(32, "time-queries")
    spark.conf.set("graft.sums.exact", "false")
    val dirs = sys.env.getOrElse("SPARK_GRAFT_SF_DIRS",
      "/root/testdata/sf0.01,/root/testdata/sf0.1").split(",").toSeq
    for (name <- args.toSeq; dir <- dirs) {
      val fn = SparkEntry.queries(name)
      def run(): Double = {
        val t0 = System.nanoTime()
        fn(spark, dir).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      run() // warmup (codegen compile)
      val best = (1 to 3).map(_ => run()).min
      println(f"SEGMENT $name%-26s ${dir.split('/').last}%-8s min=$best%.2fs")
    }
    spark.stop()
  }
}
