package graft.tools

import graft.core.Session

/** Dev scratch: segment timing for the minhash pipeline (not part of the
  * driver contract).
  */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val spark = Session.local(32, "profile")
    val dir = "/root/testdata/sf0.1"
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"SEGMENT $label%-30s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    // warmup
    spark.range(1000).count()
    time("full first run") {
      graft.functions.DedupOps.minhashLsh(spark, dir).write.format("noop").mode("overwrite").save()
    }
    time("full second run") {
      graft.functions.DedupOps.minhashLsh(spark, dir).write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
