package graft.tools

import graft.core.{Session, Tables}
import org.apache.spark.sql.functions._

/** Dev scratch: segment timing for the minhash pipeline (not part of the
  * driver contract).
  */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val spark = Session.local(32, "profile")
    import spark.implicits._
    val dir = "/root/testdata/sf0.1"
    def time[A](label: String)(f: => A): A = {
      f // warm
      val t0 = System.nanoTime(); val r = f
      println(f"SEGMENT $label%-30s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    spark.range(1000).count()
    time("full run") {
      graft.functions.DedupOps.minhashLsh(spark, dir).write.format("noop").mode("overwrite").save()
    }
    // segments
    val docs = Tables.documents(spark, dir)
    time("scan documents")(docs.write.format("noop").mode("overwrite").save())
    val sh = docs
      .select($"doc_id", split(regexp_replace(trim(lower(col("text"))), "\\s+", " "), " ").as("toks"))
      .select($"doc_id", explode(transform(
        sequence(lit(1), greatest(size($"toks") - lit(2), lit(1))),
        i => concat_ws(" ", slice($"toks", i, lit(3))))).as("shingle"))
    time("explode shingles")(sh.write.format("noop").mode("overwrite").save())
    val aggs = (0 until 16).map { i =>
      min(xxhash64(concat(lit(s"$i|"), col("shingle")))).as(s"mh_$i")
    }
    val sigs = sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
    time("signatures groupBy")(sigs.write.format("noop").mode("overwrite").save())
    val bandCols = (0 until 8).map { b =>
      struct(lit(b).as("band"),
        xxhash64((0 until 2).map(r => col(s"mh_${b * 2 + r}")): _*).as("bh"))
    }
    val candidates = sigs
      .select($"doc_id", explode(array(bandCols: _*)).as("bb"))
      .groupBy($"bb").agg(collect_set($"doc_id").as("docs"))
      .filter(size($"docs") > 1)
      .select(explode($"docs").as("d1"), $"docs")
      .select($"d1", explode($"docs").as("d2"))
      .filter($"d1" < $"d2")
      .distinct()
    time("candidates")(candidates.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
