package graft.tools

import graft.core.Session
import graft.functions.{DedupOps, SimilarityOps}

/** Dev scratch: A/B the `graft.sim.exact` knob — exact all-pairs baselines
  * vs the banded-LSH candidate paths — on the sf0.1 tables (2000 vectors,
  * 5000 documents).
  */
object ProfileExactness {
  def main(args: Array[String]): Unit = {
    val spark = Session.local(32, "profile-exactness")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val queries = Seq[(String, () => org.apache.spark.sql.DataFrame)](
      "pairs_threshold" -> (() => SimilarityOps.pairsAboveThreshold(spark, dir)),
      "nearest_same_label" -> (() => SimilarityOps.nearestSameLabel(spark, dir)),
      "embedding_cosine" -> (() => DedupOps.embeddingCosineDedup(spark, dir)),
      "ngram_jaccard" -> (() => DedupOps.ngramJaccard(spark, dir)))
    for ((label, f) <- queries; exact <- Seq(true, false)) {
      spark.conf.set("graft.sim.exact", exact.toString)
      f().write.format("noop").mode("overwrite").save() // warm
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        f().write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val mode = if (exact) "exact" else "banded"
      println(f"SEGMENT $label%-20s $mode%-7s min=${times.min}%.2fs med=${times.sorted.apply(1)}%.2fs")
    }
    spark.stop()
  }
}
