package graft.tools

import graft.core.{Session, Tables}
import graft.functions.SimilarityOps
import org.apache.spark.sql.functions._

/** Dev scratch: decompose the banded pipeline's wall time at a crossover
  * corpus size — candidate generation vs distinct vs embedding re-join vs
  * verify — to find which stage carries the unexplained per-row constant
  * (ProfileCrossover r6: banded ~0.65 ms/vector regardless of shape).
  */
object TimeBanded {
  def main(args: Array[String]): Unit = {
    val spark = Session.local(32, "time-banded")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
    import spark.implicits._
    val dir = if (args.nonEmpty) args(0) else "/tmp/graft_crossover/n20000"
    val shape = if (args.length > 1) args(1) else "8x8"
    val Array(t, p) = shape.split("x").map(_.toInt)
    graft.plans.GraftFunctions.register(spark)

    def time(label: String)(f: => Long): Unit = {
      f // warm
      val t0 = System.nanoTime(); val n = f
      println(f"TIMEBANDED $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2fs rows=$n")
    }

    val e = Tables.embeddings(spark, dir)
    time("corpus_scan")(e.count())

    // stage 1: bucketing via the native lsh_buckets kernel (the composed
    // CASE WHEN dot_product form this replaced measured 5.5 s FORCED at 20k
    // — 275 µs/row of boxed literal access; count() alone was 0.25 s only
    // because column pruning dropped the dots entirely)
    val bucketed = e.select($"vec_id",
      posexplode(expr(s"lsh_buckets(embedding, $t, $p)")).as(Seq("tbl", "bucket")))
    time("bucketing_explode")(bucketed.count())
    time("bucketing_forced")(
      bucketed.agg(sum($"bucket")).head().getLong(0))

    // stage 2: self-join candidate volume (pre-distinct)
    val raw = bucketed.select($"tbl", $"bucket", $"vec_id".as("v1"))
      .join(bucketed.select($"tbl", $"bucket", $"vec_id".as("v2")), Seq("tbl", "bucket"))
      .filter($"v1" < $"v2")
    time("selfjoin_raw_pairs")(raw.count())

    // stage 3: distinct pairs
    val cand = SimilarityOps.lshCandidateIds(spark, dir, t, p)
    time("candidates_distinct")(cand.count())

    // stage 4: re-join embeddings + verify
    val verified = cand
      .join(e.select($"vec_id".as("v1"), $"embedding".as("e1")), Seq("v1"))
      .join(e.select($"vec_id".as("v2"), $"embedding".as("e2")), Seq("v2"))
      .withColumn("cos", expr("cosine_sim(e1, e2)"))
      .filter($"cos" >= 0.4)
    time("rejoin_verify")(verified.count())

    // full production query for reference
    spark.conf.set("graft.sim.exact", "false")
    Seq("pairs", "samelabel", "cosdedup")
      .foreach(k => spark.conf.set(s"graft.sim.bands.$k", shape))
    time("full_pairs_threshold") {
      SimilarityOps.pairsAboveThreshold(spark, dir).write
        .format("noop").mode("overwrite").save(); 0L
    }
    spark.stop()
  }
}
