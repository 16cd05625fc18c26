package graft.tools

import graft.functions.{BandTuner, DedupOps, SimilarityOps}
import graft.core.Session
import org.apache.spark.sql.functions._

/** Probe-knob frontier for the EMBEDDING-DEDUP route (round 8): the
  * `graft.sim.probe.cosdedup` knob shipped in round 7 wired but
  * unmeasured — its recall/cost frontier was only known for the top-1
  * same-label family. This measures `dedup_embedding_cosine` on the
  * [[ProfileCrossover]] corpus: exact all-pairs once (baseline + truth),
  * then banded at gate/advisor shapes with probeBits swept, reporting
  *
  *  - wall time and speedup vs exact,
  *  - PAIR recall: |banded ∩ exact| / |exact| over the true ≥0.9-cosine
  *    neighbor pairs (the quantity LSH can miss),
  *  - ROW agreement: fraction of vectors whose (canonical_id,
  *    n_near_dups) output row equals exact's — the user-visible metric,
  *  - the advisor's predicted recall for each setting
  *    ([[BandTuner.pairRecallProbed]] priced at the corpus's two pair
  *    populations), and
  *  - the headroom a rescue analogue COULD buy: dedup has no per-row
  *    confidence signal (a missed pair is silent — nothing scores low),
  *    so the only rescuable population is vectors with ZERO banded
  *    candidates; the tool counts how many of those actually have a true
  *    neighbor, which bounds any no-candidate rescue tier's recall gain.
  *
  * Usage: `runMain graft.tools.ProfileDedupProbe [n] [shape[,shape...]]
  * [bits...]` (defaults: 100000, "8x4,auto", 0 1 2).
  */
object ProfileDedupProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val shapes = args.lift(1).getOrElse("8x4,auto")
      .toLowerCase.split(",").map(_.trim).toSeq
    val bits = if (args.length > 2) args.drop(2).map(_.toInt).toSeq else Seq(0, 1, 2)

    val spark = Session.local(32, "profile-dedup-probe")
    // same setting as ProfileProbe: keep the exact baseline on its best
    // plan (the broadcast nested-loop theta-join over the ~26 MB corpus)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (256L << 20).toString)
    import spark.implicits._

    val dir = ProfileCrossover.generate(spark, n)
    println(s"DEDUPPROBE corpus n=$n shapes=${shapes.mkString(",")} dir=$dir")

    def run(): Unit = DedupOps.embeddingCosineDedup(spark, dir)
      .write.format("noop").mode("overwrite").save()

    // exact truth, timed like the banded runs. The exact route is the full
    // n² theta-join (no label to slice by), so passes default to 1 at big n
    val exactPasses = sys.env.get("SPARK_GRAFT_DEDUPPROBE_EXACT_PASSES")
      .flatMap(_.toIntOption).filter(_ > 0).getOrElse(1)
    spark.conf.set("graft.sim.exact", "true")
    val tExact = ProfileCrossover.timed(exactPasses)(run())
    val exactRows = DedupOps.embeddingCosineDedup(spark, dir).localCheckpoint()

    // true neighbor-pair set (v1 < v2, cos ≥ 0.9, self excluded) — the
    // recall denominator. Derived once from the same theta-join the exact
    // route uses.
    val e = graft.core.Tables.embeddings(spark, dir)
    graft.plans.GraftFunctions.register(spark)
    val truePairs = e.select($"vec_id".as("v1"), $"embedding".as("e1"))
      .join(e.select($"vec_id".as("v2"), $"embedding".as("e2")), $"v1" < $"v2")
      .filter(expr("cosine_sim(e1, e2)") >= 0.9)
      .select($"v1", $"v2").localCheckpoint()
    val nTrue = math.max(truePairs.count(), 1L)
    val nRows = math.max(exactRows.count(), 1L)
    println(f"DEDUPPROBE n=$n exact=$tExact%7.2fs truePairs=$nTrue rows=$nRows")

    spark.conf.set("graft.sim.exact", "false")
    for (shape <- shapes; m0 <- bits) {
      val (t, p) =
        if (shape == "auto") {
          // threshold 0.9 = the route's verify filter AND where this
          // corpus's true pairs sit (clusters at σ=0.025 concentrate
          // within-cluster cosines ≈ 0.96+; 0.9 is the conservative floor)
          val a = BandTuner.suggest(spark, dir, threshold = 0.9, probeBits = m0)
          println(f"DEDUPPROBE advisor n=$n bits=$m0 shape=${a.shape} " +
            f"predRecall=${a.predictedRecall}%.4f " +
            f"predSpeedup=${a.predictedSpeedup}%.1fx recommend=${a.recommendBanded}")
          (a.nTables, a.planesPerTable)
        } else {
          val Array(t0, p0) = shape.split("x").map(_.trim.toInt)
          (t0, p0)
        }
      val m = math.min(m0, p)
      spark.conf.set("graft.sim.bands.cosdedup", s"${t}x$p")
      spark.conf.set("graft.sim.probe.cosdedup", m.toString)
      val tBanded = ProfileCrossover.timed(2)(run())

      // pair recall: candidates that survive the exact ≥0.9 verify filter,
      // against the true pair set (candidates are v1<v2-canonical already)
      val cand = SimilarityOps.lshCandidateIds(spark, dir,
          nTables = t, planesPerTable = p, probeBits = m)
        .join(e.select($"vec_id".as("v1"), $"embedding".as("e1")), Seq("v1"))
        .join(e.select($"vec_id".as("v2"), $"embedding".as("e2")), Seq("v2"))
        .filter(expr("cosine_sim(e1, e2)") >= 0.9)
        .select($"v1", $"v2").localCheckpoint()
      val found = truePairs.join(cand, Seq("v1", "v2"), "left_semi").count()

      // row agreement: the user-visible output (canonical + dup count)
      val bandedRows = DedupOps.embeddingCosineDedup(spark, dir)
      val agree = exactRows.join(bandedRows,
        Seq("vec_id", "canonical_id", "n_near_dups"), "left_semi").count()

      // rescue headroom: vectors with NO banded candidate but a true pair.
      // (candidates count a vector on either side; orphans touch neither)
      val touched = cand.select($"v1".as("v")).union(cand.select($"v2".as("v"))).distinct()
      val withTrue = truePairs.select($"v1".as("v"))
        .union(truePairs.select($"v2".as("v"))).distinct()
      val rescuable = withTrue.join(touched, Seq("v"), "left_anti").count()

      val predTight = BandTuner.pairRecallProbed(0.96, t, p, m)
      val predFloor = BandTuner.pairRecallProbed(0.90, t, p, m)
      println(f"DEDUPPROBE n=$n shape=${t}x$p bits=$m banded=$tBanded%7.2fs " +
        f"speedup=${tExact / tBanded}%5.2fx " +
        f"pairRecall=${found.toDouble / nTrue}%.4f " +
        f"rowAgree=${agree.toDouble / nRows}%.4f " +
        f"rescuableVecs=$rescuable " +
        f"pred(0.96)=$predTight%.4f pred(0.90)=$predFloor%.4f")
    }
    spark.stop()
  }
}
