package graft.tools

import graft.core.Session
import graft.functions.{BandTuner, SimilarityOps}
import org.apache.spark.sql.functions._

/** Multi-probe LSH measurement (round 7): does query-side probing lift
  * same-label top-1 recall from the measured 0.86–0.88 (SCALE.md round 6,
  * "isolated-vector LSH physics") toward ≥0.95 at ≤2× the unprobed banded
  * time? Runs `nearest_same_label` on the [[ProfileCrossover]] corpus:
  * exact once (baseline + truth), then banded at the corpus-matched shape
  * with probeBits ∈ {0, 1, 2, 4}, reporting wall time, top-1 recall, and
  * the advisor's predicted recall for each setting.
  *
  * Usage: `runMain graft.tools.ProfileProbe [n] [shape[,shape...]] [bits...]`
  * (defaults: 100000, SPARK_GRAFT_CROSSOVER_BANDS or 8x10, 0 1 2 4) —
  * several comma-separated shapes share one exact baseline measurement.
  */
object ProfileProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(100000)
    val shapes = args.lift(1).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_CROSSOVER_BANDS", "8x10"))
      .toLowerCase.split(",").map(_.trim).toSeq
    val bits = if (args.length > 2) args.drop(2).map(_.toInt).toSeq else Seq(0, 1, 2, 4)

    val spark = Session.local(32, "profile-probe")
    // 256 MB: keep the exact baseline on its best (broadcast-hash) plan at
    // 250k+ vectors — at 64 MB the ~70 MB embedding side flipped to a
    // sort-merge join whose per-group buffering spilled >50 GB (r7)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (256L << 20).toString)
    import spark.implicits._

    val dir = ProfileCrossover.generate(spark, n)
    println(s"PROBE corpus n=$n shapes=${shapes.mkString(",")} dir=$dir")

    def run(): Unit = SimilarityOps.nearestSameLabel(spark, dir)
      .write.format("noop").mode("overwrite").save()

    // debug: print the exact query's plan and exit (no execution)
    if (sys.env.contains("SPARK_GRAFT_PROBE_EXPLAIN")) {
      spark.conf.set("graft.sim.exact", "true")
      SimilarityOps.nearestSameLabel(spark, dir).explain("formatted")
      spark.stop(); return
    }

    // exact truth: timed like the banded runs, pinned for recall.
    // SPARK_GRAFT_PROBE_EXACT_PASSES trims the exact timing loop at big n
    // (250k exact is ~minutes per pass; the banded-shape comparison is the
    // point there, exact is baseline + truth)
    val exactPasses = sys.env.get("SPARK_GRAFT_PROBE_EXACT_PASSES")
      .flatMap(_.toIntOption).filter(_ > 0).getOrElse(2)
    spark.conf.set("graft.sim.exact", "true")
    val tExact = ProfileCrossover.timed(exactPasses)(run())
    val exact = SimilarityOps.nearestSameLabel(spark, dir).localCheckpoint()
    val nExact = math.max(exact.count(), 1L)
    println(f"PROBE n=$n exact=$tExact%7.2fs rows=$nExact")

    spark.conf.set("graft.sim.exact", "false")
    // the measurement sweeps rescue floors whose unresolved fraction
    // exceeds the production refusal knob (the 15%-background corpus at
    // rescue 0.6 unresolves ~15% — exactly what the round-8 guard
    // refuses by default); accept everything here so the sweep can PRICE
    // those configurations. Past BroadcastSafeRescueFrac the engine
    // routes them through the shuffled rescue join, so the timings below
    // are the post-guard production path for fat tails.
    spark.conf.set("graft.sim.rescue.maxfrac.samelabel", "1.0")
    val rescues = sys.env.getOrElse("SPARK_GRAFT_PROBE_RESCUE", "0,0.8")
      .split(",").map(_.trim.toDouble).toSeq
    for (shape <- shapes; m0 <- bits) {
      // "auto" = the advisor picks the shape for THIS corpus and probe
      // setting (round 7, task: crossover rows where the shape came from
      // suggest, not a human); hoisted above the rescue loop — the advice
      // depends only on (shape, bits)
      val (t, p) =
        if (shape == "auto") {
          val a = BandTuner.suggest(spark, dir, threshold = 0.96, probeBits = m0)
          println(f"PROBE advisor n=$n bits=$m0 shape=${a.shape} " +
            f"predRecall=${a.predictedRecall}%.4f " +
            f"predSpeedup=${a.predictedSpeedup}%.1fx recommend=${a.recommendBanded}")
          (a.nTables, a.planesPerTable)
        } else {
          val Array(t0, p0) = shape.split("x").map(_.trim.toInt)
          (t0, p0)
        }
      // clamp like the production knob does — a bits value past this
      // shape's planes would otherwise measure the clamped route but then
      // throw from pairRecallProbed AFTER the expensive timed run
      val m = math.min(m0, p)
      for (r <- rescues) {
      spark.conf.set("graft.sim.bands.samelabel", s"${t}x$p")
      spark.conf.set("graft.sim.probe.samelabel", m.toString)
      spark.conf.set("graft.sim.rescue.samelabel", r.toString)
      val tBanded = ProfileCrossover.timed(2)(run())
      val banded = SimilarityOps.nearestSameLabel(spark, dir).localCheckpoint()
      // a hit = banded's neighbor is as close as exact's (id may differ on
      // ties); a vector banded has NO row for is a miss — same rule as
      // ProfileCrossover
      val j = exact.select($"vec_id", $"cos".as("c_ex"))
        .join(banded.select($"vec_id", $"cos".as("c_b")), Seq("vec_id"), "left")
        .withColumn("hit", ($"c_b" >= $"c_ex" - 1e-6).cast("long"))
        .localCheckpoint()
      val recall = j.agg(sum($"hit")).head.getLong(0).toDouble / nExact
      // recall by population: vec_id < nBg are the uniform background (no
      // cluster to share a bucket with — LSH's hard case), the rest
      // clustered. The split shows WHERE the misses live.
      val nBg = (n * ProfileCrossover.BgFrac).toInt
      val Seq((bgHit, bgN), (clHit, clN)) = Seq(
        j.filter($"vec_id" < nBg), j.filter($"vec_id" >= nBg))
        .map(d => (d.agg(coalesce(sum($"hit"), lit(0L))).head.getLong(0),
          math.max(d.count(), 1L)))
      // the advisor's floor for this setting: price recall at the cosine
      // where the corpus's true nearest neighbors actually sit (the
      // clustered corpus concentrates same-cluster NNs near 1 - sigma²
      // ≈ 0.97; isolated/background vectors sit much lower, which is the
      // regime probing targets — print both ends)
      val predTight = BandTuner.pairRecallProbed(0.97, t, p, m)
      val predLoose = BandTuner.pairRecallProbed(0.60, t, p, m)
      println(f"PROBE n=$n shape=${t}x$p bits=$m rescue=$r%.2f banded=$tBanded%7.2fs " +
        f"xSlower=${tBanded / tExact}%5.3f " +
        f"speedup=${tExact / tBanded}%5.2fx recall=$recall%.4f " +
        f"recall_bg=${bgHit.toDouble / bgN}%.4f(n=$bgN) " +
        f"recall_clustered=${clHit.toDouble / clN}%.4f " +
        f"pred(0.97)=$predTight%.4f pred(0.60)=$predLoose%.4f")
      }
    }
    spark.stop()
  }
}
