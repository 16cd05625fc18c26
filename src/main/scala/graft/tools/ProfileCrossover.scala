package graft.tools

import graft.core.Session
import graft.functions.{DedupOps, SimilarityOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev crossover experiment (not part of the driver contract): measure
  * where the banded-LSH routes BEAT the exact all-pairs baselines, and at
  * what recall.
  *
  * The driver's synthetic embeddings are near-uniform on the sphere —
  * LSH's documented worst case (no cluster structure to prune), so on the
  * gate corpus banded is slower than exact at every SF (SCALE.md r5). A
  * production near-dup corpus is the opposite: most qualifying pairs live
  * inside tight duplicate clusters. This tool builds that corpus — a
  * mixture of Gaussians on the unit sphere — at 10–50× the gate's vector
  * count and A/Bs exact vs banded for the three knobbed queries, reporting
  * wall time AND recall against the exact answer.
  *
  * Corpus: `n` vectors, 85% in ~n/50 clusters (unit center + σ=0.025
  * Gaussian noise, re-normalized → intra-cluster cosine ≈ 0.96, above both
  * the 0.9 dedup and 0.4 pairs thresholds), 15% uniform background
  * (pairwise cosine ~N(0, 1/64): mostly isolated, occasional borderline
  * pairs — the hard tail for LSH). Labels = cluster mod 8, so same-label
  * search stays an eighth-corpus problem, not a per-cluster one.
  *
  * Banded shape under test: [[Bands]] (default 8 tables × 8 planes = 256
  * buckets per table, overridable via SPARK_GRAFT_CROSSOVER_BANDS; applied
  * to all three routes via `graft.sim.bands.*`). At the default, intra-
  * cluster cosine 0.96 gives an 8-bit table collision of p≈0.47, so 8
  * tables give candidate recall 1-(1-0.47)^8 ≈ 0.994 for clustered pairs;
  * what banded genuinely misses is background pairs near the 0.4 threshold
  * (p≈0.03/table at 8 bits) and the same-label nearest of ISOLATED
  * vectors — the recall numbers below price that honestly. The first
  * measured shape (8×4 = 16 buckets/table) packed ~25 clusters per bucket
  * and LOST to exact despite high recall — bucket count must exceed
  * cluster count, which is why the shape is an env knob: re-measure at a
  * corpus-matched shape as n (and with it cluster count) grows
  * (SCALE.md round 6; [[graft.functions.BandTuner]] is the in-engine
  * advisor built on the same arithmetic).
  *
  * Fairness: exact gets a 256 MB broadcast threshold so its all-pairs join
  * broadcasts the full corpus instead of degrading to a partitioned
  * cartesian product (or, at 250k vectors, to a sort-merge join whose
  * per-key group buffering spills tens of GB).
  *
  * Usage: `runMain graft.tools.ProfileCrossover [n1 n2 ...]`
  * (default sizes 20000 50000 — 10× and 25× the sf0.1 corpus).
  * Results recorded in SCALE.md.
  */
object ProfileCrossover {
  val Dim: Int = SimilarityOps.Dim
  val Sigma = 0.025
  /** Uniform-background fraction — the isolated tail that is LSH's hard
    * population (no cluster to share a bucket with). 15% is a deliberately
    * adversarial stress tail; override via SPARK_GRAFT_CROSSOVER_BG to
    * model realistic near-dup corpora (round 7 measures 5% alongside).
    */
  val BgFrac: Double = sys.env.get("SPARK_GRAFT_CROSSOVER_BG")
    .map(s => s.toDoubleOption.getOrElse(sys.error(
      s"SPARK_GRAFT_CROSSOVER_BG must be a fraction, got '$s'")))
    .getOrElse(0.15)
  val ClusterSize = 50
  val NLabels = 8
  /** Default 8 tables × 8 planes: 256 buckets per table — the first
    * measured shape (8×4 = 16 buckets/table) packed ~25 clusters into
    * every bucket, making Σ|bucket|² comparable to n² and banded 4–5×
    * SLOWER than exact despite 0.95+ recall. The lesson is now codified in
    * [[SimilarityOps.bandShape]]: bucket count must exceed cluster count —
    * and since cluster count grows with n, override via
    * SPARK_GRAFT_CROSSOVER_BANDS to re-measure at corpus-matched shapes
    * (e.g. 8x10 = 1024 buckets for the ~2000-cluster 100k corpus).
    * Parsed eagerly so a malformed value fails at startup, not after the
    * expensive exact measurement pass.
    */
  val Bands: String = {
    val s = sys.env.getOrElse("SPARK_GRAFT_CROSSOVER_BANDS", "8x8")
    if (s.toLowerCase == "auto") s.toLowerCase
    else s.toLowerCase.split("x").map(t => scala.util.Try(t.trim.toInt)) match {
      case Array(scala.util.Success(t), scala.util.Success(p))
          if t > 0 && p > 0 && t * p <= graft.expr.Hyperplanes.Max => s
      case _ => sys.error(
        s"SPARK_GRAFT_CROSSOVER_BANDS must be '<tables>x<planes>' (or " +
          s"'auto' to let BandTuner.suggest pick per corpus) with " +
          s"tables*planes <= ${graft.expr.Hyperplanes.Max}, got '$s'")
    }
  }

  /** Resolve the shape for a generated corpus: the env value, or — in
    * `auto` mode — whatever [[graft.functions.BandTuner.suggest]] picks
    * from the corpus itself (threshold 0.96 = where the planted
    * intra-cluster pairs sit; round 7 closes the loop by letting the
    * ADVISOR choose the shape the measurement then validates, instead of
    * a human reading the cluster count off the generator).
    */
  def resolveBands(spark: SparkSession, dir: String): String =
    if (Bands != "auto") Bands
    else {
      val a = graft.functions.BandTuner.suggest(spark, dir, threshold = 0.96)
      println(f"CROSSOVER advisor shape=${a.shape} " +
        f"predRecall=${a.predictedRecall}%.4f " +
        f"predSpeedup=${a.predictedSpeedup}%.1fx recommend=${a.recommendBanded}")
      a.shape
    }

  def generate(spark: SparkSession, n: Int, seed: Int = 7): String = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    def unit(v: Array[Double]): Seq[Float] = {
      val nrm = math.sqrt(v.map(x => x * x).sum)
      v.map(x => (x / nrm).toFloat).toSeq
    }
    val nClusters = math.max(1, n / ClusterSize)
    val centers = Array.fill(nClusters)(unit(Array.fill(Dim)(rnd.nextGaussian())))
    val nBg = (n * BgFrac).toInt
    // driver-side generation: 100k × 64 floats is model-state scale (~26 MB);
    // a real 100 TB corpus arrives as data, it isn't synthesized
    val rows = (0 until n).map { i =>
      if (i < nBg)
        (i.toLong, unit(Array.fill(Dim)(rnd.nextGaussian())), rnd.nextInt(NLabels))
      else {
        val c = i % nClusters
        val v = Array.tabulate(Dim)(j => centers(c)(j) + Sigma * rnd.nextGaussian())
        (i.toLong, unit(v), c % NLabels)
      }
    }
    // dir carries the background fraction so corpora generated under
    // different SPARK_GRAFT_CROSSOVER_BG values never alias
    val dir = s"/tmp/graft_crossover/n${n}_bg${math.round(BgFrac * 100)}"
    rows.toDF("vec_id", "embedding", "label")
      .repartition(32).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  /** warm once, then min of `passes` timed noop-writes */
  def timed(passes: Int)(f: => Unit): Double = {
    f
    (1 to passes).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }.min
  }

  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(20000, 50000)
    val spark = Session.local(32, "profile-crossover")
    // 256 MB: keep the exact baseline on its best (broadcast-hash) plan at
    // 250k+ vectors — at 64 MB the ~70 MB embedding side flipped to a
    // sort-merge join whose per-group buffering spilled >50 GB (r7)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (256L << 20).toString)
    import spark.implicits._

    val queries = Seq[(String, String => DataFrame)](
      "pairs_threshold" -> (d => SimilarityOps.pairsAboveThreshold(spark, d)),
      "nearest_same_label" -> (d => SimilarityOps.nearestSameLabel(spark, d)),
      "embedding_cosine" -> (d => DedupOps.embeddingCosineDedup(spark, d)))

    for (n <- sizes) {
      val dir = generate(spark, n)
      val bands = resolveBands(spark, dir)
      println(s"CROSSOVER corpus n=$n dir=$dir bands=$bands")
      for ((name, build) <- queries) {
        spark.conf.set("graft.sim.exact", "true")
        Seq("pairs", "samelabel", "cosdedup")
          .foreach(k => spark.conf.set(s"graft.sim.bands.$k", bands))
        val tExact = timed(2)(build(dir).write.format("noop").mode("overwrite").save())
        val exact = build(dir).localCheckpoint() // pin the exact answer for recall
        spark.conf.set("graft.sim.exact", "false")
        val tBanded = timed(2)(build(dir).write.format("noop").mode("overwrite").save())
        val banded = build(dir).localCheckpoint()
        val recall = name match {
          case "pairs_threshold" =>
            val nExact = exact.count()
            val found = exact.select($"v1", $"v2")
              .join(banded.select($"v1", $"v2"), Seq("v1", "v2"), "left_semi").count()
            // the loose 0.4 threshold is LSH's hard case: collision
            // probability for a pair AT the threshold is only ~0.16 per
            // 8-plane table, so misses concentrate just above 0.4 — report
            // recall on confident pairs (cos >= 0.6) separately to show it
            val conf = exact.filter($"cos" >= 0.6)
            val nConf = conf.count()
            val foundConf = conf.select($"v1", $"v2")
              .join(banded.select($"v1", $"v2"), Seq("v1", "v2"), "left_semi").count()
            println(f"CROSSOVER n=$n pairs_threshold      " +
              f"recall_conf(cos>=0.6)=${foundConf.toDouble / math.max(nConf, 1)}%.4f " +
              f"over $nConf confident pairs")
            found.toDouble / math.max(nExact, 1)
          case "nearest_same_label" =>
            // a hit = banded's neighbor is as close as exact's (id may
            // differ on cosine ties); a vector banded has NO row for is a miss
            val j = exact.select($"vec_id", $"cos".as("c_ex"))
              .join(banded.select($"vec_id", $"cos".as("c_b")), Seq("vec_id"), "left")
            j.filter($"c_b" >= $"c_ex" - 1e-6).count().toDouble / math.max(exact.count(), 1)
          case _ => // embedding_cosine: canonical assignment agreement
            val j = exact.select($"vec_id", $"canonical_id".as("ce"))
              .join(banded.select($"vec_id", $"canonical_id".as("cb")), Seq("vec_id"), "left")
            j.filter($"cb" === $"ce").count().toDouble / math.max(exact.count(), 1)
        }
        println(f"CROSSOVER n=$n $name%-20s exact=$tExact%7.2fs banded=$tBanded%7.2fs " +
          f"speedup=${tExact / tBanded}%5.2fx recall=$recall%.4f")
      }
    }
    spark.stop()
  }
}
