package graft.tools

import graft.core.Session
import graft.functions.{BandTuner, DedupOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Document-side (MinHash) crossover measurement — round 7's answer to the
  * round-6 gap "the MinHash banded route's only win is at 5k documents".
  * Generates a near-dup-structured Zipfian document corpus at 10–50× the
  * sf0.1 document count (50k–250k), A/Bs exact n-gram Jaccard against the
  * banded MinHash route through the REAL `ngramJaccard` knob, and
  * validates [[BandTuner.suggestMinhash]]'s sampled candidate-fraction
  * prediction against the measured candidate count — the same
  * loop-closing the embedding side got in round 6.
  *
  * Corpus shape (honest, not rigged): tokens drawn Zipf(0.7) from an
  * 8k-word vocabulary — real text is Zipfian, and moderately-hot shingles
  * are exactly why the exact shingle self-join is the documented 100 TB
  * killer; 70% original docs of 60 tokens, 30% near-dups mutating each
  * token of an original with p=0.05 (3-shingle survival 0.95³ ≈ 0.857 →
  * Jaccard ≈ 0.75, comfortably above the 0.5 verify threshold and at the
  * concentration the advisor prices).
  *
  * Usage: `runMain graft.tools.ProfileDocsCrossover [n1 n2 ...]`
  * (default 50000 250000). Results recorded in SCALE.md.
  */
object ProfileDocsCrossover {
  val Vocab = 8000
  val DocLen = 60
  /** Token-frequency skew. 0.7 is mildly Zipfian (both routes stay
    * linear-dominated); classic natural-language Zipf is s ≈ 1.0, where
    * the hottest shingles appear in percent-level fractions of all slots
    * and the exact self-join's Σ count² term explodes — override via
    * SPARK_GRAFT_DOCSX_ZIPF to measure that regime.
    */
  val ZipfS: Double = sys.env.get("SPARK_GRAFT_DOCSX_ZIPF")
    .map(s => s.toDoubleOption.getOrElse(sys.error(
      s"SPARK_GRAFT_DOCSX_ZIPF must be a Zipf exponent, got '$s'")))
    .getOrElse(0.7)
  val OrigFrac = 0.7
  val MutateP = 0.05

  private lazy val cum: Array[Double] = {
    val w = Array.tabulate(Vocab)(k => 1.0 / math.pow(k + 1.0, ZipfS))
    val c = w.scanLeft(0.0)(_ + _).drop(1)
    val t = c.last
    c.map(_ / t)
  }

  def generateDocs(spark: SparkSession, n: Int, seed: Int = 13): String = {
    import spark.implicits._
    val nOrig = math.max(1, (n * OrigFrac).toInt)
    // distributed, deterministic per doc_id: a dup regenerates its base's
    // tokens from the base's seed, so no driver-side corpus materializes
    // (250k × 60 tokens stays executor-side; the driver ships only scalars).
    // Everything the lambda touches is a LOCAL copy — referencing the
    // enclosing object's members would drag the non-serializable object
    // into the task closure.
    val (cumL, vocab, docLen, mutP) = (cum, Vocab, DocLen, MutateP)
    val docs = spark.range(n).map { i =>
      def sampleWordL(r: scala.util.Random): String = {
        val u = r.nextDouble()
        val k = java.util.Arrays.binarySearch(cumL, u)
        "w" + (if (k >= 0) k else -k - 1)
      }
      def tokensOf(id: Long): Array[String] = {
        val r = new scala.util.Random(seed * 1000003L + id)
        Array.fill(docLen)(sampleWordL(r))
      }
      val text =
        if (i < nOrig) tokensOf(i).mkString(" ")
        else {
          val r = new scala.util.Random(seed * 7919L + i)
          tokensOf(i % nOrig)
            .map(t => if (r.nextDouble() < mutP) "w" + r.nextInt(vocab) else t)
            .mkString(" ")
        }
      (i, text)
    }.toDF("doc_id", "text")
    val dir = s"/tmp/graft_docs_crossover/n${n}_z${math.round(ZipfS * 100)}"
    docs.repartition(32).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  def main(args: Array[String]): Unit = {
    val sizes = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(50000, 250000)
    val spark = Session.local(32, "profile-docs-crossover")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", (64L << 20).toString)
    import spark.implicits._

    for (n <- sizes) {
      val dir = generateDocs(spark, n)
      println(s"DOCSX corpus n=$n dir=$dir")

      // the advisor first: what shape would a deployment be told, and what
      // candidate fraction does it predict from its 10k-doc sample?
      val advice = BandTuner.suggestMinhash(spark, dir, jaccard = 0.75)
      println(f"DOCSX n=$n advice shape=${advice.shape} " +
        f"predRecall=${advice.predictedRecall}%.4f " +
        f"predFrac=${advice.candidateFraction}%.6f " +
        f"predSpeedup=${advice.predictedSpeedup}%.1fx " +
        f"recommend=${advice.recommendBanded}")

      def run(): Unit = DedupOps.ngramJaccard(spark, dir)
        .write.format("noop").mode("overwrite").save()

      // SPARK_GRAFT_DOCSX_SKIP_EXACT: banded-only legs for corpora whose
      // exact self-join cannot finish (the Zipf-1.0 250k corpus spilled
      // past the disk budget — that explosion IS the measurement); recall
      // is then unavailable and printed as -1
      val skipExact = sys.env.contains("SPARK_GRAFT_DOCSX_SKIP_EXACT")
      val (tExact, exactOpt) =
        if (skipExact) (Double.NaN, None)
        else {
          spark.conf.set("graft.sim.exact", "true")
          val t = ProfileCrossover.timed(2)(run())
          (t, Some(DedupOps.ngramJaccard(spark, dir).localCheckpoint()))
        }
      val nExact = exactOpt.map(e => math.max(e.count(), 1L)).getOrElse(1L)

      // the advised shape, plus the gate's recall-heavy 8x2 for contrast
      for (shape <- Seq(advice.shape, "8x2").distinct) {
        spark.conf.set("graft.sim.exact", "false")
        spark.conf.set("graft.sim.bands.minhash", shape)
        val tBanded = ProfileCrossover.timed(2)(run())
        val banded = DedupOps.ngramJaccard(spark, dir).localCheckpoint()
        val found = exactOpt.map(e => e.select($"d1", $"d2")
          .join(banded.select($"d1", $"d2"), Seq("d1", "d2"), "left_semi").count())
          .getOrElse(-1L)

        // advisor validation: measured candidate fraction at this shape vs
        // the sample-predicted one (for the advised shape)
        val nCand = DedupOps.minhashCandidatesPlan(spark, dir).count()
        val allPairs = n.toDouble * (n - 1) / 2
        println(f"DOCSX n=$n shape=$shape%-5s exact=$tExact%8.2fs banded=$tBanded%8.2fs " +
          f"speedup=${tExact / tBanded}%5.2fx recall=${found.toDouble / nExact}%.4f " +
          f"pairs=$nExact")
        println(f"DOCSX n=$n shape=$shape%-5s advisor-validation " +
          f"measuredFrac=${nCand / allPairs}%.6f " +
          f"predictedFrac=${advice.candidateFraction}%.6f " +
          f"candidates=$nCand")
        spark.conf.unset("graft.sim.bands.minhash")
      }
      spark.conf.set("graft.sim.exact", "true")
    }
    spark.stop()
  }
}
