package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): times the headline query set from
  * BASELINE.md on SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Methodology:
  *  - one warmup query absorbs session/JIT/codegen-compiler startup so the
  *    numbers measure the queries, not the JVM;
  *  - results sink to the noop format — `count()` would let the optimizer
  *    prune the expensive expressions out of the measured plan.
  */
object Bench {
  /** Headline set (BASELINE.md "Bench query set"). */
  val headline: Seq[String] = Seq(
    "q1_pricing_summary",   // scan→filter→agg→sort
    "text_wordcount",       // tokenize→explode→agg
    "text_grep",            // regex extract→agg→sort desc
    "rel_global_sort",      // total-order sort (TeraSort stand-in)
    "rel_topk",             // TakeOrderedAndProject
    "join_3way_agg",        // customer⋈orders⋈lineitem
    "join_broadcast_dims",  // broadcast dim joins
    "join_override",        // snapshot-merge full_outer+coalesce
    "agg_value_histogram",  // per-key histogram re-agg
    "evt_tumbling",         // 10-min event-time windows
    "rel_secondary_sort",   // per-key ordered window
    "dedup_minhash_lsh",    // MinHash+LSH banding + verify
    "sim_cosine_topk")      // brute-force cosine top-k (codegen expr)

  /** One dependency chain of `n` XXH64 long hashes — the fixed work unit
    * behind BOTH calibration anchors below (the chain defeats ILP and
    * DCE, so its wall tracks scalar CPU speed, not issue width). */
  private def chain(seed: Long, n: Long): Long = {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    var h = seed
    var i = 0L
    while (i < n) { h = XXH64.hashLong(h + i, 42L); i += 1 }
    h
  }

  /** Machine-window calibration anchor (round 15 — r13 brief #4, validated
    * by three uniform drift/recovery cycles on byte-identical code: r12
    * 6.61 s → r13 7.26 s → r14 6.80 s officials with zero source change).
    * One FIXED-WORK, Spark-free, single-threaded CPU figure — 50M chained
    * XXH64 long hashes — tracking scalar CPU speed under the current
    * machine load. Reported as `calib_sec` in the bench JSON: two rounds'
    * totals divide out their calib ratio before anyone reads a drift as a
    * regression. min-of-3 inside one run; the chain result is folded into
    * a side-effect so the JIT cannot elide the loop.
    */
  private def calibSec(): Double = {
    def pass(): (Double, Long) = {
      val t0 = System.nanoTime()
      val h = chain(42L, 50000000L)
      ((System.nanoTime() - t0) / 1e9, h)
    }
    val runs = Seq.fill(3)(pass())
    // the hash values are data-dependent on the full chain: printing one
    // keeps every iteration observable (stderr, not the JSON line)
    System.err.println(s"[bench] calib chain=${runs.head._2}")
    runs.map(_._1).min
  }

  /** Multi-threaded twin of [[calibSec]]: the SAME fixed work per thread
    * on every available core at once, reporting the wall of the slowest
    * thread (min-of-3 rounds). The single-threaded anchor tracks scalar
    * CPU speed (frequency/thermal state); this one additionally feels
    * CO-TENANT CORE CONTENTION — the round-15 closing window measured
    * query totals +25% with the single-threaded anchor UNMOVED (0.463 s
    * in both windows), proving that window was parallel-throughput
    * contention, invisible to one pinned thread. Reading rule: totals
    * drifting with calib_mt_sec (and calib_sec flat) = contended machine;
    * both flat with totals moved = look at the code. The thread count
    * rides the JSON as `calib_mt_threads`: per-thread work is fixed, so
    * the figure is only comparable between runs at the SAME width — a
    * resized machine (or a different cpus dial) would move it for
    * capacity reasons, and the recorded width lets a reader tell the two
    * apart instead of mis-reading a resize as contention.
    */
  private def calibMtSec(): (Int, Double) = {
    val threads = Runtime.getRuntime.availableProcessors()
    def pass(): Double = {
      val t0 = System.nanoTime()
      val ts = (0 until threads).map { t =>
        val th = new Thread(() => { val h = chain(42L + t, 20000000L); if (h == 0) System.err.println("") })
        th.start(); th
      }
      ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }
    (threads, (1 to 3).map(_ => pass()).min)
  }

  /** Locale-independent 4-decimal JSON number — Locale.ROOT, not the
    * f-interpolator (round-16 advice #4): f"" formats with the JVM
    * default locale, and a comma-decimal locale (fr_FR, de_DE) would turn
    * the one-line bench contract into invalid JSON. Double.toString (the
    * min-of-passes values in `toJson`) is locale-independent already;
    * only %-style formatting isn't.
    */
  private[graft] def num4(d: Double): String = core.Fmt.num(d, 4)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // deployment arithmetic: plain double sums (the decimal-exact path is
      // a reproducibility feature the correctness gate uses — see QueryPack)
      .config("graft.sums.exact", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(name: String): Double = {
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    // Steady-state methodology: one untimed pass first. Whole-stage codegen
    // compiles each query's generated classes on first execution (janino) —
    // a fixed per-plan cost that would dwarf the tiny-SF data cost and is
    // irrelevant at the target scale. Then `passes` timed passes, reporting
    // the min: single-pass numbers on a shared machine carry ~±15% noise
    // (observed round-over-round: the same build measured 7.0s and 9.6s
    // under different machine load), so more passes = tighter min.
    headline.foreach(run)

    // malformed or non-positive values fall back to 7 (min-of-3 was not
    // enough: identical builds measured 24-32% apart round-over-round on a
    // shared machine) — a crash here would discard the already-run warmup
    // and 0 passes would silently report the -1 failure sentinel for every
    // query; values above 20 clamp to 20 (an unbounded typo like 300 would
    // multiply bench wall-clock 100×), with a stderr note so an
    // asked-for-25 run doesn't silently measure less
    val passes = sys.env.get("SPARK_GRAFT_BENCH_PASSES")
      .flatMap(_.toIntOption).filter(_ > 0)
      .map { p =>
        if (p > 20) System.err.println(s"[bench] SPARK_GRAFT_BENCH_PASSES=$p clamped to 20")
        math.min(p, 20)
      }.getOrElse(7)
    // one measurement methodology for every block: min of `passes` timed
    // runs (failures excluded; all-failed → the -1 sentinel). Passes are
    // ROUND-ROBIN over the whole set, not consecutive per query: the round-6
    // official bench showed the first four queries of the set drifting
    // +18-61% while a re-run on identical code showed a DIFFERENT contiguous
    // block drifting — shared-machine load spikes span seconds, so 7
    // back-to-back passes of one ~0.3 s query all land inside one spike and
    // min-of-7 can't discard it. Interleaving spreads each query's passes
    // across the whole measurement window, so a spike costs every query at
    // most one or two of its passes.
    // carries every raw pass alongside the min: dispersion is what
    // distinguishes machine-load noise from a code regression (a load
    // spike shows as one or two outlier samples over a tight floor; a
    // regression lifts every sample) — round 7's drift dispute took four
    // extra ritual runs to settle because only the min was recorded
    // diagnostic order toggle (round 8): SPARK_GRAFT_BENCH_ORDER=consecutive
    // restores the pre-r7 all-passes-per-query order, which gives each
    // query hot-loop JIT/cache locality across its passes — the regime the
    // r5/r6 historical mins were measured under. Round-robin (the default,
    // and the official methodology) trades that locality for load-spike
    // robustness; comparing the two in ONE window separates "methodology
    // floor shift" from "machine load" when a historical min looks
    // unreachable.
    val consecutive = sys.env.get("SPARK_GRAFT_BENCH_ORDER").contains("consecutive")
    def measure(names: Seq[String]): Seq[(String, Double, Seq[Double])] = {
      val ordered =
        if (consecutive) names.flatMap(n => Seq.fill(passes)(n))
        else Seq.fill(passes)(names).flatten
      val times = ordered.map(n => n -> run(n))
        .groupMap(_._1)(_._2)
      names.map { n =>
        val all = times(n)
        val ok = all.filter(_ >= 0)
        (n, if (ok.isEmpty) -1.0 else ok.min, all)
      }
    }
    def toJson(results: Seq[(String, Double, Seq[Double])]): String =
      results.map { case (k, v, _) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    def samplesJson(results: Seq[(String, Double, Seq[Double])]): String =
      results.map { case (k, _, all) =>
        "\"" + k + "\":" + all.map(num4).mkString("[", ",", "]")
      }.mkString("{", ",", "}")
    val results = measure(headline)
    val qs = toJson(results)
    val total = results.map(_._2).filter(_ >= 0).sum

    // second block: the banded-LSH scale paths (graft.sim.exact=false) —
    // the configuration a 100 TB deployment runs the similarity/dedup
    // family under. Separate JSON key so the headline block (and its
    // total) stays comparable round-over-round.
    val bandedSet = Seq("sim_pairs_threshold", "sim_nearest_same_label",
      "dedup_embedding_cosine", "dedup_ngram_jaccard")
    spark.conf.set("graft.sim.exact", "false")
    bandedSet.foreach(run) // warmup: banded plans codegen fresh classes
    val bandedResults = measure(bandedSet)
    val bq = toJson(bandedResults)
    spark.conf.set("graft.sim.exact", "true")
    // calibration anchor AFTER the measured passes: it shares the window
    // that produced them without stealing cache/CPU warmth from the first
    // warmup, and a load spike during measurement shows up in it
    val calib = calibSec()
    val (calibMtThreads, calibMt) = calibMtSec()
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"banded":$bq,""" +
      s""""calib_sec":${num4(calib)},"calib_mt_sec":${num4(calibMt)},"calib_mt_threads":$calibMtThreads,""" +
      s""""samples":${samplesJson(results)},"banded_samples":${samplesJson(bandedResults)},"sf":"$sfDir"}"""
    println(line)
    // LOUD failure surface (round-8 lesson: three headline queries silently
    // reported the -1.0 sentinel for a whole round). Named on stdout next to
    // the JSON so any reader of the bench output sees the breakage.
    val benchFailed = (results ++ bandedResults).collect { case (n, v, _) if v < 0 => n }
    if (benchFailed.nonEmpty)
      println(s"[bench-FAILED] ${benchFailed.size} queries errored: ${benchFailed.mkString(", ")}")
    // sbt prefixes stdout with "[info] ", which defeated the driver's JSON
    // parse in round 1 — also write the line to a file it can read directly
    // (cwd and, when launched elsewhere, the known repo root). Both copies
    // are convenience fallbacks: never fail the run over a read-only cwd
    // after the measurements already printed.
    def tryWrite(p: java.nio.file.Path): Unit =
      try java.nio.file.Files.writeString(p, line)
      catch { case scala.util.control.NonFatal(e) =>
        System.err.println(s"[bench] convenience copy $p skipped: ${e.getMessage}") }
    tryWrite(java.nio.file.Paths.get("bench_result.json"))
    val repoRoot = java.nio.file.Paths.get("/root/repo")
    if (java.nio.file.Files.isDirectory(repoRoot) && !java.nio.file.Files.isSameFile(
        repoRoot, java.nio.file.Paths.get("").toAbsolutePath))
      tryWrite(repoRoot.resolve("bench_result.json"))
    spark.stop()
  }
}
