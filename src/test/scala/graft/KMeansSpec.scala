package graft

import graft.functions.SimilarityOps
import org.apache.spark.sql.functions._

/** The k-means coarse quantizer (production IVF path): Lloyd rounds must
  * not worsen the objective, and the resulting index must retrieve as well
  * as the placeholder centroids it replaces. Float-iterative training has
  * no engine-exact oracle, so these properties are the correctness pin.
  */
class KMeansSpec extends SparkSpec {
  import spark.implicits._

  test("k-means: inertia non-increasing over Lloyd rounds; shapes correct") {
    val (cents, inertias) = SimilarityOps.kmeansCentroids(spark, sfDir)
    assert(cents.size == SimilarityOps.IvfCells)
    assert(cents.forall(_._2.size == SimilarityOps.Dim))
    assert(inertias.nonEmpty && inertias.size <= 10,
      s"expected 1..10 convergence-bounded rounds, got ${inertias.size}")
    inertias.sliding(2).foreach {
      case Seq(a, b) => assert(b <= a + 1e-9, s"inertia rose: $inertias")
      case _ =>
    }
  }

  test("k-means: convergence stop fires before the round cap on converged data") {
    // with a generous cap, Lloyd must terminate on the tolerance check, not
    // the cap — otherwise every training run pays maxRounds corpus scans
    val (_, inertias) = SimilarityOps.kmeansCentroids(spark, sfDir, maxRounds = 25)
    assert(inertias.size < 25,
      s"no early stop: ran all 25 rounds (inertias: $inertias)")
    val (last2, prev2) = (inertias.last, inertias(inertias.size - 2))
    assert(prev2 - last2 <= SimilarityOps.KmTol * math.max(prev2, SimilarityOps.KmTolFloor),
      s"stopped but not converged: $inertias")
  }

  test("zero-norm embeddings train cleanly and never seed a centroid (NaN guard)") {
    // failed encoders produce all-zero embeddings in real corpora; cosine
    // distance to the zero vector is NaN, which (unguarded) wins every
    // farthest-first comparison and poisons the whole assignment — and the
    // refit's x/|v| would throw DIVIDE_BY_ZERO under ANSI mode (this test
    // caught exactly that). Train on a corpus containing one zero vector:
    // seeding must skip it, the refit must exclude it (it has no
    // direction; it still gets ASSIGNED to a cell), Lloyd must complete,
    // and no centroid or inertia may be non-finite.
    import spark.implicits._
    val dim = 8
    val rnd = new scala.util.Random(7)
    val rows = (0L until 40L).map { i =>
      val emb = if (i == 3L) Seq.fill(dim)(0.0f)
                else Seq.fill(dim)(rnd.nextFloat() - 0.5f)
      (i, emb, (i % 4).toInt)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_zeronorm").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val (cents, inertias) = SimilarityOps.kmeansCentroids(spark, dir, k = 8, maxRounds = 3)
    assert(cents.size == 8)
    assert(cents.forall(_._2.forall(f => !f.isNaN && !f.isInfinite)),
      s"non-finite centroid component: $cents")
    assert(inertias.nonEmpty && inertias.forall(v => !v.isNaN), s"NaN inertia: $inertias")
    assert(cents.forall(_._2.exists(_ != 0.0f)), s"a zero vector became a centroid: $cents")
  }

  test("IVF over k-means centroids: nearest lands in brute-force top-3 for most queries") {
    val brute = SimilarityOps.cosineTopK(spark, sfDir)
      .select($"q_id", $"c_id").collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    val ivf = SimilarityOps.annIvfKmeansRaw(spark, sfDir)
      .select($"q_id", $"nearest_ivf").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hits = ivf.count { case (q, n) => brute.getOrElse(q, Set.empty).contains(n) }
    assert(ivf.size == 5, s"expected 5 query rows, got ${ivf.size}")
    assert(hits >= 3, s"k-means IVF recall too low: $hits/5 in brute-force top-3")
  }

  test("percentile sketch at deployment accuracy stays within rank-error tolerance") {
    // agg_percentiles_sketch runs at exactness-forcing accuracy for the hash
    // gate; deployments use the default 10000 → rank error <= n/10000. On
    // integer-valued l_quantity that bounds the value error to ~one step.
    val li = graft.core.Tables.lineitem(spark, sfDir)
    val rows = li.groupBy($"l_returnflag")
      .agg(
        expr("percentile_approx(l_quantity, 0.5, 10000)").as("approx"),
        expr("percentile(l_quantity, 0.5)").as("exact"))
      .collect()
    rows.foreach { r =>
      assert(math.abs(r.getDouble(1) - r.getDouble(2)) <= 1.0,
        s"approx p50 ${r.getDouble(1)} too far from exact ${r.getDouble(2)}")
    }
  }

  test("percentile sketch hash-gate premise: group sizes stay under exactness capacity at every gated SF") {
    // agg_percentiles_sketch is in the HASH gate on the premise that
    // percentile_approx at accuracy=1e6 degenerates to exact (rank error
    // eps*n = n/accuracy < 1). That premise silently breaks once a
    // l_returnflag group outgrows the capacity — guard it explicitly at
    // every scale factor the gate runs on, with 2x headroom.
    val accuracy = 1000000L
    val gated = Seq("sf0.001", "sf0.01", "sf0.1")
      .map(s => s"/root/testdata/$s")
      .filter(d => new java.io.File(s"$d/lineitem.parquet").exists())
    assert(gated.nonEmpty, "no gated testdata dirs found")
    gated.foreach { d =>
      val maxGroup = graft.core.Tables.lineitem(spark, d)
        .groupBy($"l_returnflag").count()
        .agg(max($"count")).head().getLong(0)
      assert(maxGroup * 2 <= accuracy,
        s"$d: max l_returnflag group $maxGroup within 2x of sketch capacity $accuracy — " +
          "raise the accuracy in Aggregates.percentilesSketch or demote the query to rows-only")
    }
  }
}
