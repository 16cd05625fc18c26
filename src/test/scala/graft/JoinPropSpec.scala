package graft

import graft.operators.Joins
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based check of the override join (SURVEY §7.4 risk 1: "easy to
  * get subtly wrong; property-test against a scala reference model").
  *
  * Model: folding snapshots left to right into a Map — later snapshots
  * shadow earlier ones per key, whole-record. The Spark implementation
  * (iterated full_outer + key-presence switch) must agree on arbitrary
  * N-ary inputs, including records with NULL payload columns (where a
  * per-column coalesce implementation would mix fields across snapshots).
  *
  * ScalaCheck generators are driven directly with fixed seeds (the
  * scalatest bridge isn't on the offline classpath, and each case costs
  * Spark jobs — a deterministic, bounded case list is preferable anyway).
  */
class JoinPropSpec extends SparkSpec {

  case class Rec(k: Int, v: Option[Int], tag: String)

  val genSnapshot: Gen[List[Rec]] = for {
    n <- Gen.choose(0, 12)
    recs <- Gen.listOfN(n, for {
      k <- Gen.choose(0, 9)
      v <- Gen.option(Gen.choose(-100, 100))
      t <- Gen.oneOf("a", "b", "c")
    } yield Rec(k, v, t))
  } yield recs.groupBy(_.k).map(_._2.head).toList // one record per key per snapshot

  val genSnapshots: Gen[List[List[Rec]]] =
    Gen.choose(2, 4).flatMap(n => Gen.listOfN(n, genSnapshot))

  test("override merge equals the fold-left map model on arbitrary N-ary inputs") {
    val cases = (0 until 10).flatMap { i =>
      genSnapshots.apply(Gen.Parameters.default, Seed(42L + i))
    }
    assert(cases.size >= 8, "generator must produce the planned cases")
    cases.foreach { snaps =>
      val model: Map[Int, Rec] =
        snaps.foldLeft(Map.empty[Int, Rec]) { (m, snap) =>
          m ++ snap.map(r => r.k -> r)
        }
      val dfs = snaps.map(s => spark.createDataFrame(s).toDF("k", "v", "tag"))
      val merged = Joins.overrideMerge(dfs, "k").collect()
        .map(r => r.getInt(0) -> Rec(r.getInt(0),
          if (r.isNullAt(1)) None else Some(r.getInt(1)), r.getString(2)))
        .toMap
      assert(merged == model,
        s"mismatch:\n merged=$merged\n model =$model\n snaps=$snaps")
    }
  }
}
