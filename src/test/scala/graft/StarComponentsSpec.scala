package graft

import graft.functions.DedupOps
import scala.util.Random

/** Convergence + correctness pins for the alternating large-star/small-star
  * connected-components core ([[DedupOps.starComponents]]), the round-12
  * replacement for the 25-round min-label loop that exited SILENTLY
  * un-converged on any >25-diameter near-dup chain (round 11's one `weak`
  * mark). The planted-chain tests here are exactly the shapes that loop
  * fractured; the round-count assertions pin the O(log) rate that makes
  * the new fail-loud cap unreachable.
  */
class StarComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def run(n: Long, pairs: Seq[(Long, Long)]): (Map[Long, Long], Int) = {
    val nodes = spark.range(n).select($"id".as("doc_id"))
    val edges = pairs.toDF("d1", "d2")
    val (labels, rounds) = DedupOps.starComponents(nodes, edges)
    (labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap, rounds)
  }

  test("30-hop chain (the shape the old 25-round min-label loop fractured)") {
    // path 0-1-2-…-30: diameter 30 > the removed cap; every node must
    // still reach label 0, in far fewer rounds than the diameter
    val (labels, rounds) = run(31, (0L until 30L).map(i => (i, i + 1)))
    assert(labels.values.toSet == Set(0L),
      s"chain fractured into ${labels.values.toSet.size} clusters after $rounds rounds")
    assert(rounds <= 10, s"path-31 should contract in O(log n) rounds, took $rounds")
  }

  test("300-node path converges in O(log n) rounds, not O(diameter)") {
    val (labels, rounds) = run(300, (0L until 299L).map(i => (i, i + 1)))
    assert(labels.values.toSet == Set(0L))
    assert(rounds <= 12, s"path-300 (diameter 299) took $rounds rounds — not log-rate")
  }

  test("random graphs match a driver-side union-find (seeded)") {
    val rnd = new Random(1742)
    for (trial <- 0 until 3) {
      val n = 60 + trial * 40
      val pairs = Seq.fill(n / 2)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      // reference answer: plain union-find over the same pairs
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); r }
      pairs.foreach { case (a, b) =>
        val (ra, rb) = (find(a.toInt), find(b.toInt))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = (0 until n).map { i =>
        // canonical = min id in component: path-compress to the root, which
        // is the min because unions always point larger roots at smaller
        i.toLong -> find(i).toLong
      }.toMap
      val (labels, rounds) = run(n, pairs)
      assert(labels == expected, s"trial $trial mismatch (rounds=$rounds)")
    }
  }

  test("self-loops, duplicate and reversed edges collapse; singletons label themselves") {
    val pairs = Seq((5L, 5L), (1L, 2L), (2L, 1L), (1L, 2L), (7L, 6L))
    val (labels, _) = run(10, pairs)
    assert(labels(1L) == 1L && labels(2L) == 1L, "1-2 component")
    assert(labels(6L) == 6L && labels(7L) == 6L, "6-7 component")
    assert(Seq(0L, 3L, 4L, 5L, 8L, 9L).forall(i => labels(i) == i), "singletons")
  }

  test("edgeless graph: zero rounds, all-self labels") {
    val (labels, rounds) = run(5, Seq.empty[(Long, Long)])
    assert(rounds == 0)
    assert(labels == (0L until 5L).map(i => i -> i).toMap)
  }
}
