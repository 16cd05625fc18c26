package graft

import graft.expr.SimhashSig
import graft.functions.DedupOps
import org.apache.spark.unsafe.types.UTF8String

/** Bit-compatibility of the one-pass `simhash_sig` kernel with the composed
  * reference pipeline (token explode → (doc,token) count groupBy → 64-vote
  * groupBy). The kernel replaces the composed form on the deployed simhash
  * paths, so equality here is what keeps the DuckDB oracle's bit-for-bit
  * signature recomputation valid unchanged.
  */
class SimhashSigSpec extends SparkSpec {
  import spark.implicits._

  private def assertEqualSigs(docs: org.apache.spark.sql.DataFrame): Unit = {
    val c = DedupOps.simhashSig(docs).orderBy($"doc_id").collect()
    val k = DedupOps.simhashSigsOf(docs).orderBy($"doc_id").collect()
    assert(c.length == k.length,
      s"row counts differ: composed ${c.length}, kernel ${k.length}")
    c.zip(k).foreach { case (cr, kr) =>
      assert(cr.getLong(0) == kr.getLong(0), "doc_id order mismatch")
      assert(cr.getLong(1) == kr.getLong(1),
        s"doc ${cr.getLong(0)}: composed sig ${cr.getLong(1)} != kernel ${kr.getLong(1)}")
    }
  }

  test("kernel signatures equal the composed pipeline on the documents fixture") {
    assertEqualSigs(graft.core.Tables.documents(spark, sfDir).select($"doc_id", $"text"))
  }

  test("kernel signatures equal the composed pipeline on adversarial token shapes") {
    val docs = Seq(
      (1L, ""),
      (2L, "one"),
      (3L, "one two"),
      (4L, "  leading and   multiple   spaces  "),
      (5L, "\ttab\tseparated\ttokens\t"),
      (6L, "ünïcödé tökens über ällés"),
      (7L, "MiXeD Case TEXT Gets Lowered"),
      (8L, "dup dup dup dup unique"), // vote weighting: counts matter
      (9L, Seq.fill(500)("repeat me often").mkString(" "))
    ).toDF("doc_id", "text")
    assertEqualSigs(docs)
  }

  test("null text is dropped by both paths") {
    val docs = Seq((1L, "some text"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    assert(DedupOps.simhashSig(docs).select($"doc_id").as[Long].collect().toSet == Set(1L))
    assert(DedupOps.simhashSigsOf(docs).select($"doc_id").as[Long].collect().toSet == Set(1L))
  }

  test("compute matches the md5 vote construction on a hand-built doc") {
    // one token repeated 3× + one other: votes are +3/-3 vs +1/-1 — pins
    // that occurrence-folding equals the count-weighted composed votes
    val sig = SimhashSig.compute(UTF8String.fromString("aa aa aa bb"))
    // recompute from first principles with java md5
    def th(tok: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(tok.getBytes("UTF-8"))
      val hi = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
        ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
      val lo = ((d(4) & 0xFFL) << 24) | ((d(5) & 0xFFL) << 16) |
        ((d(6) & 0xFFL) << 8) | (d(7) & 0xFFL)
      (hi << 32) | lo
    }
    val want = (0 until 64).map { b =>
      val v = (if (((th("aa") >>> b) & 1L) == 1L) 3 else -3) +
        (if (((th("bb") >>> b) & 1L) == 1L) 1 else -1)
      if (v > 0) 1L << b else 0L
    }.reduce(_ | _)
    assert(sig == want)
  }
}
