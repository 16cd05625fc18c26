package graft

import graft.core.Tables
import graft.sources.Formats
import org.apache.spark.sql.functions._

/** BloomMapFile parity: storage-side (parquet column bloom filter actually
  * lands in the footer) and sketch-side (no false negatives; false-positive
  * rate within the configured bound) — the halves the hash gate can't check.
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  test("parquet written with bloom option carries the filter in its footer") {
    Formats.bloomMembership(spark, sfDir).collect() // writes /tmp/graft_fmt/bloom_orders
    val hconf = spark.sparkContext.hadoopConfiguration
    val dir = new org.apache.hadoop.fs.Path("/tmp/graft_fmt/bloom_orders")
    val fs = dir.getFileSystem(hconf)
    val part = fs.listStatus(dir).map(_.getPath)
      .find(p => p.getName.startsWith("part-") && p.getName.endsWith(".parquet"))
      .getOrElse(fail("no parquet part file written"))
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(part, hconf))
    try {
      val blocks = reader.getFooter.getBlocks
      assert(!blocks.isEmpty)
      blocks.forEach { b =>
        val chunk = b.getColumns.stream()
          .filter(_.getPath.toDotString == "o_custkey").findFirst().get()
        assert(chunk.getBloomFilterOffset >= 0,
          "o_custkey chunk has no bloom filter — row-group skipping can't engage")
      }
    } finally reader.close()
  }

  test("BloomProbe compares by filter VALUE, not array reference") {
    // r14 advice #4: Array[Byte] as a case-class field synthesizes
    // reference equality — two probes built from equal serialized filters
    // never canonicalized equal, silently defeating subexpression
    // elimination and exchange reuse. Equal bytes (distinct arrays) must
    // compare and hash equal, and canonicalize equal; different filters
    // must not.
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Literal}
    import org.apache.spark.sql.types.LongType
    val bf = org.apache.spark.util.sketch.BloomFilter.create(100L, 0.01)
    (1L to 50L).foreach(bf.putLong)
    def bytesOf(f: org.apache.spark.util.sketch.BloomFilter): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      f.writeTo(bos)
      bos.toByteArray
    }
    val b1 = bytesOf(bf)
    val b2 = b1.clone()
    assert(!(b1 eq b2) && java.util.Arrays.equals(b1, b2))
    val key = AttributeReference("k", LongType)()
    val (p1, p2) = (graft.expr.BloomProbe(b1, key), graft.expr.BloomProbe(b2, key))
    assert(p1 == p2, "equal filter bytes must compare equal")
    assert(p1.hashCode == p2.hashCode, "equal probes must hash equal")
    assert(p1.semanticEquals(p2), "equal probes must canonicalize equal")
    val other = org.apache.spark.util.sketch.BloomFilter.create(100L, 0.01)
    other.putLong(99L)
    val p3 = graft.expr.BloomProbe(bytesOf(other), key)
    assert(p1 != p3, "different filters must not compare equal")
    assert(p1 != graft.expr.BloomProbe(b1, Literal(7L)),
      "same filter over a different child must not compare equal")
  }

  test("bloom membership: zero false negatives, bounded false positives") {
    val orders = Tables.orders(spark, sfDir)
    val bf = orders.stat.bloomFilter("o_custkey", 100000L, 0.01)
    val custkeys = Tables.customer(spark, sfDir).select($"c_custkey").collect().map(_.getLong(0))
    val withOrders = orders.select($"o_custkey").distinct().collect().map(_.getLong(0)).toSet
    val (present, absent) = custkeys.partition(withOrders.contains)
    assert(present.forall(bf.mightContain), "bloom false negative — contract broken")
    if (absent.nonEmpty) {
      val fp = absent.count(bf.mightContain)
      val rate = fp.toDouble / absent.length
      assert(rate <= 0.05, s"false-positive rate $rate way above configured 0.01")
    }
  }
}
