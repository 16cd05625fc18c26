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
