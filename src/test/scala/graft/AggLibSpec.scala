package graft

import graft.core.Tables
import graft.functions.{AggRegistry, CappedUniq, ValueHistogram}
import org.apache.spark.sql.functions._

class AggLibSpec extends SparkSpec {
  import spark.implicits._

  test("ValueHistogram one-pass Aggregator equals the composed two-level agg") {
    val hist = udaf(ValueHistogram)
    val onePass = Tables.events(spark, sfDir)
      .groupBy($"event_type")
      .agg(hist($"user_id".cast("string")).as("h"))
      .select($"event_type", $"h.nDistinctValues", $"h.minCount", $"h.maxCount",
        $"h.totalCount", $"h.sumSqCount")
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val composed = graft.operators.Aggregates.valueHistogram(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(onePass == composed)
  }

  test("CappedUniq caps retained items but counts exactly") {
    val cu = udaf(new CappedUniq(3))
    val rows = Tables.events(spark, sfDir)
      .groupBy($"event_type").agg(cu($"user_id").as("u"))
      .select($"event_type", $"u.nDistinct", $"u.items").collect()
    val exact = Tables.events(spark, sfDir)
      .groupBy($"event_type").agg(countDistinct($"user_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      assert(r.getLong(1) == exact(r.getString(0)))
      val items = r.getSeq[Long](2)
      assert(items.length <= 3 && items == items.sorted)
    }
  }

  test("AggRegistry descriptor strings drive a single-pass multi-aggregate") {
    val cols = AggRegistry.fromDescriptors(Seq(
      "DoubleValueSum:value", "LongValueMax:user_id", "LongValueMin:user_id",
      "UniqValueCount:user_id", "ValueCount:event_id"))
    val got = Tables.events(spark, sfDir).groupBy($"event_type")
      .agg(cols.head, cols.tail: _*)
      .filter($"event_type" === "error").collect().head
    val want = Tables.events(spark, sfDir).filter($"event_type" === "error")
      .agg(sum($"value".cast("decimal(18,6)")).cast("double"), max($"user_id"),
        min($"user_id"), countDistinct($"user_id"), count($"event_id"))
      .collect().head
    assert((1 to 5).forall(i => got.get(i) == want.get(i - 1)))
  }

  test("unknown descriptor fails loudly") {
    intercept[IllegalArgumentException] {
      AggRegistry.fromDescriptors(Seq("Bogus:thing"))
    }
  }

  test("approx_count_distinct within 5% of exact on test data") {
    // raw relative error, independent of the witness query's boolean
    val got = Tables.events(spark, sfDir).groupBy($"event_type")
      .agg(countDistinct($"user_id").as("exact"),
        approx_count_distinct($"user_id", 0.01).as("approx"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val exact = r.getLong(1).toDouble
      val approx = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact <= 0.05, s"$r")
    }
    // and the oracle-facing witness must agree on every group
    val wit = graft.operators.Aggregates.approxDistinct(spark, sfDir).collect()
    assert(wit.nonEmpty && wit.forall(_.getBoolean(2)))
  }
}
