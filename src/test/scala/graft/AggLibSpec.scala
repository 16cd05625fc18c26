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

  test("LowKLong keeps k smallest, skips NULLs, exact above 2^53") {
    val low3 = udaf(new graft.functions.LowKLong(3), org.apache.spark.sql.Encoders.LONG)
    // Two ids straddling 2^53: (1L<<53)+1 and (1L<<53)+2 collapse to the
    // same double, so the old -id.cast(double) route could not order them.
    val big1 = (1L << 53) + 1L; val big2 = (1L << 53) + 2L
    val df = Seq[(String, Option[Long])](
      ("mixed", Some(big2)), ("mixed", Some(big1)), ("mixed", None),
      ("mixed", Some(7L)), ("mixed", Some(big1)),
      ("allnull", None), ("allnull", None),
      ("big", Some(big2)), ("big", Some(big1)),
      ("small", Some(5L))).toDF("k", "v")
    val got = df.groupBy($"k").agg(low3($"v").as("low")).collect()
      .map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    // multiset semantics (uniqValueCount feeds it pre-distinct rows): the
    // duplicate big1 is kept, and 2^53+1 < 2^53+2 ordering is preserved —
    // both collapse to the same double, so the old -id.cast(double) route
    // could not make this distinction
    assert(got("mixed") == Seq(7L, big1, big1))
    assert(got("big") == Seq(big1, big2)) // direct 2^53+1 < 2^53+2 ordering
    assert(got("allnull") == Seq.empty)
    assert(got("small") == Seq(5L))
  }

  test("uniqValueCount emits all-NULL groups like the DuckDB oracle") {
    // The oracle (COUNT(DISTINCT) + LIST/sort/slice/join, no NULL filter)
    // emits a group whose user_ids are all NULL as (key, 0, NULL) and
    // ignores NULLs inside mixed groups — pinned stepwise in DuckDB.
    // Drive the same shape through the query's exact plan via a temp view
    // of the events schema.
    val df = Seq[(String, Option[Long])](
      ("a", Some(2L)), ("a", Some(1L)), ("a", None),
      ("b", None), ("b", None),
      ("c", Some(7L))).toDF("event_type", "user_id")
    val low5 = udaf(new graft.functions.LowKLong(5), org.apache.spark.sql.Encoders.LONG)
    val out = df.select($"event_type", $"user_id").distinct()
      .groupBy($"event_type")
      .agg(count($"user_id").as("n_distinct"), low5($"user_id").as("low5"))
      .select($"event_type", $"n_distinct",
        when($"n_distinct" > 0,
          array_join(transform($"low5", x => x.cast("string")), ","))
          .as("first_users"))
      .orderBy($"event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), Option(r.getString(2))))
    assert(out.toSeq == Seq(("a", 2L, Some("1,2")), ("b", 0L, None), ("c", 1L, Some("7"))))
    // and on the real testdata (no NULL user_ids) the registered query is
    // unchanged vs the countDistinct/sorted-slice ground truth
    val wit = graft.operators.Aggregates.uniqValueCount(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    val truth = Tables.events(spark, sfDir)
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("n"),
        array_join(transform(slice(sort_array(collect_set($"user_id")), 1, 5),
          x => x.cast("string")), ",").as("f"))
      .orderBy($"event_type")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq
    assert(wit == truth)
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
