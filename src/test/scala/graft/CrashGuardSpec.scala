package graft

import graft.core.Tables
import graft.operators.{CrashGuard, Relational}
import org.apache.spark.sql.functions._

/** SkipBadRecords user-code half: a throwing transform under CrashGuard
  * completes the job, routes bad records to the side channel, and the
  * skipped count matches the deterministic failure condition exactly.
  */
class CrashGuardSpec extends SparkSpec {
  import spark.implicits._

  test("guarded user fn: bad rows yield (null, error class), good rows the value") {
    val g = CrashGuard.guarded((s: String) => s.toLong)
    val rows = Seq("1", "nope", "3").toDF("s")
      .select(g($"s").as("g"))
      .select($"g._1".as("v"), $"g._2".as("err"))
      .collect()
    assert(rows.map(r => Option(r.get(0))).toSeq == Seq(Some(1L), None, Some(3L)))
    assert(rows(1).getString(1) == "NumberFormatException")
    assert(rows(0).isNullAt(1) && rows(2).isNullAt(1))
  }

  test("a legitimately-null success is ok (error field is the discriminator), not lost") {
    val g = CrashGuard.guarded((s: String) =>
      if (s == "boom") throw new RuntimeException("x")
      else if (s == "miss") null else s.toUpperCase)
    val rows = Seq("a", "miss", "boom").toDF("s")
      .select(g($"s").as("g"))
      .agg(
        count(when($"g._2".isNull, lit(1))).as("ok"),
        count($"g._2").as("skipped"))
      .head()
    assert(rows.getLong(0) == 2, "null-returning success must count as ok")
    assert(rows.getLong(1) == 1)
  }

  test("property: guard semantics match scala Try on arbitrary inputs (seeded generator)") {
    // deterministic seeded cases (JoinPropSpec pattern: drive scalacheck
    // Gen directly; each case costs a Spark job, so bounded case list)
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    val genInputs = Gen.listOfN(30, Gen.oneOf(
      Gen.choose(-1000L, 1000L).map(_.toString),
      Gen.alphaStr.map(_.take(8)),
      Gen.const(""), Gen.const("9223372036854775808")))
    val inputs = (0 until 4).flatMap { i =>
      genInputs(Gen.Parameters.default, Seed(42L + i)).getOrElse(Nil)
    }
    val g = CrashGuard.guarded((s: String) => s.toLong)
    val got = inputs.toDF("s").select($"s", g($"s").as("g"))
      .select($"s", $"g._1".as("v"), $"g._2".as("err")).collect()
      .map(r => (r.getString(0), Option(r.get(1)), Option(r.get(2)))).toSeq
    val expected = inputs.map { s =>
      scala.util.Try(s.toLong) match {
        case scala.util.Success(v) => (s, Some(v), None)
        case scala.util.Failure(e) => (s, None, Some(e.getClass.getSimpleName))
      }
    }
    assert(got == expected)
  }

  test("rel_skip_bad_records: job completes; skipped == records where user code throws") {
    val out = Relational.skipBadRecords(spark, sfDir).collect()
    val skipped = out.map(_.getLong(2)).sum
    val ok = out.map(_.getLong(1)).sum
    val expectSkipped = Tables.documents(spark, sfDir)
      .filter($"n_chars" % 7 === 0).count()
    val total = Tables.documents(spark, sfDir).count()
    assert(skipped == expectSkipped, s"skipped $skipped != deterministic $expectSkipped")
    assert(ok + skipped == total, "every record is either ok or skipped, never lost")
    assert(expectSkipped > 0, "test data should exercise the throwing branch")
  }
}
