package graft.operators

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf
import scala.reflect.runtime.universe.TypeTag
import scala.util.{Failure, Success, Try}

/** SkipBadRecords crash-guard half (reference:
  * src/mapred/org/apache/hadoop/mapred/SkipBadRecords.java, anchor
  * `setMapperMaxSkipRecords`): user code that throws on record N must not
  * kill the job — the record is skipped and counted. The parse-level half
  * is [[graft.sources.Formats.permissiveParse]]; this is the half for
  * failures inside USER code.
  *
  * Spark-first shape: the user fn runs inside `Try` in one UDF returning a
  * (result, error) struct — a bad row carries the error class in a side
  * channel and flows on; good rows pay one branch. Strictly cheaper and
  * finer-grained than the reference's skip-range machinery (task re-execution
  * + binary search over record offsets to locate the bad record), because
  * Spark lets the guard live inside the operator instead of around the task.
  * A UDF is the honest vehicle here: the wrapped code is arbitrary user
  * logic, exactly what the reference's mapper body was.
  */
object CrashGuard {

  /** Wrap user code: row → struct(_1 = result or null, _2 = error class or
    * null). The ERROR field is the ok/skipped discriminator — `_2 IS NULL`
    * means the record succeeded (possibly with a legitimately-null result),
    * `_2 IS NOT NULL` is the corrupt-record side channel (≙ the reference's
    * skipped-records counter). Counting on `_1` instead would lose
    * null-returning successes. See Relational.skipBadRecords.
    *
    * NULL INPUTS: Spark never invokes the UDF on a null input row — the
    * whole struct is null, which the `_2 IS NULL` discriminator counts as a
    * null-result SUCCESS, not a skip. That is the contract: a null input is
    * not "user code crashed", it's absent data passing through (same as the
    * reference, whose mapper was simply not called for records the reader
    * never produced). Callers that must treat nulls as corrupt should
    * filter/flag them BEFORE the guard, where the null is still visible.
    */
  def guarded[I: TypeTag, O: TypeTag](f: I => O): UserDefinedFunction =
    udf((i: I) => Try(f(i)) match {
      case Success(o) => (Option(o), Option.empty[String])
      case Failure(e) => (Option.empty[O], Option(e.getClass.getSimpleName))
    })
}
