package graft

import org.apache.spark.sql.catalyst.expressions._

/** Higher-order-function binding discipline (round 12).
  *
  * Catalyst HOFs (`transform`/`filter`/`aggregate`) evaluate INTERPRETED
  * with no common-subexpression elimination: anything referenced inside
  * the lambda body is re-evaluated once per array element. A lambda that
  * rebuilds a token array from the raw text (`slice(split(regexp_replace(
  * text)), i, 3)`) therefore costs O(tokens) per element — O(tokens²) per
  * document. Invisible on ~100-token gate docs; measured 13 MINUTES for
  * five 50k-token documents on the decontam stress corpus, where the
  * bound form (`slice($"toks", i, 3)` over a column materialized by a
  * prior select) takes milliseconds. A 100 TB corpus contains books.
  *
  * This sweep walks the analyzed plan of EVERY registered query and fails
  * if any lambda body contains a string-rebuilding expression (split /
  * regexp_replace / lower / trim / md5 / sha2) whose inputs reach back to
  * a ROW ATTRIBUTE — the signature of per-element recomputation. The same
  * expressions over a lambda variable (e.g. bigramsOf's width check
  * `size(split(b, " ")) === 2`, md5 of a shingle element) are O(element)
  * and legitimate; HOF ARGUMENTS are evaluated once and may be arbitrary.
  */
class HofBindingSpec extends SparkSpec {

  private def rebuildsFromAttr(e: Expression): Boolean = {
    val hazard = e match {
      case _: StringSplit | _: RegExpReplace | _: Lower | _: Upper |
           _: StringTrim | _: Md5 | _: Sha2 => true
      case _ => false
    }
    hazard && e.exists(_.isInstanceOf[AttributeReference])
  }

  test("detector control: the pre-round-12 unbound shingle form IS flagged") {
    // the exact shape evalOverlaps used to build — split over the raw text
    // referenced inside the index lambda — must trip the sweep's detector,
    // or the sweep is a rubber stamp
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val toks = split(regexp_replace(trim(lower($"text")), "\\s+", " "), " ")
    val df = Seq((1L, "a b c d")).toDF("doc_id", "text")
      .select(explode(transform(
        sequence(lit(1), greatest(size(toks) - lit(2), lit(1))),
        i => concat_ws(" ", slice(toks, i, lit(3))))).as("shingle"))
    var hit = false
    df.queryExecution.analyzed.foreach(_.expressions.foreach(_.foreach {
      case hof: HigherOrderFunction =>
        if (hof.functions.exists(_.exists(rebuildsFromAttr))) hit = true
      case _ =>
    }))
    assert(hit, "detector missed the unbound form")
  }

  test("no registered query recomputes a string expression inside a HOF lambda") {
    // BOTH the analyzed and the optimized plan are swept (round 13, r12
    // advice #2): binding an array as a column is an analyzed-plan
    // property that the optimizer can UNDO — CollapseProject happily
    // re-inlines a single-use projected column into the lambda body,
    // which would reintroduce the O(tokens²) evaluation while an
    // analyzed-only guard stays green. The optimized plan is the one
    // that executes, so it is the one that must be clean.
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val qe = fn(spark, sfDir).queryExecution
      val bad = scala.collection.mutable.ArrayBuffer.empty[String]
      for ((tag, plan) <- Seq("analyzed" -> qe.analyzed, "optimized" -> qe.optimizedPlan))
        plan.foreach { node =>
          node.expressions.foreach(_.foreach {
            case hof: HigherOrderFunction =>
              hof.functions.foreach { f =>
                val hits = f.collect { case e if rebuildsFromAttr(e) => e }
                if (hits.nonEmpty)
                  bad += s"$name [$tag]: ${hits.head.getClass.getSimpleName} over a row " +
                    s"attribute inside ${hof.prettyName}'s lambda — bind the array " +
                    s"as a column first (quadratic-eval hazard, see TextOps.bigramsOf)"
              }
            case _ =>
          })
        }
      bad.distinct
    }
    assert(offenders.isEmpty, offenders.mkString("\n", "\n", ""))
  }
}
