package graft.operators

import graft.core.Tables
import graft.functions.AggRegistry
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Config-driven pipeline runner — the moral successor of the reference's
  * string-configured job assembly (SURVEY.md §7.0): `ValueAggregatorJob`
  * built a whole MR job from descriptor strings
  * (`.../lib/aggregate/ValueAggregatorJob.java` anchor:
  * `createValueAggregatorJob`) and `StreamJob` from CLI args
  * (`.../streaming/StreamJob.java` anchor:`parseArgv`). Here the "job conf"
  * is a list of step strings compiled into ONE declarative DataFrame plan —
  * so unlike the reference, the assembled pipeline still goes through
  * Catalyst whole: pushdown, pruning, partial aggregation and AQE all apply
  * to configured pipelines exactly as to hand-written ones.
  *
  * Step grammar (`verb:args`):
  *   read:<table>                       load a catalog table (TESTDATA.md name)
  *   filter:<sql predicate>
  *   select:<sql expr list>             comma-split, `expr AS alias` allowed
  *   agg:<groupCols>|<descriptors>      groupCols comma-split; descriptors are
  *                                      AggRegistry strings ("LongValueSum:col")
  *   orderBy:<col[ desc]" list>
  *   limit:<n>
  */
object Pipeline {

  def run(spark: SparkSession, dir: String, steps: Seq[String]): DataFrame =
    steps.foldLeft(null: DataFrame) { (df, step) =>
      val (verb, arg) = step.span(_ != ':') match {
        case (v, a) => (v, a.drop(1))
      }
      if (df == null && verb != "read")
        throw new IllegalArgumentException(
          s"pipeline must start with a read: step, got '$step'")
      verb match {
        case "read" => Tables.load(spark, dir, arg)
        case "filter" => df.filter(arg)
        case "select" => df.selectExpr(splitTop(arg): _*)
        case "agg" =>
          val Array(groupCols, descriptors) = arg.split("\\|", 2)
          val aggs = AggRegistry.fromDescriptors(descriptors.split(",").toSeq)
          df.groupBy(groupCols.split(",").map(c => org.apache.spark.sql.functions.col(c.trim)): _*)
            .agg(aggs.head, aggs.tail: _*)
        case "orderBy" =>
          val sorts = arg.split(",").map(_.trim).map {
            case s if s.endsWith(" desc") =>
              org.apache.spark.sql.functions.col(s.stripSuffix(" desc")).desc
            case s => org.apache.spark.sql.functions.col(s).asc
          }
          df.orderBy(sorts.toSeq: _*)
        case "limit" => df.limit(arg.trim.toInt)
        case other => throw new IllegalArgumentException(s"unknown pipeline verb: $other")
      }
    }

  /** Split a select list on top-level commas (commas inside parens belong
    * to function calls).
    */
  private def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; val cur = new StringBuilder
    s.foreach {
      case ',' if depth == 0 => out += cur.result().trim; cur.clear()
      case c =>
        if (c == '(') depth += 1 else if (c == ')') depth -= 1
        cur += c
    }
    out += cur.result().trim
    out.result().filter(_.nonEmpty)
  }
}
