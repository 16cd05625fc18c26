package graft.expr

import org.apache.spark.sql.catalyst.dsl.expressions._
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, CreateNamedStruct, Expression, If, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.types.{BooleanType, DataType, DoubleType, LongType, StructField, StructType}

/** arg_max_long(id, score) → struct<id: bigint, score: double>: the id
  * with the greatest score, ties to the LOWEST id — the (score desc, id
  * asc) argmax every similarity pipeline uses.
  *
  * Exists because the composed form, `max_by(struct(id, score),
  * struct(score, -id))`, carries STRUCT-typed aggregation buffers, which
  * disqualify `HashAggregateExec` (buffers must be UnsafeRow-mutable) and
  * plan as **SortAggregate**: the entire scored-pair stream — Θ(n²/L) rows
  * for the exact same-label path — is sorted per partition before one row
  * per group survives. Measured round 7: at 250k vectors the sort spilled
  * >90 GB of /tmp and killed the job; at 100k it silently spilled tens of
  * GB inside the "70–90 s exact" runs. This aggregate keeps the SAME
  * semantics in two flat primitive buffer slots (best score, best id), so
  * the plan stays `HashAggregate` — fully codegen, partial→final, zero
  * sort — and the argmax is a true streaming fold at any scale.
  *
  * Semantics pinned to the composed form it replaces:
  *  - ties on score → lowest id (strict `<` on id at equal score);
  *  - NaN score ranks greatest (Spark's double comparison order), same as
  *    the struct-ordering max_by;
  *  - rows with a null score OR null id are ignored; a group with no
  *    qualifying row yields null, tracked by a dedicated boolean `seen`
  *    buffer slot (still primitive, so HashAggregate eligibility is
  *    unchanged) — NOT by a sentinel (score, id) pair, so a genuine input
  *    row carrying (Long.MaxValue, −∞) is returned, not masked.
  */
case class ArgMaxLong(id: Expression, score: Expression)
    extends DeclarativeAggregate {

  override def children: Seq[Expression] = Seq(id, score)
  override def nullable: Boolean = true
  override def dataType: DataType = StructType(Seq(
    StructField("id", LongType), StructField("score", DoubleType)))
  override def prettyName: String = "arg_max_long"

  private lazy val bScore = AttributeReference("bScore", DoubleType, nullable = false)()
  private lazy val bId = AttributeReference("bId", LongType, nullable = false)()
  private lazy val bSeen = AttributeReference("bSeen", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(bScore, bId, bSeen)

  // the (−∞, MaxValue) init pair is arbitrary — bSeen=false is what marks
  // the buffer empty; it merely keeps the first `beats` comparison cheap
  // (any qualifying row wins against −∞ without a special case, except a
  // literal −∞ score, which the !bSeen branch of `cond` admits)
  override lazy val initialValues: Seq[Expression] = Seq(
    Literal(Double.NegativeInfinity), Literal(Long.MaxValue), Literal(false))

  // a candidate (s, i) beats the buffer iff s > bScore, or s == bScore and
  // i < bId (Spark's double comparison: NaN greatest, NaN === NaN)
  private def beats(s: Expression, i: Expression): Expression =
    (s > bScore) || ((s === bScore) && (i < bId))

  override lazy val updateExpressions: Seq[Expression] = {
    // null-id rows are ignored like null-score rows: a winning null id
    // would otherwise be written into the non-nullable bId buffer slot
    // (engine pipelines never produce one — ids are join keys — but a
    // library aggregate must not corrupt its buffer on hostile input)
    val qualifies = score.isNotNull && id.isNotNull
    val cond = qualifies && (!bSeen || beats(score, id))
    Seq(If(cond, score, bScore), If(cond, id, bId), bSeen || qualifies)
  }

  override lazy val mergeExpressions: Seq[Expression] = {
    // right buffer's attributes address the partial being merged in
    val cond = bSeen.right && (!bSeen.left ||
      (bScore.right > bScore.left) ||
      ((bScore.right === bScore.left) && (bId.right < bId.left)))
    Seq(If(cond, bScore.right, bScore.left), If(cond, bId.right, bId.left),
      bSeen.left || bSeen.right)
  }

  override lazy val evaluateExpression: Expression = If(
    !bSeen,
    Literal.create(null, dataType),
    CreateNamedStruct(Seq(Literal("id"), bId, Literal("score"), bScore)))

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(id = newChildren(0), score = newChildren(1))
}
