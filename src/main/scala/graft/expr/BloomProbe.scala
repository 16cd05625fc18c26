package graft.expr

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** bloom_probe(filter_bytes, long_value) → boolean: membership probe of a
  * LONG against a serialized `spark.util.sketch.BloomFilter`, evaluated
  * inside whole-stage codegen — the decontamination outgrow path's
  * scan-stage prefilter ([[graft.functions.TextOps.evalOverlaps]]).
  *
  * This is semantically Spark's own `BloomFilterMightContain` (the
  * expression its injected runtime filters compile to), re-housed for one
  * reason the round-13 review caught: that expression takes the filter as
  * a child EXPRESSION, so the only non-subquery way to feed it a
  * pre-built filter is a BinaryType `Literal` — and binary literals
  * render as full hex in every plan string (2 chars/byte: a ~1.2 MB
  * filter over 1M eval grams puts ~2.4 MB of hex into each explain/
  * Spark-UI SQL description/spec failure message, retained per execution
  * by the UI). Here the bytes are a constructor FIELD, not a child:
  * `toString` renders them as the JVM's compact `[B@…` tag, the probed
  * value is the only child, and the codegen references the deserialized
  * filter object exactly as the native expression does (`mightContainLong`
  * on an `addReferenceObj` handle — same per-row work, same stage).
  *
  * The registry builder ([[graft.plans.GraftExtensions]]) unwraps the
  * caller's `lit(bytes)` at resolution time, so the literal exists only
  * in the UNRESOLVED plan (rendered by `explain(true)` alone); analyzed,
  * optimized, and physical plans — the ones the UI and PlanSpec render —
  * carry this compact form.
  */
case class BloomProbe(filterBytes: Array[Byte], child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  require(filterBytes != null && filterBytes.nonEmpty,
    "bloom_probe: empty filter")

  override def prettyName: String = "bloom_probe"

  // Array[Byte] as a case-class field means the synthesized equals/
  // hashCode compare by REFERENCE (round-14 advice #4): two probes built
  // from equal serialized filters never canonicalized equal, silently
  // defeating subexpression elimination and exchange reuse wherever the
  // same filter is probed twice. Value equality restores the Expression
  // contract (same pattern as Catalyst's Literal, which special-cases
  // binary literals with Arrays.equals for exactly this reason).
  //
  // The bytes hash is CACHED (round-16 advice #2): Catalyst calls
  // equals/hashCode repeatedly per optimizer pass (canonicalization,
  // subexpression-elimination maps, exchange-reuse lookups), and the
  // serialized filter is megabytes — re-hashing it each call made every
  // pass corpus-filter-proportional. One hash per JVM instance instead;
  // equals compares the cached ints first so unequal filters never touch
  // the byte arrays, and equal-instance lookups (the common map-hit case)
  // pay Arrays.equals only on a genuine candidate match.
  @transient private lazy val filterBytesHash: Int =
    java.util.Arrays.hashCode(filterBytes)
  override def equals(other: Any): Boolean = other match {
    case b: BloomProbe =>
      filterBytesHash == b.filterBytesHash && child == b.child &&
        java.util.Arrays.equals(filterBytes, b.filterBytes)
    case _ => false
  }
  override def hashCode(): Int = 31 * filterBytesHash + child.hashCode()
  override def inputTypes = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override protected def withNewChildInternal(newChild: Expression): BloomProbe =
    copy(child = newChild)

  // built once per deserialized expression instance (driver + each
  // executor); BloomFilterImpl is itself Serializable, so the codegen
  // reference below ships intact
  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(filterBytes))

  override def nullSafeEval(v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val ref = ctx.addReferenceObj("bloomFilter", filter,
        classOf[BloomFilter].getName)
      s"${ev.value} = $ref.mightContainLong($v);"
    })
}
