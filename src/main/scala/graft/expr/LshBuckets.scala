package graft.expr

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** The seeded Rademacher (±1) hyperplane family shared by every LSH
  * consumer — held as primitive `float[][]` so kernels index it directly.
  * scala.util.Random(42), plane-major: extending `Max` APPENDS planes
  * without changing existing ones (each plane consumes `Dim` booleans of
  * the stream in order), so every previously validated band config is
  * byte-identical under a wider family. Mirrored by tools/lsh_recall.py
  * and inlined into the DuckDB oracle as constants.
  */
object Hyperplanes {
  val Dim = 64
  val Max = 128 // 64→128 in r6: admits 8×10+ shapes for 100k+-cluster corpora
  lazy val planes: Array[Array[Float]] = {
    val rnd = new scala.util.Random(42)
    Array.fill(Max)(Array.fill(Dim)(if (rnd.nextBoolean()) 1.0f else -1.0f))
  }
}

/** lsh_buckets(embedding, nTables, planesPerTable) → array<int> of one
  * bucket id per table: bit p of table t's bucket is set iff
  * dot(embedding, plane[t*planesPerTable+p]) > 0.
  *
  * Exists because the composed form — `planesPerTable × nTables` separate
  * `CASE WHEN dot_product(emb, <array literal>) > 0` column expressions —
  * pays GenericArrayData boxing on every literal element access: measured
  * 275 µs/row at 8×8/dim-64 (5.5 s for a 20k corpus, swamping the whole
  * banded pipeline; the candidate self-join itself was 0.4 s). This kernel
  * is one codegen loop over the primitive plane matrix shipped as a
  * reference object: all 64 dots in a few µs, and the bucketing stays
  * inside whole-stage codegen with the scan.
  *
  * Sign math matches the composed form bit-for-bit (left-to-right double
  * accumulation over float elements), so oracle replays and every
  * gate-validated band shape are unchanged.
  */
case class LshBuckets(child: Expression, nTables: Int, planesPerTable: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(nTables > 0 && planesPerTable > 0 && planesPerTable <= 30,
    s"lsh_buckets: bad shape ${nTables}x$planesPerTable")
  require(nTables * planesPerTable <= Hyperplanes.Max,
    s"lsh_buckets: need ${nTables * planesPerTable} planes, have ${Hyperplanes.Max}")

  override def prettyName: String = "lsh_buckets"
  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() != Hyperplanes.Dim)
      throw new IllegalArgumentException(
        s"lsh_buckets: embedding dim ${x.numElements()} != plane dim ${Hyperplanes.Dim}")
    val planes = Hyperplanes.planes
    val out = new Array[Int](nTables)
    var t = 0
    while (t < nTables) {
      var b = 0; var p = 0
      while (p < planesPerTable) {
        val pl = planes(t * planesPerTable + p)
        var dot = 0.0; var i = 0
        while (i < pl.length) { dot += x.getFloat(i).toDouble * pl(i); i += 1 }
        if (dot > 0.0) b |= 1 << p
        p += 1
      }
      out(t) = b
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val planesRef = ctx.addReferenceObj("lshPlanes", Hyperplanes.planes, "float[][]")
      val out = ctx.freshName("out")
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val p = ctx.freshName("p")
      val pl = ctx.freshName("pl")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      s"""
         |if ($x.numElements() != ${Hyperplanes.Dim}) {
         |  throw new IllegalArgumentException("lsh_buckets: embedding dim "
         |    + $x.numElements() + " != plane dim " + ${Hyperplanes.Dim});
         |}
         |int[] $out = new int[$nTables];
         |for (int $t = 0; $t < $nTables; $t++) {
         |  int $b = 0;
         |  for (int $p = 0; $p < $planesPerTable; $p++) {
         |    final float[] $pl = $planesRef[$t * $planesPerTable + $p];
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $pl.length; $i++) {
         |      $dot += (double) $x.getFloat($i) * (double) $pl[$i];
         |    }
         |    if ($dot > 0.0) $b |= (1 << $p);
         |  }
         |  $out[$t] = $b;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
