package graft.expr

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** lsh_probes(embedding, nTables, planesPerTable, probeBits) → array<int>
  * of `nTables * (1 + probeBits)` bucket ids, stride `1 + probeBits` per
  * table: slot 0 of each table is the base [[LshBuckets]] bucket, slots
  * 1..probeBits are its Hamming-1 neighbors for the `probeBits` planes
  * whose dot products sit CLOSEST to zero (ascending |dot|).
  *
  * This is query-side multi-probe LSH (Lv et al., VLDB'07, public
  * technique): a vector whose true neighbor lands one sign-flip away —
  * exactly the planes the vector nearly touches — is found by probing the
  * adjacent bucket instead of by adding whole tables. Confidence-ordered
  * probing beats flipping arbitrary planes because, conditioned on the
  * pair differing in exactly one plane, that plane is overwhelmingly one
  * the query had low margin on. Only the PROBE side of the candidate join
  * expands (`1 + probeBits` rows per table instead of 1); the index side
  * keeps its base buckets, so a probe never changes what the index stores.
  *
  * Bit-exactness contract: base buckets use the same left-to-right double
  * accumulation over the shared [[Hyperplanes]] family as `lsh_buckets`,
  * so slot 0 replays that kernel exactly; a probed run can only ADD
  * candidate pairs, never lose one (ExactnessSpec pins banded ≡ exact
  * with the probe knob on).
  *
  * Tie/edge rules (identical in interpreted and codegen paths): equal
  * |dot| picks the lower plane position (strict `<` scan); NaN dots are
  * never selected while a finite candidate remains (NaN fails every `<`),
  * and an all-NaN table falls back to flipping the lowest unused
  * positions, so output length is always exactly `nTables*(1+probeBits)`.
  */
case class LshProbes(child: Expression, nTables: Int, planesPerTable: Int,
    probeBits: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(nTables > 0 && planesPerTable > 0 && planesPerTable <= 30,
    s"lsh_probes: bad shape ${nTables}x$planesPerTable")
  require(probeBits >= 0 && probeBits <= planesPerTable,
    s"lsh_probes: probeBits $probeBits must be in [0, planesPerTable=$planesPerTable]")
  require(nTables * planesPerTable <= Hyperplanes.Max,
    s"lsh_probes: need ${nTables * planesPerTable} planes, have ${Hyperplanes.Max}")

  override def prettyName: String = "lsh_probes"
  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullIntolerant: Boolean = true

  private val stride = 1 + probeBits

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    if (x.numElements() != Hyperplanes.Dim)
      throw new IllegalArgumentException(
        s"lsh_probes: embedding dim ${x.numElements()} != plane dim ${Hyperplanes.Dim}")
    val planes = Hyperplanes.planes
    val out = new Array[Int](nTables * stride)
    val dots = new Array[Double](planesPerTable)
    val used = new Array[Boolean](planesPerTable)
    var t = 0
    while (t < nTables) {
      var b = 0
      var p = 0
      while (p < planesPerTable) {
        val pl = planes(t * planesPerTable + p)
        var dot = 0.0; var i = 0
        while (i < pl.length) { dot += x.getFloat(i).toDouble * pl(i); i += 1 }
        if (dot > 0.0) b |= 1 << p
        dots(p) = math.abs(dot)
        used(p) = false
        p += 1
      }
      out(t * stride) = b
      var j = 0
      while (j < probeBits) {
        var best = -1; var bestV = Double.PositiveInfinity
        var k = 0
        while (k < planesPerTable) {
          if (!used(k) && dots(k) < bestV) { best = k; bestV = dots(k) }
          k += 1
        }
        if (best < 0) { // all remaining |dot| are NaN: lowest unused position
          var k2 = 0
          while (best < 0 && k2 < planesPerTable) {
            if (!used(k2)) best = k2
            k2 += 1
          }
        }
        used(best) = true
        out(t * stride + 1 + j) = b ^ (1 << best)
        j += 1
      }
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val planesRef = ctx.addReferenceObj("lshPlanes", Hyperplanes.planes, "float[][]")
      val out = ctx.freshName("out")
      val dots = ctx.freshName("dots")
      val used = ctx.freshName("used")
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val p = ctx.freshName("p")
      val pl = ctx.freshName("pl")
      val dot = ctx.freshName("dot")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      val k2 = ctx.freshName("k2")
      val best = ctx.freshName("best")
      val bestV = ctx.freshName("bestV")
      s"""
         |if ($x.numElements() != ${Hyperplanes.Dim}) {
         |  throw new IllegalArgumentException("lsh_probes: embedding dim "
         |    + $x.numElements() + " != plane dim " + ${Hyperplanes.Dim});
         |}
         |int[] $out = new int[${nTables * stride}];
         |double[] $dots = new double[$planesPerTable];
         |boolean[] $used = new boolean[$planesPerTable];
         |for (int $t = 0; $t < $nTables; $t++) {
         |  int $b = 0;
         |  for (int $p = 0; $p < $planesPerTable; $p++) {
         |    final float[] $pl = $planesRef[$t * $planesPerTable + $p];
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $pl.length; $i++) {
         |      $dot += (double) $x.getFloat($i) * (double) $pl[$i];
         |    }
         |    if ($dot > 0.0) $b |= (1 << $p);
         |    $dots[$p] = Math.abs($dot);
         |    $used[$p] = false;
         |  }
         |  $out[$t * $stride] = $b;
         |  for (int $j = 0; $j < $probeBits; $j++) {
         |    int $best = -1; double $bestV = Double.POSITIVE_INFINITY;
         |    for (int $k = 0; $k < $planesPerTable; $k++) {
         |      if (!$used[$k] && $dots[$k] < $bestV) { $best = $k; $bestV = $dots[$k]; }
         |    }
         |    if ($best < 0) {
         |      for (int $k2 = 0; $best < 0 && $k2 < $planesPerTable; $k2++) {
         |        if (!$used[$k2]) $best = $k2;
         |      }
         |    }
         |    $used[$best] = true;
         |    $out[$t * $stride + 1 + $j] = $b ^ (1 << $best);
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
