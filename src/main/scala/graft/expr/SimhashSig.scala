package graft.expr

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** simhash_sig(normalized_text) → the 64-bit SimHash signature in ONE pass
  * over the text bytes — no token explode, no (doc,token) count shuffle, no
  * 64-vote re-aggregation shuffle.
  *
  * The composed reference form ([[graft.functions.DedupOps.simhashSig]])
  * pays TWO corpus-wide exchanges: `groupBy(doc_id, token)` for counts,
  * then `groupBy(doc_id)` for the 64 vote sums — plus the token explode's
  * row amplification in between. The votes are LINEAR in the counts
  * (Σ_distinct cnt(t)·sign_b(t) = Σ_occurrences sign_b(token)), so the
  * per-token grouping is mathematically redundant: this kernel folds ±1
  * votes per token OCCURRENCE directly and emits the identical signature
  * from inside the scan's whole-stage codegen.
  *
  * BIT-COMPATIBILITY CONTRACT (SimhashSigSpec): equals the composed form
  * exactly —
  *  - tokens = byte segments between 0x20 bytes with Java `split` limit -1
  *    semantics, empty segments included (matches `explode(split(norm, " "))`,
  *    which keeps empty-string tokens);
  *  - token hash = top 8 bytes of md5(token), assembled as two unsigned
  *    32-bit big-endian halves (matches the `conv(substring(md5,…),16,10)`
  *    construction — md5 keeps the signature recomputable bit-for-bit by
  *    the DuckDB oracle, which is why the 5×-cheaper xxhash64 is NOT used);
  *  - bit b of the signature is set iff the occurrence-vote sum is > 0.
  *
  * Null text is null here (nullIntolerant); the composed form DROPS
  * null-text docs (explode of a null array emits nothing, so they never
  * reach the signature frame), so callers filter `text IS NOT NULL` to
  * match ([[graft.functions.DedupOps.simhashSigsOf]]).
  */
case class SimhashSig(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def prettyName: String = "simhash_sig"
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    SimhashSig.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.expr.SimhashSig.compute($x);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimhashSig {
  // MessageDigest.getInstance per token would dominate the hash itself;
  // one instance per executor thread, reset()+digest() per token
  private val md5 = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  def compute(s: UTF8String): Long = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numBytes
    val votes = new Array[Int](64)
    val md = md5.get()
    var buf = new Array[Byte](64)
    var start = 0
    var p = 0
    while (p <= n) {
      if (p == n || Platform.getByte(base, off + p) == 0x20) {
        val len = p - start
        if (len > buf.length) buf = new Array[Byte](len)
        Platform.copyMemory(base, off + start, buf, Platform.BYTE_ARRAY_OFFSET, len.toLong)
        md.reset()
        md.update(buf, 0, len)
        val d = md.digest()
        // th = unsigned-BE(d0..d3) << 32 | unsigned-BE(d4..d7), matching
        // shiftleft(conv(substring(md5,1,8),16,10),32) | conv(substring(md5,9,8),16,10)
        val hi = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
          ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
        val lo = ((d(4) & 0xFFL) << 24) | ((d(5) & 0xFFL) << 16) |
          ((d(6) & 0xFFL) << 8) | (d(7) & 0xFFL)
        val th = (hi << 32) | lo
        var b = 0
        while (b < 64) {
          if (((th >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
        start = p + 1
      }
      p += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }
}
