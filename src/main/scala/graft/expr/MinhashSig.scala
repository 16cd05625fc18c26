package graft.expr

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** minhash_sig(normalized_text, numHashes) → array<long>: the document's
  * complete MinHash signature (mh_0..mh_{numHashes-1}) in ONE pass over the
  * text bytes — no shingle explode, no per-doc aggregation, no shuffle.
  *
  * Exists for the same reason as [[LshBuckets]] on the embedding side: the
  * composed form pays row amplification. `shingledOf` explodes ~one row per
  * token (a 100 TB corpus becomes a multi-PB shingle stream), and the
  * 16-way `min` groupBy that follows is the ONLY corpus-wide shuffle on the
  * MinHash candidate path. This kernel computes the same signature inside
  * the scan's whole-stage codegen, so the first shuffle on the path becomes
  * the (band,bucket) groupBy over `bands` rows per doc.
  *
  * BIT-COMPATIBILITY CONTRACT (MinhashSigSpec asserts it on the fixtures
  * and on adversarial token shapes): output equals the composed pipeline
  * `min(xxhash64(xxhash64(shingle), lit(i)))` over `shingledOf`'s 3-token
  * shingles, exactly. The input MUST already be [[DedupOps.normText]]-
  * normalized (single-space separated); the kernel then reproduces the
  * composed chain byte-for-byte:
  *  - `split(text, " ")` with Java limit -1 semantics == byte segments
  *    between 0x20 bytes (0x20 never occurs inside a multi-byte UTF-8
  *    sequence, so the byte scan is exact), empty segments included;
  *  - shingle i = `concat_ws(" ", slice(toks, i, 3))` == the original byte
  *    range from token i's start to token min(i+2, last)'s end, because the
  *    joiner equals the separator;
  *  - shingle count = max(numToks - 2, 1) (short docs yield one short
  *    shingle, matching `greatest(size - 2, 1)`);
  *  - hash chain: h = XXH64(bytes, seed 42) (Spark's `xxhash64(string)`),
  *    then per function i: XXH64.hashInt(i, XXH64.hashLong(h, 42)) (Spark's
  *    `xxhash64(longCol, lit(i))` fold order), `min` over shingles.
  *
  * Null text produces a null signature (nullIntolerant). The composed path
  * keeps a null-text doc WITH one empty shingle (`greatest(null,1)` is 1
  * and `concat_ws` of a null array is ""), so callers match it by feeding
  * `coalesce(normalized, '')` — the empty string produces the identical
  * one-empty-shingle signature (see [[graft.functions.DedupOps.minhashSigsOf]]).
  */
case class MinhashSig(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(numHashes > 0 && numHashes <= 1024, s"minhash_sig: bad numHashes $numHashes")

  override def prettyName: String = "minhash_sig"
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      MinhashSig.compute(input.asInstanceOf[UTF8String], numHashes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    // one static call per row keeps the expression inside whole-stage
    // codegen (no CodegenFallback iterator break); the loop itself is
    // hash-dominated, so JIT inlining of the helper is not load-bearing
    nullSafeCodeGen(ctx, ev, x => {
      s"""
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(graft.expr.MinhashSig.compute($x, $numHashes));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinhashSig {
  private final val Seed = 42L // Spark's xxhash64 default seed

  /** Shingle count above which the fused kernel stops counting distinct
    * shingles and emits [[CardUnknown]] instead (round 12, r11 advice):
    * the card's open-addressed set is PER-ROW transient memory — 2·shingles
    * longs — so a single multi-GB document would allocate gigabytes (and
    * past 2^29 the capacity doubling overflows, the round-11 loud-fail).
    * 2^22 shingles ≈ a 30 MB document caps the table at 64 MB — generous
    * for any real corpus document (a long book is ~200k tokens) while
    * bounding the worst row. Above it the doc keeps its exact SIGNATURE
    * (banding is unaffected) and merely loses the size-ratio prefilter,
    * which the consumer must honor by passing sentinel rows through
    * ([[graft.functions.DedupOps.minhashCandidatesPlan]]) — the verify
    * stage re-derives true sizes for survivors, so answers are identical.
    */
  final val CardCapShingles: Int = 1 << 22

  /** Sentinel in the card slot: "cardinality not computed — never reject
    * this row on the size-ratio bound". 0 is unreachable as a genuine
    * count (every document yields ≥ 1 shingle, including the empty
    * string), so the sentinel cannot collide with real data. */
  final val CardUnknown: Long = 0L

  /** One-pass signature over a normalized text's bytes. See the class doc
    * for the exact composed-pipeline chain this reproduces.
    */
  def compute(s: UTF8String, numHashes: Int): Array[Long] =
    core(s, numHashes, withCard = false)

  /** Fused signature + distinct-shingle count: slots 0..numHashes-1 are
    * the signature (bit-identical to [[compute]]), slot numHashes is
    * [[ShingleCard.compute]]'s count — or [[CardUnknown]] past
    * [[CardCapShingles]] shingles (the per-row degrade, see that
    * constant's doc). ONE tokenization and ONE string hash per shingle —
    * the card's set probes reuse the shingle hash the signature chain
    * computes anyway, so the deployed prefiltered scan pays a set insert
    * per shingle instead of a second full hash pass (r11 review finding).
    */
  def computeWithCard(s: UTF8String, numHashes: Int): Array[Long] =
    core(s, numHashes, withCard = true)

  private def core(s: UTF8String, numHashes: Int, withCard: Boolean): Array[Long] = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numBytes
    // token starts: one at 0, one after every 0x20 byte
    var numToks = 1
    var p = 0
    while (p < n) {
      if (Platform.getByte(base, off + p) == 0x20) numToks += 1
      p += 1
    }
    // starts(j) = byte index of token j; starts(numToks) = n + 1 sentinel so
    // tokEnd(j) = starts(j + 1) - 1 holds for the last token too
    val starts = new Array[Int](numToks + 1)
    var j = 1
    p = 0
    while (p < n) {
      if (Platform.getByte(base, off + p) == 0x20) { starts(j) = p + 1; j += 1 }
      p += 1
    }
    starts(numToks) = n + 1
    val nShingles = math.max(numToks - 2, 1)
    val mins = new Array[Long](if (withCard) numHashes + 1 else numHashes)
    java.util.Arrays.fill(mins, 0, numHashes, Long.MaxValue)
    // distinct-shingle set (card only): same open-addressed scheme as
    // ShingleCard.compute, fed by the h already computed for the chain
    // past CardCapShingles the card degrades to the CardUnknown sentinel
    // (prefilter optional PER ROW, r11 advice) instead of allocating a
    // giant per-row table or — past 2^29, where cap <<= 1 overflows —
    // failing the whole query; the signature stays exact either way
    val trackCard = withCard && nShingles <= CardCapShingles
    var table: Array[Long] = null
    var mask = 0
    var seenZero = false
    var card = 0L
    if (trackCard) {
      var cap = 4
      while (cap < nShingles * 2) cap <<= 1
      table = new Array[Long](cap)
      mask = cap - 1
    }
    var sh = 0
    while (sh < nShingles) {
      val start = starts(sh)
      val lastTok = math.min(sh + 2, numToks - 1)
      val end = starts(lastTok + 1) - 1
      val h = XXH64.hashUnsafeBytes(base, off + start, end - start, Seed)
      if (trackCard) {
        if (h == 0L) {
          if (!seenZero) { seenZero = true; card += 1 }
        } else {
          var idx = (h ^ (h >>> 32)).toInt & mask
          while (table(idx) != 0L && table(idx) != h) idx = (idx + 1) & mask
          if (table(idx) == 0L) { table(idx) = h; card += 1 }
        }
      }
      val seeded = XXH64.hashLong(h, Seed)
      var i = 0
      while (i < numHashes) {
        val v = XXH64.hashInt(i, seeded)
        if (v < mins(i)) mins(i) = v
        i += 1
      }
      sh += 1
    }
    if (withCard) mins(numHashes) = if (trackCard) card else CardUnknown
    mins
  }
}

/** minhash_sig_card(normalized_text, numHashes) → array<long> of
  * numHashes+1: the [[MinhashSig]] signature with the doc's distinct
  * 3-token shingle count appended — the DEPLOYED form on the prefiltered
  * candidate path ([[graft.functions.DedupOps.minhashSigsOf]] with
  * `withCard`), fusing what would otherwise be two kernels re-tokenizing
  * and re-hashing the same bytes. Spec-checked against the two standalone
  * kernels it fuses (MinhashSigSpec).
  */
case class MinhashSigCard(child: Expression, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(numHashes > 0 && numHashes <= 1024, s"minhash_sig_card: bad numHashes $numHashes")

  override def prettyName: String = "minhash_sig_card"
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    UnsafeArrayData.fromPrimitiveArray(
      MinhashSig.computeWithCard(input.asInstanceOf[UTF8String], numHashes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      s"""
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(graft.expr.MinhashSig.computeWithCard($x, $numHashes));
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** shingle_card(normalized_text) → long: the document's DISTINCT 3-token
  * shingle count, computed in the same one-pass, no-explode, no-shuffle
  * style as [[MinhashSig]] — tokenization and shingling are byte-for-byte
  * the chain documented there (the two kernels MUST agree on what a
  * shingle is, or the size-ratio prefilter below reasons about different
  * sets than the signature banded on).
  *
  * Exists for the minhash candidate self-join's size-ratio prefilter
  * (round 11, the int8-prefilter pattern applied to the Jaccard family):
  * J(A,B) ≥ θ implies min(|A|,|B|)/max(|A|,|B|) ≥ θ — an exact bound with
  * zero tuning — so carrying each doc's |distinct shingles| (ONE long)
  * through the (band,bucket) shuffle lets the bucket self-join reject
  * size-mismatched pairs in-stage, before the pair distinct and the
  * shingle re-join verify ([[graft.functions.DedupOps]]). This standalone
  * kernel is the SEMANTIC DEFINITION the specs pin; the deployed scan
  * uses the fused [[MinhashSigCard]], which computes the same count from
  * the shingle hashes the signature chain already produces (one string
  * hash per shingle instead of two).
  *
  * Distinctness is counted over the 64-bit xxhash64 of each shingle's
  * bytes (open-addressed set, O(shingles-per-doc) — per-ROW state, not an
  * aggregation buffer), not the strings themselves: a within-doc hash
  * collision undercounts by one. That is the SAME no-collision assumption
  * the minhash signature itself already rests on (colliding shingles
  * perturb the signature and hence banding recall), so the prefilter adds
  * no new assumption class; the prefiltered ≡ unfiltered equivalence is
  * pinned by ExactnessSpec and the exact-Jaccard oracle either way, since
  * the verify stage recomputes true sizes from the strings for survivors.
  */
case class ShingleCard(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def prettyName: String = "shingle_card"
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    ShingleCard.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.expr.ShingleCard.compute($x);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleCard {
  private final val Seed = 42L // Spark's xxhash64 default seed

  def compute(s: UTF8String): Long = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val n = s.numBytes
    // tokenization identical to MinhashSig.compute (see its contract doc)
    var numToks = 1
    var p = 0
    while (p < n) {
      if (Platform.getByte(base, off + p) == 0x20) numToks += 1
      p += 1
    }
    val starts = new Array[Int](numToks + 1)
    var j = 1
    p = 0
    while (p < n) {
      if (Platform.getByte(base, off + p) == 0x20) { starts(j) = p + 1; j += 1 }
      p += 1
    }
    starts(numToks) = n + 1
    val nShingles = math.max(numToks - 2, 1)
    // open-addressed long set, capacity = smallest power of two ≥ 2·n —
    // load factor ≤ 0.5 keeps probe chains short; 0 is the empty slot, a
    // genuine h == 0 is tracked by a flag. This SEMANTIC-DEFINITION kernel
    // keeps the loud 2^29 overflow guard and always returns the true
    // count; the DEPLOYED fused kernel instead degrades to the
    // MinhashSig.CardUnknown sentinel past MinhashSig.CardCapShingles
    // (see that constant's doc) — callers wanting the prefilter semantics
    // must use the fused form
    require(nShingles <= (1 << 29),
      s"shingle_card: document has $nShingles shingles (limit ${1 << 29})")
    var cap = 4
    while (cap < nShingles * 2) cap <<= 1
    val table = new Array[Long](cap)
    val mask = cap - 1
    var seenZero = false
    var card = 0L
    var sh = 0
    while (sh < nShingles) {
      val start = starts(sh)
      val lastTok = math.min(sh + 2, numToks - 1)
      val end = starts(lastTok + 1) - 1
      val h = XXH64.hashUnsafeBytes(base, off + start, end - start, Seed)
      if (h == 0L) {
        if (!seenZero) { seenZero = true; card += 1 }
      } else {
        var idx = (h ^ (h >>> 32)).toInt & mask
        while (table(idx) != 0L && table(idx) != h) idx = (idx + 1) & mask
        if (table(idx) == 0L) { table(idx) = h; card += 1 }
      }
      sh += 1
    }
    card
  }
}
