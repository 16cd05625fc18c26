package graft.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native codegen kernels for the per-document text statistics that were
  * previously composed from interpreted higher-order functions (round 22,
  * guide §4 "expressions and codegen" / VERDICT r21 item 4).
  *
  * The composed forms — `transform(sequence(...), i => concat_ws(" ",
  * slice(toks, i, 2)))` for bigrams, `aggregate(array_sort(toks), ...)` for
  * the top-word run — are Catalyst higher-order functions: they run
  * INTERPRETED (CodegenFallback) with a per-element lambda dispatch, and
  * the run-length fold additionally pays an `array_sort` per document.
  * That per-row cost is paid at ANY scale; the round-21 scan fan-out only
  * spread it across local cores. These kernels compute the identical
  * values in one pass over the token array from inside whole-stage codegen.
  *
  * BIT-COMPATIBILITY CONTRACTS (TextKernelsSpec asserts kernel ≡ composed
  * on the fixtures and on adversarial token arrays):
  *
  * `word_bigrams(toks)` ≡ `filter(transform(sequence(1, greatest(size-1,
  * 1)), i => concat_ws(" ", slice(toks, i, 2))), b => size(split(b, " "))
  * === 2)`:
  *  - candidate i (1-based, 1..max(size-1, 1)) joins the elements at
  *    0-based positions i-1 and i (slice clips past the end);
  *  - concat_ws SKIPS null elements (a [x, null] window yields just "x");
  *  - the width filter keeps a candidate iff `split(b, " ")` has exactly
  *    two fields, i.e. iff the joined string contains exactly ONE 0x20
  *    byte (in UTF-8 the space byte never occurs inside a multi-byte
  *    sequence, so a byte scan is exact).
  *
  * `rep_stats(toks)` returns the five per-document repetition statistics
  * as one struct:
  *  - n_tokens           ≡ size(toks)
  *  - n_distinct_words   ≡ size(array_distinct(toks))  (null counts once)
  *  - n_bigrams          ≡ size(word_bigrams(toks))
  *  - n_distinct_bigrams ≡ size(array_distinct(word_bigrams(toks)))
  *  - top_word_n         ≡ aggregate(array_sort(toks), (prev="", run=0,
  *    best=0), run-length step, acc.best): array_sort groups binary-equal
  *    strings adjacently, so the max run IS the max per-word occurrence
  *    count, computed here with a count map and no sort. A null element
  *    never extends a run in the composed fold (null-safe === yields
  *    null → run resets to 1), so each null contributes exactly a run of
  *    1 — mirrored by flooring best at 1 when nulls are present. An empty
  *    array folds to the initial best = 0 on both sides.
  */
case class WordBigrams(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def prettyName: String = "word_bigrams"
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TextKernels.bigrams(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.expr.TextKernels.bigrams($x);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class RepStats(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def prettyName: String = "rep_stats"
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = RepStats.schema
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TextKernels.repStats(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.expr.TextKernels.repStats($x);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RepStats {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct_words", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false),
    StructField("n_distinct_bigrams", LongType, nullable = false),
    StructField("top_word_n", LongType, nullable = false)))
}

/** count_in(toks, set) ≡ size(filter(toks, t => t.isin(set: _*))) for a
  * QUERY-CONSTANT string set: occurrences (not distinct membership) of
  * set elements, binary string equality, null elements never match (isin
  * on null is null, which the composed filter drops). The set rides as a
  * constructor field (resolved from a foldable array literal by the
  * registry builder) so the probe is one hash lookup per token inside
  * whole-stage codegen instead of an interpreted lambda with a linear
  * In-list per element.
  */
case class CountIn(child: Expression, set: Seq[UTF8String])
    extends UnaryExpression with ExpectsInputTypes {

  override def prettyName: String = "count_in"
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  @transient private lazy val lookup: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](set.size * 2)
    set.foreach(s.add)
    s
  }

  override def nullSafeEval(input: Any): Any =
    TextKernels.countIn(input.asInstanceOf[ArrayData], lookup)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("countInSet", lookup,
      classOf[java.util.HashSet[UTF8String]].getName)
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.expr.TextKernels.countIn($x, $setRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** count_longer(toks, n) ≡ size(filter(toks, t => length(t) > n)):
  * occurrences of tokens longer than n CHARACTERS (codepoints, matching
  * `length`), null elements never match.
  */
case class CountLonger(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def prettyName: String = "count_longer"
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TextKernels.countLonger(input.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.expr.TextKernels.countLonger($x, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** count_cp_range(text, lo, hi) ≡ size(regexp_extract_all(text,
  * '[\x{lo}-\x{hi}]', 0)): occurrences of codepoints in [lo, hi]. The
  * regex character class matches single CODEPOINTS (never splitting a
  * supplementary pair), so a codepoint iteration counts identically —
  * minus the regex engine, the per-match string extraction and the
  * result-array materialization that size() immediately throws away.
  * Iterates the decoded string exactly like the regex path does (the
  * regexp expressions call toString first), so malformed-UTF-8
  * replacement behavior matches too.
  */
case class CountCpRange(child: Expression, lo: Int, hi: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def prettyName: String = "count_cp_range"
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TextKernels.countCpRange(input.asInstanceOf[UTF8String], lo, hi)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.expr.TextKernels.countCpRange($x, $lo, $hi);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** min_md5_shingle(toks) ≡ array_min(transform(SHINGLES(toks), s =>
  * md5(s))) where SHINGLES is the [[WordShingles]]/shingledOf 3-token
  * window family: the 1-permutation MinHash fingerprint. Equality holds
  * because md5's lowercase-hex encoding is order-preserving over the
  * digest bytes (each byte maps to two hex chars monotonically), so the
  * minimum hex string IS the unsigned-lexicographic minimum digest —
  * computed here without materializing the shingle array, the per-shingle
  * hex strings, or the interpreted transform lambdas.
  */
case class MinMd5Shingle(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def prettyName: String = "min_md5_shingle"
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TextKernels.minMd5Shingle(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.expr.TextKernels.minMd5Shingle($x);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** cm_cells(term, depth, width) ≡ the composed count-min bucket family
  * array((0 until depth).map(r => struct(r, conv(substring(md5(concat(
  * lit(s"$r:"), term)), 1, 8), 16, 10).cast(long) % width))): row r's
  * cell is the first 4 md5 digest bytes of "r:term" read as an unsigned
  * big-endian int, mod width — exactly what the hex substring + conv
  * base-16 parse compute, minus materializing a 32-char hex string and
  * re-parsing 8 of its chars per (token × row). The md5 derivation
  * itself stays (the cells are the DECLARED result — the DuckDB oracle
  * replays them bit-for-bit).
  */
case class CmCells(child: Expression, depth: Int, width: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def prettyName: String = "cm_cells"
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("r", IntegerType, nullable = false),
    StructField("c", LongType, nullable = false))), containsNull = false)
  override def nullIntolerant: Boolean = true

  // "r:" prefix bytes per row, computed once per expression instance —
  // Integer.toString + getBytes inside the per-term loop would be 2×depth
  // allocations per token occurrence on the exact hot path this kernel
  // de-allocates (review r22 #4)
  @transient private lazy val prefixes: Array[Array[Byte]] =
    Array.tabulate(depth)(r =>
      (r.toString + ":").getBytes(java.nio.charset.StandardCharsets.UTF_8))

  override def nullSafeEval(input: Any): Any =
    TextKernels.cmCells(input.asInstanceOf[UTF8String], prefixes, width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pRef = ctx.addReferenceObj("cmPrefixes", prefixes, "byte[][]")
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.expr.TextKernels.cmCells($x, $pRef, $width);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** word_shingles(toks) ≡ transform(sequence(1, greatest(size(toks) - 2,
  * 1)), i => concat_ws(" ", slice(toks, i, 3))) — the 3-token shingle
  * array of [[graft.functions.DedupOps.shingledOf]], WITHOUT any width
  * filter (short documents emit their single short shingle exactly like
  * the composed form; concat_ws skips null elements; slice clips at the
  * array end).
  */
case class WordShingles(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def prettyName: String = "word_shingles"
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TextKernels.shingles(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.expr.TextKernels.shingles($x);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextKernels {

  private val Space = UTF8String.fromString(" ")

  /** The composed form's candidate bigram at 1-based index i, or null when
    * the width filter drops it: concat_ws-join of the (clipped) 2-element
    * slice, kept iff it contains exactly one space byte.
    */
  private def candidate(arr: ArrayData, i: Int): UTF8String = {
    val n = arr.numElements()
    val aIdx = i - 1
    // slice(toks, i, 2) clips at the end; element nulls are skipped by
    // concat_ws, so collect the non-null parts of the window
    var a: UTF8String = null
    var b: UTF8String = null
    if (aIdx < n && !arr.isNullAt(aIdx)) a = arr.getUTF8String(aIdx)
    if (aIdx + 1 < n && !arr.isNullAt(aIdx + 1)) b = arr.getUTF8String(aIdx + 1)
    val joined =
      if (a != null && b != null) UTF8String.concat(a, Space, b)
      else if (a != null) a
      else if (b != null) b
      else UTF8String.EMPTY_UTF8
    // keep iff split(joined, " ") has exactly 2 fields = exactly one 0x20
    // byte (UTF-8: the space byte never occurs inside a multi-byte char)
    var spaces = 0
    var p = 0
    val bytes = joined.numBytes()
    while (p < bytes && spaces < 2) {
      if (joined.getByte(p) == 0x20) spaces += 1
      p += 1
    }
    if (spaces == 1) joined else null
  }

  def bigrams(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val iMax = math.max(n - 1, 1)
    val out = new java.util.ArrayList[UTF8String](math.max(n - 1, 0))
    var i = 1
    while (i <= iMax) {
      val c = candidate(arr, i)
      if (c != null) out.add(c)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  def countIn(arr: ArrayData, set: java.util.HashSet[UTF8String]): Int = {
    val n = arr.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  def countLonger(arr: ArrayData, longerThan: Int): Int = {
    val n = arr.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && arr.getUTF8String(i).numChars() > longerThan) c += 1
      i += 1
    }
    c
  }

  /** 3-token shingle at 1-based index i: concat_ws-join of the clipped
    * 3-element slice — never filtered (unlike [[candidate]]'s bigrams). */
  private def shingleAt(arr: ArrayData, i: Int): UTF8String = {
    val n = arr.numElements()
    val parts = new java.util.ArrayList[UTF8String](3)
    var k = i - 1
    val end = math.min(i + 2, n)
    while (k < end) {
      if (!arr.isNullAt(k)) parts.add(arr.getUTF8String(k))
      k += 1
    }
    if (parts.isEmpty) UTF8String.EMPTY_UTF8
    else UTF8String.concatWs(Space, parts.toArray(new Array[UTF8String](parts.size())): _*)
  }

  def shingles(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val iMax = math.max(n - 2, 1)
    val out = new Array[UTF8String](iMax)
    var i = 1
    while (i <= iMax) {
      out(i - 1) = shingleAt(arr, i)
      i += 1
    }
    new GenericArrayData(out.asInstanceOf[Array[Any]])
  }

  def countCpRange(s: UTF8String, lo: Int, hi: Int): Int = {
    // through toString like the regexp path (identical replacement-char
    // handling on malformed UTF-8), then one codepoint sweep
    val str = s.toString
    var i = 0
    var c = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      if (cp >= lo && cp <= hi) c += 1
      i += Character.charCount(cp)
    }
    c
  }

  // one MessageDigest per executor thread, reset per shingle (the
  // getInstance call would otherwise dominate the hash — SimhashSig's rule)
  private val md5Local = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  private val HexChars = "0123456789abcdef".toCharArray

  def minMd5Shingle(arr: ArrayData): UTF8String = {
    val n = arr.numElements()
    val iMax = math.max(n - 2, 1)
    val md = md5Local.get()
    var best: Array[Byte] = null
    var i = 1
    while (i <= iMax) {
      val sh = shingleAt(arr, i)
      md.reset()
      md.update(sh.getBytes)
      val d = md.digest()
      if (best == null || unsignedLess(d, best)) best = d
      i += 1
    }
    // iMax >= 1 always yields a shingle (possibly ""), so best is non-null
    val hex = new Array[Char](32)
    var k = 0
    while (k < 16) {
      hex(2 * k) = HexChars((best(k) >> 4) & 0xF)
      hex(2 * k + 1) = HexChars(best(k) & 0xF)
      k += 1
    }
    UTF8String.fromString(new String(hex))
  }

  private def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val ai = a(i) & 0xFF
      val bi = b(i) & 0xFF
      if (ai != bi) return ai < bi
      i += 1
    }
    false
  }

  def cmCells(term: UTF8String, prefixes: Array[Array[Byte]], width: Int): ArrayData = {
    val md = md5Local.get()
    val termBytes = term.getBytes
    val depth = prefixes.length
    val out = new Array[Any](depth)
    var r = 0
    while (r < depth) {
      md.reset()
      // "r:" prefix exactly as the composed concat(lit(s"$r:"), term),
      // precomputed once per expression instance
      md.update(prefixes(r))
      md.update(termBytes)
      val d = md.digest()
      // unsigned big-endian int of the first 4 digest bytes == conv(first
      // 8 hex chars, 16, 10); nonneg, so % matches the composed long %
      val v = ((d(0) & 0xFFL) << 24) | ((d(1) & 0xFFL) << 16) |
        ((d(2) & 0xFFL) << 8) | (d(3) & 0xFFL)
      out(r) = new GenericInternalRow(Array[Any](r, v % width))
      r += 1
    }
    new GenericArrayData(out)
  }

  def repStats(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    // word counts in one pass: max count == max run over the sorted array
    val counts = new java.util.HashMap[UTF8String, Integer](math.max(n * 2, 8))
    var hasNullElem = false
    var top = 0
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) hasNullElem = true
      else {
        val w = arr.getUTF8String(i)
        val c = counts.merge(w, 1, (x, y) => x + y)
        if (c > top) top = c
      }
      i += 1
    }
    if (hasNullElem && top < 1) top = 1 // composed fold: a null is a run of 1
    val nDistinctWords = counts.size() + (if (hasNullElem) 1 else 0)
    // bigram count + distinct in the same candidate sweep
    val seen = new java.util.HashSet[UTF8String](math.max(n * 2, 8))
    var nBigrams = 0L
    val iMax = math.max(n - 1, 1)
    var j = 1
    while (j <= iMax) {
      val c = candidate(arr, j)
      if (c != null) { nBigrams += 1; seen.add(c) }
      j += 1
    }
    new GenericInternalRow(Array[Any](
      n.toLong, nDistinctWords.toLong, nBigrams, seen.size().toLong, top.toLong))
  }
}
