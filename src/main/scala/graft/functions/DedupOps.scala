package graft.functions

import graft.QueryPack
import graft.core.Tables
import graft.plans.GraftFunctions
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` (north-star extension,
  * SURVEY.md §7.2 step 8).
  *
  * Tiers, cheapest to most robust:
  *  - exact: sha2(normalized text) → canonical = min doc_id per hash. One
  *    shuffle on a 32-byte key at any scale.
  *  - n-gram Jaccard (exact near-dup): 3-token shingles, self-join on
  *    shingle, |∩| / |∪|. Correctness baseline; O(pairs sharing a shingle).
  *  - MinHash + LSH banding (scale path): k=16 min-hashes, 8 bands × 2
  *    rows; candidates only meet within a band bucket, then exact-verify.
  *    At 100 TB the shingle self-join above is infeasible (hot shingles
  *    explode); banding bounds the join to near-certain candidates.
  *    Planted near-dups in the test data sit at Jaccard ≥ 0.88, where
  *    P(candidate) = 1-(1-s²)^8 ≈ 1 — recall asserted in DedupSpec.
  *  - SimHash: 64-bit weighted-token signature; near-dups differ in ≤ k
  *    bits. Emitted as doc→signature (the index table); pairing is a
  *    bucketed hamming join in DedupSpec.
  */
object DedupOps extends QueryPack {

  // explicit name (not getClass, whose `$` suffix varies) so the
  // ExactnessSpec warn-tier appender can address this logger exactly
  private val log = org.slf4j.LoggerFactory.getLogger("graft.functions.DedupOps")

  /** THE normalization under every content identity in the library —
    * shared (package-visible) so TextOps' fingerprints and corpus-select
    * dedup verdict cannot drift from the dedup pack's definition.
    */
  private[functions] def normText: Column =
    regexp_replace(trim(lower(col("text"))), "\\s+", " ")

  /** Content identity: sha-256 of [[normText]] — exact-dedup key. */
  private[functions] def contentSha: Column = sha2(normText, 256)

  /** doc_id → 3-token shingles (exploded, WITH duplicates — narrow, no
    * shuffle) for any frame with (doc_id, text). Used by the exact-verify
    * slice ([[jaccardStats]]), the exact self-join baseline, and the
    * composed reference form the `minhash_sig` kernel is spec-checked
    * against. Callers that need set semantics apply `.distinct()` on the
    * (much smaller) slice they actually need.
    */
  private[graft] def shingledOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), split(normText, " ").as("toks"))
      .select(col("doc_id"), explode(transform(
        sequence(lit(1), greatest(size(col("toks")) - lit(2), lit(1))),
        i => concat_ws(" ", slice(col("toks"), i, lit(3))))).as("shingle"))

  /** [[shingledOf]] through the `word_shingles` native kernel (round 22,
    * guide §4): the composed index-transform evaluates interpreted per
    * shingle; the kernel emits the identical array in one codegen pass
    * (TextKernelsSpec pins equality). [[shingledOf]] stays the composed
    * reference — MinhashSigSpec builds the minhash reference signatures
    * from it so the kernel contracts remain independent.
    */
  private[graft] def shingledKernelOf(docs: DataFrame): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    docs
      .select(col("doc_id"), split(normText, " ").as("toks"))
      .select(col("doc_id"),
        explode(call_function("word_shingles", col("toks"))).as("shingle"))
  }

  private def shingledRaw(spark: SparkSession, dir: String): DataFrame =
    shingledKernelOf(Tables.documents(spark, dir))

  /** doc_id → distinct 3-token shingles (exploded). */
  private def shingled(spark: SparkSession, dir: String): DataFrame =
    shingledRaw(spark, dir).distinct()

  /** Exact dedup: canonical id per normalized-content hash. */
  def exactDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"content_sha")
    Tables.documents(spark, dir)
      .select($"doc_id", contentSha.as("content_sha"))
      .withColumn("canonical_id", min($"doc_id").over(w))
      .withColumn("n_copies", count(lit(1)).over(w))
      .select($"doc_id", $"content_sha", $"canonical_id", $"n_copies")
      .orderBy($"doc_id")
  }

  /** Exact n-gram Jaccard near-dup pairs (threshold 0.5). The all-pairs
    * shingle self-join is the oracle-checked baseline — and the known
    * 100 TB killer (hot shingles explode the join). With
    * `graft.sim.exact=false` the SAME stats are computed on the MinHash
    * band-bucket candidate slice instead ([[minhashCandidates]]) — the
    * path [[minhashLsh]] always uses — so the self-join never touches the
    * full corpus. ExactnessSpec asserts row-identical output on the test
    * data (banding recall is total at Jaccard ≥ 0.5 there, per DedupSpec).
    * [[connectedComponents]] consumes this, so the knob makes clustering
    * scale-safe too.
    */
  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    if (!SimilarityOps.exactSim(spark))
      return jaccardStats(spark, dir, minhashCandidates(spark, dir))
        .filter($"jaccard" >= JaccardTheta)
        .select($"d1", $"d2", $"common", $"n1", $"n2", $"jaccard")
        .orderBy($"d1", $"d2")
    val sh = shingled(spark, dir)
    val counts = sh.groupBy($"doc_id").agg(count(lit(1)).as("n"))
    val common = sh.select($"doc_id".as("d1"), $"shingle")
      .join(sh.select($"doc_id".as("d2"), $"shingle"), Seq("shingle"))
      .filter($"d1" < $"d2")
      .groupBy($"d1", $"d2").agg(count(lit(1)).as("common"))
    common
      .join(counts.select($"doc_id".as("d1"), $"n".as("n1")), Seq("d1"))
      .join(counts.select($"doc_id".as("d2"), $"n".as("n2")), Seq("d2"))
      .withColumn("jaccard", $"common" / ($"n1" + $"n2" - $"common"))
      .filter($"jaccard" >= JaccardTheta)
      .select($"d1", $"d2", $"common", $"n1", $"n2", $"jaccard")
      .orderBy($"d1", $"d2")
  }

  // gate shape: 8 bands x 2 rows = 16 hashes; minhashShape's defaults
  // derive from these so the constants and the knob default can't drift
  val BandRows = 2
  val NumBands = 8
  val NumHashes = NumBands * BandRows

  /** The Jaccard threshold every minhash-candidate consumer filters at
    * ([[ngramJaccard]], [[minhashLsh]], and [[connectedComponents]]
    * through them). Single-sourced here because the candidate self-join's
    * size-ratio prefilter is lossless ONLY against this bound: J ≥ θ ⟹
    * min(n1,n2)/max(n1,n2) ≥ θ (common ≤ min, so min·(1+θ) ≥ θ·(n1+n2) ≥
    * θ·(min+max) ⟹ min ≥ θ·max). A consumer filtering looser than θ must
    * not reuse the prefiltered candidates.
    */
  val JaccardTheta = 0.5

  /** Runtime MinHash band shape, `graft.sim.bands.minhash` =
    * `"<bands>x<rows>"` (default the gate's 8x2) — the document-side twin
    * of the embedding family's corpus-tunable shapes, resolved through the
    * same knob machinery. Rows per band trade recall for pruning exactly
    * like planes per table (band match probability is j^rows); the gate
    * never sets the knob, and the oracle is shape-independent (exact
    * Jaccard over the emitted pairs), so any recall-total shape
    * hash-matches. [[BandTuner.suggestMinhash]] picks a shape for a corpus.
    */
  private[graft] def minhashShape(spark: SparkSession): (Int, Int) =
    SimilarityOps.bandShape(spark, "minhash", defTables = NumBands, defPlanes = BandRows)

  /** MinHash signatures mh_0..mh_{n-1}, COMPOSED REFERENCE FORM. Each
    * shingle STRING is hashed once (xxhash64); the n hash functions re-hash
    * that single long with the function index — a fixed-width long hash is
    * far cheaper than hashing the variable-length string n×, and unlike a
    * linear h1+i·h2 family the re-hash keeps the functions independent
    * across LSH bands (a linear family measurably lost recall on the
    * planted pairs). `min` is duplicate-insensitive, so this consumes the
    * RAW shingle stream: the aggregation is fully map-combinable.
    *
    * The DEPLOYED path is [[minhashSigsOf]] — the `minhash_sig` native
    * kernel computing the identical signature in one pass per document,
    * with no shingle explode and no shuffle at all. This composed form
    * remains as the semantic definition the kernel is spec-checked against
    * (MinhashSigSpec asserts bit-equality on the fixtures and on
    * adversarial token shapes).
    */
  private[graft] def minhashSignatures(sh: DataFrame, numHashes: Int): DataFrame = {
    val h = xxhash64(col("shingle"))
    val aggs = (0 until numHashes).map { i =>
      min(xxhash64(h, lit(i))).as(s"mh_$i")
    }
    sh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
  }

  /** doc_id → mh_0..mh_{n-1} via the one-pass `minhash_sig` kernel
    * ([[graft.expr.MinhashSig]]): signature computed inside the scan's
    * whole-stage codegen — no shingle explode (row amplification ~one per
    * token) and, unlike [[minhashSignatures]]'s groupBy, NO corpus-wide
    * shuffle. The first shuffle on the candidate path becomes the
    * (band,bucket) groupBy over `bands` rows per doc. Bit-identical to the
    * composed form by the kernel's compatibility contract.
    */
  private[graft] def minhashSigsOf(docs: DataFrame, numHashes: Int,
      withCard: Boolean = false): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    // composed-path parity: a null text still yields ONE empty shingle
    // there (greatest(null,1)=1 and concat_ws on a null array is ""), so
    // feed the kernels "" — identical signature (and card 1), doc retained
    val in = coalesce(normText, lit(""))
    // `withCard` switches to the FUSED `minhash_sig_card` kernel: the
    // doc's distinct-shingle count (the size-ratio prefilter's input,
    // [[minhashCandidatesPlan]]) rides as slot numHashes of the signature
    // array — one tokenization and one string hash per shingle, instead
    // of a second full `shingle_card` pass over the same bytes
    val sigFn = if (withCard) "minhash_sig_card" else "minhash_sig"
    val cardCols = if (withCard)
      Seq(col("sig").getItem(numHashes).as("n_sh")) else Nil
    docs
      .select(col("doc_id"),
        call_function(sigFn, in, lit(numHashes)).as("sig"))
      .select((col("doc_id") +: cardCols) ++
        (0 until numHashes).map(i => col("sig").getItem(i).as(s"mh_$i")): _*)
  }

  /** (doc_id, bb) band-bucket memberships from a signature frame: band b's
    * bucket is the hash of its `rows` consecutive min-hashes. Shared by the
    * candidate path and [[BandTuner.suggestMinhash]]'s cost sample so the
    * priced bucketing is the deployed bucketing.
    */
  private[functions] def bandBuckets(sigs: DataFrame, bands: Int, rows: Int,
      carry: Seq[String] = Nil): DataFrame = {
    val bandCols = (0 until bands).map { b =>
      struct(lit(b).as("band"),
        xxhash64((0 until rows).map(r => col(s"mh_${b * rows + r}")): _*).as("bh"))
    }
    // `carry` columns (the prefilter's n_sh) are already materialized
    // columns of `sigs`, so they land in the Generate's
    // requiredChildOutput — listing a fresh expression here instead would
    // re-evaluate it once per band row (the int8-blob lesson,
    // SimilarityOps.lshCandidateIds)
    sigs.select((col("doc_id") +: carry.map(col)) :+
      explode(array(bandCols: _*)).as("bb"): _*)
  }

  /** MinHash+LSH near-dup: band-bucket candidates, exact-verify, emit pairs
    * with their true Jaccard. Hash-gated by EQUIVALENCE: candidates are
    * exact-verified so precision is 1.0 by construction, and banding recall
    * at Jaccard ≥ 0.5 is total on this corpus (DedupSimSpec asserts
    * LSH ≡ exact; the banded gate run re-proves it at every SF) — so the
    * plain exact-Jaccard SQL is a valid oracle for THIS output, and a
    * stronger check than rows-only: it pins that the sketch path returns
    * exactly the right pairs, not just the right number of them.
    *
    * Shuffle budget (the 100 TB view): signatures are computed by the
    * one-pass `minhash_sig` kernel inside the scan — ZERO corpus-wide
    * shuffle on the whole candidate path (the first shuffle is the
    * (band,bucket) groupBy over `bands` rows per doc). Everything
    * downstream — candidate pairing, distinct-shingle sets, Jaccard sizes
    * and intersections — runs on the candidate slice only, reached by
    * broadcasting the candidate doc-id set into a semi-join against the
    * (re-scanned, narrow) shingle stream. Banding exists precisely to make
    * that slice tiny relative to corpus.
    */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    jaccardStats(spark, dir, minhashCandidates(spark, dir))
      .filter($"jaccard" >= JaccardTheta)
      .select($"d1", $"d2", $"jaccard")
      .orderBy($"d1", $"d2")
  }

  /** Band-bucket candidate (d1 < d2) pairs from the MinHash signatures —
    * signature computation is shuffle-free ([[minhashSigsOf]]); the first
    * shuffle on this path is the (band,bucket) groupBy below.
    */
  private def minhashCandidates(spark: SparkSession, dir: String): DataFrame =
    // localCheckpoint instead of CacheManager .cache(): the pair set is
    // reused by several downstream subtrees, but a CacheManager entry is
    // pinned until an explicit unpersist — repeated invocations in a long
    // session would accumulate storage. The checkpoint's backing blocks
    // are released by the ContextCleaner as soon as the returned plan is
    // unreferenced. LAZY since round 22 (was eager): the dedicated
    // construction-time materialization job sat inside the bench's timed
    // region; letting the first consumer materialize it drops one job per
    // pass with NO double-compute of the scan+signature subtree (profiled:
    // the band-stream map stage runs once per pass either way — the first
    // consumer is jaccardStats' candDocs broadcast build, which completes
    // before the pair joins submit). A/B min-of-3 at sf0.1: eager
    // 1.40/1.16 s vs lazy 1.25/1.03 s, jobs 14 → 12 (with the shN
    // checkpoint below going lazy in the same change).
    minhashCandidatesPlan(spark, dir).localCheckpoint(false)

  /** The candidate-generation subtree WITHOUT the closing checkpoint
    * boundary — [[minhashCandidates]] minus its `localCheckpoint`, exposed
    * so plan dumps (DumpPlans) can show the signature/banding stages that
    * the checkpoint otherwise collapses to `Scan ExistingRDD`.
    *
    * CAP-ON NOTE: with [[bucketCap]] > 0 the band stream is routed through
    * an INNER `localCheckpoint` so the cap's consumers (the sizes
    * aggregation and both self-join legs) read one materialized stream
    * instead of each embedding its own copy of the scan+signature subtree
    * (measured 4 full passes; ReuseExchange did not unify them — PlanSpec
    * pins the single-pass shape). The checkpoint is LAZY (round 13, r12
    * advice #4): constructing this frame runs NO job — the first action
    * materializes the band stream once and every later pass reads the
    * persisted blocks. (On the very first action, AQE may submit the two
    * leaf stages that share the stream concurrently, so a partition can be
    * computed twice in that race — a bounded first-run cost, chosen over
    * the eager form's construction-time corpus job, which made plan dumps,
    * analysis-only tests, and A/B frame construction execute Spark jobs as
    * a side effect.) A dump with the cap set shows the capped subtree
    * above `Scan ExistingRDD`; dump with the cap unset (the default) to
    * see the full lazy pipeline.
    */
  private[graft] def minhashCandidatesPlan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (bands, rows) = minhashShape(spark)
    // bucket SELF-JOIN, not collect_set-then-explode² (round 10): the old
    // form materialized every bucket's doc list in ONE aggregation buffer
    // and then expanded |bucket|² pairs from a single row — at corpus scale
    // a degenerate band value (near-empty documents share signatures) is an
    // unbounded array in one ObjectHashAggregate buffer and a one-row
    // explosion no executor survives. The join streams the same pair set,
    // spills gracefully, and AQE's skew handling can split a hot bucket;
    // it is also the shape the embedding-side candidate route has always
    // used. shuffle_hash for the usual corpus-sized-sides reason.
    // size-ratio prefilter (round 11, the int8_keep pattern applied to the
    // Jaccard family): each doc's distinct-shingle count n_sh (ONE long,
    // `shingle_card` computed in the scan next to the signature) rides the
    // (band,bucket) shuffle, and pairs failing the lossless bound
    // min(n1,n2) ≥ JaccardTheta·max(n1,n2) are rejected INSIDE the bucket
    // self-join — before the pair distinct and the shingle re-join verify,
    // which now see only plausibly-above-θ survivors. Same A/B knob as the
    // embedding-side prefilter; answers are identical either way
    // (ExactnessSpec's prefiltered ≡ unfiltered test).
    val pf = SimilarityOps.prefilterOn(spark)
    val sigs = minhashSigsOf(Tables.documents(spark, dir), bands * rows,
      withCard = pf)
    val b = bandBuckets(sigs, bands, rows,
      carry = if (pf) Seq("n_sh") else Nil)
    // oversized-bucket drop ([[bucketCap]], off for the gate). The band
    // stream is MATERIALIZED once (lazy localCheckpoint — see the CAP-ON
    // NOTE in the scaladoc) before the cap's consumers: without it, each
    // self-join leg embeds its own copy of both the band stream and the
    // (bb,count) aggregation — measured 4 full scan+signature passes
    // where one suffices (ReuseExchange did not unify the duplicated
    // subtrees; the probe is pinned in PlanSpec). The materialized stream
    // is bands × corpus rows of id-width longs — the same width the
    // (band,bucket) shuffle already carries — and the cost is paid only
    // when the dial is on.
    val cap = bucketCap(spark)
    val bc =
      if (cap > 0) dropOversizedBuckets(b, Seq("bb"), cap, "graft.dedup.bucketcap")
      else b
    def side(d: String, ns: String): DataFrame =
      bc.select($"bb" +: $"doc_id".as(d) +:
        (if (pf) Seq($"n_sh".as(ns)) else Nil): _*).hint("shuffle_hash")
    val joined = side("d1", "ns1").join(side("d2", "ns2"), Seq("bb"))
      .filter($"d1" < $"d2")
    // sentinel pass-through (round 12, r11 advice): a doc past the fused
    // kernel's CardCapShingles carries CardUnknown (0) instead of a count
    // — such rows must never be rejected (the prefilter is optional per
    // row; the verify stage recomputes true sizes for survivors). 0 can't
    // collide with a real count (every doc has ≥ 1 shingle).
    val unknown = lit(graft.expr.MinhashSig.CardUnknown)
    val kept = if (pf)
      joined.filter($"ns1" === unknown || $"ns2" === unknown ||
        least($"ns1", $"ns2") >= lit(JaccardTheta) * greatest($"ns1", $"ns2"))
    else joined
    kept.select($"d1", $"d2").distinct()
  }

  /** `graft.dedup.bucketcap` (default 0 = off): before the candidate
    * self-join, DROP every (band,bucket) group holding more than this many
    * documents. The quadratic hazard it bounds is measured, not
    * hypothetical (SCALE.md round 12): on a boilerplate corpus the 8×2
    * shape's candidate mass grows ~quadratically in corpus size — shared
    * banner shingles supply the per-band minima for short documents, so a
    * constant FRACTION of same-size doc pairs collides, mass the size-ratio
    * prefilter cannot touch (equal sizes pass the bound) — and at 100k
    * docs the uncapped verify fan-out kills the local JVM outright. A
    * bucket of c docs contributes c(c−1)/2 enumerated pairs; capping
    * bounds total candidate mass to O(corpus × cap) — linear again.
    *
    * Semantics, stated honestly: capping is LOSSY, which is why the gate
    * profile leaves it off (the DuckDB oracle replays exact banding). A
    * pair at Jaccard j collides in each band independently with
    * probability j^rows, so a pair losing k of its colliding bands to the
    * cap is still found with 1−(1−j^rows)^(B−k) — near-dup pairs that
    * share ANY small bucket survive. What the cap removes outright is
    * pairs ALL of whose shared buckets are degenerate — i.e. documents
    * whose similarity IS the boilerplate (or thousand-fold identical
    * copies, which exact dedup upstream handles cheaper). ExactnessSpec
    * pins both directions: a permissive cap is a no-op on the gate corpus,
    * and the capped candidate set equals the independent
    * pairs-sharing-a-small-bucket reference on a boilerplate corpus.
    */
  private[graft] def bucketCap(spark: SparkSession): Int =
    spark.conf.get("graft.dedup.bucketcap", "0").toInt

  /** The oversized-bucket drop behind BOTH cap dials
    * (`graft.dedup.bucketcap` here, `graft.sim.bucketcap.<key>` in
    * [[SimilarityOps.lshCandidateIds]]) — one implementation so the two
    * cannot silently diverge (round-13 review). The bucketed stream is
    * materialized ONCE through a `localCheckpoint` so the cap's
    * consumers (the sizes aggregation, the semi-join leg, and every
    * self-join side downstream) read persisted rows instead of each
    * re-running the scan+signature subtree (measured 4 passes without
    * it); the blocks are ContextCleaner-released once the returned frame
    * is unreferenced. `shuffle_hash` on the (keys,count) side: it is
    * strictly smaller than the stream it filters, but
    * corpus-proportional — broadcast is never the scale-correct strategy
    * for it. Callers gate on cap > 0.
    *
    * EMPTY-INDEX TRIPWIRE (round 15 — r13's #1 ordered fix; discriminator
    * reworked round 16 per advice #1): a cap below corpus /
    * buckets-per-table puts EVERY bucket over the cap and the drop
    * silently returns an empty candidate set — a dedup run that quietly
    * reports "no near-dups" on a corpus full of them (measured, SCALE.md
    * round 13: sign-LSH 8×4 at 20k vectors with cap 512 → 0 candidates;
    * every bucket held ~1250). The sizes aggregation this helper computes
    * anyway makes the check nearly free: ONE eager pass over the
    * checkpointed blocks at construction (blocks the first consumer would
    * materialize immediately after). The hard-fail is a COMBINED
    * predicate: (a) ≥ 99% of BUCKETS over the cap — the pure shape
    * mismatch, which drowns every bucket at once — OR (b) ≥ 99% of the
    * row MASS over the cap while over-cap buckets are also the MAJORITY
    * of observed buckets — the skewed mismatch, where a tail of
    * near-empty buckets keeps the bucket fraction under (a) while the
    * index still empties (round-16 review). Row mass alone (the round-15
    * predicate) cannot tell either footgun from a legitimately extreme
    * hot-cluster corpus — ≥ 99% of rows in hot buckets on a matched
    * shape, exactly the case the cap exists for, which must run, not
    * fail (r16 advice #1) — hence the majority hatch in (b): a mismatch
    * means the MEAN bucket is over the cap, so uniform hashing drowns
    * essentially every occupied bucket, while a hot-cluster corpus is
    * bimodal — its background population outnumbers the hot buckets in
    * COUNT even when negligible in mass. The hatch deliberately measures
    * against OBSERVED (non-empty) buckets and stays at the 50% boundary:
    * tighter drafts (10%) hard-failed legitimate multi-cluster /
    * thin-background corpora, whose observed-bucket count shrinks as
    * clusters dominate. 99%, not 100%, on buckets in (a): the mismatch
    * drowns every bucket; a matched shape keeps its many small
    * background buckets under the cap.
    *
    * WARN TIER (round 16 — r15 verdict #1): below the hard-fail, a cap
    * can still legally excise most of the candidate MASS (a 90%-hot
    * corpus drops 90% of bucketed rows without tripping any guard). When
    * over-cap buckets hold ≥ 50% of bucketed rows — and the shape guard
    * above did not fire — log a WARNING with the same shape arithmetic
    * and the BandTuner pointer, from the stats row already in hand. The
    * query proceeds: excising a dominant hot cluster is the dial's
    * documented purpose; the warning makes the magnitude visible instead
    * of silent.
    */
  private[graft] def dropOversizedBuckets(
      bucketed: DataFrame, keys: Seq[String], cap: Int, dial: String): DataFrame = {
    val bMat = bucketed.localCheckpoint(false)
    // eager checkpoint: the groupBy over the band stream runs ONCE — the
    // tripwire stats and the semi-join build side below both read the
    // materialized (keys, bkt_n) frame (one narrow row per bucket), not
    // re-run the corpus-proportional aggregation (round-15 review)
    val sizes = bMat.groupBy(keys.map(col): _*).agg(count(lit(1)).as("bkt_n"))
      .localCheckpoint(true)
    val bn = col("bkt_n")
    val st = sizes.agg(
      coalesce(sum(bn), lit(0L)).as("total"),
      coalesce(sum(when(bn > cap, bn)), lit(0L)).as("over"),
      count(lit(1)).as("buckets"),
      coalesce(sum(when(bn > cap, lit(1L))), lit(0L)).as("overBuckets"),
      coalesce(min(when(bn > cap, bn)), lit(0L)).as("minOver")).head
    val (total, over) = (st.getLong(0), st.getLong(1))
    val (buckets, overBuckets, minOver) =
      (st.getLong(2), st.getLong(3), st.getLong(4))
    // remediation differs by dial: the sign-LSH dials have 2^planes
    // buckets per table (the measured corpus/2^planes rule); the minhash
    // dial's band buckets are hashed band values, where the fix is more
    // rows per band, not more buckets
    val remedy =
      if (dial.startsWith("graft.sim.bucketcap"))
        "This is a band-SHAPE mismatch, not a corpus property: sign-LSH has " +
          "2^planes buckets per table, so a cap below corpus/2^planes puts " +
          s"every bucket over the cap. Raise the cap to at least the smallest " +
          s"over-cap bucket ($minOver) or sharpen the shape (more planes per " +
          "table via graft.sim.bands.<key>; BandTuner.suggest names a " +
          "corpus-matched shape and cap)."
      else
        "Nearly every band bucket is degenerate at this shape: raise the cap " +
          s"to at least the smallest over-cap bucket ($minOver) or sharpen the " +
          "bands (more rows per band via graft.sim.bands.minhash; " +
          "BandTuner.suggestMinhash names a corpus-matched shape and cap)."
    // footgun = EITHER nearly every bucket drowned (the pure shape
    // mismatch) OR ≥99% of the candidate mass gone while over-cap buckets
    // are also the MAJORITY of observed buckets (round-16 review #3: a
    // skewed mismatch — 250 of 256 buckets over, a tail of near-empty
    // buckets under — evades the bucket-count test alone while emptying
    // the index). The majority threshold separates the two occupancy
    // shapes: a mismatch means mean bucket size > cap, so uniform hashing
    // puts essentially every occupied bucket over (fraction → 1); a
    // hot-cluster corpus is BIMODAL — hot buckets plus a real background
    // population that outnumbers them in bucket COUNT even when it is
    // negligible in mass. `buckets` counts OBSERVED (non-empty) buckets,
    // which shrinks as clusters dominate — a tighter hatch (an earlier
    // draft used 10%) hard-failed legitimate multi-cluster or
    // thin-background corpora for exactly that reason (review second
    // pass): 15 clusters × 8 tables = 120 hot of ~920 observed is
    // already 13%.
    val drowned = overBuckets >= 0.99 * buckets
    val massGoneBeyondHotCluster = over >= 0.99 * total && overBuckets > 0.5 * buckets
    require(total == 0L || !(drowned || massGoneBeyondHotCluster),
      s"$dial=$cap would drop ${if (over == total) "ALL" else s"$over of $total"} " +
        s"bucketed rows ($overBuckets of $buckets buckets over the cap) — the " +
        "candidate index would be silently empty(ish) and the dedup would " +
        s"report no near-dups on any corpus. $remedy")
    if (total > 0L && over >= 0.5 * total) {
      // floored, not rounded: a 98.7% fraction must never print as the
      // 99% hard-fail threshold it sits below (round-16 review, 2nd pass);
      // Locale.ROOT via core.Fmt, not the f-interpolator (round-16
      // advice #4's bench fix, extended here by r17 advice #2): f"" uses
      // the JVM default locale, so a comma-decimal JVM would log '98,70%'
      val overPct = math.floor(overBuckets * 10000.0 / math.max(buckets, 1L)) / 100
      val overPctStr = graft.core.Fmt.num(overPct, 2)
      log.warn(s"$dial=$cap drops $over of $total bucketed rows — over half " +
        s"the candidate mass ($overBuckets of $buckets buckets over the cap, " +
        s"smallest over-cap bucket $minOver). Legal — the guard reads " +
        s"$overPctStr% of buckets over the cap, below the footgun regime — " +
        "but verify the dial is sized to THIS corpus: a hot-cluster " +
        s"excision this large should be intentional. $remedy")
    }
    val small = sizes.filter(bn <= cap).select(keys.map(col): _*)
    bMat.join(small.hint("shuffle_hash"), keys, "left_semi")
  }

  /** `graft.dedup.hashverify` (default on): carry 8-byte xxhash64 shingle
    * keys instead of shingle STRINGS through the verify stage's shuffles
    * (round 12, r11 verdict #2 — the strings were the widest payload still
    * crossing a shuffle on the dedup path). Off = the legacy string-keyed
    * verify, kept as the A/B control and the collision-free semantic
    * reference (ExactnessSpec asserts the two paths emit identical rows).
    */
  private[graft] def hashVerify(spark: SparkSession): Boolean =
    spark.conf.get("graft.dedup.hashverify", "true").toBoolean

  /** Exact Jaccard stats (common, n1, n2, jaccard) computed for the given
    * candidate (d1, d2) pairs only: shingle sets are re-derived for the
    * candidate doc-id slice alone (broadcast semi-join against the narrow
    * shingle stream), never for the full corpus.
    *
    * With [[hashVerify]] on (default), the slice is keyed by
    * `xxhash64(shingle)` — 8 bytes — below its distinct, so every verify
    * shuffle (slice distinct, sizes groupBy, both legs of the common join)
    * carries fixed-width longs where it carried ~15–30 B strings. Both
    * n1/n2 and common then count hash-distinct sets: Jaccard drifts from
    * the string-set value only if xxhash64 collides among a candidate
    * document's shingles (~n²/2^64 per doc — the same accepted class as
    * the ShingleCard note), and the drift direction is symmetric (a
    * within-doc collision shrinks n, a cross-doc collision grows common).
    * CONSISTENCY BONUS that closes the r11 advice nit: the size-ratio
    * prefilter's n_sh is hash-distinct (ShingleCard, same seed-42
    * xxhash64), so prefilter bound and verify sizes now count the SAME
    * sets — the lossless bound holds exactly even under a collision,
    * instead of holding only up to string-vs-hash count skew.
    */
  private def jaccardStats(spark: SparkSession, dir: String,
      candidates: DataFrame): DataFrame = {
    import spark.implicits._
    val candDocs = candidates
      .select(explode(array($"d1", $"d2")).as("doc_id")).distinct()
    // hash ABOVE the semi-join: only the candidate slice pays the
    // per-shingle xxhash64, not the whole corpus stream (the semi-join's
    // condition needs doc_id alone, so the slice cut comes first)
    val sliced = shingledRaw(spark, dir)
      .join(broadcast(candDocs), Seq("doc_id"), "left_semi")
    // per-doc set size as a WINDOW computed INSIDE the checkpointed slice
    // (round 21): the previous shape aggregated sizes separately and
    // joined them onto the per-pair stats twice — one aggregation exchange
    // plus two joins (each an AQE stage + broadcast build). Carrying `n`
    // on the slice rows through the intersection joins costs one
    // exchange+sort on doc_id, runs ONCE in the checkpoint
    // materialization (both join legs read the persisted blocks), and
    // deletes all three; output identical (n is constant per doc_id
    // group; min() in the pair agg just picks it up).
    // Slice-proportional like everything here, so scale posture unchanged.
    val shN = (if (hashVerify(spark))
        sliced.select($"doc_id", xxhash64($"shingle").as("shingle"))
      else sliced)
      .distinct()
      .withColumn("n", count(lit(1)).over(Window.partitionBy($"doc_id")))
      // candidate-slice only; localCheckpoint over .cache() for the same
      // ContextCleaner-managed lifetime as minhashCandidates above. LAZY
      // since round 22 (was eager), same reasoning and A/B as there: the
      // first join leg materializes the slice, the second reads the
      // persisted blocks — one construction job less per pass, slice
      // subtree still computed exactly once (profiled).
      .localCheckpoint(false)
    // NO broadcast hint on the candidate PAIR set (round 11): it is
    // candidate-proportional, and a forced broadcast of it is the same
    // pathology class as the r10 blob broadcast — measured fatal on a
    // boilerplate corpus at the 16x1 recall-total shape (37 M surviving
    // pairs → notEnoughMemoryToBuildAndBroadcastTableError on the
    // driver). AQE converts these joins to broadcast at runtime whenever
    // the sides are genuinely small (the gate corpus), and shuffles them
    // when they aren't — the id-width candDocs semi-join above keeps its
    // hint because it IS the slice contract (ids only, never
    // pair-shaped).
    candidates
      .join(shN.select($"doc_id".as("d1"), $"shingle", $"n".as("n1")), Seq("d1"))
      .join(shN.select($"doc_id".as("d2"), $"shingle", $"n".as("n2")), Seq("d2", "shingle"))
      .groupBy($"d1", $"d2")
      .agg(count(lit(1)).as("common"), min($"n1").as("n1"), min($"n2").as("n2"))
      .withColumn("jaccard", $"common" / ($"n1" + $"n2" - $"common"))
  }

  /** 64-bit SimHash signatures as a LONG column over any frame with
    * (doc_id, text): bit b set iff Σ_tokens count·(±1) > 0, sign from bit b
    * of a 64-bit hash of the token. The hash is md5-DERIVED (top 8 digest
    * bytes, assembled from two 32-bit `conv` halves so no ANSI overflow):
    * md5 exists bit-identically in every engine, which is what lets the
    * DuckDB oracle recompute the signature bit-for-bit. xxhash64 is ~5×
    * cheaper per token and is the swap-in when cross-engine
    * reproducibility of the signature doesn't matter; the plan shape
    * (map-combinable vote sums, one shuffle) is identical either way.
    */
  def simhashSig(docs: DataFrame): DataFrame = {
    val tokenCounts = docs
      .select(col("doc_id"), explode(split(normText, " ")).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("cnt"))
      .withColumn("md", md5(col("token")))
      .withColumn("th",
        shiftleft(conv(substring(col("md"), 1, 8), 16, 10).cast("long"), 32)
          .bitwiseOR(conv(substring(col("md"), 9, 8), 16, 10).cast("long")))
    val votes = (0 until 64).map { b =>
      sum(when(shiftright(col("th"), b).bitwiseAND(lit(1L)) === 1L, col("cnt"))
        .otherwise(-col("cnt"))).as(s"v_$b")
    }
    val sig = (0 until 64).map { b =>
      when(col(s"v_$b") > 0, shiftleft(lit(1L), b)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
    tokenCounts.groupBy(col("doc_id")).agg(votes.head, votes.tail: _*)
      .select(col("doc_id"), sig.as("sig"))
  }

  /** doc_id → 64-bit SimHash signature via the one-pass `simhash_sig`
    * kernel ([[graft.expr.SimhashSig]]): computed inside the scan — no
    * token explode and NEITHER of the composed form's two corpus-wide
    * shuffles (the (doc,token) count groupBy and the 64-vote groupBy).
    * Bit-identical by the kernel's compatibility contract (SimhashSigSpec);
    * the `text IS NOT NULL` filter mirrors the composed form, where a null
    * text explodes to nothing and the doc never reaches the frame.
    */
  private[graft] def simhashSigsOf(docs: DataFrame): DataFrame = {
    GraftFunctions.register(docs.sparkSession)
    docs
      .where(col("text").isNotNull)
      .select(col("doc_id"), call_function("simhash_sig", normText).as("sig"))
  }

  /** SimHash index table (doc_id → signature hex), the artifact a
    * hamming-distance pairing job consumes. Hash-gated: the DuckDB oracle
    * rebuilds the md5-derived signature bit-for-bit (see [[simhashSig]]).
    */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    simhashSigsOf(Tables.documents(spark, dir))
      .select($"doc_id", lower(lpad(hex($"sig"), 16, "0")).as("simhash_hex"))
      .orderBy($"doc_id")
  }

  val SimhashBands = 4
  val SimhashMaxHamming = 3

  /** SimHash near-dup PAIRING — the consumer of the [[simhash]] index
    * table: all pairs within hamming distance ≤ 3 of the 64-bit signature.
    * Banded by pigeonhole: split the signature into 4 bands of 16 bits;
    * any pair differing in ≤ 3 bits must agree EXACTLY on at least one
    * band, so band-equality buckets have recall 1 by theorem (not by
    * tuning) and the all-pairs O(n²) popcount becomes O(Σ bucket²) with
    * one shuffle on (band, value) — the same construction the reference's
    * dedup pipelines used over MapReduce sort buckets. Candidates carry
    * two longs; the distinct never touches text.
    */
  def simhashPairs(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // fan out: unlike [[simhash]] (index only, where the A/B measured the
    // exchange costing more than the kernel), the pairing pays the sig
    // kernel AND the band self-join above one scan task — fan-out
    // measured 1.0 -> 0.6-0.7 s
    val sigs = simhashSigsOf(graft.core.Fanout.maybeFanout(
      Tables.documents(spark, dir), col("doc_id")))
    val banded = sigs.select($"doc_id", $"sig",
        explode(array((0 until SimhashBands).map { t =>
          struct(lit(t).as("band"),
            shiftright($"sig", 16 * t).bitwiseAND(lit(0xFFFFL)).as("bv"))
        }: _*)).as("tb"))
      .select($"doc_id", $"sig", $"tb.band", $"tb.bv")
    banded.select($"band", $"bv", $"doc_id".as("d1"), $"sig".as("s1"))
      .join(banded.select($"band", $"bv", $"doc_id".as("d2"), $"sig".as("s2")),
        Seq("band", "bv"))
      .filter($"d1" < $"d2")
      .select($"d1", $"d2", $"s1", $"s2").distinct()
      .withColumn("hamming", expr("bit_count(s1 ^ s2)"))
      .filter($"hamming" <= SimhashMaxHamming)
      .select($"d1", $"d2", $"hamming".cast("int").as("hamming"))
      .orderBy($"d1", $"d2")
  }

  /** Embedding-cosine near-dup: canonical id = min vec_id among neighbors
    * with cosine ≥ 0.9 (self included — cos(v,v)=1). Exact all-pairs form
    * is the oracle-checked baseline; with `graft.sim.exact=false` the SAME
    * neighbor filter + canonical groupBy runs over banded LSH candidates
    * ([[SimilarityOps.lshCandidateIds]]) — a tight 0.9 threshold (26°)
    * tolerates 4-bit tables, so 8 tables × 4 planes: candidate volume
    * O(Σ bucket²) instead of the n² cross join, int8-prefiltered inside
    * the candidate self-join ([[SimilarityOps.lshCandidateIds]]
    * `prefilterTheta` — lossless by the [[graft.expr.Int8Blob]] margin
    * bound, so the float verify below sees near-threshold survivors only).
    * ExactnessSpec asserts the two paths agree on the test data.
    * Reference analogue: none (north-star extension).
    */
  /** Near-dup cosine floor, shared by the float verify and the banded
    * route's int8 prefilter (lossless only at the same θ). */
  val CosDedupThreshold = 0.9

  def embeddingCosineDedup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.plans.GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, dir)
    val neighbors =
      if (SimilarityOps.exactSim(spark)) {
        // exact theta-join scores C(n,2) pairs: precomputed norms + cosPre
        // (bit-identical to the cosine_sim kernel incl. the zero-norm →
        // 0.0 convention, ~3× less per-pair work — SimilarityOps.cosPre)
        val en = e.withColumn("nrm", SimilarityOps.normCol)
        val a = SimilarityOps.vecSide(en, "v1", "e1", "n1")
        val b = SimilarityOps.vecSide(en, "v2", "e2", "n2")
        a.join(b, $"v1" === $"v2" ||
            SimilarityOps.cosPre("e1", "e2", "n1", "n2") >= CosDedupThreshold)
          .select($"v1", $"v2")
      } else {
        val (t, p) = SimilarityOps.bandShape(spark, "cosdedup", defTables = 8, defPlanes = 4)
        val cand = SimilarityOps.lshCandidateIds(spark, dir, nTables = t, planesPerTable = p,
          probeBits = SimilarityOps.probeBitsOf(spark, "cosdedup", p),
          prefilterTheta = Some(CosDedupThreshold), capKey = "cosdedup")
        val near = cand.union(cand.select($"v2".as("v1"), $"v1".as("v2")))
          .join(e.select($"vec_id".as("v1"), $"embedding".as("e1")), Seq("v1"))
          .join(e.select($"vec_id".as("v2"), $"embedding".as("e2")), Seq("v2"))
          .filter(expr("cosine_sim(e1, e2)") >= CosDedupThreshold)
          .select($"v1", $"v2")
        // self-pairs (cos(v,v)=1) join the candidate hits explicitly
        near.union(e.select($"vec_id".as("v1"), $"vec_id".as("v2")))
      }
    neighbors
      .groupBy($"v1")
      .agg(min($"v2").as("canonical_id"), (count(lit(1)) - 1).as("n_near_dups"))
      .select($"v1".as("vec_id"), $"canonical_id", $"n_near_dups")
      .orderBy($"vec_id")
  }

  /** Exact dedup with a KEEP POLICY: per content hash keep the longest
    * document (ties → min doc_id) — the realistic corpus policy ("keep the
    * most complete copy"), vs [[exactDedup]]'s neutral min-id canonical.
    */
  def exactDedupKeepLongest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    // keep-policy argmax ("longest, ties to min id") via arg_max_long —
    // flat primitive buffers keep the plan a streaming HashAggregate over
    // the corpus; the max_by(struct, struct) form planned as SortAggregate
    // and sorted every partition's document stream (SCALE.md round 7).
    // n_chars rides as the double score (int64 lengths are far below the
    // 2^53 lossless bound) and is cast back on the way out.
    GraftFunctions.register(spark)
    Tables.documents(spark, dir)
      .select($"doc_id", $"n_chars", sha2(normText, 256).as("content_sha"))
      .groupBy($"content_sha")
      .agg(expr("arg_max_long(doc_id, CAST(n_chars AS DOUBLE))").as("b"))
      .select($"b.id".as("doc_id"), $"content_sha",
        $"b.score".cast("long").as("n_chars"))
      .orderBy($"doc_id")
  }

  /** Hard cap on large-star/small-star rounds. [[starComponents]] needs
    * O(log² n) rounds worst-case (O(log n) observed — StarComponentsSpec
    * pins a 300-node path at ≤ 12), so 64 is unreachable for any corpus
    * that fits on hardware; hitting it means a logic bug, and the loop
    * FAILS LOUDLY rather than emitting fractured clusters (the silent
    * 25-round min-label cap was round 11's one `weak` mark).
    */
  private val MaxStarRounds = 64

  /** Connected-components core: alternating large-star/small-star edge
    * contraction (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SOCC'14 — a public algorithm) over an undirected edge set.
    * Returns each node's component label = min node id in its component,
    * plus the round count (exposed for the convergence-rate spec).
    *
    * Why not min-label propagation (the round-11 form): that loop needs
    * O(graph diameter) rounds, and a near-dup CHAIN (A~B~C~… through
    * shared boilerplate) makes diameter unbounded — at 25 rounds it exited
    * SILENTLY un-converged, fracturing clusters with no error. Star
    * contraction halves path lengths every alternation:
    *  - large-star: every node u links each STRICTLY LARGER neighbor v to
    *    m = min(N(u) ∪ {u});
    *  - small-star: orienting edges toward the larger endpoint u, u and
    *    each smaller neighbor link to m = min of the small neighborhood.
    * Both steps preserve connectivity (each dropped edge is re-expressed
    * through m), keep every intermediate edge (m, v) with m < v, and the
    * fixpoint is a star per component centered at its min id — the SAME
    * min-id semantics as label propagation, reached in O(log) rounds
    * instead of O(diameter). Each round is two groupBy+join shuffles on
    * id-width rows; `localCheckpoint` truncates lineage per round
    * (the iterative-algorithm pattern Pregel/GraphFrames use).
    * Deployment caveat: localCheckpoint stores blocks on executors, so
    * an executor loss mid-job forfeits them (no lineage left to
    * recompute) — right for local[32] and on-demand clusters, but on a
    * PREEMPTIBLE cluster substitute reliable `checkpoint` with a
    * `sparkContext.setCheckpointDir` to durable storage, at one HDFS
    * write per round (the standard Pregel production posture).
    *
    * Convergence test is EXACT, not a checksum: both edge sets are
    * distinct, so |next| = |cur| ∧ next∖cur = ∅ ⟺ next = cur — a hash
    * signature could collide into false convergence (a quiet wrong answer,
    * the exact failure class this rewrite removes). (next∖cur = ∅ means
    * next ⊆ cur; with equal cardinalities of distinct sets that IS set
    * equality, so the left_anti emptiness probe below is the same test
    * `except(...).isEmpty` ran, minus except's extra distinct shuffle.)
    *
    * Job budget per round (round 13, closing the r12 verdict's one
    * remaining CC inefficiency — ~4 driver actions/round of fixed
    * overhead): the new edge set is LAZILY localCheckpoint'd and the
    * `count()` action materializes checkpoint AND cardinality in ONE job;
    * the set-equality probe only runs in rounds where the cardinality
    * matched (at most the final round plus checksum-unreachable ties), and
    * each superseded round's checkpoint blocks are unpersisted
    * DETERMINISTICALLY (not left to ContextCleaner GC timing — executor
    * block-store usage stays O(current round), flat in round count).
    */
  /** One large-star + small-star contraction round over a canonical
    * (lo < hi, distinct) edge frame — the loop body of [[starComponents]],
    * exposed so plan tooling can dump a round's physical plan (the loop
    * runs during query CONSTRUCTION, so the declared query's explain never
    * shows it).
    *
    * Shuffle budget (round 22, guide §2.4): THREE exchanges per round where
    * the round-21 form paid six (sym groupBy(u), sym⋈lMin on u, large-star
    * distinct on (lo,hi), ls groupBy(hi), ls⋈sMin on hi, final distinct):
    *  - large-star: ONE `repartition(u)` serves both the neighborhood-min
    *    aggregation and the re-link join (both sides arrive hash-partitioned
    *    on u, so neither plans its own exchange — "two operations keyed the
    *    same way share one exchange"). The join stays a JOIN (shuffle_hash,
    *    no sort) rather than a window: large-star groups by u over the
    *    SYMMETRIC edge set, and a component's min-node neighborhood is the
    *    whole component — a window would funnel that hot key through one
    *    task with no recourse, while AQE's skew handling can split a join.
    *  - small-star: ONE `repartition(hi)` serves the large-star output's
    *    distinct (hash(hi) co-locates equal (lo,hi) pairs, so the aggregate
    *    needs no exchange of its own) AND the per-hi min window. Grouping
    *    here is by the LARGER endpoint, whose neighborhoods stay small
    *    (star arms group singly), so the window's one-task-per-key shape is
    *    safe where it wasn't for large-star. The window also replaces the
    *    join outright: each row emits (m, lo) when lo ≠ m, and the unique
    *    lo = m row emits (m, hi) — exactly the old join-branch ∪ sMin rows.
    *  - the closing distinct keys on the NEW (lo, hi), so its exchange is
    *    semantically required (convergence is an exact set test).
    * Output is row-identical to the round-21 form (StarComponentsSpec pins
    * fixpoints and round counts; the per-round edge SET is unchanged, so
    * round counts cannot drift).
    */
  private[graft] def contractionRound(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    // large-star: symmetric neighborhoods; m = min(N(u) ∪ {u}) via the
    // group min, then each larger neighbor re-links to m. m ≤ u < v, so
    // the (m, v) output is already lo<hi-canonical and never a self-loop.
    val sym = edges.select($"lo".as("u"), $"hi".as("v"))
      .union(edges.select($"hi".as("u"), $"lo".as("v")))
      .repartition($"u")
    val lMin = sym.groupBy($"u").agg(min($"v").as("mn"))
      .select($"u", least($"u", $"mn").as("m"))
    val ls = sym.join(lMin.hint("shuffle_hash"), Seq("u")).filter($"v" > $"u")
      .select($"m".as("lo"), $"v".as("hi"))
    // small-star on the large-star output: one exchange on the larger
    // endpoint hi carries the dedup AND the per-hi min; the row with
    // lo = m is unique per hi after the distinct, so the two output
    // branches partition the windowed rows exactly
    val w = Window.partitionBy($"hi")
    ls.repartition($"hi").distinct()
      .withColumn("m", min($"lo").over(w))
      .select(when($"lo" === $"m", struct($"m".as("lo"), $"hi".as("hi")))
        .otherwise(struct($"m".as("lo"), $"lo".as("hi"))).as("e"))
      .select($"e.lo".as("lo"), $"e.hi".as("hi"))
      .distinct()
  }

  private[graft] def starComponents(nodes: DataFrame, pairs: DataFrame): (DataFrame, Int) = {
    val spark = nodes.sparkSession
    import spark.implicits._
    var edges = pairs
      .select(least($"d1", $"d2").as("lo"), greatest($"d1", $"d2").as("hi"))
      .filter($"lo" =!= $"hi").distinct().localCheckpoint(false)
    var nCur = edges.count() // materializes the lazy checkpoint, same job
    var rounds = 0
    var converged = nCur == 0L
    while (!converged) {
      if (rounds >= MaxStarRounds)
        throw new IllegalStateException(
          s"connected components: star contraction still changing after $rounds rounds " +
            s"(${nCur} edges) — O(log² n) convergence makes this unreachable; logic bug")
      val next = contractionRound(edges).localCheckpoint(false)
      val nNext = next.count() // one job: compute, persist blocks, count
      converged = nNext == nCur &&
        next.join(edges, Seq("lo", "hi"), "left_anti").isEmpty
      // `next` is fully materialized and the probe (if any) has run, so
      // this round's input edges are dead — release their blocks now
      unpersistCheckpoint(edges)
      edges = next
      nCur = nNext
      rounds += 1
    }
    // fixpoint edges are stars (lo = component min); min-per-hi guards the
    // join against any duplicate star arms, singletons label themselves
    val labels = nodes.select($"doc_id")
      .join(edges.groupBy($"hi".as("doc_id")).agg(min($"lo").as("mn")),
        Seq("doc_id"), "left")
      .select($"doc_id", coalesce($"mn", $"doc_id").as("label"))
    (labels, rounds)
  }

  /** Release the executor blocks behind a localCheckpoint'd frame the
    * moment a contraction round supersedes it. The plan behind such a
    * frame is exactly the `LogicalRDD` wrapping the persisted RDD, so the
    * unpersist is a direct handle release — without it the blocks survive
    * until ContextCleaner notices the dropped reference at some future GC,
    * and a long contraction accumulates every round's edge set in the
    * executor block store (the r12 advice finding). Non-blocking: the
    * caller never re-reads the superseded frame — Spark logs a WARN that
    * the truncated lineage "cannot be recomputed after unpersisting",
    * which is precisely the point: the frame is dead. No-op on any other
    * plan shape (defensive only — every caller passes a checkpointed
    * frame).
    */
  private def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _ => ()
    }

  /** Near-dup CLUSTERS: connected components over the ≥0.5-Jaccard pair
    * graph, cluster id = min doc_id in the component. Pairwise canonicals
    * aren't transitive (A~B, B~C but A≁C still belong together); dedup
    * pipelines cluster before keeping one doc per cluster. The fixpoint is
    * computed by [[starComponents]] (O(log) alternating star rounds —
    * diameter-safe, fail-loud). Oracle: DuckDB recursive CTE
    * (reachability → min) — same fixpoint, declaratively.
    */
  def connectedComponents(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val pairs = ngramJaccard(spark, dir).select($"d1", $"d2")
    val nodes = Tables.documents(spark, dir).select($"doc_id")
    val (labels, _) = starComponents(nodes, pairs)
    labels.select($"doc_id", $"label".as("cluster_id"))
      .withColumn("is_canonical", ($"doc_id" === $"cluster_id").cast("boolean"))
      .orderBy($"doc_id")
  }

  /** The end of the dedup pipeline: ONE representative per near-dup
    * cluster, chosen by a keep policy (longest, ties → min doc_id — same
    * policy as [[exactDedupKeepLongest]] but over [[connectedComponents]]
    * clusters instead of exact-hash groups). This is the op that actually
    * shrinks the corpus; everything upstream only discovers structure.
    * The argmax is `arg_max_long` — a streaming HashAggregate with one
    * winner per (cluster, partition) in the shuffle; the struct-buffer
    * `max_by` form would SortAggregate the whole document stream
    * (SCALE.md round 7).
    */
  def clusterKeepBest(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    GraftFunctions.register(spark)
    connectedComponents(spark, dir)
      .join(Tables.documents(spark, dir).select($"doc_id", $"n_chars"), Seq("doc_id"))
      .groupBy($"cluster_id")
      .agg(expr("arg_max_long(doc_id, CAST(n_chars AS DOUBLE))").as("b"),
        count(lit(1)).as("cluster_size"))
      .select($"cluster_id", $"b.id".as("kept_doc_id"),
        $"b.score".cast("long").as("n_chars"), $"cluster_size")
      .orderBy($"cluster_id")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_cluster_keep_best" -> (clusterKeepBest _),
    "dedup_connected_components" -> (connectedComponents _),
    "dedup_exact" -> (exactDedup _),
    "dedup_exact_keep_longest" -> (exactDedupKeepLongest _),
    "dedup_ngram_jaccard" -> (ngramJaccard _),
    "dedup_minhash_lsh" -> (minhashLsh _),
    "dedup_simhash" -> (simhash _),
    "dedup_simhash_pairs" -> (simhashPairs _),
    "dedup_embedding_cosine" -> (embeddingCosineDedup _))

  /** DuckDB rebuild of the md5-derived SimHash, bit-for-bit: same token
    * counts, same top-8-digest-byte hash (hex-string cast — DuckDB reads
    * '0x…' into UBIGINT), same vote sums; the output hex is assembled
    * digit-by-digit from the vote signs (DuckDB's `<<` range-checks at bit
    * 63, so no shift-based assembly).
    */
  /** Shared CTE prefix rebuilding the 64 per-bit vote sums (`v_0..v_63`)
    * of the md5-derived SimHash — consumed by both the index oracle
    * (hex digits) and the pairing oracle (bands + hamming). */
  private val duckSimhashVotes: String = {
    val votes = (0 until 64).map(b =>
      s"SUM(CASE WHEN (th >> $b) & 1 = 1 THEN cnt ELSE -cnt END) AS v_$b")
      .mkString(",\n    ")
    s"""WITH nt AS (
       |  SELECT doc_id, string_split(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'), ' ') AS toks
       |  FROM documents),
       |tok AS (
       |  SELECT doc_id, t AS token, COUNT(*) AS cnt
       |  FROM nt, UNNEST(toks) AS u(t) GROUP BY 1, 2),
       |h AS (
       |  SELECT doc_id, cnt,
       |    CAST('0x' || substr(md5(token), 1, 16) AS UBIGINT) AS th
       |  FROM tok),
       |v AS (
       |  SELECT doc_id,
       |    $votes
       |  FROM h GROUP BY doc_id)""".stripMargin
  }

  private val duckSimhash: String = {
    val digits = (1 to 16).map { i =>
      val base = 4 * (16 - i)
      val dv = (3 to 0 by -1)
        .map(k => s"(CASE WHEN v_${base + k} > 0 THEN ${1 << k} ELSE 0 END)")
        .mkString(" + ")
      s"substr('0123456789abcdef', ($dv) + 1, 1)"
    }.mkString(" ||\n  ")
    s"""$duckSimhashVotes
       |SELECT doc_id,
       |  $digits AS simhash_hex
       |FROM v ORDER BY doc_id""".stripMargin
  }

  /** Banded hamming pairing replayed from the votes: same 4×16-bit bands,
    * same pigeonhole candidates, hamming as the sum of band popcounts. */
  private val duckSimhashPairs: String = {
    def bandExpr(t: Int): String = (0 until 16)
      .map(k => s"(CASE WHEN v_${16 * t + k} > 0 THEN ${1 << k} ELSE 0 END)")
      .mkString(" + ")
    val bandCols = (0 until SimhashBands).map(t => s"(${bandExpr(t)}) AS b$t").mkString(",\n    ")
    val unioned = (0 until SimhashBands)
      .map(t => s"SELECT doc_id, $t AS t, b$t AS bv FROM b")
      .mkString("\n  UNION ALL ")
    val hamming = (0 until SimhashBands)
      .map(t => s"bit_count(xor(x.b$t, y.b$t))").mkString(" + ")
    s"""$duckSimhashVotes,
       |b AS (
       |  SELECT doc_id,
       |    $bandCols
       |  FROM v),
       |e AS (
       |  $unioned),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS d1, c.doc_id AS d2
       |  FROM e a JOIN e c ON a.t = c.t AND a.bv = c.bv AND a.doc_id < c.doc_id)
       |SELECT d1, d2, hamming FROM (
       |  SELECT d1, d2, CAST($hamming AS INT) AS hamming
       |  FROM cand JOIN b x ON x.doc_id = cand.d1
       |            JOIN b y ON y.doc_id = cand.d2)
       |WHERE hamming <= $SimhashMaxHamming ORDER BY d1, d2""".stripMargin
  }

  /** Shared recursive-CTE prefix: shingles → ≥0.5-Jaccard edges →
    * reachability (`r(node, reach)`), the fixpoint both cluster oracles
    * aggregate over.
    */
  private lazy val duckCCReach: String =
    s"""${duckShingles.replace("WITH nt AS", "WITH RECURSIVE nt AS")},
       |pairs AS (
       |  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS common
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |jp AS (
       |  SELECT d1, d2 FROM pairs
       |  JOIN cnt ca ON ca.doc_id = d1 JOIN cnt cb ON cb.doc_id = d2
       |  WHERE common * 1.0 / (ca.n + cb.n - common) >= 0.5),
       |e AS (SELECT d1 AS src, d2 AS dst FROM jp
       |      UNION ALL SELECT d2, d1 FROM jp),
       |r AS (
       |  SELECT doc_id AS node, doc_id AS reach FROM documents
       |  UNION
       |  SELECT r.node, e.dst FROM r JOIN e ON e.src = r.reach)""".stripMargin

  private val duckShingles =
    """WITH nt AS (
      |  SELECT doc_id, string_split(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'), ' ') AS toks
      |  FROM documents),
      |sh AS (
      |  SELECT DISTINCT doc_id, array_to_string(toks[i:i+2], ' ') AS shingle
      |  FROM nt, UNNEST(range(1, GREATEST(len(toks) - 2, 1) + 1)) AS u(i)),
      |cnt AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id)""".stripMargin

  override def oracle: Map[String, String] = Map(
    "dedup_exact" ->
      """WITH h AS (
        |  SELECT doc_id,
        |    sha256(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS content_sha
        |  FROM documents)
        |SELECT doc_id, content_sha,
        |  MIN(doc_id) OVER (PARTITION BY content_sha) AS canonical_id,
        |  COUNT(*) OVER (PARTITION BY content_sha) AS n_copies
        |FROM h ORDER BY doc_id""".stripMargin,
    "dedup_exact_keep_longest" ->
      """WITH h AS (
        |  SELECT doc_id, n_chars,
        |    sha256(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS content_sha
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, content_sha, n_chars,
        |    ROW_NUMBER() OVER (PARTITION BY content_sha
        |                       ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM h)
        |SELECT doc_id, content_sha, n_chars FROM r WHERE rn = 1
        |ORDER BY doc_id""".stripMargin,
    "dedup_ngram_jaccard" ->
      s"""$duckShingles,
         |pairs AS (
         |  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS common
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT d1, d2, common, ca.n AS n1, cb.n AS n2,
         |  common * 1.0 / (ca.n + cb.n - common) AS jaccard
         |FROM pairs JOIN cnt ca ON ca.doc_id = d1 JOIN cnt cb ON cb.doc_id = d2
         |WHERE common * 1.0 / (ca.n + cb.n - common) >= 0.5
         |ORDER BY d1, d2""".stripMargin,
    // Valid by the equivalence argument on minhashLsh's scaladoc: exact-
    // verified candidates (precision 1.0) + total banding recall at ≥0.5 on
    // this corpus (spec-asserted at every SF) ⇒ the LSH output IS the exact
    // ≥0.5 pair set.
    "dedup_minhash_lsh" ->
      s"""$duckShingles,
         |pairs AS (
         |  SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS common
         |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT d1, d2, common * 1.0 / (ca.n + cb.n - common) AS jaccard
         |FROM pairs JOIN cnt ca ON ca.doc_id = d1 JOIN cnt cb ON cb.doc_id = d2
         |WHERE common * 1.0 / (ca.n + cb.n - common) >= 0.5
         |ORDER BY d1, d2""".stripMargin,
    "dedup_simhash" -> duckSimhash,
    "dedup_simhash_pairs" -> duckSimhashPairs,
    "dedup_connected_components" ->
      s"""$duckCCReach
         |SELECT node AS doc_id, MIN(reach) AS cluster_id,
         |  (node = MIN(reach)) AS is_canonical
         |FROM r GROUP BY node ORDER BY doc_id""".stripMargin,
    "dedup_cluster_keep_best" ->
      s"""$duckCCReach,
         |m AS (SELECT node AS doc_id, MIN(reach) AS cluster_id FROM r GROUP BY node),
         |j AS (
         |  SELECT m.cluster_id, m.doc_id, d.n_chars
         |  FROM m JOIN documents d ON d.doc_id = m.doc_id),
         |rk AS (
         |  SELECT cluster_id, doc_id, n_chars,
         |    COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size,
         |    ROW_NUMBER() OVER (PARTITION BY cluster_id
         |                       ORDER BY n_chars DESC, doc_id) AS rn
         |  FROM j)
         |SELECT cluster_id, doc_id AS kept_doc_id, n_chars, cluster_size
         |FROM rk WHERE rn = 1 ORDER BY cluster_id""".stripMargin,
    "dedup_embedding_cosine" ->
      """WITH p AS (
        |  SELECT a.vec_id AS v1, b.vec_id AS v2
        |  FROM embeddings a JOIN embeddings b
        |    ON a.vec_id = b.vec_id
        |    OR list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                              CAST(b.embedding AS DOUBLE[])) >= 0.9)
        |SELECT v1 AS vec_id, MIN(v2) AS canonical_id, COUNT(*) - 1 AS n_near_dups
        |FROM p GROUP BY v1 ORDER BY vec_id""".stripMargin)
}
