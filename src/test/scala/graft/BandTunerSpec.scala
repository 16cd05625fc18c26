package graft

import graft.functions.BandTuner
import graft.tools.Corpora

/** The band-shape advisor must reproduce both halves of the measured
  * crossover story (SCALE.md round 6): a clustered corpus at a tight
  * threshold gets an aggressive banded shape with a large predicted win,
  * and the near-uniform gate corpus at the loose 0.4 threshold gets
  * "stay exact" — the recall floor caps planes so low that buckets stay
  * fat and the candidate fraction approaches 1.
  */
class BandTunerSpec extends SparkSpec {

  test("the collision model is the Charikar law: exact at the pole, monotone both ways") {
    assert(math.abs(BandTuner.pairRecall(1.0, 8, 8) - 1.0) < 1e-9)
    val byPlanes = (1 to 12).map(BandTuner.pairRecall(0.9, 8, _))
    assert(byPlanes == byPlanes.sorted.reverse,
      "recall must fall as planes sharpen buckets")
    val byTables = (1 to 12).map(BandTuner.pairRecall(0.9, _, 8))
    assert(byTables == byTables.sorted,
      "recall must rise with more OR-ed tables")
  }

  test("clustered corpus, tight threshold: banded recommended at an aggressive shape") {
    val dir = Corpora.generate(spark, 2000)
    val a = BandTuner.suggest(spark, dir, threshold = 0.9)
    assert(a.recommendBanded, s"expected banded on a clustered corpus: $a")
    assert(a.planesPerTable >= 6, s"expected small buckets at threshold 0.9: $a")
    assert(a.predictedRecall >= 0.9, s"floor must hold at the threshold: $a")
    assert(a.predictedSpeedup >= 3.0, s"clusters must price well below n²: $a")
    assert(a.sampledVectors == 2000 && a.corpusVectors == 2000)
  }

  test("near-uniform gate corpus, loose threshold: stay exact") {
    val a = BandTuner.suggest(spark, sfDir, threshold = 0.4)
    assert(!a.recommendBanded,
      s"LSH cannot win on a near-uniform corpus at a loose threshold: $a")
    assert(a.predictedRecall >= 0.9, s"the floor still binds the shape tried: $a")
  }

  test("an unreachable recall floor is never recommended, however well it prices") {
    val dir = Corpora.generate(spark, 2000)
    // one table can't clear 0.99 at threshold 0.9 (single-plane collision
    // is 0.856) — the getOrElse(1) fallback shape must come back
    // recommendBanded=false even if the sampled cost looks good
    val a = BandTuner.suggest(spark, dir, threshold = 0.9, nTables = 1,
      recallFloor = 0.99)
    assert(a.planesPerTable == 1, s"expected the fallback shape: $a")
    assert(a.predictedRecall < 0.99, s"floor must be reported unmet: $a")
    assert(!a.recommendBanded, s"unmet floor must veto the recommendation: $a")
  }

  test("minhash model: gate shape gives 0.90 at the 0.5 threshold, ~1 for planted dups") {
    assert(math.abs(BandTuner.minhashBandRecall(0.5, 8, 2) - 0.90) < 0.01)
    assert(BandTuner.minhashBandRecall(0.8, 8, 2) > 0.999)
    assert(math.abs(BandTuner.minhashBandRecall(1.0, 8, 2) - 1.0) < 1e-9)
  }

  test("document corpus: minhash banding recommended — docs have dup structure") {
    // unlike the near-uniform embeddings, the gate documents carry planted
    // near-dups; banding should price far below all-pairs
    val a = BandTuner.suggestMinhash(spark, sfDir, jaccard = 0.8)
    assert(a.recommendBanded, s"expected banded on the document corpus: $a")
    assert(a.predictedRecall >= 0.9, s"floor must hold at j=0.8: $a")
    assert(a.nTables * a.planesPerTable <= 16, s"budget must bind: $a")
  }

  test("size-ratio dimension: a 1-row shape on the boilerplate corpus exposes killable mass") {
    // the r11 finding folded into the advice: recall-total 1-row shapes on
    // a size-heterogeneous corpus admit size-mismatched banding collisions
    // in volume — mass the default-on prefilter kills, which raw bucket
    // pricing can't see. Floor 0.95 forces rows=1 (8x2 models 0.8999 at
    // j=0.5), the boilerplate generator supplies the heterogeneity.
    val dir = Corpora.generateBoilerplateDocs(spark, 2000)
    val boiler = BandTuner.suggestMinhash(spark, dir, jaccard = 0.5,
      recallFloor = 0.95)
    info(s"boiler: $boiler")
    assert(boiler.planesPerTable == 1, s"expected the recall-total 1-row shape: $boiler")
    assert(boiler.cardCv > 0.3,
      s"log-uniform 25..500 tails must read as heterogeneous: $boiler")
    assert(boiler.prefilterKeepFraction < 0.95,
      s"expected real killable mass in the 1-row estimate: $boiler")
    // same shape on the gate corpus: its candidates are dominated by
    // planted SAME-SIZE near-dups, so less of the mass is killable — the
    // keep fraction, priced on the real banding, is the discriminator
    // (NOT cardCv: the gate docs vary in length almost as much as the
    // boilerplate tails, measured cv 0.48 vs 0.42 — heterogeneity only
    // matters where banding actually collides the mismatched sizes)
    val gate = BandTuner.suggestMinhash(spark, sfDir, jaccard = 0.5,
      recallFloor = 0.95)
    info(s"gate: $gate")
    assert(gate.planesPerTable == 1)
    assert(gate.prefilterKeepFraction > boiler.prefilterKeepFraction,
      s"gate must have less killable mass: gate=$gate boiler=$boiler")
  }

  test("bucket-cap suggestion: boilerplate corpus yields a cap in the measured dial's decade") {
    // r12 verdict #4: the advisor must name a VALUE for
    // graft.dedup.bucketcap, not just point at the dial. On the 20k-doc
    // boilerplate corpus — the exact corpus/shape of SCALE.md round 12's
    // measured table, where cap=512 verified every planted pair with the
    // quadratic mass excised — the suggestion must be finite and within
    // an order of magnitude of that validated dial (the default 10k
    // sample prices half the corpus; the n/s scaling covers the rest).
    val dir = Corpora.generateBoilerplateDocs(spark, 20000)
    val a = BandTuner.suggestMinhash(spark, dir, jaccard = 0.5)
    info(s"boiler 20k: $a")
    assert(a.suggestedBucketCap > 0, s"expected a cap on the boilerplate corpus: $a")
    assert(a.suggestedBucketCap >= 52 && a.suggestedBucketCap <= 5120,
      s"suggestion must be within an order of magnitude of the measured 512: $a")
    // clean corpus control: no degenerate buckets → no cap suggested (the
    // dial is an excision tool, not a default posture)
    val clean = BandTuner.suggestMinhash(spark, Corpora.generateDocs(spark, 2000),
      jaccard = 0.5)
    info(s"clean 2k: $clean")
    assert(clean.suggestedBucketCap == 0,
      s"a corpus without degenerate buckets must not suggest a cap: $clean")
  }

  test("suggestCapFrom scales BOTH populations to corpus units (round-13 review)") {
    // The review's scenario: n/s = 10, degThreshold = max(16, 1%·10000)
    // = 100. A genuine 900-doc cluster appears in the sample at ~90
    // (< 100 → non-degenerate); the smallest degenerate sampled bucket
    // is 100 (corpus 1000). The cap must keep the genuine cluster at
    // CORPUS scale — the pre-fix floor used sample units, said 128, and
    // excised it. Here 90×10 = 900 floors the suggestion at 1024 even
    // though the degenerate bound alone would say 512: overlap, recall
    // wins (the field's documented tie-break).
    val cap = BandTuner.suggestCapFrom(Array(2L, 5L, 90L, 100L, 400L), 10000L, 100000L)
    assert(cap >= 900, s"genuine 900-doc cluster must survive the suggested cap: $cap")
    assert(cap == 1024, s"expected the power-of-two floor over 90×10: $cap")
    // no degenerate buckets → no cap, at any scale
    assert(BandTuner.suggestCapFrom(Array(1L, 3L, 15L), 10000L, 100000L) == 0)
    // clean separation: sampled degenerate 100 (corpus 1000), largest
    // non-degenerate 30 (corpus 300) → largest power of two below 1000
    // that keeps 300: 512
    val sep = BandTuner.suggestCapFrom(Array(2L, 30L, 100L), 10000L, 100000L)
    assert(sep == 512, s"expected 512: $sep")
    // sampling-rate invariance: the same corpus sampled twice as deep
    // (observed sizes double, scale halves) must suggest the same cap —
    // the property the sample-unit floor violated by ~n/s
    val deep = BandTuner.suggestCapFrom(Array(4L, 60L, 200L), 20000L, 100000L)
    assert(deep == sep, s"suggestion must be sampling-rate invariant: $sep vs $deep")
  }

  test("suggestCapFrom: power-of-two ceiling in Long — tie-break holds at maxOk near 2^31") {
    // r14 advice #1: the non-degenerate floor's power-of-two ceiling was
    // computed in Int — at maxOk ≥ 2^30, `h * 2` overflowed negative, the
    // final math.max silently returned the degenerate bound instead, and
    // the suggested cap (2^30) excised the largest GENUINE cluster
    // (~2^31 − 2 docs at corpus scale): the exact inversion of the
    // documented recall-wins tie-break, in the function extracted to
    // prevent that bug class. Scenario: s = 10k, n such that scale ≈
    // 23.86M — the sampled 90-doc non-degenerate bucket reads ~2^31 − 2
    // at corpus scale (maxOk ≥ 2^30), the sampled 100-doc degenerate
    // bucket clamps to Int.MaxValue.
    val s = 10000L
    val n = 238609294000L
    val maxOkCorpus =
      math.min(math.ceil(90L * (n.toDouble / s)), Int.MaxValue.toDouble).toLong
    assert(maxOkCorpus > Integer.highestOneBit(Int.MaxValue),
      s"scenario must put maxOk past 2^30 to exercise the overflow: $maxOkCorpus")
    val cap = BandTuner.suggestCapFrom(Array(90L, 100L), s, n)
    assert(cap >= maxOkCorpus,
      s"tie-break must favor recall (cap ≥ scaled non-degenerate max $maxOkCorpus), got $cap")
    assert(cap == Int.MaxValue,
      s"the Long power-of-two ceiling of ~2^31−2 clamps to Int.MaxValue, got $cap")
  }

  test("sign-LSH advisor names a bucket cap on a matched shape, refuses on a mismatched one") {
    // r13 item #3 / r14 brief #4: the embedding-side dial
    // (graft.sim.bucketcap.<key>) gets the same advisor support as the
    // minhash dial — with the shape-precondition cross-check the measured
    // footgun demands (SCALE.md r13: at 8×4 on this corpus every bucket
    // holds ~1250 and cap 512 silently emptied the index; the runtime
    // tripwire now fails that loud, and the ADVICE must never name it).
    val dir = Corpora.generateDenseDupVectors(spark, 20000)
    // θ = 0.9 picks 8 planes (2^8 = 256 buckets/table) — corpus-matched:
    // the 4000-vector hot cluster collapses into one degenerate bucket
    // per table while genuine 50-vector clusters and background stay far
    // below the degeneracy threshold. The suggestion must be finite, in
    // the decade of the SCALE.md-validated 512, and above the
    // corpus/2^planes floor the runtime tripwire enforces.
    val matched = BandTuner.suggest(spark, dir, threshold = 0.9)
    info(s"matched: $matched")
    assert(matched.planesPerTable >= 8,
      s"scenario needs ≥ 2^8 buckets per table to be corpus-matched: $matched")
    assert(matched.suggestedBucketCap > 0,
      s"expected a cap on the dense-duplicate corpus: $matched")
    assert(matched.suggestedBucketCap >= 52 && matched.suggestedBucketCap <= 5120,
      s"suggestion must be within an order of magnitude of the measured 512: $matched")
    assert(matched.suggestedBucketCap.toDouble >=
      matched.corpusVectors.toDouble / math.pow(2.0, matched.planesPerTable),
      s"a suggested cap must clear the shape floor it would be deployed under: $matched")
    // θ = 0.7 caps planes at 4 (16 buckets/table): at 20k vectors every
    // bucket is over ANY cap that would excise the hot mass — the advice
    // must refuse to suggest one, not hand back the silent-empty 512
    val mismatched = BandTuner.suggest(spark, dir, threshold = 0.7)
    info(s"mismatched: $mismatched")
    assert(mismatched.planesPerTable <= 5,
      s"scenario needs a too-coarse shape for the refusal to exercise: $mismatched")
    assert(mismatched.suggestedBucketCap == 0,
      s"a cap below corpus/2^planes must be refused, not suggested: $mismatched")
  }

  test("over-cap sentinel docs price as always-kept, not as a size class") {
    // a doc past CardCapShingles carries n_sh = CardUnknown (0); the
    // deployed prefilter passes such rows through unconditionally, so the
    // advisor must price their pairs as KEPT — size-classing the 0 would
    // count them killed and break the keep-is-an-upper-bound contract.
    // Discriminating corpus: a periodic giant (tokens i % 97 ⇒ ~97
    // distinct shingles) and its 2^21-token prefix share the SAME distinct
    // shingle set, hence identical minhash signatures ⇒ they collide in
    // every band; the giant is over-cap (sentinel), the prefix's true card
    // is tiny (class ~6), so the buggy classing reads the pair as ≥2
    // classes apart (killed ⇒ keep = 0) where the pass-through semantics
    // say keep = 1.
    import graft.expr.MinhashSig.CardCapShingles
    def periodic(nToks: Int): String = {
      val sb = new java.lang.StringBuilder(nToks * 4)
      var i = 0
      while (i < nToks) { if (i > 0) sb.append(' '); sb.append(i % 97); i += 1 }
      sb.toString
    }
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_senttune").toString
    Seq((0L, periodic(CardCapShingles + 10)), (1L, periodic(1 << 21)))
      .toDF("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val a = BandTuner.suggestMinhash(spark, dir, jaccard = 0.5,
      recallFloor = 0.95)
    info(s"sentinel corpus: $a")
    assert(a.prefilterKeepFraction == 1.0,
      s"the sentinel pair must price as kept (pass-through): $a")
    // the cv excludes sentinels (a 0 is not a cardinality): one real doc
    // left ⇒ stddev_samp is null ⇒ cv 0, where classing the 0 would read
    // a wildly heterogeneous two-doc corpus
    assert(a.cardCv == 0.0, s"sentinel must not feed the cv: $a")
  }

  test("probed recall model: probeBits=0 degenerates to pairRecall, probing only helps") {
    for (cos <- Seq(0.5, 0.7, 0.9); t <- Seq(4, 8); p <- Seq(4, 10)) {
      assert(BandTuner.pairRecallProbed(cos, t, p, 0) == BandTuner.pairRecall(cos, t, p))
      val byBits = (0 to p).map(BandTuner.pairRecallProbed(cos, t, p, _))
      assert(byBits == byBits.sorted, s"recall must rise with probes: $cos $t $p")
      assert(byBits.last > byBits.head, "full-ball probing must strictly help off the pole")
    }
    // the binomial d<=1 identity at probeBits=planes: P0 + planes·q·(1-q)^(p-1)
    val q = math.acos(0.7) / math.Pi
    val expect = 1.0 - math.pow(
      1.0 - (math.pow(1 - q, 8) + 8 * q * math.pow(1 - q, 7)), 4)
    assert(math.abs(BandTuner.pairRecallProbed(0.7, 4, 8, 8) - expect) < 1e-12)
  }

  test("probing lets the same floor buy sharper tables, and prices the probe volume") {
    val dir = Corpora.generate(spark, 2000)
    val base = BandTuner.suggest(spark, dir, threshold = 0.9)
    val probed = BandTuner.suggest(spark, dir, threshold = 0.9, probeBits = 3)
    assert(probed.probeBits == 3, s"advice must carry the probe setting: $probed")
    assert(probed.planesPerTable >= base.planesPerTable,
      s"probed recall admits at least as sharp a shape: base=$base probed=$probed")
    assert(probed.predictedRecall >= 0.9, s"floor must hold under probing: $probed")
    // the probed pricing path must produce a sane fraction (self-matches
    // subtracted, never negative, capped at all-pairs)
    assert(probed.candidateFraction > 0.0 && probed.candidateFraction <= 1.0)
  }

  test("advice is deterministic") {
    val dir = Corpora.generate(spark, 2000)
    val a1 = BandTuner.suggest(spark, dir, threshold = 0.9)
    val a2 = BandTuner.suggest(spark, dir, threshold = 0.9)
    assert(a1 == a2)
  }
}
