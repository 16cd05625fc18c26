package graft

import graft.core.Tables
import org.apache.spark.sql.functions._

/** Physical-plan shape assertions — the 100 TB discipline checks
  * (SURVEY.md §7.2 step 9). Correct results with a wrong plan shape fail
  * here even though the oracle passes.
  */
class PlanSpec extends SparkSpec {
  import spark.implicits._

  test("filter and projection reach the parquet scan (pushdown + pruning)") {
    val df = Tables.lineitem(spark, sfDir)
      .filter($"l_quantity" > 45.0)
      .select($"l_orderkey", $"l_quantity")
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: [IsNotNull(l_quantity), GreaterThan(l_quantity,45.0)"),
      s"filter not pushed:\n$scan")
    assert(scan.contains("ReadSchema: struct<l_orderkey:bigint,l_quantity:double>"),
      s"columns not pruned:\n$scan")
  }

  test("dim join broadcasts (no shuffle of the fact side)") {
    val plan = planOf(graft.operators.Joins.broadcastDims(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join:\n$plan")
  }

  test("top-k compiles to TakeOrderedAndProject (no global sort)") {
    val plan = graft.operators.Relational.topK(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"expected top-k operator:\n$plan")
  }

  test("aggregation runs partial then final (combiner parity)") {
    val plan = planOf(graft.operators.Aggregates.q1PricingSummary(spark, sfDir))
    assert(plan.contains("partial_sum") || plan.contains("partial_"),
      s"expected map-side partial aggregation:\n$plan")
  }

  test("q1 stays inside whole-stage codegen") {
    // codegen stages appear as "*(n) Operator" in the executed-plan string
    val plan = planOf(graft.operators.Aggregates.q1PricingSummary(spark, sfDir))
    assert(plan.contains("*("), s"expected codegen spans:\n$plan")
  }

  test("co-bucketed tables join without a shuffle (CompositeInputFormat parity)") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // the in-memory catalog is fresh each session but the warehouse dir is
      // not: clear both, or saveAsTable trips over the stale location
      Seq("b_orders", "b_lineitem").foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS $t")
        val p = new org.apache.hadoop.fs.Path(s"/tmp/graft_warehouse/$t")
        p.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(p, true)
      }
      Tables.orders(spark, sfDir).write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
      Tables.lineitem(spark, sfDir).write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lineitem")
      val joined = spark.table("b_orders")
        .join(spark.table("b_lineitem"), $"o_orderkey" === $"l_orderkey")
        .select($"o_orderkey", $"l_quantity")
      val plan = planOf(joined)
      assert(!plan.contains("Exchange"), s"bucketed join should not shuffle:\n$plan")
      assert(joined.count() == Tables.lineitem(spark, sfDir).count())
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("point lookup on a bucketed table prunes to one bucket (MapFile parity)") {
    // fmt_bucketed_join leaves fq_orders bucketed by o_orderkey in the
    // warehouse; a key-equality filter must scan 1 of 8 buckets only
    graft.sources.Formats.bucketedJoin(spark, sfDir).collect()
    // the auto heuristic turns bucketed scans off when no join/agg wants the
    // distribution — but a point lookup wants bucket PRUNING, so pin it on
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val one = spark.table("fq_orders").filter($"o_orderkey" === 7L)
      val scan = one.queryExecution.executedPlan.toString
      assert(scan.contains("SelectedBucketsCount: 1 out of 8"),
        s"expected single-bucket pruning:\n$scan")
    } finally spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
  }

  test("partitionBy demux prunes partitions on read") {
    val path = "/tmp/graft_test/demux_prune"
    Tables.documents(spark, sfDir).write.mode("overwrite").partitionBy("lang").parquet(path)
    val one = spark.read.parquet(path).filter($"lang" === "en")
    val scan = one.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(lang"), s"no partition pruning:\n$scan")
  }

  test("eager 3-way join: pre-agg partitioning is reused by the join") {
    val plan = planOf(graft.operators.Joins.threeWayAgg(spark, sfDir))
    // the per-order pre-aggregation must exist (partial_count below the join)
    assert(plan.contains("partial_count") || plan.contains("partial_"),
      s"expected pre-aggregation below the join:\n$plan")
    // lineitem appears in exactly one scan: the fact table is read once
    val lineitemScans = "lineitem\\.parquet".r.findAllIn(plan).length
    assert(lineitemScans >= 1, s"plan lost the lineitem scan:\n$plan")
  }

  test("minhash signature aggregation is map-combined (objHashAggregate or partial min)") {
    // the corpus-wide signature groupBy must run partial→final so the only
    // full shuffle carries partial signatures, not exploded shingles
    val plan = graft.functions.DedupOps.minhashLsh(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_min") || plan.contains("partial_"),
      s"expected map-side partial min for signatures:\n$plan")
  }

  test("percentile sketch aggregates partial then final (mergeable at scale)") {
    val plan = graft.operators.Aggregates.percentilesSketch(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_percentile_approx"),
      s"expected map-side partial sketch merge:\n$plan")
  }

  test("bloom membership: the present-keys semi-join broadcasts") {
    val plan = planOf(graft.sources.Formats.bloomMembership(spark, sfDir))
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftSemi"),
      s"expected broadcast semi-join for the probe set:\n$plan")
  }

  test("LSH candidate distinct runs on id pairs, not embedding arrays") {
    val plan = graft.functions.SimilarityOps
      .lshCandidateIds(spark, sfDir, nTables = 8, planesPerTable = 4)
      .queryExecution.executedPlan.toString
    // the distinct's aggregation keys must be exactly the two id columns
    val keyPattern = """keys=\[v1#\d+L?, v2#\d+L?\]""".r
    assert(keyPattern.findFirstIn(plan).isDefined,
      s"expected distinct keyed on (v1, v2) only:\n$plan")
  }

  test("cosine top-k merges bounded heaps map-side, no window rank shuffle") {
    val plan = graft.functions.SimilarityOps.cosineTopK(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate") && plan.contains("partial_"),
      s"expected partial heap aggregation:\n$plan")
    assert(!plan.contains("Window"),
      s"window rank would shuffle every scored candidate:\n$plan")
  }

  test("cosine_sim participates in whole-stage codegen") {
    graft.plans.GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, sfDir)
    val df = e.select($"vec_id", expr("cosine_sim(embedding, embedding)").as("self"))
    val plan = planOf(df)
    assert(plan.contains("*("), s"expression fell out of codegen:\n$plan")
    assert(df.filter($"self" < 0.999999).count() == 0) // self-similarity == 1
  }

  test("int8 quantization is map-only: no shuffle below the output sort") {
    // the only Exchange allowed is the presentation orderBy's range
    // partitioning (it exists for the oracle hash); the operator itself
    // must be a single narrow scan — no hash-partitioned shuffle at all
    val plan = planOf(graft.functions.SimilarityOps.quantizeInt8(spark, sfDir))
    assert(plan.contains("rangepartitioning"), s"missing presentation sort:\n$plan")
    assert(!plan.contains("hashpartitioning"), s"quantization hash-shuffled:\n$plan")
    assert(!plan.contains("HashAggregate"), s"unexpected aggregation:\n$plan")
  }

  test("IVF inverted file never shuffles the corpus (no vec_id partitioning)") {
    // cell assignment is a per-row argmax over the inline centroid literal;
    // the only hash shuffle left in the IVF search is the per-query final
    // argmax (grouped by q_id, ≤1 row per (query, partition)). A
    // hashpartitioning on vec_id would mean the broadcast-join + re-group
    // corpus shuffle crept back in.
    val plan = planOf(graft.functions.SimilarityOps.annIvf(spark, sfDir))
    assert(!plan.contains("hashpartitioning(vec_id"),
      s"corpus re-grouped by vec_id (assignment shuffled the corpus):\n$plan")
    assert(plan.contains("hashpartitioning(q_id"),
      s"expected the per-query final argmax shuffle:\n$plan")
    // the argmax must appear EXACTLY once: an inferred IsNotNull(cell)
    // filter (nullable join key) or a collapsed projection would duplicate
    // the 16-kernel expression per corpus row — cost ×2 at 100 TB. AQE's
    // toString prints the final AND initial plans — count the final only.
    val finalPlan = plan.split("== Initial Plan ==").head
    val evals = "best_cell".r.findAllIn(finalPlan).length
    assert(evals == 1, s"argmax evaluated $evals times (expected 1):\n$finalPlan")
  }

  test("k-means Lloyd assignment evaluates the centroid argmax once per row") {
    // the training loop selects BOTH fields of the argmax struct (cell,
    // csim); CollapseProject must not inline the expensive expression into
    // each field reference — that would double every Lloyd round's scan
    // cost. Built through the PRODUCTION bestCellCol (package-private for
    // exactly this) so the pinned plan shape can't drift from the code.
    import org.apache.spark.sql.functions._
    graft.plans.GraftFunctions.register(spark)
    val e = Tables.embeddings(spark, sfDir).select($"vec_id", $"embedding")
    val dim = e.select(size($"embedding")).head().getInt(0)
    val cents = Seq((0, Seq.fill(dim)(0.1f)), (1, Seq.fill(dim)(0.2f)))
    val best = graft.functions.SimilarityOps.bestCellCol(cents, $"embedding")
    val assigned = e.withColumn("b", best)
      .select($"b.cent_id".as("cell"), $"vec_id", $"embedding", $"b.csim".as("csim"))
    val plan = assigned.queryExecution.executedPlan.toString
    val evals = "best_cell".r.findAllIn(plan).length
    assert(evals == 1, s"Lloyd argmax evaluated $evals times (expected 1):\n$plan")
  }

  test("funnel has no window operator: per-step min-aggregations only") {
    val plan = planOf(graft.operators.Events.funnel(spark, sfDir))
    assert(!plan.contains("Window"), s"funnel fell back to a window sort:\n$plan")
    assert(plan.contains("HashAggregate"), plan)
  }

  test("similarity argmax is a streaming HashAggregate, never a SortAggregate") {
    // arg_max_long exists because max_by(struct, struct) carries struct
    // aggregation buffers → SortAggregate → the whole Θ(n²/L) scored-pair
    // stream is sorted per partition (measured >90 GB spill at 250k
    // vectors, SCALE.md round 7). Pin the plan so a refactor back to the
    // composed form fails here, not on a production corpus.
    for (df <- Seq(
        graft.functions.SimilarityOps.nearestSameLabel(spark, sfDir),
        graft.functions.SimilarityOps.annLsh(spark, sfDir),
        graft.operators.Events.firstEventPerUserType(spark, sfDir))) {
      val plan = planOf(df)
      assert(!plan.contains("SortAggregate"),
        s"argmax fell back to sort-based aggregation:\n$plan")
      assert(plan.contains("arg_max_long"), plan)
    }
  }

  test("decontaminate bloom path: the might-contain predicate sits below the exact join") {
    // the outgrow path's whole value is WHERE the bloom probe runs — in
    // the corpus-side scan stage, so misses die before the (possibly
    // shuffled) exact join's exchange. A refactor that hoists it above
    // the join (or drops the exact join after it) fails here.
    // round 13: the probe is the native BloomProbe predicate (the house
    // re-housing of BloomFilterMightContain with the filter as a compact
    // field, not a hex-rendering binary literal), not a ScalaUDF — the
    // pin now also guards against a regression back to the
    // codegen-breaking UDF form
    import org.apache.spark.sql.catalyst.expressions.ScalaUDF
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
    spark.conf.set("graft.text.decontam.bloom", "true")
    try {
      val df = graft.functions.TextOps.decontaminate(spark, sfDir)
      val plan = df.queryExecution.optimizedPlan
      def bloomBelow(p: LogicalPlan): Boolean = p.collectFirst {
        case f: Filter if f.condition.exists(_.isInstanceOf[graft.expr.BloomProbe]) => f
      }.nonEmpty
      val joins = plan.collect { case j: Join => j }
      assert(joins.exists(j => j.children.exists(bloomBelow)),
        s"no might-contain filter below a join:\n$plan")
      assert(plan.collectFirst {
        case f: Filter if f.condition.exists(_.isInstanceOf[ScalaUDF]) => f
      }.isEmpty, s"the bloom probe regressed to a ScalaUDF:\n$plan")
    } finally spark.conf.unset("graft.text.decontam.bloom")
  }

  test("bloom membership probes through the native kernel — no ScalaUDF anywhere in the plan") {
    // round 15 (r13 brief #2 / r14 brief #5): the BloomMapFile membership
    // probe was the engine's last avoidable ScalaUDF — an opaque closure
    // that broke whole-stage codegen in its projection. It must ride the
    // same BloomProbe kernel as the decontamination path; a regression to
    // any UDF form fails here.
    import org.apache.spark.sql.catalyst.expressions.ScalaUDF
    val df = graft.sources.Formats.bloomMembership(spark, sfDir)
    val plan = df.queryExecution.optimizedPlan
    assert(plan.collectFirst {
      case p if p.expressions.exists(_.exists(_.isInstanceOf[graft.expr.BloomProbe])) => p
    }.nonEmpty, s"no native bloom_probe in the membership plan:\n$plan")
    assert(plan.collectFirst {
      case p if p.expressions.exists(_.exists(_.isInstanceOf[ScalaUDF])) => p
    }.isEmpty, s"the membership probe regressed to a ScalaUDF:\n$plan")
  }

  test("embedding bucket cap: one bucketing pass — the capped candidate plan rescans nothing") {
    // the embedding-side twin of the minhash one-pass pin below: with
    // graft.sim.bucketcap set, every consumer of the bucketed stream
    // (sizes agg, cap semi-join, both self-join legs) must read the ONE
    // materialized (tbl,bucket,id,blob) stream — no scan+lsh_buckets
    // subtree may be duplicated into the plan
    spark.conf.set("graft.sim.bucketcap.adhoc", "64")
    try {
      val plan = planOf(graft.functions.SimilarityOps.lshCandidateIds(
        spark, sfDir, nTables = 8, planesPerTable = 4,
        prefilterTheta = Some(0.9)))
      assert(!plan.contains("Scan parquet"),
        s"capped embedding candidate plan rescans the corpus:\n$plan")
      assert(plan.contains("LeftSemi"), s"cap semi-join missing:\n$plan")
    } finally spark.conf.unset("graft.sim.bucketcap.adhoc")
  }

  test("bucket cap: one signature pass — the capped candidate plan rescans nothing") {
    // without the explicit materialization, each self-join leg embedded
    // its own copy of the band stream AND the (bb,count) sizes
    // aggregation — 4 full scan+signature passes where one suffices
    // (ReuseExchange did not unify the duplicated subtrees; measured,
    // SCALE.md round 12). The checkpoint makes the single pass a plan
    // property: the capped candidate subtree must contain NO parquet
    // scan — every consumer reads the materialized band stream.
    spark.conf.set("graft.dedup.bucketcap", "64")
    try {
      val plan = planOf(graft.functions.DedupOps.minhashCandidatesPlan(spark, sfDir))
      assert(!plan.contains("Scan parquet"),
        s"capped candidate plan rescans the corpus:\n$plan")
      assert(plan.contains("LeftSemi"), s"cap semi-join missing:\n$plan")
    } finally spark.conf.unset("graft.dedup.bucketcap")
  }
}
