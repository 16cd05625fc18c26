package graft

/** Pins the round-20 bench instrumentation (VERDICT r19 item 1): the
  * memory-bandwidth calibration anchors and the fixture physical stats
  * that ride the bench JSON. Both exist to make host-regime and
  * fixture-layout changes observable instead of confounds — so the spec
  * pins the parts a silent regression would corrupt: the sweep's
  * arithmetic (a wrong wrap would time PARTIAL passes and overstate
  * bandwidth), the anchors' sanity at the exact production code path,
  * and the stats' agreement with ground truth read back through Spark.
  */
class BenchInstrumentationSpec extends SparkSpec {

  test("sweep sums the whole array from any start offset (wrap is total)") {
    val a = Array.tabulate(101)(_.toLong) // 0..100 → sum 5050
    assert(Bench.sweep(a, 0) === 5050L)
    // staggered offsets — the MT anchor's thread starts — must cover the
    // SAME fixed work, or per-thread effort would depend on thread index
    for (off <- Seq(1, 37, 50, 100))
      assert(Bench.sweep(a, off) === 5050L, s"offset $off")
  }

  test("membw anchors are positive and finite on the production code path") {
    // exact production code path, small array (512 KiB) so the spec is
    // fast; no ST-vs-MT ordering assertion — at cache-resident sizes the
    // relationship is scheduler noise, not a pinned property
    val (st, mt) = Bench.calibMembw(1 << 16, 4)
    assert(st > 0.0 && java.lang.Double.isFinite(st))
    assert(mt > 0.0 && java.lang.Double.isFinite(mt))
  }

  test("fixtureStats matches ground truth on the real sf0.001 fixtures") {
    val stats = Bench.fixtureStats(sfDir)
    val byName = stats.map(s => s._1 -> s).toMap
    // every driver-generated table present, with positive physical stats
    val expected = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    for (t <- expected) {
      val (_, bytes, groups, rows) = byName.getOrElse(t, fail(s"missing table $t"))
      assert(bytes > 0L, s"$t bytes"); assert(groups > 0L, s"$t row groups")
      assert(rows > 0L, s"$t rows")
    }
    // footer row counts must agree with what Spark actually reads — the
    // stat is only useful for drift adjudication if it is ground truth
    val liRows = spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    assert(byName("lineitem")._4 === liRows)
    // bytes must agree with the filesystem
    assert(byName("lineitem")._2 ===
      java.nio.file.Files.size(java.nio.file.Paths.get(s"$sfDir/lineitem.parquet")))
  }

  test("fixtureStats handles part-file directories (Spark-written tables)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_fixstats").toString
    try {
      import spark.implicits._
      val n = 100L
      spark.range(n).map(i => (i, s"v$i")).toDF("k", "v")
        .repartition(3).write.parquet(s"$tmp/t.parquet")
      val stats = Bench.fixtureStats(tmp)
      assert(stats.map(_._1) === Seq("t"))
      val (_, bytes, groups, rows) = stats.head
      assert(rows === n)
      assert(groups >= 3L, "each non-empty part file carries >=1 row group")
      val dir = java.nio.file.Paths.get(s"$tmp/t.parquet")
      val s = java.nio.file.Files.list(dir)
      val partBytes =
        try {
          import scala.jdk.CollectionConverters._
          s.iterator.asScala.filter(_.getFileName.toString.endsWith(".parquet"))
            .map(java.nio.file.Files.size).sum
        } finally s.close()
      assert(bytes === partBytes)
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(tmp)).deleteRecursively()
    }
  }

  test("fixtureStats counts partitioned layouts and skips empty dirs") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_fixstats2").toString
    try {
      import spark.implicits._
      // partitioned table: files nest one level down (t.parquet/p=…/part-*)
      spark.range(60).map(i => (i, (i % 3).toInt)).toDF("k", "p")
        .write.partitionBy("p").parquet(s"$tmp/t.parquet")
      // empty directory: nothing readable — must be SKIPPED, not recorded
      // as (0,0,0) ground truth a drift adjudicator would misread
      java.nio.file.Files.createDirectory(java.nio.file.Paths.get(s"$tmp/empty.parquet"))
      val stats = Bench.fixtureStats(tmp)
      assert(stats.map(_._1) === Seq("t"))
      assert(stats.head._4 === 60L)
      assert(stats.head._3 >= 3L, "one row group per partition at minimum")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(tmp)).deleteRecursively()
    }
  }

  test("fixtureStats on a missing dir is empty, not an error") {
    assert(Bench.fixtureStats("/nonexistent/graft_nowhere") === Seq.empty)
  }

  test("fixturesJson renders a stable one-line object") {
    val j = Bench.fixturesJson(Seq(("a", 10L, 2L, 3L), ("b", 5L, 1L, 1L)))
    assert(j === """{"a":{"bytes":10,"row_groups":2,"rows":3},"b":{"bytes":5,"row_groups":1,"rows":1}}""")
    assert(Bench.fixturesJson(Seq.empty) === "{}")
    assert(!j.contains("\n"))
  }

  /** Representative headline record at full production width: 13 headline
    * queries + 4 banded, realistic magnitudes — what the compact line
    * carries on a real bench run.
    */
  private def productionWidthHeadline: String = {
    val qs = (1 to 13).map(i => "\"query_name_of_width_" + "%02d".format(i) + "\":0.123456789012345")
      .mkString("{", ",", "}")
    val bq = (1 to 4).map(i => "\"banded_query_name_wd_" + "%02d".format(i) + "\":1.234567890123456")
      .mkString("{", ",", "}")
    Bench.headlineJson(12.345678901234567, qs, bq,
      0.3836, 0.1731, 32, 0.1924, 0.0777, "/root/testdata/sf0.1",
      "32", "local[32]")
  }

  test("headlineJson parses as JSON with every headline key and no payload keys") {
    // the round-21 contract fix (VERDICT r20 item 1): BENCH_r20 came back
    // "parsed": null because the verbose line outgrew the driver's stdout
    // tail capture — the LAST stdout line is now this compact record
    val line = productionWidthHeadline
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
    assert(node.get("metric").asText === "total")
    assert(node.get("value").asDouble > 0.0)
    assert(node.get("unit").asText === "sec")
    assert(node.get("queries").size === 13)
    assert(node.get("banded").size === 4)
    for (k <- Seq("calib_sec", "calib_mt_sec", "calib_membw_sec", "calib_membw_mt_sec"))
      assert(node.get(k).asDouble > 0.0, k)
    assert(node.get("calib_mt_threads").asInt === 32)
    assert(node.get("sf").asText === "/root/testdata/sf0.1")
    // round 22 (VERDICT r21 item 1): the record must prove which core dial
    // and master the run actually used — the driver's scaling block flagged
    // suspect_cpus_ignored precisely because the emitted JSON couldn't
    assert(node.get("cpus").asText === "32")
    assert(node.get("master").asText === "local[32]")
    // nothing sample- or fixture-shaped may ride the compact line — those
    // payloads are exactly what outgrew the capture window
    for (k <- Seq("samples", "banded_samples", "fixtures"))
      assert(!node.has(k), k)
    assert(!line.contains("\n"))
  }

  test("headlineJson stays under the 1.5 KB capture budget at production width") {
    val bytes = productionWidthHeadline.getBytes("UTF-8").length
    assert(bytes <= 1536, s"compact headline line is $bytes bytes")
  }

  test("headlineJson escapes a hostile sf path instead of corrupting the line") {
    val line = Bench.headlineJson(1.0, "{}", "{}", 0.1, 0.1, 4, 0.1, 0.1,
      "/tmp/we\"ird\\dir\tx", "8", "local[8]")
    val node = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
    assert(node.get("sf").asText === "/tmp/we\"ird\\dir\tx")
  }

  test("fixturesJson escapes hostile table names instead of corrupting the line") {
    val j = Bench.fixturesJson(Seq(("a\"b\\c", 1L, 1L, 1L), ("t\tab", 2L, 1L, 1L)))
    assert(j === "{\"a\\\"b\\\\c\":{\"bytes\":1,\"row_groups\":1,\"rows\":1}," +
      "\"t\\u0009ab\":{\"bytes\":2,\"row_groups\":1,\"rows\":1}}")
    assert(!j.contains("\n") && !j.contains("\t"))
  }
}
