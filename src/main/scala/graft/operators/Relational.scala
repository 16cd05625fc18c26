package graft.operators

import graft.QueryPack
import graft.core.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Projection / filter / scalar-function / sort / set operators
  * (SURVEY.md §2.3, §2.6, §2.7).
  *
  * Reference parity map:
  *  - IdentityMapper/Reducer → no-op select (identity_scan)
  *  - InverseMapper (swap key↔value) → column reorder (inverse_map)
  *  - RegexMapper → `regexp_like` filter + `regexp_extract_all` explode
  *  - FieldSelectionMapReduce (Unix-cut field ranges) → split + element_at
  *  - dedup pattern (identity MR on whole record) → distinct
  *  - multi-path input union (FileInputFormat.addInputPath ×N) → unionByName
  *  - intersect/except: absent in reference, exposed as built-ins
  *  - TotalOrderPartitioner global sort → orderBy (Spark RangePartitioner
  *    samples cut points exactly like InputSampler.writePartitionFile)
  *  - top-k (single-reducer pattern) → orderBy.limit → TakeOrderedAndProject
  *  - SecondarySort example → Window.partitionBy(k).orderBy(v)
  *  - KeyFieldBasedComparator (`sort -k2,2n -k1,1r`) → typed multi-col sort
  *
  * Scale notes: global sort range-partitions after sampling (no single
  * reducer); top-k is per-partition heap + driver merge (TakeOrderedAndProject)
  * — both are exactly the reference's own tricks, built in. All filters and
  * projections here reach the parquet scan (PushedFilters / pruned ReadSchema),
  * asserted in PlanSpec.
  */
object Relational extends QueryPack {

  /** IdentityMapper parity — and a scan-pushdown witness: projection+filter
    * must land in the parquet reader, not a Spark Filter node.
    */
  def identityScan(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.nation(spark, dir).orderBy($"n_nationkey")
  }

  def inverseMap(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .select($"event_type".as("k"), $"event_id".as("v"))
      .select($"v", $"k")
      .orderBy($"v")
  }

  /** RegexMapper predicate form: lines matching a pattern. */
  def regexFilter(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .filter($"text".rlike("spark\\s+\\w+\\s+join"))
      .select($"doc_id", $"lang")
      .orderBy($"doc_id")
  }

  /** RegexMapper emit form (Grep job 1): every match of a group pattern,
    * counted. `regexp_extract_all` + explode = the 1→N mapper emit.
    */
  def regexExtract(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(explode(expr("regexp_extract_all(text, '(spark|merge|join|scan)', 1)")).as("match"))
      .groupBy($"match").agg(count(lit(1)).as("n"))
      .orderBy($"match")
  }

  /** FieldSelectionMapReduce parity: `cut`-style field spec "0-2,4" over
    * whitespace-separated records.
    */
  def fieldSelection(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select($"doc_id", split($"text", " ").as("f"))
      .filter(size($"f") >= 5)
      .select($"doc_id",
        element_at($"f", 1).as("f0"), element_at($"f", 2).as("f1"),
        element_at($"f", 3).as("f2"), element_at($"f", 5).as("f4"))
      .orderBy($"doc_id")
  }

  /** Dedup pattern (identity map + identity reduce on record-as-key). */
  def distinctRows(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .select($"l_returnflag", $"l_linestatus")
      .distinct()
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  /** MultipleInputs / addInputPath×N parity: union of two differently-shaped
    * sources aligned by name.
    */
  def unionSources(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, dir)
    val hi = o.filter($"o_totalprice" > 200000.0)
      .select($"o_orderkey", lit("high").as("band"))
    val lo = o.filter($"o_totalprice" < 20000.0)
      .select(lit("low").as("band"), $"o_orderkey") // misaligned on purpose
    hi.unionByName(lo).orderBy($"band", $"o_orderkey")
  }

  def intersectNations(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, dir).select($"c_nationkey".as("nationkey"))
      .intersect(Tables.supplier(spark, dir).select($"s_nationkey".as("nationkey")))
      .orderBy($"nationkey")
  }

  def exceptNations(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, dir).select($"c_nationkey".as("nationkey"))
      .except(Tables.supplier(spark, dir).select($"s_nationkey".as("nationkey")))
      .orderBy($"nationkey")
  }

  /** TotalOrderPartitioner / TeraSort parity: global sort. Spark's orderBy
    * range-partitions from a sample — the same sample→cut-points→range
    * design as InputSampler.writePartitionFile, minus the hand-built trie.
    */
  def globalSort(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .select($"l_shipdate", $"l_orderkey", $"l_linenumber", $"l_quantity")
      .orderBy($"l_shipdate", $"l_orderkey", $"l_linenumber")
  }

  /** Top-k (reference pattern: per-mapper heap + single reducer) →
    * TakeOrderedAndProjectExec: per-partition heap, driver merge. No global
    * shuffle at any scale.
    */
  def topK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
      .orderBy($"l_extendedprice".desc, $"l_orderkey", $"l_linenumber")
      .limit(100)
  }

  /** SecondarySort example parity: values ordered within each key group.
    * The composite-key + grouping-comparator machinery collapses into a
    * window: partition on the natural key, order by the secondary key.
    */
  def secondarySort(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    // ONE range exchange serves both operators (round 21, guide §2.4
    // "two operations keyed the same way can share one exchange"): range
    // partitioning on user_id clusters each key into a single partition —
    // satisfying the window's ClusteredDistribution — and is an ordered
    // prefix of the final (user_id, seq) sort, so the closing orderBy
    // needs only a partition-local sort instead of its own
    // hash-then-range exchange pair (plan: 2 Exchange → 1; the range
    // sampling pass moves from the window output to the narrower scan).
    Tables.events(spark, dir)
      .repartitionByRange($"user_id")
      .select($"user_id", $"ts", $"event_id", $"event_type",
        row_number().over(w).as("seq"))
      .orderBy($"user_id", $"seq")
  }

  /** KeyFieldBasedComparator parity: `sort -k2,2nr -k1,1` over delimited
    * fields — fields get real types and a multi-column sort.
    */
  def keyFieldSort(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir)
      .select(concat_ws("|", $"doc_id", $"lang", $"n_chars").as("line"))
      .select(split($"line", "\\|").as("f"))
      .select(
        element_at($"f", 1).cast("bigint").as("doc_id"),
        element_at($"f", 2).as("lang"),
        element_at($"f", 3).cast("bigint").as("n_chars"))
      .orderBy($"n_chars".desc, $"lang".asc, $"doc_id".asc)
  }

  /** SequenceFileInputFilter parity (`MD5Filter` / `PercentFilter`):
    * deterministic record sampling by digest of the key — every engine
    * reading the same data picks the same ~1/16 of records, independent
    * of partitioning. Reference: `src/mapred/.../SequenceFileInputFilter.java`
    * anchor:`class MD5Filter`.
    */
  def sampleMd5(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter(substring(md5(concat_ws("|", $"l_orderkey", $"l_linenumber")), 1, 1) === "0")
      .select($"l_orderkey", $"l_linenumber", $"l_quantity")
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** SequenceFileInputFilter `PercentFilter` parity, made deterministic:
    * the reference's percent form keeps every f-th record by key hashCode —
    * partitioning-independent but tied to Java's hash. The engine-portable
    * equivalent thresholds the md5 digest: lowercase hex sorts
    * lexicographically in numeric order, so `substr(md5(key),1,2) < '1a'`
    * keeps exactly the keys whose first digest byte is < 26, ~10.2% of
    * records — same sample on any engine, any partitioning, any run.
    * Reference: `src/mapred/.../SequenceFileInputFilter.java`
    * anchor:`class PercentFilter`.
    */
  def samplePercent(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .filter(substring(md5(concat_ws("|", $"l_orderkey", $"l_linenumber")), 1, 2) < "1a")
      .select($"l_orderkey", $"l_linenumber", $"l_quantity")
      .orderBy($"l_orderkey", $"l_linenumber")
  }

  /** LineRecordReader offset parity (SURVEY §2.1): the reference keyed
    * every text record by byte offset — a stable record id. The
    * deterministic distributed equivalent is numbering over a total order
    * (monotonically_increasing_id is partitioning-dependent, so NOT this).
    */
  def recordNumbers(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    // Distributed total-order numbering (TotalOrderPartitioner style):
    // range-partition on the sort key, sort within partitions, then
    // zipWithIndex — one small count job for partition offsets plus
    // per-partition increments. A global row_number window would move
    // every record through ONE reducer; this is the one numbering shape
    // that survives 100 TB. The sort is total (doc_id tiebreak), so the
    // numbering is deterministic regardless of partition boundaries.
    val sorted = Tables.documents(spark, dir)
      .select($"doc_id", $"n_chars")
      .repartitionByRange($"n_chars".desc, $"doc_id")
      .sortWithinPartitions($"n_chars".desc, $"doc_id")
    val schema = StructType(sorted.schema.fields :+
      StructField("record_no", LongType, nullable = false))
    val numbered = sorted.rdd.zipWithIndex.map { case (r, i) => Row.fromSeq(r.toSeq :+ i) }
    spark.createDataFrame(numbered, schema).orderBy($"record_no")
  }

  /** SkipBadRecords (user-code half) as a query: a deliberately-throwing
    * transform — integer division by `n_chars mod 7`, an
    * ArithmeticException on every multiple of 7 — runs under
    * [[CrashGuard.guarded]]; the job completes, bad records land in the
    * side channel, and the output reports ok/skipped counts per lang plus
    * the aggregate over surviving rows. The failure condition is
    * deterministic, so the oracle replays it declaratively.
    */
  def skipBadRecords(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val userFn = (n: Long) => 1000L / (n % 7) // throws when n % 7 == 0
    val g = CrashGuard.guarded(userFn)
    Tables.documents(spark, dir)
      .select($"lang", g($"n_chars").as("g"))
      .groupBy($"lang")
      .agg(
        // the error field discriminates ok/skipped (a success may carry a
        // legitimately-null value; counting g._1 would drop it)
        count(when($"g._2".isNull, lit(1))).as("n_ok"),
        count($"g._2").as("n_skipped"),
        sum($"g._1").as("sum_val"))
      .orderBy($"lang")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rel_skip_bad_records" -> (skipBadRecords _),
    "rel_record_numbers" -> (recordNumbers _),
    "rel_sample_md5" -> (sampleMd5 _),
    "rel_sample_percent" -> (samplePercent _),
    "rel_identity_scan" -> (identityScan _),
    "rel_inverse_map" -> (inverseMap _),
    "rel_regex_filter" -> (regexFilter _),
    "rel_regex_extract" -> (regexExtract _),
    "rel_field_selection" -> (fieldSelection _),
    "rel_distinct" -> (distinctRows _),
    "rel_union_sources" -> (unionSources _),
    "rel_intersect" -> (intersectNations _),
    "rel_except" -> (exceptNations _),
    "rel_global_sort" -> (globalSort _),
    "rel_topk" -> (topK _),
    "rel_secondary_sort" -> (secondarySort _),
    "rel_key_field_sort" -> (keyFieldSort _))

  override def oracle: Map[String, String] = Map(
    "rel_skip_bad_records" ->
      """SELECT lang,
        |  COUNT(CASE WHEN n_chars % 7 <> 0 THEN 1 END) AS n_ok,
        |  COUNT(CASE WHEN n_chars % 7 = 0 THEN 1 END) AS n_skipped,
        |  CAST(SUM(CASE WHEN n_chars % 7 <> 0 THEN 1000 // (n_chars % 7) END) AS BIGINT) AS sum_val
        |FROM documents GROUP BY lang ORDER BY lang""".stripMargin,
    "rel_record_numbers" ->
      """SELECT doc_id, n_chars,
        |  CAST(ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) - 1 AS BIGINT) AS record_no
        |FROM documents ORDER BY record_no""".stripMargin,
    "rel_sample_md5" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE substr(md5(l_orderkey || '|' || l_linenumber), 1, 1) = '0'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "rel_sample_percent" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
        |WHERE substr(md5(l_orderkey || '|' || l_linenumber), 1, 2) < '1a'
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "rel_identity_scan" ->
      "SELECT * FROM nation ORDER BY n_nationkey",
    "rel_inverse_map" ->
      "SELECT event_id AS v, event_type AS k FROM events ORDER BY v",
    "rel_regex_filter" ->
      """SELECT doc_id, lang FROM documents
        |WHERE regexp_matches(text, 'spark\s+\w+\s+join') ORDER BY doc_id""".stripMargin,
    "rel_regex_extract" ->
      """SELECT m AS match, COUNT(*) AS n
        |FROM (SELECT UNNEST(regexp_extract_all(text, '(spark|merge|join|scan)', 1)) AS m
        |      FROM documents)
        |GROUP BY m ORDER BY m""".stripMargin,
    "rel_field_selection" ->
      """SELECT doc_id, f[1] AS f0, f[2] AS f1, f[3] AS f2, f[5] AS f4
        |FROM (SELECT doc_id, string_split(text, ' ') AS f FROM documents)
        |WHERE len(f) >= 5 ORDER BY doc_id""".stripMargin,
    "rel_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "rel_union_sources" ->
      """SELECT o_orderkey, 'high' AS band FROM orders WHERE o_totalprice > 200000.0
        |UNION ALL
        |SELECT o_orderkey, 'low' AS band FROM orders WHERE o_totalprice < 20000.0
        |ORDER BY band, o_orderkey""".stripMargin,
    "rel_intersect" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |INTERSECT
        |SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "rel_except" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |EXCEPT
        |SELECT s_nationkey AS nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,
    "rel_global_sort" ->
      """SELECT l_shipdate, l_orderkey, l_linenumber, l_quantity FROM lineitem
        |ORDER BY l_shipdate, l_orderkey, l_linenumber""".stripMargin,
    "rel_topk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin,
    "rel_secondary_sort" ->
      """SELECT user_id, ts, event_id, event_type,
        |  CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS INT) AS seq
        |FROM events ORDER BY user_id, seq""".stripMargin,
    "rel_key_field_sort" ->
      """SELECT doc_id, lang, n_chars FROM documents
        |ORDER BY n_chars DESC, lang ASC, doc_id ASC""".stripMargin)
}
