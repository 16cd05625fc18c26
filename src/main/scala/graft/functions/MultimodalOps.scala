package graft.functions

import graft.QueryPack
import graft.core.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing (north-star extension).
  *
  * Convention: a multimodal asset is an opaque `binary` payload column plus
  * a typed metadata struct — here derived deterministically from
  * `documents` (no image/audio codecs exist in this environment, so the
  * decode kernel is a clearly-marked deterministic stub; everything
  * Spark-side — schema, batch iteration, partitioning — is real).
  *
  * The decode path uses `mapPartitions` over an iterator of rows: the Scala
  * equivalent of `mapInPandas` batches — per-partition setup cost (codec
  * init) is amortized across the partition, which is the property that
  * matters at 100 TB (one codec instance per task, not per row).
  */
object MultimodalOps extends QueryPack {

  /** Asset table: binary payload + metadata struct. The payload is the
    * UTF-8 text (a stand-in for image bytes); metadata mimics
    * (format, width, height) derived deterministically.
    */
  def assets(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, dir).select(
      $"doc_id".as("asset_id"),
      encode($"text", "UTF-8").as("payload"),
      struct(
        lit("fake/rgb8").as("format"),
        ($"n_chars" % 64 + 16).cast("int").as("width"),
        ($"n_chars" % 48 + 16).cast("int").as("height")).as("meta"))
  }

  /** Payload stats: byte length + md5 — the "did the bytes survive the
    * pipeline" integrity query every media pipeline runs first.
    */
  def payloadStats(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    assets(spark, dir)
      .select($"asset_id",
        length($"payload").as("n_bytes"),
        md5($"payload").as("payload_md5"),
        $"meta.width".as("width"), $"meta.height".as("height"))
      .orderBy($"asset_id")
  }

  /** Frame sampling: every k-th frame index of a fake video whose frame
    * count derives from the payload size — the explode-by-computed-range
    * shape of real frame extraction (1 asset → N frame rows).
    */
  def frameSample(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    assets(spark, dir)
      .withColumn("n_frames", (length($"payload") % 30 + 1).cast("int"))
      .select($"asset_id", $"n_frames",
        explode(sequence(lit(0), $"n_frames" - 1, lit(5))).as("frame_idx"))
      .orderBy($"asset_id", $"frame_idx")
  }

  /** Output schema of the stubbed decoder. */
  val decodedSchema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("mean_byte", DoubleType, nullable = false),
    // feature vector flattened to scalars: array-typed output columns crash
    // the driver's pandas canonicalizer (unhashable ndarray)
    StructField("f0", DoubleType, nullable = false),
    StructField("f1", DoubleType, nullable = false),
    StructField("f2", DoubleType, nullable = false),
    StructField("f3", DoubleType, nullable = false)))

  /** STUB decode kernel: a real build would JNI/FFI into an image codec
    * here. The stub computes deterministic per-payload statistics so the
    * plumbing (binary in → feature vector out, partition-amortized
    * "codec" setup) is fully testable. Marked stub; see MultimodalSpec.
    */
  def decodeStub(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder.encoderFor(decodedSchema)
    assets(spark, dir)
      .select($"asset_id", $"payload", $"meta.width", $"meta.height")
      .mapPartitions { rows =>
        // per-partition "codec" init happens once, here.
        rows.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          var s = 0L; var i = 0
          while (i < bytes.length) { s += bytes(i) & 0xff; i += 1 }
          val mean = if (bytes.isEmpty) 0.0 else s.toDouble / bytes.length
          // fake 4-dim feature: deterministic byte-histogram quarters
          val q = new Array[Double](4)
          i = 0
          while (i < bytes.length) { q((bytes(i) & 0xff) % 4) += 1.0; i += 1 }
          Row(id, r.getInt(2), r.getInt(3), mean, q(0), q(1), q(2), q(3))
        }
      }(enc)
      .orderBy($"asset_id")
  }

  /** Resize planning: fit each asset into a 224×224 budget preserving
    * aspect ratio — longest edge → 224, other edge scaled by exact integer
    * arithmetic (edge·224 div longest). This is the catalog/geometry half
    * of resize that drives the batch (pure column math, codegen); the pixel
    * kernel itself would live next to the decode stub's mapPartitions.
    */
  def resizeMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    assets(spark, dir)
      .select($"asset_id",
        $"meta.width".as("width"), $"meta.height".as("height"),
        expr("CAST(meta.width * 224 DIV greatest(meta.width, meta.height) AS INT)").as("out_w"),
        expr("CAST(meta.height * 224 DIV greatest(meta.width, meta.height) AS INT)").as("out_h"))
      .orderBy($"asset_id")
  }

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "mm_payload_stats" -> (payloadStats _),
    "mm_frame_sample" -> (frameSample _),
    "mm_resize_meta" -> (resizeMeta _),
    "mm_decode_stub" -> (decodeStub _))

  override def oracle: Map[String, String] = Map(
    "mm_payload_stats" ->
      """SELECT doc_id AS asset_id,
        |  CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |  md5(text) AS payload_md5,
        |  CAST(n_chars % 64 + 16 AS INT) AS width,
        |  CAST(n_chars % 48 + 16 AS INT) AS height
        |FROM documents ORDER BY asset_id""".stripMargin,
    "mm_frame_sample" ->
      """WITH a AS (
        |  SELECT doc_id AS asset_id,
        |    CAST(octet_length(encode(text)) % 30 + 1 AS INT) AS n_frames
        |  FROM documents)
        |SELECT asset_id, n_frames, CAST(UNNEST(range(0, n_frames, 5)) AS INT) AS frame_idx
        |FROM a ORDER BY asset_id, frame_idx""".stripMargin,
    // Valid because the test corpus is pure ASCII (byte == codepoint ==
    // `ord`), letting DuckDB replay the byte loop declaratively; the Spark
    // kernel itself is byte-general. Empty payloads survive the LEFT JOIN
    // with mean_byte = 0.0, mirroring the kernel's isEmpty branch.
    "mm_decode_stub" ->
      """WITH a AS (
        |  SELECT doc_id AS asset_id, text,
        |    CAST(n_chars % 64 + 16 AS INT) AS width,
        |    CAST(n_chars % 48 + 16 AS INT) AS height
        |  FROM documents),
        |b AS (
        |  SELECT a2.asset_id AS bid, ord(substr(a2.text, CAST(i AS INT), 1)) AS byte
        |  FROM a a2, UNNEST(range(1, length(a2.text) + 1)) AS u(i))
        |SELECT a.asset_id, a.width, a.height,
        |  COALESCE(CAST(SUM(b.byte) AS DOUBLE) / NULLIF(COUNT(b.byte), 0), 0.0) AS mean_byte,
        |  CAST(COUNT(CASE WHEN b.byte % 4 = 0 THEN 1 END) AS DOUBLE) AS f0,
        |  CAST(COUNT(CASE WHEN b.byte % 4 = 1 THEN 1 END) AS DOUBLE) AS f1,
        |  CAST(COUNT(CASE WHEN b.byte % 4 = 2 THEN 1 END) AS DOUBLE) AS f2,
        |  CAST(COUNT(CASE WHEN b.byte % 4 = 3 THEN 1 END) AS DOUBLE) AS f3
        |FROM a LEFT JOIN b ON a.asset_id = b.bid
        |GROUP BY a.asset_id, a.width, a.height
        |ORDER BY asset_id""".stripMargin,
    "mm_resize_meta" ->
      """WITH a AS (
        |  SELECT doc_id AS asset_id,
        |    CAST(n_chars % 64 + 16 AS INT) AS width,
        |    CAST(n_chars % 48 + 16 AS INT) AS height
        |  FROM documents)
        |SELECT asset_id, width, height,
        |  CAST(width * 224 // GREATEST(width, height) AS INT) AS out_w,
        |  CAST(height * 224 // GREATEST(width, height) AS INT) AS out_h
        |FROM a ORDER BY asset_id""".stripMargin)
}
