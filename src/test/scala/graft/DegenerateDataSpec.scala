package graft

import graft.functions.{DedupOps, TextOps}
import org.apache.spark.sql.DataFrame

/** Degenerate-corpus robustness: a 100 TB crawl certainly contains empty
  * documents, whitespace-only documents, and single-token documents — forms
  * the driver's synthetic gate corpus never produces, so the oracle gate
  * cannot catch an operator that throws or NaN-poisons on them (the k-means
  * refit's ANSI DIVIDE_BY_ZERO on a zero-norm embedding was exactly this
  * class of latent crash). Every text/dedup operator must COMPLETE on the
  * doctored corpus and return finite values for the rows it keeps; whether
  * a degenerate doc is kept or dropped is each operator's documented
  * choice, not asserted here.
  */
class DegenerateDataSpec extends SparkSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft_degen").toString
    val docs = Seq(
      (0L, "", "en", "web"),                         // empty
      (1L, "   \t  \n ", "en", "web"),               // whitespace-only
      (2L, "word", "en", "web"),                     // single token
      (3L, "a a a a a a a a", "en", "books"),        // one repeated token
      (4L, "the quick brown fox jumps over the lazy dog", "en", "web"),
      (5L, "pack my box with five dozen liquor jugs", "en", "books"),
      (6L, "!!! ??? ... ---", "en", "web"),          // punctuation-only
      (7L, "une phrase en francais pour la variete", "fr", "web"))
      .map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.mode("overwrite").parquet(s"$d/documents.parquet")
    d
  }

  /** Materialize and assert every double/float column is finite. */
  private def finite(name: String, df: => DataFrame): Unit = {
    val frame = df // bind the by-name arg once: collect + schema below must
    val rows = frame.collect() // not each re-build the operator's DataFrame
    val schema = frame.schema
    rows.foreach { r =>
      schema.fields.zipWithIndex.foreach { case (f, i) =>
        if (!r.isNullAt(i)) f.dataType.typeName match {
          case "double" => assert(!r.getDouble(i).isNaN && !r.getDouble(i).isInfinite,
            s"$name.${f.name} non-finite in row $r")
          case "float" => assert(!r.getFloat(i).isNaN && !r.getFloat(i).isInfinite,
            s"$name.${f.name} non-finite in row $r")
          case _ =>
        }
      }
    }
  }

  test("text operators complete with finite outputs on degenerate documents") {
    for ((name, f) <- Seq[(String, (org.apache.spark.sql.SparkSession, String) => DataFrame)](
        "text_quality_score" -> (TextOps.qualityScore _),
        "text_lang_id" -> (TextOps.langId _),
        "text_token_count" -> (TextOps.tokenCount _),
        "text_fingerprint" -> (TextOps.fingerprint _),
        "text_repetition_stats" -> (TextOps.repetitionStats _),
        "text_wordcount" -> (TextOps.wordCount _)))
      finite(name, f(spark, dir))
  }

  test("dedup operators complete with finite outputs on degenerate documents") {
    for ((name, f) <- Seq[(String, (org.apache.spark.sql.SparkSession, String) => DataFrame)](
        "dedup_exact" -> (DedupOps.exactDedup _),
        "dedup_simhash" -> (DedupOps.simhash _),
        "dedup_minhash_lsh" -> (DedupOps.minhashLsh _),
        "dedup_ngram_jaccard" -> (DedupOps.ngramJaccard _)))
      finite(name, f(spark, dir))
  }
}
