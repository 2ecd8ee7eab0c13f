package graft.llm

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines. `df.sample()` is
  * seed-dependent on partitioning and row order, so a re-run (or another
  * engine) draws a different subset — useless for reproducible corpus
  * curation. Hash-based sampling keys the draw on the ROW ITSELF: a row
  * is in the sample iff md5(key) lands in the accepted bucket range, so
  * any engine, any partitioning, any run selects the identical subset.
  *
  * Scale: a pure scan+filter — no shuffle, no state, embarrassingly
  * parallel; the md5 is Spark's codegen'd built-in. Rates compose: a
  * 1/8 sample of a 1/8 sample (on independent key salts) is a 1/64
  * sample, and a rate can be widened later without invalidating rows
  * already drawn (bucket prefix ranges are nested).
  */
object Sampling {

  /** First hex nibble of md5(key) ∈ {0,1} — a deterministic 1/8 sample. */
  def hashSampleFilter(key: Column, nibbles: Seq[String] = Seq("0", "1")): Column =
    substring(md5(key.cast("string")), 1, 1).isin(nibbles: _*)

  /** Registered query: reproducible 1/8 sample of the documents table,
    * with the 2-hex-digit bucket carried so downstream strata are
    * inspectable. */
  def sampleHash(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(hashSampleFilter(col("doc_id")))
      .select(col("doc_id"), col("lang"), col("source"),
        substring(md5(col("doc_id").cast("string")), 1, 2).as("bucket"))

  val sampleHashSql: String =
    """SELECT doc_id, lang, source,
      |  substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket
      |FROM documents
      |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1')""".stripMargin

  /** Stratified deterministic sampling: per-stratum rates over the same
    * md5 bucket space — here the dominant language is downsampled to
    * 1/16 while the rest keep 4/16, the language-rebalancing move every
    * multilingual corpus build makes. Still a pure scan+filter; rates
    * change by widening/narrowing a stratum's accepted nibble set
    * without invalidating previously drawn rows. */
  def sampleStratified(spark: SparkSession, dir: String): DataFrame = {
    val nib = substring(md5(col("doc_id").cast("string")), 1, 1)
    Tables.documents(spark, dir)
      .filter(
        (col("lang") === "en" && nib === "0") ||
        (col("lang") =!= "en" && nib.isin("0", "1", "2", "3")))
      .select(col("doc_id"), col("lang"))
  }

  val sampleStratifiedSql: String =
    """SELECT doc_id, lang FROM documents
      |WHERE (lang = 'en' AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0')
      |   OR (lang <> 'en' AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1', '2', '3'))""".stripMargin
}
