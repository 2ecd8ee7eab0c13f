package graft.llm

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads ride through the pipeline
  * as opaque `binary` columns with typed metadata, and decode /
  * feature-extraction runs batched per partition so a real decoder
  * (image/audio libs are absent in this container — see [[MediaCodec]])
  * drops in without changing the dataflow.
  *
  * The Spark-side mechanics are real: binary columns, case-class
  * Encoders, partition-wise batch processing with no driver collect and
  * no shuffle (a narrow mapPartitions over the scan).
  */
object Multimodal {

  /** A media row as it would arrive from a lake: id + opaque bytes +
    * claimed mime type. */
  final case class MediaRow(doc_id: Long, payload: Array[Byte], mime: String)

  /** Extracted features (the stub decoder derives them deterministically
    * from the payload bytes; a real decoder would emit true dims). */
  final case class MediaFeatures(doc_id: Long, n_bytes: Long, width: Int,
      height: Int, checksum: Long)

  /** The stubbed decoder: deterministic fake in place of an image/audio
    * library. Reads ONLY the payload bytes, so the dataflow (schema,
    * batching, partitioning) is exactly what a real decoder needs. */
  object MediaCodec {
    def decodeStub(payload: Array[Byte]): (Int, Int, Long) = {
      val n = payload.length
      var checksum = 0L
      var i = 0
      while (i < n) { checksum = checksum * 31 + (payload(i) & 0xFF); i += 1 }
      ((n % 64) + 1, ((n / 64) % 64) + 1, checksum)
    }
  }

  /** Documents re-materialized as a media table: payload = UTF-8 bytes of
    * the text standing in for encoded media. */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("text").cast("binary").as("payload"),
        lit("application/octet-stream").as("mime"))

  /** Batched per-partition decode: Dataset[MediaRow] → mapPartitions →
    * Dataset[MediaFeatures]. The iterator shape is what a real decoder
    * wants (amortize codec init across a partition's rows). */
  def mediaFeatures(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    mediaTable(spark, dir).as[MediaRow]
      .mapPartitions { rows =>
        rows.map { r =>
          val (w, h, checksum) = MediaCodec.decodeStub(r.payload)
          MediaFeatures(r.doc_id, r.payload.length.toLong, w, h, checksum)
        }
      }
      .toDF()
  }

  /** Oracle-checkable projection of [[mediaFeatures]] (the checksum is
    * engine-side only — DuckDB can't fold over bytes — so the oracle
    * covers byte length and the derived dims; the checksum is asserted
    * against a plain-Scala fold in MultimodalSpec). */
  def mediaFeaturesQuery(spark: SparkSession, dir: String): DataFrame =
    mediaFeatures(spark, dir)
      .select(col("doc_id"), col("n_bytes"), col("width"), col("height"))

  val mediaFeaturesSql: String =
    """SELECT doc_id,
      |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |  CAST((octet_length(encode(text)) % 64) + 1 AS INT) AS width,
      |  CAST(((octet_length(encode(text)) // 64) % 64) + 1 AS INT) AS height
      |FROM documents""".stripMargin
}
