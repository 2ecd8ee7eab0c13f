package graft

import graft.llm.Dedup
import graft.streaming.StreamingNearDup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** Drives the streaming near-dup operator from the documents table split
  * across micro-batches and pins stream truth == batch truth. */
class StreamingNearDupSpec extends AnyFunSuite {
  import SparkTestSession.{sf, spark}

  test("per-row simhash64 equals the registered signature frame") {
    val fromCol = Tables.documents(spark, sf)
      .select(col("doc_id"), Dedup.simhash64(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val registered = Dedup.simhashSignatures(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fromCol == registered && fromCol.nonEmpty)
  }

  test("streamed near-dup pairs across micro-batches == batch dedup_simhash") {
    val dir = java.nio.file.Files.createTempDirectory("graft-snd").toString
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    // three files -> three micro-batches with maxFilesPerTrigger=1, so
    // most pairs must be found against STATE from an earlier batch
    for (m <- 0 until 3)
      docs.filter(col("doc_id") % 3 === m)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/part=$m")
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(s"$dir/part=*")
    val q = StreamingNearDup.nearDupStream(stream)
      .writeStream.format("memory").queryName("snd_pairs")
      .outputMode("append").trigger(Trigger.ProcessingTime("1 second")).start()
    q.processAllAvailable()
    q.stop()
    // per-band emissions dedupe at the consumer (documented contract)
    val got = spark.table("snd_pairs").select("ida", "idb")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val want = Dedup.dedupSimhash(spark, sf)
      .select("ida", "idb")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == want && want.nonEmpty)
    // the split guarantees cross-batch pairs exist (different residues
    // arrive in different micro-batches) — state is really consulted
    assert(want.exists { case (a, b) => a % 3 != b % 3 })
  }
}
