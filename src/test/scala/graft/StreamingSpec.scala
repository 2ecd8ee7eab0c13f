package graft

import java.nio.file.Files
import graft.ingest.ChunkFeeder
import graft.ops.Patterns
import graft.state.JdbcUpsertStore
import graft.streaming.MicroBatchRunner
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end: ChunkFeeder (Mechanism X) → file-stream →
  * MicroBatchRunner (Mechanism Y) → Derby state → detection CSVs.
  * Asserts the SURVEY.md §5.3 invariants: state parity with a batch-mode
  * recomputation, 50-row detection files, and the 6-string-column
  * contract. */
class StreamingSpec extends AnyFunSuite {
  import SparkTestSession.{sf, spark}

  test("chunked stream end-to-end: state parity + detection file contract") {
    val base = Files.createTempDirectory("graft-stream").toString
    val inDir = s"$base/in"; val outDir = s"$base/out"; val cp = s"$base/cp"
    val store = JdbcUpsertStore.derby(s"$base/derby")
    try {
      val tx = Tables.transactions(spark, sf)
        .withColumn("step", lit(0))
        .select("step", "customer", "merchant", "category", "amount", "gender")
      val nChunks = ChunkFeeder.feed(tx, inDir, chunkSize = 2000)
      assert(nChunks == math.ceil(tx.count() / 2000.0).toInt)

      val runner = new MicroBatchRunner(spark, store, Tables.importance(spark, sf),
        outDir, clock = () => Patterns.FixedClock)
      val q = runner.start(inDir, cp, triggerInterval = "1 second")
      q.processAllAvailable()
      q.stop()
      runner.flushRemainder()

      // state parity: cumulative Derby state == one-shot aggregation
      val want = tx.groupBy(col("merchant").cast("string").as("merchant_id"))
        .agg(count(lit(1)).as("total_transactions"))
      val got = store.merchantSummary(spark)
      assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)

      // detection files: header + 6 string columns, 50 rows per full file
      val dirs = new java.io.File(outDir).listFiles().filter(_.isDirectory)
      assert(dirs.nonEmpty)
      val all = spark.read.option("header", "true").csv(dirs.map(_.toString): _*)
      assert(all.columns.toSeq == MicroBatchRunner.detectionSchema.fieldNames.toSeq)
      val sizes = dirs.map(d => spark.read.option("header", "true")
        .csv(d.toString).count())
      assert(sizes.count(_ == 50) >= sizes.length - 1) // all full except ≤1 trailing
      // detections eventually fire (cumulative state crosses thresholds)
      assert(all.count() > 0)
    } finally store.close()
  }

  test("checkpoint restart resumes without reprocessing consumed files") {
    val base = Files.createTempDirectory("graft-restart").toString
    val inDir = s"$base/in"; val outDir = s"$base/out"; val cp = s"$base/cp"
    val store = JdbcUpsertStore.derby(s"$base/derby")
    try {
      val tx = Tables.transactions(spark, sf)
        .withColumn("step", lit(0))
        .select("step", "customer", "merchant", "category", "amount", "gender")
        .cache()
      val half = tx.limit((tx.count() / 2).toInt)
      ChunkFeeder.feed(half, inDir, chunkSize = 1000)
      val runner = new MicroBatchRunner(spark, store, Tables.importance(spark, sf),
        outDir, clock = () => Patterns.FixedClock)
      val q1 = runner.start(inDir, cp, triggerInterval = "1 second")
      q1.processAllAvailable(); q1.stop()
      val afterFirst = store.merchantSummary(spark)
        .agg(sum(col("total_transactions"))).collect()(0).getLong(0)
      assert(afterFirst == half.count())

      // second feed under new names; the restarted query must process
      // exactly these files — the first run's files are in the
      // checkpoint's seen-file log and must not be replayed
      ChunkFeeder.feed(tx, inDir, chunkSize = 1000, namePrefix = "refeed_chunk")
      val q2 = runner.start(inDir, cp, triggerInterval = "1 second")
      q2.processAllAvailable(); q2.stop()
      val afterSecond = store.merchantSummary(spark)
        .agg(sum(col("total_transactions"))).collect()(0).getLong(0)
      assert(afterSecond == afterFirst + tx.count())
    } finally store.close()
  }

  test("empty batch is a no-op (guard)") {
    val base = Files.createTempDirectory("graft-empty").toString
    val store = JdbcUpsertStore.derby(s"$base/derby")
    try {
      val runner = new MicroBatchRunner(spark, store, Tables.importance(spark, sf),
        s"$base/out", clock = () => Patterns.FixedClock)
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        MicroBatchRunner.txStreamSchema)
      runner.processBatch(empty, 0L)
      assert(store.merchantSummary(spark).isEmpty)
    } finally store.close()
  }
}
