package graft

import java.nio.file.Files
import graft.ingest.ChunkFeeder
import graft.ops.Patterns
import graft.state.JdbcUpsertStore
import graft.streaming.{MicroBatchRunner, NativeStatePipeline}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

/** The A7 native state backend ([[NativeStatePipeline]]): the three
  * state tables in Spark's own checkpointed state store must behave
  * exactly like the JDBC-externalized backend — identical detections,
  * identical reconstructed state — and survive a checkpoint restart. */
class NativeStateSpec extends AnyFunSuite {
  import SparkTestSession.{sf, spark}

  private def refTx(): DataFrame =
    Tables.transactions(spark, sf).select(
      lit(0).as("step"),
      col("customer").cast("string").as("customer"),
      lit("3").as("age"),
      col("gender"),
      lit("28007").as("zipcodeOri"),
      col("merchant").cast("string").as("merchant"),
      lit("28007").as("zipMerchant"),
      col("category"),
      col("amount").cast("double").as("amount"),
      lit(0).as("fraud"))

  private def detections(dir: String): Set[Seq[String]] = {
    val dirs = Option(new java.io.File(dir).listFiles()).getOrElse(Array())
      .filter(_.isDirectory)
    if (dirs.isEmpty) Set.empty
    else spark.read.option("header", "true").csv(dirs.map(_.toString): _*)
      .collect().map(_.toSeq.map(v => Option(v).fold("")(_.toString))).toSet
  }

  private def sameRows(a: DataFrame, b: DataFrame): Boolean =
    a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

  test("N batches through the native backend == the JDBC scale-mode backend (detections + state)") {
    val base = Files.createTempDirectory("graft-native").toString
    val tx = refTx().cache()
    ChunkFeeder.feed(tx, s"$base/in", chunkSize = 2000)

    val store = JdbcUpsertStore.derby(s"$base/derby")
    try {
      // JDBC scale mode over the chunk files
      val runner = new MicroBatchRunner(spark, store, Tables.importance(spark, sf),
        s"$base/out-jdbc", clock = () => Patterns.FixedClock, scaleMode = true)
      val q1 = runner.start(s"$base/in", s"$base/cp-jdbc", "1 second")
      q1.processAllAvailable(); q1.stop()

      // native fMGWS pipeline over the SAME chunk files, own checkpoint
      val native = new NativeStatePipeline(spark, Tables.importance(spark, sf),
        s"$base/out-native", s"$base/state-native",
        clock = () => Patterns.FixedClock)
      val q2 = native.start(s"$base/in", s"$base/cp-native", "1 second")
      q2.processAllAvailable(); q2.stop()

      val jdbcDets = detections(s"$base/out-jdbc")
      val nativeDets = detections(s"$base/out-native")
      assert(jdbcDets.nonEmpty)
      assert(nativeDets == jdbcDets)

      // state parity, all three tables
      assert(sameRows(
        NativeStatePipeline.merchantSummary(spark, s"$base/state-native"),
        store.merchantSummary(spark)))
      val castAmt = (df: DataFrame) => df.withColumn("total_amount_sum",
        col("total_amount_sum").cast(DecimalType(28, 2)))
      assert(sameRows(
        castAmt(NativeStatePipeline.custMerchantSummary(spark, s"$base/state-native")),
        castAmt(store.custMerchantSummary(spark))))
      assert(sameRows(
        NativeStatePipeline.genderSummary(spark, s"$base/state-native"),
        store.genderSummary(spark)))
    } finally store.close()
  }

  test("transformWithState backend (MapState per customer) == flatMapGroupsWithState backend") {
    val base = Files.createTempDirectory("graft-tws").toString
    val tx = refTx().cache()
    ChunkFeeder.feed(tx, s"$base/in", chunkSize = 2000)

    val fmgws = new NativeStatePipeline(spark, Tables.importance(spark, sf),
      s"$base/out-fmgws", s"$base/state-fmgws", clock = () => Patterns.FixedClock)
    val q1 = fmgws.start(s"$base/in", s"$base/cp-fmgws", "1 second")
    q1.processAllAvailable(); q1.stop()

    val tws = new NativeStatePipeline(spark, Tables.importance(spark, sf),
      s"$base/out-tws", s"$base/state-tws", clock = () => Patterns.FixedClock,
      api = NativeStatePipeline.TransformWithStateApi)
    val q2 = tws.start(s"$base/in", s"$base/cp-tws", "1 second")
    q2.processAllAvailable(); q2.stop()

    assert(detections(s"$base/out-fmgws").nonEmpty)
    assert(detections(s"$base/out-tws") == detections(s"$base/out-fmgws"))
    assert(sameRows(
      NativeStatePipeline.merchantSummary(spark, s"$base/state-tws"),
      NativeStatePipeline.merchantSummary(spark, s"$base/state-fmgws")))
    assert(sameRows(
      NativeStatePipeline.custMerchantSummary(spark, s"$base/state-tws"),
      NativeStatePipeline.custMerchantSummary(spark, s"$base/state-fmgws")))
    assert(sameRows(
      NativeStatePipeline.genderSummary(spark, s"$base/state-tws"),
      NativeStatePipeline.genderSummary(spark, s"$base/state-fmgws")))
  }

  test("change-log compaction: readout unchanged, scans only snapshot + tail") {
    val base = Files.createTempDirectory("graft-compact").toString
    val tx = refTx().cache()
    ChunkFeeder.feed(tx, s"$base/in", chunkSize = 500) // many epochs

    // control: no compaction
    val ctl = new NativeStatePipeline(spark, Tables.importance(spark, sf),
      s"$base/out-ctl", s"$base/state-ctl", clock = () => Patterns.FixedClock,
      compactEvery = 0)
    val q1 = ctl.start(s"$base/in", s"$base/cp-ctl", "1 second")
    q1.processAllAvailable(); q1.stop()

    // compacting pipeline over the same input
    val cmp = new NativeStatePipeline(spark, Tables.importance(spark, sf),
      s"$base/out-cmp", s"$base/state-cmp", clock = () => Patterns.FixedClock,
      compactEvery = 3)
    val q2 = cmp.start(s"$base/in", s"$base/cp-cmp", "1 second")
    q2.processAllAvailable(); q2.stop()

    // the readout is identical across all three tables
    assert(sameRows(
      NativeStatePipeline.merchantSummary(spark, s"$base/state-cmp"),
      NativeStatePipeline.merchantSummary(spark, s"$base/state-ctl")))
    assert(sameRows(
      NativeStatePipeline.custMerchantSummary(spark, s"$base/state-cmp"),
      NativeStatePipeline.custMerchantSummary(spark, s"$base/state-ctl")))
    assert(sameRows(
      NativeStatePipeline.genderSummary(spark, s"$base/state-cmp"),
      NativeStatePipeline.genderSummary(spark, s"$base/state-ctl")))

    // folded epochs are GONE from the log: at most compactEvery-1 tail
    // partitions remain, and a snapshot exists
    def epochDirs(dir: String) = Option(new java.io.File(dir).listFiles())
      .getOrElse(Array()).filter(f => f.isDirectory && f.getName.startsWith("epoch="))
    val ctlEpochs = epochDirs(s"$base/state-ctl/log").length
    val cmpEpochs = epochDirs(s"$base/state-cmp/log").length
    assert(ctlEpochs > 3, s"control should have many epochs, had $ctlEpochs")
    assert(cmpEpochs < 3, s"compacted tail should be < compactEvery, had $cmpEpochs")
    val snaps = Option(new java.io.File(s"$base/state-cmp/snapshot").listFiles())
      .getOrElse(Array()).filter(f => f.isDirectory && f.getName.startsWith("v="))
    assert(snaps.length == 1, "exactly one snapshot version survives")
    // detections are unaffected by compaction
    assert(detections(s"$base/out-cmp") == detections(s"$base/out-ctl"))
    // compact() is idempotent: a second run changes nothing
    val before = NativeStatePipeline.merchantSummary(spark, s"$base/state-cmp").collect().toSet
    NativeStatePipeline.compact(spark, s"$base/state-cmp")
    val after = NativeStatePipeline.merchantSummary(spark, s"$base/state-cmp").collect().toSet
    assert(after == before)
  }

  test("a torn snapshot (no _SUCCESS) is ignored by readout and compaction") {
    // compact()'s snapshot overwrite is not atomic: a crash mid-write
    // leaves a newest v=N dir without its completion marker while the
    // rows it was folding survive in the previous snapshot + log. The
    // readout must IGNORE the torn dir — preferring it for being newest
    // silently drops every row folded into the previous snapshot (the
    // log no longer has them). Regression for the fix in
    // completeSnapshots.
    val base = Files.createTempDirectory("graft-torn").toString
    val tx = refTx().cache()
    ChunkFeeder.feed(tx, s"$base/in", chunkSize = 500)
    val p = new NativeStatePipeline(spark, Tables.importance(spark, sf),
      s"$base/out", s"$base/state", clock = () => Patterns.FixedClock,
      compactEvery = 3)
    val q = p.start(s"$base/in", s"$base/cp", "1 second")
    q.processAllAvailable(); q.stop()
    val before = NativeStatePipeline
      .merchantSummary(spark, s"$base/state").collect().toSet
    assert(before.nonEmpty)
    // fabricate the torn newest snapshot: a data-less dir with a stray
    // part file and NO _SUCCESS
    val torn = new java.io.File(s"$base/state/snapshot/v=999999")
    torn.mkdirs()
    java.nio.file.Files.write(
      java.nio.file.Paths.get(torn.getPath, "part-00000.parquet"),
      Array[Byte](0, 1, 2, 3))
    val after = NativeStatePipeline
      .merchantSummary(spark, s"$base/state").collect().toSet
    assert(after == before,
      "readout changed after a torn snapshot appeared — torn dir not ignored")
    // compaction still folds correctly with the torn dir present
    NativeStatePipeline.compact(spark, s"$base/state")
    val after2 = NativeStatePipeline
      .merchantSummary(spark, s"$base/state").collect().toSet
    assert(after2 == before)
  }

  test("TWS pipeline does not leak the RocksDB provider conf into the caller's session") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val before = spark.conf.getOption(key)
    val base = Files.createTempDirectory("graft-tws-conf").toString
    val tx = refTx().limit(1000).cache()
    ChunkFeeder.feed(tx, s"$base/in", chunkSize = 1000)
    val tws = new NativeStatePipeline(spark, Tables.importance(spark, sf),
      s"$base/out", s"$base/state", clock = () => Patterns.FixedClock,
      api = NativeStatePipeline.TransformWithStateApi)
    val q = tws.start(s"$base/in", s"$base/cp", "1 second")
    q.processAllAvailable(); q.stop()
    assert(spark.conf.getOption(key) == before,
      "starting a TWS query must not mutate the shared session conf")
    // state actually landed (the cloned session really ran RocksDB)
    assert(NativeStatePipeline.merchantSummary(spark, s"$base/state")
      .agg(sum(col("total_transactions"))).collect()(0).getLong(0) == tx.count())
  }

  test("checkpoint restart restores transformWithState state (RocksDB)") {
    val base = Files.createTempDirectory("graft-tws-restart").toString
    val tx = refTx().cache()
    val half = tx.limit((tx.count() / 2).toInt).cache()

    ChunkFeeder.feed(half, s"$base/in", chunkSize = 1000)
    val p1 = new NativeStatePipeline(spark, Tables.importance(spark, sf),
      s"$base/out", s"$base/state", clock = () => Patterns.FixedClock,
      api = NativeStatePipeline.TransformWithStateApi)
    val q1 = p1.start(s"$base/in", s"$base/cp", "1 second")
    q1.processAllAvailable(); q1.stop()
    val afterFirst = NativeStatePipeline.merchantSummary(spark, s"$base/state")
      .agg(sum(col("total_transactions"))).collect()(0).getLong(0)
    assert(afterFirst == half.count())

    // a BRAND-NEW pipeline on the same checkpoint resumes RocksDB state
    ChunkFeeder.feed(tx, s"$base/in", chunkSize = 1000)
    val p2 = new NativeStatePipeline(spark, Tables.importance(spark, sf),
      s"$base/out", s"$base/state", clock = () => Patterns.FixedClock,
      api = NativeStatePipeline.TransformWithStateApi)
    val q2 = p2.start(s"$base/in", s"$base/cp", "1 second")
    q2.processAllAvailable(); q2.stop()
    val afterSecond = NativeStatePipeline.merchantSummary(spark, s"$base/state")
      .agg(sum(col("total_transactions"))).collect()(0).getLong(0)
    assert(afterSecond == afterFirst + tx.count())
  }

  test("checkpoint restart restores fMGWS state (no loss, no double count)") {
    val base = Files.createTempDirectory("graft-native-restart").toString
    val tx = refTx().cache()
    val half = tx.limit((tx.count() / 2).toInt).cache()

    ChunkFeeder.feed(half, s"$base/in", chunkSize = 1000)
    val p1 = new NativeStatePipeline(spark, Tables.importance(spark, sf),
      s"$base/out", s"$base/state", clock = () => Patterns.FixedClock)
    val q1 = p1.start(s"$base/in", s"$base/cp", "1 second")
    q1.processAllAvailable(); q1.stop()
    val afterFirst = NativeStatePipeline.merchantSummary(spark, s"$base/state")
      .agg(sum(col("total_transactions"))).collect()(0).getLong(0)
    assert(afterFirst == half.count())

    // a BRAND-NEW pipeline on the same checkpoint resumes the state
    ChunkFeeder.feed(tx, s"$base/in", chunkSize = 1000)
    val p2 = new NativeStatePipeline(spark, Tables.importance(spark, sf),
      s"$base/out", s"$base/state", clock = () => Patterns.FixedClock)
    val q2 = p2.start(s"$base/in", s"$base/cp", "1 second")
    q2.processAllAvailable(); q2.stop()
    val afterSecond = NativeStatePipeline.merchantSummary(spark, s"$base/state")
      .agg(sum(col("total_transactions"))).collect()(0).getLong(0)
    assert(afterSecond == afterFirst + tx.count())
  }
}
