package graft.streaming

import graft.ops.Patterns
import graft.state.StateStore
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._
import scala.collection.mutable.ArrayBuffer
import scala.jdk.CollectionConverters._

/** Mechanism-Y analog: the Structured Streaming micro-batch pipeline
  * ("Mechanism Y.py":100-313) re-expressed Spark-first.
  *
  * Per micro-batch (foreachBatch):
  *   1. empty-batch guard ("Mechanism Y.py":124-134)
  *   2. three per-batch aggregates (A1/A2/A3) → additive state upsert
  *      (K2/K3 via [[StateStore]])
  *   3. enrichment join against the static importance dim (J1) and the
  *      cached percentile thresholds (A4/J2), with the reference's
  *      missing-weight fallback ("Mechanism Y.py":236-237)
  *   4. the three pattern queries over cumulative state (§2.11)
  *   5. detections → driver buffer → 50-row single-file CSV flushes
  *      (S6/K4, "Mechanism Y.py":268-277)
  *
  * Kept reference semantics: PatId2/3 re-emit all qualifying state every
  * batch; detections are collected to the driver (bounded by state size,
  * a reference parity choice — SURVEY.md §2.11). Fixed vs the reference:
  * upserts can be epoch-fenced (idempotent = true), and `scaleMode`
  * switches the three per-batch state reads from full-table to keyed
  * ([[StateStore.merchantSummaryFor]] etc., pruned to the merchants the
  * batch touched) — per-batch state IO becomes O(batch keys) instead of
  * the reference's O(state) re-read (SURVEY.md §4). In scale mode the
  * PatId2/3 re-emit is keyed to the batch's merchants too: for touched
  * merchants the detections are identical to parity mode; untouched
  * merchants simply aren't re-announced every batch. Scale mode also
  * replaces the driver-side detection buffer with a distributed sink
  * ([[flushDistributed]]): detections write straight from executors, so
  * neither state size nor detection volume ever funnels through the
  * driver.
  */
class MicroBatchRunner(
    spark: SparkSession,
    store: StateStore,
    importanceDim: DataFrame,
    outDir: String,
    cfg: Patterns.Config = Patterns.DefaultConfig,
    clock: () => Patterns.Clock = () => MicroBatchRunner.wallClock(),
    detectionBatchSize: Int = 50,
    idempotent: Boolean = false,
    fallbackWeight: Double = 2.0,
    scaleMode: Boolean = false) {

  import MicroBatchRunner._

  // Static setup queries, cached once like the reference's
  // CustomerImportance + percentile precompute ("Mechanism Y.py":68-89).
  private val importance = importanceDim.cache()
  private val percentiles = importance
    .groupBy(col("merchant").as("merchant_key"), col("category").as("category_key"))
    .agg(expr(s"percentile_approx(weight, ${cfg.detectionPercentile}, 10000)")
      .as("p_weight"))
    .cache()

  private val buffer = ArrayBuffer[Row]()
  private var currentEpoch = -1L

  /** S5 — the reference's state-read fallback ("Mechanism Y.py":214-218):
    * a transient store failure yields an empty, correctly-schema'd frame
    * (the reference's includes last_updated; ours reads drop it) so the
    * batch completes with whatever state IS readable instead of killing
    * the streaming query. */
  private def stateOrEmpty(schema: StructType)(read: => DataFrame): DataFrame =
    try read catch {
      case scala.util.control.NonFatal(_) =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    }

  /** The per-batch pipeline; public so batch-mode tests drive it without
    * a streaming query (SURVEY.md §7 step 3: process_batch as a pure-ish
    * function of (batch, state)). */
  def processBatch(batch: DataFrame, epochId: Long): Unit = {
    if (batch.isEmpty) return                         // empty-batch guard
    currentEpoch = epochId
    batch.persist()
    try {
      val epoch = if (idempotent) Some(epochId) else None

      // One finest-grain pass over the batch; the three state deltas
      // roll up from it (the reference aggregates the batch three times
      // — "Mechanism Y.py":142, 167, 187; the gender pivot becomes the
      // conditional aggregation SURVEY.md §2.5 A3 recommends at scale;
      // the pivot+P11-repair form itself is oracle-checked in
      // RelOps.aggGenderPivot).
      val fin = batch.groupBy(col("customer"), col("merchant"), col("gender"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("amount").cast(DecimalType(18, 2))).as("amt"))
        .persist()
      val mDelta = fin.groupBy(col("merchant").as("merchant_id"))
        .agg(sum(col("cnt")).as("total_transactions"))
      val cmDelta = fin.groupBy(
          col("customer").as("customer_id"), col("merchant").as("merchant_id"))
        .agg(sum(col("cnt")).as("transaction_count"),
          sum(col("amt")).as("total_amount_sum"))
      val gDelta = fin.groupBy(col("merchant").as("merchant_id"))
        .agg(
          sum(when(col("gender") === "M", col("cnt")).otherwise(0L))
            .as("male_transaction_count"),
          sum(when(col("gender") === "F", col("cnt")).otherwise(0L))
            .as("female_transaction_count"))

      store.applyDeltas(mDelta, cmDelta, gDelta, epoch)
      fin.unpersist()

      // J1 enrichment + J2 low-weight with percentile-miss fallback
      val enriched = batch.join(importance
          .withColumnRenamed("customer", "i_customer")
          .withColumnRenamed("merchant", "i_merchant")
          .withColumnRenamed("category", "i_category"),
        batch("customer") === col("i_customer") &&
          batch("merchant") === col("i_merchant") &&
          batch("category") === col("i_category"), "left_outer")
      val lowWeight = enriched.join(percentiles,
          enriched("merchant") === percentiles("merchant_key") &&
          enriched("category") === percentiles("category_key"), "left_outer")
        .filter(
          (col("p_weight").isNotNull && col("weight") < col("p_weight")) ||
          (col("p_weight").isNull && col("weight").isNotNull &&
            col("weight") < lit(fallbackWeight)))
        .select(col("customer"), col("merchant"))
        .distinct()

      // State reads: scale mode prunes every read to the merchants this
      // batch touched (a bounded driver-side key list — ≤ batch rows);
      // parity mode keeps the reference's full re-read. Both survive a
      // transient store failure via the S5 empty-frame fallback.
      val (ms, cms, gs) =
        if (scaleMode) {
          val mids = batch.select(col("merchant")).distinct()
            .collect().map(_.getString(0)).toSeq
          (stateOrEmpty(merchantStateSchema)(store.merchantSummaryFor(spark, mids)),
            stateOrEmpty(custMerchantStateSchema)(store.custMerchantSummaryFor(spark, mids)),
            stateOrEmpty(genderStateSchema)(store.genderSummaryFor(spark, mids)))
        } else {
          (stateOrEmpty(merchantStateSchema)(store.merchantSummary(spark)),
            stateOrEmpty(custMerchantStateSchema)(store.custMerchantSummary(spark)),
            stateOrEmpty(genderStateSchema)(store.genderSummary(spark)))
        }

      // cms feeds TWO patterns (PatId1 + PatId2) and ms/gs one each:
      // persist the state reads so each JDBC scan runs once per batch,
      // not once per consuming subtree of the detection union
      Seq(ms, cms, gs).foreach(_.persist())
      try {
        val tick = clock()
        val detections = Patterns.unionDetections(Seq(
          Patterns.patId1(ms, cms, lowWeight, cfg, tick),
          Patterns.patId2(cms, cfg, tick),
          Patterns.patId3(gs, cfg, tick)))

        if (scaleMode) flushDistributed(detections, epochId)
        else {
          buffer ++= detections.collect()
          while (buffer.length >= detectionBatchSize) {
            val chunk = buffer.take(detectionBatchSize).toList
            buffer.remove(0, detectionBatchSize)
            flush(chunk)
          }
        }
      } finally Seq(ms, cms, gs).foreach(_.unpersist())
    } finally batch.unpersist()
  }

  /** Scale-mode detection sink: executors write the epoch's detections
    * directly — the rows never visit the driver (parity mode's
    * `collect()` buffer is bounded by state size, which at 100 TB is
    * exactly the thing that grows). One dir per epoch, restart-safe
    * naming like [[flush]], partition count sized so files hold
    * ~detectionBatchSize rows (the reference's 50-row contract becomes
    * approximate: round-robin fills partitions evenly; exact 50-row
    * chunking across batches is inherently a driver-serial operation). */
  private def flushDistributed(detections: DataFrame, epochId: Long): Unit = {
    detections.persist()
    try {
      val n = detections.count()
      if (n > 0) {
        val files = ((n + detectionBatchSize - 1) / detectionBatchSize).toInt
        val uuid8 = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
        detections.repartition(files).write.option("header", "true")
          .csv(s"$outDir/detections_batch_${epochId}_$uuid8")
      }
    } finally detections.unpersist()
  }

  /** Trailing flush of a final partial file ("Mechanism Y.py" leaves the
    * remainder buffered; expose it so a drained run can emit it). */
  def flushRemainder(): Unit =
    if (buffer.nonEmpty) {
      val chunk = buffer.toList
      buffer.clear()
      flush(chunk)
    }

  /** Restart-safe flush: dirs are named `detections_batch_<epoch>_<uuid8>`
    * like the reference ("Mechanism Y.py":274) and written errorifexists —
    * a restarted run can never clobber a prior run's detections (a
    * sequence-numbered overwrite would restart at 0 and silently replace
    * them). */
  private def flush(rows: Seq[Row]): Unit = {
    val df = spark.createDataFrame(rows.asJava, detectionSchema)
    val uuid8 = java.util.UUID.randomUUID().toString.replace("-", "").take(8)
    df.coalesce(1).write.option("header", "true")
      .csv(s"$outDir/detections_batch_${currentEpoch}_$uuid8")
  }

  /** S3 + K5: file-stream source (1 file per trigger ⇒ ≤ chunk-size rows
    * per batch) into foreachBatch. cleanSource stays disabled like the
    * reference ("Mechanism Y.py":106-107) — the checkpoint tracks
    * processed files. */
  def start(inputDir: String, checkpointDir: String,
      triggerInterval: String = "30 seconds"): StreamingQuery =
    spark.readStream
      .format("csv")
      .schema(txStreamSchema)
      .option("header", "true")
      .option("escape", "\"") // feeder writes RFC4180 doubled quotes
      .option("maxFilesPerTrigger", 1)
      .load(inputDir)
      .writeStream
      .foreachBatch((b: DataFrame, id: Long) => processBatch(b, id))
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerInterval))
      .start()
}

object MicroBatchRunner {

  /** Streaming transaction schema — the reference's full 10-column
    * transaction_schema in its column order ("Mechanism Y.py":35-41), so
    * the engine reads the reference's chunk CSVs unmodified. Only
    * divergence: amount is DoubleType where the reference declares
    * FloatType — a widening that parses the same CSVs and keeps the sums
    * exact. */
  val txStreamSchema: StructType = StructType(Seq(
    StructField("step", IntegerType),
    StructField("customer", StringType),
    StructField("age", StringType),
    StructField("gender", StringType),
    StructField("zipcodeOri", StringType),
    StructField("merchant", StringType),
    StructField("zipMerchant", StringType),
    StructField("category", StringType),
    StructField("amount", DoubleType),
    StructField("fraud", IntegerType)))

  /** Schemas for the S5 empty-frame fallback (the reference's
    * schema_merchant_summary etc., "Mechanism Y.py":47-58, minus the
    * last_updated column our reads drop). */
  val merchantStateSchema: StructType = StructType(Seq(
    StructField("merchant_id", StringType),
    StructField("total_transactions", LongType)))
  val custMerchantStateSchema: StructType = StructType(Seq(
    StructField("customer_id", StringType),
    StructField("merchant_id", StringType),
    StructField("transaction_count", LongType),
    StructField("total_amount_sum", DecimalType(18, 2))))
  val genderStateSchema: StructType = StructType(Seq(
    StructField("merchant_id", StringType),
    StructField("male_transaction_count", LongType),
    StructField("female_transaction_count", LongType)))

  val detectionSchema: StructType = StructType(Seq(
    StructField("YStartTime", StringType),
    StructField("DetectionTime", StringType),
    StructField("PatternId", StringType),
    StructField("ActionType", StringType),
    StructField("CustomerName", StringType),
    StructField("MerchantId", StringType)))

  /** IST wall-clock strings, the reference's timestamp contract
    * ("Mechanism Y.py":112-113). */
  def wallClock(): Patterns.Clock = {
    val fmt = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss")
    val now = java.time.ZonedDateTime.now(java.time.ZoneId.of("Asia/Kolkata"))
    Patterns.Clock(now.format(fmt), now.format(fmt))
  }
}
