package graft.streaming

import graft.llm.{Decontam, Dedup, DedupIndex, Pii, Quality, TextOps}
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types._

/** The continuous-curation loop — the production shape every piece of the
  * LLM-data surface was built for, finally assembled: a standing
  * [[graft.llm.DedupIndex]] plus per-micro-batch
  *
  *   0. NFC normalization at ingest ([[graft.functions.UnicodeNormalize]])
  *      so hash equalities downstream see one byte form per glyph;
  *   1. `probe`: batch docs near-duplicating the already-curated corpus
  *      are dropped (MinHash-LSH banded probe, partition-pruned index
  *      scan — per-batch cost O(batch + candidates), never O(corpus));
  *   1b. (optional, `containment = Some(t)`) containment screen: batch
  *      docs ≥ t contained in an indexed doc drop
  *      ([[DedupIndex.containmentProbe]] against the `postings/`
  *      component) — the short-quoted-inside-long case whose Jaccard
  *      is too LOW for the banded probe to ever candidate;
  *   2. within-batch self-dedup: exact prefix-filtered n-gram Jaccard
  *      over the micro-batch ([[Dedup.ngramJaccardFromSets]] — a batch
  *      is small, exactness is cheap here), keeping the smaller doc_id
  *      of each near-dup pair;
  *   3. benchmark decontamination (optional): docs sharing a 13-gram
  *      with the holdout set are dropped ([[Decontam]]'s screen) — the
  *      benchmark posting list is built ONCE at pipeline construction
  *      and broadcast into every batch, so the per-batch cost is one
  *      broadcast-hash join over the batch's grams;
  *   4. PII scrub ([[Pii.scrub]]) then the Gopher-style quality gate
  *      ([[Quality.gate]]) over the SCRUBBED text — what gets published
  *      is what gets judged — then (optional) the CCNet-style
  *      reference-LM gate: docs scoring below `lmScoreFloor` under a
  *      bigram LM trained once on the trusted `lmRef` corpus
  *      ([[TextOps.lmScoreUnderModel]], model tables broadcast) drop;
  *   5. a per-epoch drop-attribution metrics row (docs in, drops per
  *      stage, docs kept) lands in `outDir/metrics/epoch=<id>` — the
  *      observability surface a production curation loop is operated
  *      by — and survivors land in `outDir/kept/epoch=<id>` (overwrite — a
  *      replayed batch replaces its own partition, see processBatch's
  *      exactly-once note) and fold into the index ([[DedupIndex.foldIn]]
  *      — an O(batch) append fenced by a per-epoch marker), so the NEXT
  *      batch's probe sees them.
  *
  * The per-batch body is deterministic (hash-based signatures, exact
  * verification, min-id keeper rule), so N streamed micro-batches produce
  * exactly the same kept set as driving [[processBatch]] by hand over the
  * same frames in the same order — StreamingSpec pins that parity, which
  * is also what makes the checkpoint/restart story safe: a replayed batch
  * re-derives the same decisions.
  *
  * 100 TB design notes: the index is hive-partitioned by hash prefix and
  * probes read only the partitions the batch can hit; the corpus text
  * never re-shuffles after ingest (scrub + gate are zero-shuffle
  * projections); the only growing state is the index itself, which
  * [[graft.scale.Compaction.compactPartitioned]] keeps in scan-sized
  * files as the appends accumulate.
  */
class CurationPipeline(
    spark: SparkSession,
    indexPath: String,
    outDir: String,
    threshold: Double = 0.6,
    benchmark: Option[DataFrame] = None,
    decontamN: Int = 13,
    lmRef: Option[DataFrame] = None,
    lmScoreFloor: Double = -10.0,
    lmAlpha: Double = 0.1,
    containment: Option[Double] = None,
    containMaxDf: Int = 64,
    // AQE is scope-DISABLED around each batch's jobs by default: at
    // micro-batch grain every frame is bounded, so the skew/coalesce
    // wins AQE exists for never apply, while its per-stage scheduling
    // turns each action into a chain of stage-jobs — measured 59 vs 16
    // jobs per batch, 3.7× the scheduler-floor exposure, with a
    // bit-identical kept set. A deployment feeding CLUSTER-sized
    // batches (where runtime coalescing and skew splitting pay) passes
    // None to leave the session's setting alone.
    perBatchAqe: Option[Boolean] = Some(false)) {

  import CurationPipeline._

  private def indexExists: Boolean = {
    // check the COMPLETED markers of both components probe() reads, not
    // the mere existence of the first-written directory: a crash during
    // the non-atomic first-epoch build leaves buckets/ on disk without
    // sets/, and treating that torn state as "index present" made the
    // replayed epoch's probe throw on the missing sets path forever --
    // a permanent crash loop nothing repaired (build only runs when
    // !indexExists). With the marker check, a torn build reads as "no
    // index" and the replay rebuilds it (build's overwrite mode repairs
    // the torn components). An index missing only postings/ still
    // counts as present: probe works, and the containment screen
    // already names that layout error explicitly.
    val conf = spark.sparkContext.hadoopConfiguration
    Seq("buckets", "sets").forall { c =>
      val m = new Path(s"$indexPath/$c/_SUCCESS")
      m.getFileSystem(conf).exists(m)
    }
  }

  /** The standing benchmark posting list: distinct decontamN-grams of
    * the holdout, built once per pipeline (benchmarks are small and
    * static) and broadcast into every batch's screen. */
  private val benchGrams: Option[DataFrame] = benchmark.map { b =>
    // The memo key must carry the BENCHMARK's identity, not just the
    // pipeline's: two pipelines on the same index but different holdouts
    // must not share a posting list. semanticHash is the analyzed plan's
    // stable fingerprint, so an identical benchmark still reuses the
    // cache while a different one gets its own entry.
    val benchId = b.queryExecution.analyzed.semanticHash()
    graft.Caches.memo(spark, s"curationBenchGrams:$indexPath:$decontamN:$benchId") {
      b.select(TextOps.tokens(col("text")).as("toks"))
        .select(explode(Decontam.ngramsFromTokens(col("toks"), decontamN))
          .as("gram"))
        .distinct()
    }
  }

  /** The standing reference language model (CCNet-style: incoming text
    * is scored under a bigram LM trained ONCE on a trusted corpus, and
    * reference-unlike docs drop). Model tables are vocabulary-sized and
    * broadcast into every batch's scoring join; the memo key carries the
    * REFERENCE's identity for the same reason [[benchGrams]]'s does. */
  private val lmModel: Option[(DataFrame, DataFrame)] = lmRef.map { ref =>
    val refId = ref.queryExecution.analyzed.semanticHash()
    val uni = graft.Caches.memo(spark,
      s"curationLmUni:$indexPath:$lmAlpha:$refId") {
      TextOps.lmModelTables(ref)._1
    }
    val bi = graft.Caches.memo(spark,
      s"curationLmBi:$indexPath:$lmAlpha:$refId") {
      TextOps.lmModelTables(ref)._2
    }
    (uni, bi)
  }

  /** One micro-batch of (doc_id, text) through the curation gauntlet.
    * Public so batch-mode callers (and the parity spec) can drive it
    * without a streaming query. */
  def processBatch(batch0: DataFrame, epochId: Long): Unit = {
    // scoped set/restore (the StreamingNearDupSpec conf pattern);
    // batches run sequentially and the in-batch futures share the
    // session, so the override covers exactly this batch's jobs
    val aqeKey = "spark.sql.adaptive.enabled"
    val prevAqe = perBatchAqe.map(v => {
      val p = spark.conf.get(aqeKey, "true")
      spark.conf.set(aqeKey, v.toString)
      p
    })
    try processBatchInner(batch0, epochId)
    finally prevAqe.foreach(spark.conf.set(aqeKey, _))
  }

  private def processBatchInner(batch0: DataFrame, epochId: Long): Unit = {
    // No up-front isEmpty: that limit-1 probe was one scheduler-floor
    // job on EVERY batch, paid to optimize the rare empty one. The
    // verdict aggregate below computes n_in anyway; an empty batch
    // skips the writes and the marker there (externally identical:
    // no outputs, no fold, no marker), and its gauntlet jobs are
    // near-free over empty frames.
    // stage 0: NFC-normalize at ingest — composed vs decomposed
    // codepoints would otherwise fracture every downstream hash
    // equality (index probe signatures, self-dedup shingles, decontam
    // grams), and what gets published is the normalized form
    val batch = batch0.select(col("doc_id"),
      graft.functions.UnicodeNormalize.unicode_normalize(col("text"))
        .as("text")).persist()
    // STAGE FUSION (r13): the probe, decontam, quality and LM screens
    // are PER-DOC predicates, so screen(survivors) == screen(batch) ∩
    // survivors — evaluating each against the full batch changes no
    // decision but lets all verdicts merge into ONE wide flag frame
    // whose materialization is a single job. Two screens are NOT pure
    // per-doc predicates and keep their sequential inputs: containment
    // (its df cap counts batch-side shingle frequency — see below) and
    // self-dedup (order-dependent keeper rule). The r12 shape ran the gauntlet
    // as 5 sequential anti-joins plus 7 per-stage count() actions:
    // ~13 scheduler-floor jobs per micro-batch, which at local[32]'s
    // ~0.3-0.5 s/job floor was the entire 44-vs-176 docs/s gap between
    // the streamed and batch-driven loop. Self-dedup is the one
    // genuinely ORDER-DEPENDENT stage (a doc whose only dup partner was
    // index-dropped must survive as its cluster's canonical), so it
    // still runs on the post-index survivor set. Metrics attribution is
    // first-failing-stage over the flags — identical numbers to the
    // sequential counts, in one aggregate.
    val staged = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    def stage(df: DataFrame): DataFrame = { staged += df.persist(); df }
    // SPARK_GRAFT_CURATION_DEBUG=1: per-wall timings — the jobs-per-
    // batch attribution loop (each eager stage is one sequential wall)
    val debug = sys.env.get("SPARK_GRAFT_CURATION_DEBUG").contains("1")
    def timed[T](tag: String)(f: => T): T =
      if (!debug) f
      else {
        val t0 = System.nanoTime()
        val r = f
        println(f"[curation] e$epochId $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        r
      }
    def flagged(flag: String)(drops: DataFrame): DataFrame =
      drops.select(col("doc_id"), lit(1L).as(flag)).distinct()
    try {
      val haveIndex = timed("index_exists")(indexExists)
      // 1. standing-index probe verdict (near-dups of the curated corpus)
      // EAGER probe, one wall: probe() is probeStaged + localCheckpoint —
      // since the prefix collects became DPP semi-joins it schedules ONE
      // materialization (was three sequential walls), and the checkpoint
      // TRUNCATES lineage, which matters beyond job count: a fully lazy
      // probe embedded the whole index-scan DAG in every downstream
      // staged plan, and CacheManager's canonicalized plan-matching then
      // cost ~6 s/batch at unpersist time (driver CPU, invisible to job
      // counts) plus ~2 s of verdict planning. Checkpointed, downstream
      // plans see a leaf.
      val probeDrop: Option[DataFrame] =
        if (haveIndex) Some(flagged("f_index")(
          timed("index_probe")(DedupIndex.probe(spark, indexPath, batch,
              threshold))
            .select(col("new_id").as("doc_id"))))
        else None
      // 1b. containment verdict (optional): batch docs mostly QUOTED
      //     inside the curated corpus — the low-Jaccard
      //     short-inside-long case the banded probe is blind to
      //     (a quote's MinHash bands never collide with its host's)
      val containDrop: Option[DataFrame] = containment match {
        case Some(t) if haveIndex =>
          // the postings/ component only exists for indexes built since
          // it was added — an older-layout index would fail the probe
          // with a bare path-not-found deep inside the scan; name the
          // real cause instead (silently skipping a REQUESTED screen is
          // worse: contaminated batches would pass as curated)
          val postings = new org.apache.hadoop.fs.Path(s"$indexPath/postings")
          val pfs = postings.getFileSystem(
            spark.sparkContext.hadoopConfiguration)
          if (!pfs.exists(postings))
            throw new IllegalStateException(
              s"CurationPipeline: containment screen enabled but " +
                s"$indexPath has no postings/ component -- the index " +
                "predates the containment layout; rebuild it with " +
                "DedupIndex.build before enabling containment")
          // probe the POST-INDEX survivor set, not the full batch: the
          // containment screen is the one verdict that is NOT a pure
          // per-doc predicate — its df cap counts batch-side shingle
          // frequency (dfb) plus index df, so probing index-duplicate
          // docs alongside fresh ones could push shared shingles over
          // maxDf and hide real containment. The anti-join is lazy (no
          // extra action); it becomes a subplan of the probe's own jobs,
          // exactly like the r12 sequential gauntlet.
          val fresh = probeDrop match {
            case Some(d) => batch.join(d.select(col("doc_id")),
              Seq("doc_id"), "left_anti")
            case None => batch
          }
          Some(flagged("f_contained")(
            timed("containment_probe")(DedupIndex.containmentProbe(
                spark, indexPath, fresh, t, containMaxDf))
              .select(col("new_id").as("doc_id"))))
        case _ => None
      }
      // 3. benchmark-decontamination verdict (per-doc gram containment)
      val contamDrop: Option[DataFrame] = benchGrams.map { bg =>
        flagged("f_contam")(batch
          .select(col("doc_id"),
            graft.functions.NGramGenerate.ngram_gen(
              TextOps.tokens(col("text")), decontamN).as("gram"))
          .join(broadcast(bg), Seq("gram"))
          .select(col("doc_id")))
      }
      // 4. scrub + quality verdict over the SCRUBBED text (what gets
      //    published is what gets judged); `out_text` is the publish form
      // staged: the LM scorer AND the judged join both read it — an
      // unpersisted scrub chain (5 regexp passes over every doc) would
      // run twice
      val gateCols = stage(Quality.gate(
          Pii.scrub(batch, "text")
            .select(col("doc_id"), col("clean_text").as("text")))
        .select(col("doc_id"), col("text").as("out_text"), col("keep")))
      // 5. reference-LM verdict on the publish form
      val lmScores: Option[DataFrame] = lmModel.map { case (uni, bi) =>
        TextOps.lmScoreUnderModel(
            gateCols.select(col("doc_id"), col("out_text").as("text")),
            uni, bi, lmAlpha)
          .select(col("doc_id"), col("lm_score"))
      }
      // explicit broadcast on every verdict-side join — but ONLY in
      // micro-batch mode (perBatchAqe = Some(false)): there the frames
      // are batch-bounded and AQE's runtime stats are off, so
      // size-estimate defaults would plan 32-partition sort-merge
      // shuffles for kilobyte frames. In cluster-batch mode (None) the
      // hints would be WRONG the same way the AQE override would —
      // gateCols carries the batch's full scrubbed text, and a forced
      // broadcast of a multi-GB batch is a driver OOM — so both knobs
      // ride the same switch and AQE plans the joins from runtime stats.
      def bcast(df: DataFrame): DataFrame =
        if (perBatchAqe.contains(false)) broadcast(df) else df
      def withFlag(df: DataFrame, f: Option[DataFrame],
          flag: String): DataFrame = f match {
        case Some(d) => df.join(bcast(d), Seq("doc_id"), "left_outer")
          .na.fill(0L, Seq(flag))
        case None => df.withColumn(flag, lit(0L))
      }
      val judged0 = withFlag(withFlag(withFlag(
          batch, probeDrop, "f_index"), containDrop, "f_contained"),
          contamDrop, "f_contam")
        .join(bcast(gateCols), Seq("doc_id"))
        .withColumn("f_quality", when(col("keep") === 1, 0L).otherwise(1L))
      val judged = stage(lmScores match {
        case Some(s) => judged0.join(bcast(s), Seq("doc_id"))
          .withColumn("f_lm",
            when(col("lm_score") >= lmScoreFloor, 0L).otherwise(1L))
        case None => judged0.withColumn("f_lm", lit(0L))
      })
      // 2. within-batch self-dedup on the post-index survivor set;
      //    ida < idb by construction, so dropping every idb keeps the
      //    first-seen (smallest) id. The shingle-set frame is STAGED
      //    (persisted) before the posting explode: a Generate over the
      //    raw array_sort(array_distinct(...)) expression re-evaluates
      //    it per output row — measured 30× on a 500-doc batch — while
      //    a cached frame gives the generator a plain attribute child
      val ownSets = stage(Dedup.shingleSets(
        judged.filter(col("f_index") === 0 && col("f_contained") === 0)
          .select(col("doc_id"), col("text"))))
      val selfDups = flagged("f_self")(
        Dedup.ngramJaccardFromSets(ownSets, threshold)
          .select(col("idb").as("doc_id")))
      val verdicts = stage(
        judged.join(bcast(selfDups), Seq("doc_id"), "left_outer")
          .na.fill(0L, Seq("f_self")))
      try {
        // EXACTLY-ONCE under foreachBatch's at-least-once replay: the
        // WHOLE epoch — metrics row, kept output, index fold — is
        // fenced by one per-epoch marker. A replay before the marker
        // landed re-derives IDENTICAL decisions whatever subset of the
        // epoch's concurrent writes survived the crash, because both
        // index probes exclude corpus rows carrying the batch's own
        // doc_ids (the epoch's folded copies are invisible to its own
        // replay — see the DedupIndex header) and the kept/metrics
        // partition dirs are overwrite-mode. A LATE replay (marker
        // present) is a full no-op — later epochs have since folded in
        // and a re-run would see a different index. The only
        // degradation left is storage: a replayed fold appends
        // duplicate bucket/sets/posting rows, which every reader
        // tolerates (candidate distinct, pair-level distinct,
        // posting-slice distinct) and compaction packs.
        val marker = new Path(s"$indexPath/_folded_epoch_$epochId")
        val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
        if (!fs.exists(marker)) {
          // per-stage drop attribution in ONE aggregate — the
          // observability row a curation operator actually watches (a
          // silent 90% quality-drop epoch is an incident, not a
          // statistic). Each doc attributes to its FIRST failing stage,
          // which reproduces the sequential-anti-join counts exactly.
          val s1 = col("f_index") === 0
          val s2 = s1 && col("f_contained") === 0
          val s3 = s2 && col("f_self") === 0
          val s4 = s3 && col("f_contam") === 0
          val s5 = s4 && col("f_quality") === 0
          val s6 = s5 && col("f_lm") === 0
          def cnt(c: org.apache.spark.sql.Column) =
            sum(when(c, 1L).otherwise(0L))
          val m = timed("verdict_agg")(verdicts.agg(
            count(lit(1)).as("n_in"),
            cnt(col("f_index") === 1).as("drop_index_dup"),
            cnt(s1 && col("f_contained") === 1).as("drop_contained"),
            cnt(s2 && col("f_self") === 1).as("drop_self_dup"),
            cnt(s3 && col("f_contam") === 1).as("drop_contaminated"),
            cnt(s4 && col("f_quality") === 1).as("drop_quality"),
            cnt(s5 && col("f_lm") === 1).as("drop_lm"),
            cnt(s6).as("n_kept")).collect()(0))
          if (m.getLong(0) == 0L) return // empty batch: no epoch to record
          val nKept = m.getLong(7)
          import spark.implicits._
          // the epoch's three outputs (metrics row, kept partition,
          // index fold) are independent paths — run them as concurrent
          // jobs; the marker still lands only after ALL complete, so
          // the exactly-once contract is unchanged (a crash now leaves
          // an arbitrary SUBSET instead of a prefix, which the replay
          // semantics above already tolerate)
          import scala.concurrent.{Await, Future}
          import scala.concurrent.ExecutionContext.Implicits.global
          import scala.concurrent.duration.Duration
          val metricsW = Future {
            Seq((m.getLong(0), m.getLong(1), m.getLong(2), m.getLong(3),
                m.getLong(4), m.getLong(5), m.getLong(6), nKept))
              .toDF("n_in", "drop_index_dup", "drop_contained",
                "drop_self_dup", "drop_contaminated", "drop_quality",
                "drop_lm", "n_kept")
              .coalesce(1)
              .write.mode("overwrite").parquet(s"$outDir/metrics/epoch=$epochId")
          }
          val keptW = Future {
            if (nKept > 0) {
              val kept = verdicts.filter(s6)
                .select(col("doc_id"), col("out_text").as("text"))
              kept.write.mode("overwrite").parquet(s"$outDir/kept/epoch=$epochId")
              if (haveIndex) DedupIndex.foldIn(kept, indexPath)
              else DedupIndex.build(kept, indexPath)
            }
          }
          timed("writes_wall")(
            Seq(metricsW, keptW).foreach(Await.result(_, Duration.Inf)))
          timed("marker")(fs.create(marker, true).close())
        }
      } finally timed("unpersist")(staged.foreach(_.unpersist()))
    } finally batch.unpersist()
  }

  /** File-stream source (one parquet file per trigger ⇒ one ingest batch
    * per micro-batch) into foreachBatch; the checkpoint tracks processed
    * files so a restart resumes at the first unabsorbed batch. */
  def start(inputDir: String, checkpointDir: String,
      triggerInterval: String = "1 second"): StreamingQuery =
    spark.readStream
      .schema(docSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(inputDir)
      .writeStream
      .foreachBatch((b: DataFrame, id: Long) => processBatch(b, id))
      .outputMode("update")
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.ProcessingTime(triggerInterval))
      .start()
}

object CurationPipeline {
  /** Ingest schema: the minimal (doc_id, text) document frame. */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))
}
