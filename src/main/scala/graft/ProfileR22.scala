package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-22 profiling harness: A/B measurements for the memo-layering
  * candidates (span_shared grams, cdc_shared chunks, boilerplate chunk
  * frames), the cached-plan-AQE question behind the dup-span cold
  * delta, the DedupIndex build/probe split, and the containment-probe
  * stage attribution. Measurement-only — no registered query goes
  * through this path.
  *
  *   sbt "runMain graft.ProfileR22 [sfDir]"
  */
object ProfileR22 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    // optional section filter: spans | shapes | index | probe_stages
    val section = if (args.length > 1) Some(args(1)) else None
    def on(name: String): Boolean = section.forall(_ == name)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(tag: String)(body: => Any): Double = {
      spark.sparkContext.setJobDescription(tag)
      val t0 = System.nanoTime()
      body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[profile] $tag%-52s $s%8.3f s")
      spark.sparkContext.setJobDescription(null)
      s
    }
    def count(df: DataFrame): Long = df.queryExecution.toRdd.count()

    // warmup
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    locally {
      spark.range(0L, 500000000L, 1L, cpus.toInt)
        .select(xxhash64(col("id")).as("h"))
        .agg(expr("bit_xor(h)")).queryExecution.toRdd.count()
    }

    for (pass <- 1 to 2) {
      if (on("spans")) {
      println(s"=== pass $pass: dup-span cold, memo vs cached-plan-AQE ===")
      Caches.release(spark)
      time("dup_span_scrub_maximal cold (as registered)")(
        count(graft.llm.TextOps.dupSpanScrubMaximal(spark, sfDir)))
      Caches.release(spark)
      val aqeKey = "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning"
      val prevAqe = spark.conf.get(aqeKey, "false")
      spark.conf.set(aqeKey, "true")
      time("dup_span_scrub_maximal cold (cachedPlanAQE=true)")(
        count(graft.llm.TextOps.dupSpanScrubMaximal(spark, sfDir)))
      spark.conf.set(aqeKey, prevAqe)
      Caches.release(spark)
      time("dup_spans_maximal cold (as registered)")(
        count(graft.llm.TextOps.dupSpansMaximal(spark, sfDir)))
      time("  + dup_span_scrub warm-after (shared memos)")(
        count(graft.llm.TextOps.dupSpanScrub(spark, sfDir)))
      }

      if (on("shapes")) {
      println(s"=== pass $pass: span_shared / cdc_shared shapes ===")
      Caches.release(spark)
      time("span_shared cold (as registered)")(
        count(graft.llm.Dedup.spanSharedPairs(spark, sfDir)))
      time("span_shared warm rerun (no memo today)")(
        count(graft.llm.Dedup.spanSharedPairs(spark, sfDir)))
      Caches.release(spark)
      time("cdc_shared cold (as registered)")(
        count(graft.llm.Dedup.cdcSharedPairs(spark, sfDir)))
      time("cdc_shared warm rerun")(
        count(graft.llm.Dedup.cdcSharedPairs(spark, sfDir)))
      Caches.release(spark)
      time("boilerplate_scrub cold")(
        count(graft.llm.TextOps.boilerplateScrub(spark, sfDir)))
      time("boilerplate_scrub warm rerun")(
        count(graft.llm.TextOps.boilerplateScrub(spark, sfDir)))
      }

      if (on("index")) {
      println(s"=== pass $pass: DedupIndex build + containment probe ===")
      Caches.release(spark)
      val idxPath = s"${System.getProperty("java.io.tmpdir")}/graft_profile_idx_$pass"
      val fs = new org.apache.hadoop.fs.Path(idxPath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(idxPath), true)
      val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      time("DedupIndex.build (concurrent writes)")(
        graft.llm.DedupIndex.build(docs.filter(col("doc_id") % 10 =!= 0), idxPath))
      time("DedupIndex.containmentProbe (the idx probe)")(
        count(graft.llm.DedupIndex.containmentProbe(spark, idxPath,
          docs.filter(col("doc_id") % 10 === 0))))
      time("DedupIndex.containmentProbe rerun")(
        count(graft.llm.DedupIndex.containmentProbe(spark, idxPath,
          docs.filter(col("doc_id") % 10 === 0))))
      fs.delete(new org.apache.hadoop.fs.Path(idxPath), true)

      println(s"=== pass $pass: containment_probe (memo form) ===")
      Caches.release(spark)
      time("containment_probe cold")(
        count(graft.llm.Dedup.containmentProbe(spark, sfDir)))
      time("containment_probe warm")(
        count(graft.llm.Dedup.containmentProbe(spark, sfDir)))
      }

      if (on("probe_stages")) {
      println(s"=== pass $pass: idx probe stage attribution ===")
      Caches.release(spark)
      val ipath = s"${System.getProperty("java.io.tmpdir")}/graft_profile_pidx"
      val ifs = new org.apache.hadoop.fs.Path(ipath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val docs = Tables.documents(spark, sfDir).select(col("doc_id"), col("text"))
      if (!ifs.exists(new org.apache.hadoop.fs.Path(s"$ipath/postings/_SUCCESS")))
        graft.llm.DedupIndex.build(docs.filter(col("doc_id") % 10 =!= 0), ipath)
      val batch = docs.filter(col("doc_id") % 10 === 0)
      // inline replica of DedupIndex.containmentProbe with per-stage timers
      val batchSets = graft.llm.Dedup.shingleSets(batch).persist()
      time("  batchSets persist")(count(batchSets))
      val batchSh = batchSets
        .select(col("doc_id"), explode(col("shset")).as("shingle")).persist()
      time("  batchSh explode persist")(count(batchSh))
      val batchDf = batchSh.groupBy(col("shingle"))
        .agg(org.apache.spark.sql.functions.count(lit(1)).as("dfb")).persist()
      time("  batchDf agg persist")(count(batchDf))
      var pfxs: Array[Long] = null
      time("  pfx collect") { pfxs = batchDf
        .withColumn("pfx", pmod(xxhash64(col("shingle")), lit(64)))
        .select(col("pfx")).distinct().collect().map(_.getLong(0)) }
      val idx = spark.read.parquet(s"$ipath/postings")
        .filter(col("pfx").isin(pfxs.toIndexedSeq: _*))
        .join(broadcast(batchDf.select(col("shingle"))), Seq("shingle"))
        .join(broadcast(batchSets.select(col("doc_id"))), Seq("doc_id"),
          "left_anti")
        .select(col("shingle"), col("doc_id")).distinct()
        .persist()
      time("  idx pruned-read+distinct persist")(count(idx))
      val kept = batchDf
        .join(idx.groupBy(col("shingle"))
          .agg(org.apache.spark.sql.functions.count(lit(1)).as("dfi")),
          Seq("shingle"), "left")
        .filter(col("dfb") + coalesce(col("dfi"), lit(0L)) <= 64)
        .select(col("shingle"))
      val bKept = batchSh.join(kept, Seq("shingle")).persist()
      time("  bKept persist")(count(bKept))
      val nNew = bKept.groupBy(col("doc_id"))
        .agg(org.apache.spark.sql.functions.count(lit(1)).as("n_new"))
      val scored = idx
        .join(broadcast(bKept.select(col("doc_id").as("new_id"), col("shingle"))),
          Seq("shingle"))
        .groupBy(col("new_id"), col("doc_id").as("corpus_id"))
        .agg(org.apache.spark.sql.functions.count(lit(1)).as("common"))
        .join(nNew.select(col("doc_id").as("new_id"), col("n_new")), Seq("new_id"))
        .withColumn("containment", round(
          col("common").cast("double") / col("n_new"), 6))
        .filter(col("containment") >= 0.5)
      time("  scored compute")(count(scored))
      time("  scored localCheckpoint")(scored.localCheckpoint(true))
      Seq(batchSets, batchSh, batchDf, idx, bKept).foreach(_.unpersist())
      }
    }
    Caches.release()
    spark.stop()
  }
}
