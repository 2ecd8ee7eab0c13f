package graft

import org.apache.spark.sql.SparkSession

/** Round-21 profiling harness: attributes COLD time inside the shared
  * memo chains (the cold-pass cost centers) by materializing each stage
  * in dependency order and reporting deltas. Measurement-only — no
  * registered query goes through this path.
  *
  *   sbt "runMain graft.ProfileR21 [sfDir]"
  */
object ProfileR21 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(tag: String)(body: => Any): Unit = {
      spark.sparkContext.setJobDescription(tag)
      val t0 = System.nanoTime()
      body
      println(f"[profile] $tag%-40s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      spark.sparkContext.setJobDescription(null)
    }
    def count(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()

    // warmup
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    for (pass <- 1 to 2) {
      println(s"=== pass $pass: dedup cluster chain (cold) ===")
      Caches.release(spark)
      time("shingleArrays")(count(graft.llm.Dedup.shingleArrays(spark, sfDir)))
      time("ngramJaccardPairs")(count(
        graft.llm.Dedup.ngramJaccardPairs(spark, sfDir)))
      time("dedupClusters (label prop)")(count(
        graft.llm.Dedup.dedupClusters(spark, sfDir)))
      time("cluster_canonical (window)")(count(
        graft.llm.Dedup.clusterCanonical(spark, sfDir)))
      time("dedup_apply")(count(graft.llm.Dedup.dedupApply(spark, sfDir)))
      time("dup_cluster_hist")(count(
        graft.llm.Dedup.dupClusterHist(spark, sfDir)))

      println(s"=== pass $pass: ngram pair-join internals (cold) ===")
      Caches.release(spark)
      count(graft.llm.Dedup.shingleArrays(spark, sfDir)) // pre-warm memo
      val sets = graft.llm.Dedup.shingleArrays(spark, sfDir)
      val pre = graft.llm.Dedup.prefixPostings(sets, 0.6).persist()
      time("  prefixPostings")(count(pre.toDF()))
      val cand = pre.select(org.apache.spark.sql.functions.col("doc_id")
          .as("ida"), org.apache.spark.sql.functions.col("shingle"))
        .join(pre.select(org.apache.spark.sql.functions.col("doc_id")
          .as("idb"), org.apache.spark.sql.functions.col("shingle")),
          Seq("shingle"))
        .filter(org.apache.spark.sql.functions.col("ida") <
          org.apache.spark.sql.functions.col("idb"))
        .select(org.apache.spark.sql.functions.col("ida"),
          org.apache.spark.sql.functions.col("idb")).distinct().persist()
      time("  candidates self-join")(count(cand.toDF()))
      time("  verify join")(count(graft.llm.Dedup.verifiedJaccardPairs(
        cand.toDF(), sets, sets, "ida", "idb", 0.6)))
      pre.unpersist(); cand.unpersist()

      println(s"=== pass $pass: pattern chain (cold) ===")
      Caches.release(spark)
      time("transactions memo")(count(Tables.transactions(spark, sfDir)))
      time("finestAgg")(count(graft.ops.Patterns.finestAgg(spark, sfDir)))
      time("custMerchantGrain")(count(
        graft.ops.Patterns.custMerchantGrain(spark, sfDir)))
      time("lowWeightDetectionPairs")(count(
        graft.ops.Patterns.lowWeightDetectionPairs(spark, sfDir)))
      time("patid1 (on warm memos)")(count(
        graft.ops.Patterns.patId1Query(spark, sfDir)))
      time("union_detections (warm memos)")(count(
        graft.ops.Patterns.unionDetectionsQuery(spark, sfDir)))
      Caches.release(spark)
      time("union_detections COLD total")(count(
        graft.ops.Patterns.unionDetectionsQuery(spark, sfDir)))
      Caches.release(spark)
      time("importance memo")(count(Tables.importance(spark, sfDir)))
      time("agg_percentile (warm importance)")(count(
        graft.ops.RelOps.weightPercentiles(spark, sfDir)))
    }
    Caches.release()
    spark.stop()
  }
}
