package graft

import org.apache.spark.sql.SparkSession

/** One-off eviction-isolating scale leg for the watermarked streaming
  * near-dup: the REGISTERED config (nChunks = 10) cannot show the
  * watermark evicting at the 100× corpus because each 50k-doc batch
  * swallows whole duplicate neighborhoods and SAME-batch pairs always
  * emit (exactly-once semantics) — measured: the adjacent and
  * copy-major dense layouts both emit the identical 8,175,925 pairs.
  * Eviction only prunes CROSS-batch pairs, so the leg that isolates it
  * needs batches far smaller than the duplicate spans: the adjacent
  * layout (copies of a doc 100 ids apart per original-id step) at
  * nChunks = 100 (5k-doc batches) leaves most within-copy pairs
  * cross-batch and outside the lateness window.
  *
  *   sbt "runMain graft.WmScaleLeg <dir> [nChunks]"
  *
  * Prints a scale_curve-style JSON row with the config-suffixed query
  * name; timing includes the run-to-completion stream (ScaleCurve's
  * builder-inclusive discipline, single pass — the leg is about the
  * OUTPUT/state shape, not latency).
  */
object WmScaleLeg {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val nChunks = if (args.length > 1) args(1).toInt else 100
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = spark.read.parquet(s"$dir/documents.parquet").count()
    val t0 = System.nanoTime()
    val rows = graft.streaming.StreamingNearDup
      .streamingNearDupWatermarkedQuery(spark, dir, nChunks = nChunks)
      .queryExecution.toRdd.count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"""{"metric":"scale_curve","query":"streaming_neardup_wm_c$nChunks","dir":"$dir","docs":$docs,"cold_sec":$sec%.2f,"rows":$rows}""")
    spark.stop()
  }
}
