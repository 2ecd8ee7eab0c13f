package graft

import org.apache.spark.sql.SparkSession

/** Scaling-curve evidence for the heavy dedup/span pipeline: cold
  * per-query seconds at two corpus scales, so the 100-TB design claims
  * ("one df-capped posting shuffle", "O(candidates) verify, never
  * all-pairs") are MEASURED sub-quadratic, not argued. Prints one JSON
  * line per (query, dir).
  *
  *   sbt "runMain graft.ScaleCurve <dirA> <dirB> [q1,q2,...]"
  *
  * The scaled corpus is generated as K independent token-remapped
  * copies of the base corpus (`tools/gen_scaledata.py`): within-copy
  * duplicate structure is preserved per copy, cross-copy shingle
  * collisions are zero, and doc_id offsets are multiples of 10 so the
  * mod-10 batch carves scale with the data. A K× corpus therefore
  * carries K× the dup mass — the honest load for these operators.
  *
  * Timing discipline matches Bench (min-of-2, full-output toRdd,
  * Caches.release before every pass) EXCEPT that t0 starts before the
  * query BUILDER runs: several of these queries do eager work there
  * (streaming_neardup runs its stream to completion; fixpoints loop),
  * and a scale curve that missed builder-side work would be fiction.
  */
object ScaleCurve {
  def main(args: Array[String]): Unit = {
    val dirA = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dirB = if (args.length > 1) args(1) else "/root/repo/scaledata/sf0.5"
    val names = (if (args.length > 2) args(2).split(",").toSeq
      else Seq("dup_span_scrub", "dedup_clusters", "containment_pairs",
        "streaming_neardup"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // Run tag: the jsonl is append-only (see the artifact-mirror note
    // below), so a re-run of the same (query, dir) leg would otherwise
    // append rows indistinguishable from the ones they supersede.
    // Consumers pick the latest row per (query, dir) by `run` —
    // SPARK_GRAFT_RUN_TAG when the driver sets one, else wall-clock
    // epoch seconds (monotone across runs on one host).
    val runTag = sys.env.getOrElse("SPARK_GRAFT_RUN_TAG",
      (System.currentTimeMillis() / 1000L).toString)
    val lines = scala.collection.mutable.ArrayBuffer.empty[String]
    for (dir <- Seq(dirA, dirB)) {
      spark.read.parquet(s"$dir/documents.parquet").count() // warm IO
      val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
      for (name <- names) {
        val secs = (1 to 2).map { _ =>
          Caches.release(spark)
          val t0 = System.nanoTime()
          val n = SparkEntry.queries(name)(spark, dir)
            .queryExecution.toRdd.count()
          ((System.nanoTime() - t0) / 1e9, n)
        }
        val best = secs.minBy(_._1)
        val line = f"""{"metric":"scale_curve","run":"$runTag","query":"$name","dir":"$dir","docs":$nDocs,"cold_sec":${best._1}%.2f,"rows":${best._2}}"""
        println(line)
        lines += line
      }
    }
    // committed-artifact mirror (same contract as Bench's
    // SPARK_GRAFT_BENCH_OUT): one JSON line per (query, dir). APPEND —
    // the jsonl is an accumulated cross-round log, and an overwrite
    // here would erase every prior leg the way the r18 targeted Bench
    // run clobbered BENCH_FULL.json
    try {
      val out = sys.env.getOrElse("SPARK_GRAFT_SCALE_OUT", "SCALE_CURVE.jsonl")
      java.nio.file.Files.write(java.nio.file.Paths.get(out),
        (lines.mkString("\n") + "\n").getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    } catch {
      case e: java.io.IOException =>
        // Warn-and-continue: the stdout lines above remain the primary
        // record; only the file mirror failed.
        System.err.println(s"WARN: scale-curve artifact write failed: $e")
    }
    spark.stop()
  }
}
