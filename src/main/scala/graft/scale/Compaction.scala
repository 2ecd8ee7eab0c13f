package graft.scale

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction — the table-maintenance pass every long-running
  * ingest needs (a streaming sink appending one parquet file per
  * micro-batch turns a 100 TB table into tens of millions of KB-sized
  * files, and scan-task scheduling overhead then dominates the read).
  *
  * Two pieces, separable so the planner is unit-testable without IO:
  *
  *  - [[planBins]]: first-fit-decreasing bin packing of (file, bytes)
  *    into bins of `targetBytes` — the classic 11/9·OPT+1 bound, so the
  *    output file count is within ~22% of the optimal packing.
  *  - [[compact]]: one Spark job per bin, reading exactly that bin's
  *    files and writing them back as ONE file. Jobs are submitted
  *    concurrently (scheduler pools handle the rest on a cluster); each
  *    bin's read is a plain scan — no shuffle, no sort — so compaction
  *    IO is exactly (bytes in + bytes out).
  *
  * Row-group alignment note: `coalesce(1)` over a bin concatenates row
  * groups without decompress-shuffle cycles beyond parquet re-encode;
  * we deliberately do NOT `repartition(1)` (that would shuffle every
  * row through one task's disk).
  */
object Compaction {

  /** First-fit-decreasing pack of (path, bytes) into bins of at most
    * `targetBytes` (a file larger than the target gets its own bin and
    * is left unsplit — splitting parquet needs a row-group-level
    * rewrite that costs more than it saves). Deterministic: ties break
    * on path. */
  def planBins(files: Seq[(String, Long)], targetBytes: Long): Seq[Seq[String]] = {
    val sorted = files.sortBy { case (p, b) => (-b, p) }
    val bins = scala.collection.mutable.ArrayBuffer[(Long, scala.collection.mutable.ArrayBuffer[String])]()
    for ((path, bytes) <- sorted) {
      val i = bins.indexWhere(_._1 + bytes <= targetBytes)
      if (i >= 0) {
        val (load, buf) = bins(i)
        buf += path
        bins(i) = (load + bytes, buf)
      } else bins += ((bytes, scala.collection.mutable.ArrayBuffer(path)))
    }
    bins.map(_._2.toSeq).toSeq
  }

  /** List a directory's parquet files with sizes via the Hadoop FS API
    * (works on HDFS/S3A/local alike). */
  def listParquet(spark: SparkSession, dir: String): Seq[(String, Long)] = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return Seq.empty
    fs.listStatus(p).toSeq
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(s => (s.getPath.toString, s.getLen))
  }

  /** Compact `inDir`'s parquet files into ~`targetBytes` files in
    * `outDir`. Returns (input file count, output bin count). Bins run
    * as concurrent Spark jobs — each is an independent scan+write, so
    * a 1000-executor cluster compacts 1000 bins at once. */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long, parallelism: Int = 8): (Int, Int) = {
    val files = listParquet(spark, inDir)
    val bins = planBins(files, targetBytes)
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration.Duration
    val pool = java.util.concurrent.Executors.newFixedThreadPool(parallelism)
    implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
    val jobs = bins.zipWithIndex.map { case (bin, i) =>
      Future {
        spark.read.parquet(bin: _*)
          .coalesce(1)
          .write.mode("overwrite").parquet(f"$outDir/bin=$i%05d")
      }
    }
    try Await.result(Future.sequence(jobs), Duration.Inf)
    finally pool.shutdown()
    (files.size, bins.size)
  }
}
