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

  /** Run `tasks` on a bounded pool, FAIL FAST: the first failure cancels
    * every not-yet-started task (running Spark jobs finish their bin —
    * interrupting a mid-write executor task would leave torn output) and
    * rethrows immediately instead of letting the remaining bins run to
    * completion first. */
  private def runAll(tasks: Seq[() => Unit], parallelism: Int): Unit = {
    if (tasks.isEmpty) return
    val pool = java.util.concurrent.Executors.newFixedThreadPool(parallelism)
    val ecs = new java.util.concurrent.ExecutorCompletionService[Unit](pool)
    try {
      val futures = tasks.map(t => ecs.submit(() => t()))
      var done = 0
      while (done < tasks.size) {
        try { ecs.take().get(); done += 1 }
        catch {
          case e: java.util.concurrent.ExecutionException =>
            futures.foreach(_.cancel(false)) // don't start what hasn't run
            throw e.getCause
        }
      }
    } finally {
      // Stop accepting work but let in-flight bins finish their write —
      // shutdownNow() would interrupt mid-write threads, the exact torn-
      // output hazard the cancel(false) above exists to avoid.
      pool.shutdown()
      pool.awaitTermination(Long.MaxValue, java.util.concurrent.TimeUnit.NANOSECONDS)
    }
  }

  /** Compact `inDir`'s parquet files into ~`targetBytes` files in
    * `outDir`. Returns (input file count, output bin count). Bins run
    * as concurrent Spark jobs — each is an independent scan+write, so
    * a 1000-executor cluster compacts 1000 bins at once; the first
    * failed bin cancels the rest ([[runAll]]). */
  def compact(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long, parallelism: Int = 8): (Int, Int) = {
    val files = listParquet(spark, inDir)
    val bins = planBins(files, targetBytes)
    runAll(bins.zipWithIndex.map { case (bin, i) => () =>
      spark.read.parquet(bin: _*)
        .coalesce(1)
        .write.mode("overwrite").parquet(f"$outDir/bin=$i%05d")
    }, parallelism)
    (files.size, bins.size)
  }

  /** Relative paths of every directory under `dir` that directly holds
    * parquet files — `""` for a flat table, `k=v[/k2=w…]` leaves for a
    * hive-partitioned one. Hidden/metadata dirs (`_spark_metadata`,
    * `.tmp…`) are skipped, like Spark's own file index does. */
  def leafDirs(spark: SparkSession, dir: String): Seq[String] = {
    val root = new Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    def walk(p: Path, rel: String): Seq[String] = {
      val st = fs.listStatus(p)
      val here =
        if (st.exists(s => s.isFile && s.getPath.getName.endsWith(".parquet")))
          Seq(rel)
        else Seq.empty
      here ++ st
        .filter(s => s.isDirectory &&
          !s.getPath.getName.startsWith("_") && !s.getPath.getName.startsWith("."))
        .flatMap(s => walk(s.getPath,
          if (rel.isEmpty) s.getPath.getName else s"$rel/${s.getPath.getName}"))
    }
    walk(root, "").sorted
  }

  /** Partition-recursive compaction for hive-partitioned tables (the
    * shape [[graft.llm.DedupIndex]]'s `pfx=…` buckets and epoch-
    * partitioned state logs accumulate): compact each leaf partition's
    * files independently and mirror the `k=v` directory structure under
    * `outDir`, so `spark.read.parquet(outDir)` discovers exactly the
    * same partition columns as the input. Returns (input file count,
    * output file count).
    *
    * Each bin writes through a hidden `.tmp…` staging dir and RENAMES
    * the single part file up into the partition dir — the output stays
    * a plain hive layout (no `bin=` level leaking a phantom partition
    * column), and a crashed bin leaves only an invisible staging dir,
    * never a half-file beside live data. Partitions compact
    * concurrently and independently — exactly the property that lets a
    * 100 TB table be maintained incrementally, a few partitions at a
    * time, without ever rewriting the whole table.
    *
    * Re-running into a previously-used `outDir` REPLACES same-index
    * part files (and fails loudly if it can't); it does not garbage-
    * collect higher-index parts a shrunken bin count strands, so a
    * maintenance loop should compact into a fresh dir and swap — the
    * replace semantics exist so a replayed/crashed pass converges
    * instead of silently serving stale parts. */
  def compactPartitioned(spark: SparkSession, inDir: String, outDir: String,
      targetBytes: Long, parallelism: Int = 8): (Int, Int) = {
    val outRoot = new Path(outDir)
    val fs = outRoot.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val work = for {
      rel <- leafDirs(spark, inDir)
      in = if (rel.isEmpty) inDir else s"$inDir/$rel"
      out = if (rel.isEmpty) outDir else s"$outDir/$rel"
      (bin, i) <- planBins(listParquet(spark, in), targetBytes).zipWithIndex
    } yield (bin, i, rel, out)
    runAll(work.map { case (bin, i, rel, out) => () =>
      val tmp = s"$outDir/.tmp_${rel.replace('/', '_')}_$i"
      spark.read.parquet(bin: _*)
        .coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = fs.listStatus(new Path(tmp)).toSeq
        .find(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        .getOrElse(throw new IllegalStateException(s"no part file in $tmp"))
      fs.mkdirs(new Path(out))
      val dst = new Path(out, f"part-$i%05d.parquet")
      // FileSystem.rename returns FALSE (no exception) when dst already
      // exists — e.g. re-compacting into a previously-used outDir — and
      // silently dropping the fresh file here would both keep the STALE
      // part visible and delete the only copy of the new one with the
      // staging dir below. Replace-then-rename, and fail loudly on any
      // other rename refusal.
      if (fs.exists(dst) && !fs.delete(dst, false))
        throw new java.io.IOException(s"compaction: cannot replace stale $dst")
      if (!fs.rename(part.getPath, dst))
        throw new java.io.IOException(
          s"compaction: rename ${part.getPath} -> $dst refused")
      fs.delete(new Path(tmp), true)
    }, parallelism)
    (work.map(_._1.size).sum, work.size)
  }
}
