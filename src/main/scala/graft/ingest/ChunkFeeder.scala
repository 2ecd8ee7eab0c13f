package graft.ingest

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.DataFrame

/** Mechanism-X analog (mechanism_x/mechanism_x.py): slice a transaction
  * table into fixed-size CSV chunk files dropped into a watched directory
  * at a configurable interval (10,000 rows / 1 file per second in the
  * reference — mechanism_x.py:17-18). The watched directory stands in
  * for the S3 chunk bucket; `s3a://` URIs work unchanged since the
  * consumer reads whatever path it's given.
  *
  * Driver-side by design, like the reference (a feeder process, not a
  * distributed job): the source here is a local iterator over the
  * DataFrame, chunked and written with unique, ordered names
  * (mechanism_x.py:48 name scheme).
  */
object ChunkFeeder {

  /** IST (Asia/Kolkata) wall-clock chunk-name timestamp — the zone the
    * reference's feeder runs in (mechanism_x.py:48 `datetime.now()` on
    * an IST host), so names sort identically to the reference's. */
  private[graft] def chunkTimestamp(): String =
    java.time.ZonedDateTime.now(java.time.ZoneId.of("Asia/Kolkata"))
      .format(java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss"))

  private def csvEscape(v: Any): String = v match {
    case null => ""
    case s: String if s.contains(",") || s.contains("\"") ||
        s.contains("\n") || s.contains("\r") =>
      "\"" + s.replace("\"", "\"\"") + "\""
    case other => other.toString
  }

  /** Write ceil(n/chunkSize) chunk files; returns the number written.
    * intervalMs > 0 paces uploads like the reference's 1/s sleep.
    * The writes go through the Hadoop FileSystem API, so `outDir` may
    * be local, `hdfs:` or an object store (`s3a://`/`s3g://`) — the
    * reference's boto3 upload target (mechanism_x.py:80-82). */
  def feed(df: DataFrame, outDir: String, chunkSize: Int = 10000,
      intervalMs: Long = 0L, namePrefix: String = "transactions_chunk"): Int = {
    val dir = new org.apache.hadoop.fs.Path(outDir)
    val fs = dir.getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    fs.setWriteChecksum(false) // no .crc sidecars in the watched dir
    fs.mkdirs(dir)
    val header = df.columns.mkString(",")
    val it = df.toLocalIterator()
    var part = 0
    val buf = new scala.collection.mutable.ArrayBuffer[String](chunkSize)
    def flush(): Unit = if (buf.nonEmpty) {
      // reference name scheme (mechanism_x.py:80-82):
      // <prefix>_<YYYYMMDD_HHMMSS>_<uuid8>_part<n>.csv — the ts+uuid make
      // two feeds into one directory unique, so the stream's seen-file
      // checkpoint log never confuses a refeed with an already-consumed
      // chunk. The timestamp is IST wall-clock (mechanism_x.py:48 uses
      // the reference's Asia/Kolkata runtime zone).
      val ts = chunkTimestamp()
      val uuid8 = java.util.UUID.randomUUID().toString.split("-")(0)
      val name = f"${namePrefix}_${ts}_${uuid8}_part$part%05d.csv"
      val body = (header +: buf).mkString("", "\n", "\n")
      // write-then-rename so the file-stream source never lists a
      // half-written file (on an object store the tmp object is already
      // invisible until close; the rename keeps one code path)
      val tmp = new org.apache.hadoop.fs.Path(dir, s".$name.tmp")
      val out = fs.create(tmp, true)
      try out.write(body.getBytes(StandardCharsets.UTF_8))
      finally out.close()
      val dst = new org.apache.hadoop.fs.Path(dir, name)
      // FileSystem.rename reports failure by returning false (the old
      // Files.move threw) — a swallowed false leaves the chunk as a
      // hidden .tmp the stream source never lists: a silently truncated feed
      if (!fs.rename(tmp, dst))
        throw new java.io.IOException(s"chunk publish rename failed: $tmp -> $dst")
      buf.clear()
      part += 1
      if (intervalMs > 0) Thread.sleep(intervalMs)
    }
    while (it.hasNext) {
      val row = it.next()
      buf += (0 until row.length).map(i => csvEscape(row.get(i))).mkString(",")
      if (buf.length >= chunkSize) flush()
    }
    flush()
    part
  }

  /** Distributed sibling of [[feed]] (SURVEY.md §2.1 S1's scale
    * mapping): the same ceil(n/chunkSize) chunk files with the same
    * `<prefix>_<ts>_<uuid8>_part<n>.csv` naming contract, but written BY
    * EXECUTORS — no driver iterator anywhere. Shape:
    *
    *   zipWithIndex (no shuffle) → chunk id = rowIdx / chunkSize →
    *   ONE shuffle routing each chunk to its own reducer →
    *   each reducer sorts its ≤chunkSize rows back into table order and
    *   writes its file via the Hadoop FileSystem API (so `file:`,
    *   `hdfs:` and `s3a:` output dirs all work), write-then-rename like
    *   the driver feeder so the file-stream source never lists a
    *   half-written file.
    *
    * Memory per reducer is bounded by chunkSize rows (the reference's
    * 10k), so a 100 TB feed fans out to n/10k fully parallel writers
    * with nothing funnelling through the driver. */
  def feedDistributed(df: DataFrame, outDir: String, chunkSize: Int = 10000,
      namePrefix: String = "transactions_chunk"): Int = {
    val header = df.columns.mkString(",")
    // ONE materialization for the three passes (size job, zipWithIndex's
    // internal size job, write pass): unpersisted, the source would
    // recompute per action, and a non-deterministic source (sample,
    // unsorted limit, a watched directory gaining a file mid-feed) could
    // yield more rows in the write pass than the count that sized the
    // partitioner — getPartition would route past numPartitions and
    // crash the shuffle write
    val rdd = df.rdd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = rdd.count()
      if (n == 0) return 0 // contract is "number WRITTEN" — feed() agrees
      val nChunks = math.ceil(n.toDouble / chunkSize).toInt
      val withIdx = rdd.zipWithIndex()
      val keyed = withIdx.map { case (row, idx) =>
        ((idx / chunkSize).toInt, (idx, row)) }
      val parted = keyed.partitionBy(new org.apache.spark.Partitioner {
        override def numPartitions: Int = nChunks
        override def getPartition(key: Any): Int = key.asInstanceOf[Int]
      })
      parted.foreachPartition { it =>
        // shuffle arrival order is nondeterministic; the in-memory sort
        // (bounded by chunkSize rows) restores table order within the file
        val rows = it.toArray.sortBy(_._2._1)
        if (rows.nonEmpty) {
          val chunkId = rows.head._1
          val body = (header +: rows.toSeq.map { case (_, (_, row)) =>
            (0 until row.length).map(i => csvEscape(row.get(i))).mkString(",")
          }).mkString("", "\n", "\n")
          val uuid8 = java.util.UUID.randomUUID().toString.split("-")(0)
          val name = f"${namePrefix}_${chunkTimestamp()}_${uuid8}_part$chunkId%05d.csv"
          val conf = new org.apache.hadoop.conf.Configuration()
          val dir = new org.apache.hadoop.fs.Path(outDir)
          val fs = dir.getFileSystem(conf)
          fs.setWriteChecksum(false) // no .crc sidecars in the watched dir
          fs.mkdirs(dir)
          val tmp = new org.apache.hadoop.fs.Path(dir, s".$name.tmp")
          val out = fs.create(tmp, true)
          try out.write(body.getBytes(StandardCharsets.UTF_8))
          finally out.close()
          val dst = new org.apache.hadoop.fs.Path(dir, name)
          if (!fs.rename(tmp, dst))
            throw new java.io.IOException(s"chunk publish rename failed: $tmp -> $dst")
        }
      }
      nChunks
    } finally rdd.unpersist(blocking = false)
  }
}
