package graft.ingest

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
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

  private def csvEscape(v: Any): String = v match {
    case null => ""
    case s: String if s.contains(",") || s.contains("\"") ||
        s.contains("\n") || s.contains("\r") =>
      "\"" + s.replace("\"", "\"\"") + "\""
    case other => other.toString
  }

  /** Write ceil(n/chunkSize) chunk files; returns the number written.
    * intervalMs > 0 paces uploads like the reference's 1/s sleep. */
  def feed(df: DataFrame, outDir: String, chunkSize: Int = 10000,
      intervalMs: Long = 0L, namePrefix: String = "transactions_chunk"): Int = {
    Files.createDirectories(Paths.get(outDir))
    val header = df.columns.mkString(",")
    val it = df.toLocalIterator()
    var part = 0
    val buf = new scala.collection.mutable.ArrayBuffer[String](chunkSize)
    def flush(): Unit = if (buf.nonEmpty) {
      // reference name scheme (mechanism_x.py:80-82):
      // <prefix>_<YYYYMMDD_HHMMSS>_<uuid8>_part<n>.csv — the ts+uuid make
      // two feeds into one directory unique, so the stream's seen-file
      // checkpoint log never confuses a refeed with an already-consumed
      // chunk
      val ts = java.time.LocalDateTime.now()
        .format(java.time.format.DateTimeFormatter.ofPattern("yyyyMMdd_HHmmss"))
      val uuid8 = java.util.UUID.randomUUID().toString.split("-")(0)
      val name = f"${namePrefix}_${ts}_${uuid8}_part$part%05d.csv"
      val body = (header +: buf).mkString("", "\n", "\n")
      // write-then-rename so the file-stream source never lists a
      // half-written file
      val tmp = Paths.get(outDir, s".$name.tmp")
      Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
      Files.move(tmp, Paths.get(outDir, name))
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
}
