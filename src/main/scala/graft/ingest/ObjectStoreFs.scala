package graft.ingest

import java.io.{ByteArrayOutputStream, EOFException, FileNotFoundException, IOException, InputStream, OutputStream}
import java.net.URI
import java.util.concurrent.ConcurrentHashMap
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** An OBJECT-STORE-SEMANTICS Hadoop FileSystem (`s3g://bucket/key`),
  * backed by an in-JVM key→bytes map: the S3 contract the reference's
  * transport actually runs on (mechanism_x.py:48,80-82; "Mechanism
  * Y.py":100-105,277), reproduced faithfully enough to drive the full
  * feed → stream → checkpoint → sink pipeline against it in a
  * zero-egress container (no MinIO binary, no hadoop-aws jar on the
  * pinned classpath — the `S3AFileSystem` class itself is absent, so a
  * literal s3a:// endpoint cannot even be instantiated here; on a real
  * cluster the same pipeline code takes `s3a://` URIs unchanged).
  *
  * Contract points deliberately mirrored from S3/s3a — each one is a
  * behavior POSIX rename-based code silently relies on and object
  * stores do NOT provide, which is exactly what the e2e suite must
  * prove the engine survives:
  *   - flat key namespace; "directories" are synthesized from key
  *     prefixes (plus explicit mkdirs markers, like s3a's empty dir
  *     objects) — an empty "directory" with no marker does not exist;
  *   - whole-object visibility: a writer's bytes appear atomically at
  *     `close()` (S3 PUT) — readers never observe a half-written
  *     object, but `create()` is not an exclusive claim;
  *   - NO ATOMIC RENAME: rename is per-object copy-then-delete, one
  *     key at a time (the s3a emulation); a directory rename observed
  *     mid-flight shows some keys moved and some not;
  *   - strong read-after-write consistency (S3 since 2020).
  *
  * Registered via the Hadoop ServiceLoader mechanism
  * (META-INF/services/org.apache.hadoop.fs.FileSystem), so executor
  * code that builds a bare `new Configuration()` resolves `s3g://`
  * without any per-job config plumbing — same as s3a on a real
  * cluster's classpath.
  */
class ObjectStoreFileSystem extends FileSystem {
  import ObjectStoreFileSystem.{Obj, bucket, marks}

  private var fsUri: URI = _
  private var workDir: Path = _

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    fsUri = URI.create(s"s3g://${name.getAuthority}")
    workDir = new Path(fsUri.toString + "/")
    setConf(conf)
  }

  override def getScheme: String = "s3g"
  override def getUri: URI = fsUri

  private def store = bucket(fsUri.getAuthority)
  private def dirMarks = marks(fsUri.getAuthority)

  /** Path → flat object key ("" = bucket root). */
  private def key(p: Path): String = {
    val abs = if (p.isAbsolute) p else new Path(workDir, p)
    abs.toUri.getPath.stripPrefix("/").stripSuffix("/")
  }
  private def qualify(k: String): Path =
    new Path(fsUri.toString + "/" + k)

  private def fileStatus(k: String, o: Obj): FileStatus =
    new FileStatus(o.bytes.length.toLong, false, 1, 32L * 1024 * 1024,
      o.mtime, qualify(k))
  private def dirStatus(k: String): FileStatus =
    new FileStatus(0L, true, 1, 0L, 0L, qualify(k))

  private def hasChildren(k: String): Boolean = {
    val prefix = if (k.isEmpty) "" else k + "/"
    val keys = store.keySet().iterator()
    var found = false
    while (!found && keys.hasNext) found = keys.next().startsWith(prefix)
    if (!found) {
      val ms = dirMarks.iterator()
      while (!found && ms.hasNext) {
        val m = ms.next()
        found = m.startsWith(prefix) && m != k
      }
    }
    found
  }

  override def getFileStatus(f: Path): FileStatus = {
    val k = key(f)
    if (k.isEmpty) return dirStatus(k) // bucket root always exists
    val o = store.get(k)
    if (o != null) fileStatus(k, o)
    else if (dirMarks.contains(k) || hasChildren(k)) dirStatus(k)
    else throw new FileNotFoundException(s"s3g: no such key: $f")
  }

  override def listStatus(f: Path): Array[FileStatus] = {
    val k = key(f)
    val o = store.get(k)
    if (o != null) return Array(fileStatus(k, o)) // object path lists itself
    if (!(k.isEmpty || dirMarks.contains(k) || hasChildren(k)))
      throw new FileNotFoundException(s"s3g: no such key: $f")
    val prefix = if (k.isEmpty) "" else k + "/"
    val files = scala.collection.mutable.Map[String, Obj]()
    val dirs = scala.collection.mutable.Set[String]()
    store.forEach { (kk, oo) =>
      if (kk.startsWith(prefix)) {
        val rest = kk.substring(prefix.length)
        val slash = rest.indexOf('/')
        if (slash < 0) files(kk) = oo
        else dirs += prefix + rest.substring(0, slash)
      }
    }
    dirMarks.forEach { m =>
      if (m.startsWith(prefix) && m != k) {
        val rest = m.substring(prefix.length)
        val slash = rest.indexOf('/')
        dirs += (if (slash < 0) m else prefix + rest.substring(0, slash))
      }
    }
    (files.toSeq.sortBy(_._1).map { case (kk, oo) => fileStatus(kk, oo) } ++
      (dirs -- files.keySet).toSeq.sorted.map(dirStatus)).toArray
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val o = store.get(key(f))
    if (o == null) throw new FileNotFoundException(s"s3g: no such key: $f")
    new FSDataInputStream(new ObjectStoreFileSystem.SeekableBytes(o.bytes))
  }

  override def create(f: Path, permission: FsPermission, overwrite: Boolean,
      bufferSize: Int, replication: Short, blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    val k = key(f)
    if (k.isEmpty) throw new IOException("s3g: cannot create the bucket root")
    if (!overwrite && store.containsKey(k))
      throw new FileAlreadyExistsException(s"s3g: key exists: $f")
    // s3a refuses to create an object where a directory (marker or
    // implied-by-children) stands: the object would shadow the tree for
    // getFileStatus while listings still surfaced the children.
    if (dirMarks.contains(k) || hasChildren(k))
      throw new FileAlreadyExistsException(s"s3g: key is a directory: $f")
    // whole-object visibility: nothing lands in the store before close()
    new FSDataOutputStream(new OutputStream {
      private val buf = new ByteArrayOutputStream()
      override def write(b: Int): Unit = buf.write(b)
      override def write(b: Array[Byte], off: Int, len: Int): Unit =
        buf.write(b, off, len)
      override def close(): Unit =
        store.put(k, Obj(buf.toByteArray, System.currentTimeMillis()))
    }, null)
  }

  override def append(f: Path, bufferSize: Int,
      progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("s3g: objects are immutable (no append)")

  /** Per-object copy-then-delete, the s3a rename emulation: NOT atomic
    * (each key moves independently), mtime refreshed by the copy (an
    * S3 COPY is a new PUT). */
  override def rename(src: Path, dst: Path): Boolean = {
    val sk = key(src)
    var dk = key(dst)
    val dstObj = store.get(dk)
    if (dstObj != null) return false // dst object exists: HDFS-style refusal
    if (dk.isEmpty) { // bucket root: always a directory; no leading "/" key
      dk = src.getName
      // a same-named DIRECTORY at root must refuse (HDFS semantics), not
      // be shadowed by a freshly-written object
      if (dirMarks.contains(dk) || hasChildren(dk)) return false
    } else if (dirMarks.contains(dk) || hasChildren(dk))
      dk = dk + "/" + src.getName // dst is a directory: move INTO it
    if (store.get(dk) != null) return false
    // A same-named DIRECTORY at the (possibly retargeted) destination
    // must refuse like HDFS does — silently merging the trees would let
    // stale keys under dst survive a caller's "replace by rename", the
    // exact failure family the compaction rename fix closed.
    if (dk != key(dst) && (dirMarks.contains(dk) || hasChildren(dk)))
      return false
    // Rename into the source's own subtree (includes rename(d, d), which
    // the directory retarget turns into d/d) would relocate the tree
    // under itself; HDFS refuses, so do we.
    if (dk == sk || dk.startsWith(sk + "/")) return false
    val now = System.currentTimeMillis()
    val so = store.get(sk)
    if (so != null) { // single object
      store.put(dk, Obj(so.bytes, now))
      store.remove(sk)
      return true
    }
    if (!(dirMarks.contains(sk) || hasChildren(sk))) return false
    val prefix = sk + "/"
    val keys = store.keySet().toArray(Array.empty[String])
      .filter(_.startsWith(prefix)).sorted
    for (kk <- keys) { // one key at a time — observably non-atomic
      val oo = store.get(kk)
      if (oo != null) {
        store.put(dk + "/" + kk.substring(prefix.length), Obj(oo.bytes, now))
        store.remove(kk)
      }
    }
    val ms = dirMarks.toArray(Array.empty[String])
      .filter(m => m == sk || m.startsWith(prefix))
    for (m <- ms) {
      dirMarks.add(if (m == sk) dk else dk + "/" + m.substring(prefix.length))
      dirMarks.remove(m)
    }
    true
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    val k = key(f)
    if (store.remove(k) != null) return true
    val isDir = dirMarks.contains(k) || hasChildren(k)
    if (!isDir) return false
    val prefix = if (k.isEmpty) "" else k + "/"
    val children = store.keySet().toArray(Array.empty[String])
      .filter(_.startsWith(prefix))
    val childMarks = dirMarks.toArray(Array.empty[String])
      .filter(m => m.startsWith(prefix) && m != k)
    if (!recursive && (children.nonEmpty || childMarks.nonEmpty))
      throw new IOException(s"s3g: directory not empty: $f")
    children.foreach(store.remove)
    childMarks.foreach(dirMarks.remove)
    dirMarks.remove(k)
    true
  }

  /** Like s3a: records an explicit empty-dir marker; parents are
    * implicit (an object store has no real directory tree to build). */
  override def mkdirs(f: Path, permission: FsPermission): Boolean = {
    val k = key(f)
    if (store.containsKey(k))
      throw new FileAlreadyExistsException(s"s3g: key is an object: $f")
    if (k.nonEmpty) dirMarks.add(k)
    true
  }

  override def setWorkingDirectory(dir: Path): Unit = { workDir = dir }
  override def getWorkingDirectory: Path = workDir
}

object ObjectStoreFileSystem {
  final case class Obj(bytes: Array[Byte], mtime: Long)

  private val buckets =
    new ConcurrentHashMap[String, ConcurrentHashMap[String, Obj]]()
  private val markers =
    new ConcurrentHashMap[String, java.util.concurrent.ConcurrentHashMap.KeySetView[String, java.lang.Boolean]]()

  private[ingest] def bucket(name: String): ConcurrentHashMap[String, Obj] =
    buckets.computeIfAbsent(name, _ => new ConcurrentHashMap[String, Obj]())
  private[ingest] def marks(name: String) =
    markers.computeIfAbsent(name, _ => ConcurrentHashMap.newKeySet[String]())

  /** Drop a bucket entirely (test isolation between suites). */
  def clearBucket(name: String): Unit = {
    buckets.remove(name); markers.remove(name)
  }

  /** Byte-array stream with the Seekable/PositionedReadable faces the
    * parquet/CSV readers need. */
  private[ingest] final class SeekableBytes(b: Array[Byte]) extends InputStream
      with Seekable with PositionedReadable {
    private var pos = 0
    override def read(): Int =
      if (pos >= b.length) -1 else { val r = b(pos) & 0xff; pos += 1; r }
    override def read(dst: Array[Byte], off: Int, len: Int): Int =
      if (pos >= b.length) -1
      else {
        val n = math.min(len, b.length - pos)
        System.arraycopy(b, pos, dst, off, n); pos += n; n
      }
    override def seek(p: Long): Unit = {
      if (p < 0 || p > b.length) throw new EOFException(s"seek($p) len=${b.length}")
      pos = p.toInt
    }
    override def getPos: Long = pos.toLong
    override def seekToNewSource(targetPos: Long): Boolean = false
    override def read(position: Long, buffer: Array[Byte], offset: Int,
        length: Int): Int =
      if (position >= b.length) -1
      else {
        val n = math.min(length, b.length - position.toInt)
        System.arraycopy(b, position.toInt, buffer, offset, n); n
      }
    override def readFully(position: Long, buffer: Array[Byte], offset: Int,
        length: Int): Unit = {
      if (position + length > b.length)
        throw new EOFException(s"readFully($position,$length) len=${b.length}")
      System.arraycopy(b, position.toInt, buffer, offset, length)
    }
    override def readFully(position: Long, buffer: Array[Byte]): Unit =
      readFully(position, buffer, 0, buffer.length)
  }
}
