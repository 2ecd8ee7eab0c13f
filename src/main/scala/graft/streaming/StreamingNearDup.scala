package graft.streaming

import graft.llm.Dedup
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** STREAMING near-duplicate detection — the realtime-ingest form of
  * [[graft.llm.Dedup.dedupSimhash]]: every arriving document is checked
  * against everything already ingested, in one pass, with state that
  * lives in Spark's checkpointed state store (RocksDB on a cluster).
  *
  * Shape: per-row [[Dedup.simhash64]] signature (a pure projection, so
  * it runs before any stateful operator), then the EXACT pigeonhole
  * banding of the batch path — but the band buckets are KEYED STREAM
  * STATE instead of a self-join side: `flatMapGroupsWithState` keyed by
  * (band_id, band_val) holds the (doc_id, sig) members of each bucket,
  * and an arriving document emits a pair for every stored member within
  * Hamming ≤ maxDist before joining the bucket itself. Any pair within
  * the radius agrees on ≥1 band (pigeonhole), so recall equals the
  * batch join's — StreamingNearDupSpec pins stream == batch on the same
  * corpus split across micro-batches.
  *
  * Scale properties:
  *   - state is the standing index (the streaming analog of
  *     [[graft.llm.DedupIndex]]'s fold-in contract): O(corpus) total but
  *     hash-partitioned across executors by band key, ~16 bytes/doc/band;
  *     a lateness-bounded variant would add an event-time timeout to
  *     evict buckets — the standing form is what ingest dedup needs;
  *   - per arrival, work is O(bucket size), never O(corpus); hot buckets
  *     parallelize across bands (a doc's bands land on different keys);
  *   - a pair colliding in several bands is emitted once per colliding
  *     band: cross-band suppression would need a second stateful stage,
  *     so it is left to the consumer (`.distinct()` per sink batch, or
  *     `dropDuplicatesWithinWatermark` on (ida, idb) in a watermarked
  *     pipeline) — same contract as the batch candidate stream before
  *     its final distinct.
  */
object StreamingNearDup {

  final case class BandMember(band_id: Int, band_val: Long, doc_id: Long,
      sig: Long)
  final case class Bucket(ids: Seq[Long], sigs: Seq[Long])
  final case class DupPair(ida: Long, idb: Long, hamming: Int)

  /** (doc_id, text) stream → per-row signature stream (doc_id, sig). */
  def signatures(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), Dedup.simhash64(col("text")).as("sig"))

  /** Signature stream → near-dup pair stream. `sigs` must have columns
    * (doc_id: long, sig: long); emits (ida < idb, hamming ≤ maxDist). */
  def nearDupPairs(sigs: DataFrame, maxDist: Int = 3): Dataset[DupPair] = {
    val spark = sigs.sparkSession
    import spark.implicits._
    val nBands = maxDist + 1
    val width = 64 / nBands
    val bandCols = (0 until nBands).map { b =>
      struct(lit(b).as("band_id"),
        shiftrightunsigned(col("sig"), b * width)
          .bitwiseAND((1L << width) - 1).as("band_val"))
    }
    val banded = sigs
      .select(col("doc_id"), col("sig"), explode(array(bandCols: _*)).as("band"))
      .select(col("band.band_id"), col("band.band_val"), col("doc_id"),
        col("sig"))
      .as[BandMember]

    def update(key: (Int, Long), batch: Iterator[BandMember],
        state: GroupState[Bucket]): Iterator[DupPair] = {
      val existing = state.getOption.getOrElse(Bucket(Nil, Nil))
      var ids = existing.ids.toList
      var sigl = existing.sigs.toList
      val out = scala.collection.mutable.ArrayBuffer[DupPair]()
      // deterministic intra-batch order so replay emits identical pairs
      for (m <- batch.toSeq.sortBy(_.doc_id)) {
        var i = ids
        var s = sigl
        while (i.nonEmpty) {
          if (i.head != m.doc_id) {
            val d = java.lang.Long.bitCount(s.head ^ m.sig)
            if (d <= maxDist)
              out += DupPair(math.min(i.head, m.doc_id),
                math.max(i.head, m.doc_id), d)
          }
          i = i.tail
          s = s.tail
        }
        ids ::= m.doc_id
        sigl ::= m.sig
      }
      state.update(Bucket(ids, sigl))
      out.iterator
    }

    banded.groupByKey(m => (m.band_id, m.band_val))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(update)
  }

  /** (doc_id, text) stream → near-dup pair stream, end to end. */
  def nearDupStream(docs: DataFrame, maxDist: Int = 3): Dataset[DupPair] =
    nearDupPairs(signatures(docs), maxDist)
}
