package graft.llm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The PERSISTED incremental near-dedup index — the production shape of
  * [[Dedup.dedupIncremental]]'s session-cached index: a parquet-backed
  * MinHash-LSH bucket table plus the per-doc shingle sets, living across
  * sessions and growing by `foldIn` as verified batches are absorbed.
  * Continuous-ingestion loop:
  *
  *   1. [[build]] once over the initial corpus;
  *   2. per arriving batch: [[probe]] → (new, corpus) near-dup pairs →
  *      caller drops/clusters the dups;
  *   3. [[foldIn]] the kept batch docs — an APPEND of their bucket and
  *      set rows, never a rebuild.
  *
  * Layout under `path`:
  *   - `buckets/` (doc_id, band_id, band_hash), partitioned by
  *     `pfx = pmod(band_hash, 64)`;
  *   - `sets/` (doc_id, shset) for exact candidate verification.
  *
  * 100 TB scale: a probe computes the batch's buckets, collects their
  * distinct `pfx` values (≤ 64 ints — a bounded driver set, not data),
  * and reads ONLY those index partitions — the scan is pruned to the
  * hash-prefix slices the batch can possibly hit. The batch bucket set
  * is broadcast into the pruned scan (no index-side shuffle), and only
  * verified candidates ever touch the `sets` table, via a key join.
  * Per-batch cost: O(hit-fraction of index + candidates) — the corpus
  * is never self-joined and never re-signed. foldIn appends exactly the
  * batch's rows: O(batch).
  */
object DedupIndex {

  private val nPfx = 64

  /** Files per epoch for the `sets/` append: bounded write fan-in
    * without serializing a big batch through one writer (a curation
    * batch is at most ingest-sized; [[graft.scale.Compaction]] packs
    * the accumulated epochs). */
  private val setFiles = 4

  private def withPfx(buckets: DataFrame): DataFrame =
    buckets.withColumn("pfx", pmod(col("band_hash"), lit(nPfx)))

  private def bucketsOf(sets: DataFrame, bands: Int, rows: Int): DataFrame =
    Dedup.bandedBuckets(Dedup.minhashSignatures(
      sets.select(col("doc_id"), explode(col("shset")).as("shingle"))), bands, rows)

  /** Create (overwrite) the index from an initial (doc_id, text) corpus. */
  def build(docs: DataFrame, path: String, bands: Int = 16, rows: Int = 4): Unit = {
    val sets = Dedup.shingleSets(docs).persist()
    try {
      // repartition on the partition column first: without it every
      // write task sprays a file into each of the ≤64 pfx dirs (tasks ×
      // 64 small files per epoch — measured 2.6× the fold cost and a
      // linearly growing probe tax); with it each epoch adds exactly
      // one file per touched pfx
      withPfx(bucketsOf(sets, bands, rows))
        .repartition(col("pfx"))
        .write.mode("overwrite").partitionBy("pfx").parquet(s"$path/buckets")
      sets.coalesce(setFiles)
        .write.mode("overwrite").parquet(s"$path/sets")
    } finally sets.unpersist()
  }

  /** Absorb a verified batch: append its bucket + set rows. The caller
    * folds a batch in AFTER acting on [[probe]]'s verdict, so batch docs
    * judged duplicates can be excluded before they enter the index. */
  def foldIn(docs: DataFrame, path: String, bands: Int = 16, rows: Int = 4): Unit = {
    val sets = Dedup.shingleSets(docs).persist()
    try {
      // same one-file-per-pfx-per-epoch discipline as [[build]]; a
      // batch-sized shuffle, and Compaction.compactPartitioned packs
      // the per-epoch files when they accumulate
      withPfx(bucketsOf(sets, bands, rows))
        .repartition(col("pfx"))
        .write.mode("append").partitionBy("pfx").parquet(s"$path/buckets")
      sets.coalesce(setFiles)
        .write.mode("append").parquet(s"$path/sets")
    } finally sets.unpersist()
  }

  /** (new_id, corpus_id, jaccard) for every batch doc near-duplicating
    * an indexed doc at `threshold` — same banding and exact-verify
    * contract as [[Dedup.dedupIncremental]], against the persisted
    * index. */
  def probe(spark: SparkSession, path: String, batch: DataFrame,
      threshold: Double = 0.6, bands: Int = 16, rows: Int = 4): DataFrame = {
    val batchSets = Dedup.shingleSets(batch).persist()
    val probeBuckets = withPfx(bucketsOf(batchSets, bands, rows)).persist()
    // bounded by construction: at most nPfx distinct values
    val pfxs = probeBuckets.select(col("pfx")).distinct()
      .collect().map(_.getLong(0))
    val index = spark.read.parquet(s"$path/buckets")
      .filter(col("pfx").isin(pfxs: _*)) // partition-pruned scan
    val cand = index.join(
        broadcast(probeBuckets.select(col("doc_id").as("new_id"),
          col("band_id"), col("band_hash"))),
        Seq("band_id", "band_hash"))
      .select(col("new_id"), col("doc_id").as("corpus_id"))
      .distinct()
    val verified = cand
      .join(batchSets.select(col("doc_id").as("new_id"), col("shset").as("sa")),
        Seq("new_id"))
      .join(spark.read.parquet(s"$path/sets")
          .select(col("doc_id").as("corpus_id"), col("shset").as("sb")),
        Seq("corpus_id"))
      .withColumn("i", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("jaccard", col("i").cast("double") /
        (size(col("sa")) + size(col("sb")) - col("i")))
      .filter(col("jaccard") >= threshold)
      .select(col("new_id"), col("corpus_id"), round(col("jaccard"), 6).as("jaccard"))
    // materialize before unpersisting the inputs the plan references
    val out = verified.localCheckpoint(true)
    batchSets.unpersist()
    probeBuckets.unpersist()
    out
  }
}
