package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Layout contract of the persisted plain-IVF index: the assignment is
  * partitioned BY CELL, and a probe-cell set pushed as a static IN
  * filter prunes the scan to the probed cells' directories — the
  * inverted-list property `ivfIndexTopK`'s partial-probe path relies
  * on (dynamic partition pruning does NOT fire for the broadcast probe
  * join, measured r20, which is why the path pushes the static set). */
class IvfIndexLayoutSpec extends AnyFunSuite {
  import SparkTestSession.{sf, spark}
  import graft.llm.Vectors

  test("static probe-cell IN filter prunes assignment partitions") {
    Vectors.ivfIndexTopK(spark, sf, nQueries = 5, k = 3).collect()
    // drop the hot-index memo: with it resident, the CacheManager
    // substitutes the InMemoryRelation under ANY matching fresh read
    // and the FileScan (whose PartitionFilters this spec pins) never
    // plans — this spec is about the DIRECT-read deployment shape
    Caches.release(spark)
    val path = Vectors.ivfIndexPath(spark, sf)
    val raw = spark.read.parquet(s"$path/assignment")
    // partition-type inference gives int back — the layout's read type
    assert(raw.schema("cell").dataType ==
      org.apache.spark.sql.types.IntegerType)
    val pruned = raw.filter(col("cell").isin(3, 7))
    val fmt = new java.io.ByteArrayOutputStream()
    Console.withOut(fmt) { pruned.explain("formatted") }
    val pf = fmt.toString.linesIterator
      .filter(_.contains("PartitionFilters")).mkString
    assert(pf.contains("IN (3,7)"),
      s"probe IN filter did not reach PartitionFilters: $pf")
    // (an unconditional cast over the partition column was measured to
    // block pruning in a cache-resident session — readAssignment keeps
    // the column raw via a conditional guard; whether the optimizer
    // sees through the int→int alias is context-dependent, so only the
    // positive contract is pinned here)
  }
}
