package graft

import org.scalatest.funsuite.AnyFunSuite

/** Caches.memo session scoping: a frame memoized under one session must
  * never be served to a different session (a rebuilt session would
  * otherwise receive a DataFrame bound to a stopped session and fail on
  * first use). */
class CachesSpec extends AnyFunSuite {
  import SparkTestSession.spark

  test("memo is scoped per session: a new session re-builds instead of reusing another session's frame") {
    val a = spark.newSession() // distinct sessionUUIDs on the shared context
    val b = spark.newSession()
    var builds = 0
    def build(s: org.apache.spark.sql.SparkSession) = {
      builds += 1
      s.range(3).toDF("n")
    }
    val fa = Caches.memo(a, "caches-spec-frame")(build(a))
    val fa2 = Caches.memo(a, "caches-spec-frame")(build(a))
    assert(builds == 1 && (fa eq fa2)) // same session: one build, one instance
    assert(fa.sparkSession eq a)
    // session B with the same logical key gets ITS OWN live frame — the
    // exact scenario that previously served a dead session's DataFrame
    val fb = Caches.memo(b, "caches-spec-frame")(build(b))
    assert(builds == 2)
    assert(fb.sparkSession eq b)
    assert(fb.collect().map(_.getLong(0)).toSeq == Seq(0L, 1L, 2L))
  }

  test("memo is reentrant: builders that memo other keys never hit Recursive update") {
    // ngramJaccardPairs' builder calls shingleArrays' memo — with
    // computeIfAbsent this threw IllegalStateException whenever the two
    // keys shared a hash bin (identity-hash lottery, seen in Bench).
    // Many nested pairs make a bin collision near-certain under the old
    // implementation.
    val s = spark.newSession()
    for (i <- 0 until 64) {
      val outer = Caches.memo(s, s"reentrant-outer-$i") {
        Caches.memo(s, s"reentrant-inner-$i")(s.range(2).toDF("n"))
          .select(org.apache.spark.sql.functions.col("n"))
      }
      assert(outer.count() == 2)
    }
    Caches.release(s)
  }

  test("fanOut is a no-op on already-parallel frames (memo builders must not add a gratuitous shuffle at cluster scale)") {
    val target = spark.sparkContext.defaultParallelism
    // ≥ parallelism: fanOut returns the SAME DataFrame instance — no
    // RoundRobin exchange enters the memoized plan (the transactions/
    // importance builders route through fanOut, so this is the guard
    // that a cluster-scale input never pays a full extra shuffle)
    val wide = spark.range(0, 1024).toDF("v").repartition(target)
    assert(Tables.fanOut(wide) eq wide)
    assert(!Tables.fanOut(wide).queryExecution.optimizedPlan.toString
      .toLowerCase.contains("roundrobin"))
    // under-parallelized: fanOut widens to the session parallelism
    val narrow = spark.range(0, 1024).toDF("v").coalesce(1)
    assert(Tables.fanOut(narrow).rdd.getNumPartitions == target)
  }

  test("release(spark) frees only that session's frames") {
    val a = spark.newSession()
    val b = spark.newSession()
    val fa = Caches.memo(a, "release-scope")(a.range(1).toDF("n"))
    val fb = Caches.memo(b, "release-scope")(b.range(1).toDF("n"))
    fa.count(); fb.count()
    Caches.release(a)
    // A's entry is gone (re-memo builds anew); B's entry survives
    var rebuilt = false
    Caches.memo(a, "release-scope") { rebuilt = true; a.range(1).toDF("n") }
    assert(rebuilt)
    var rebuiltB = false
    val fb2 = Caches.memo(b, "release-scope") { rebuiltB = true; b.range(1).toDF("n") }
    assert(!rebuiltB && (fb2 eq fb))
    Caches.release(a); Caches.release(b)
  }
}
