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
}
