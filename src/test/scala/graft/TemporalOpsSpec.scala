package graft

import graft.llm.Sampling
import graft.ops.{RelOps, TemporalOps}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TemporalOpsSpec extends AnyFunSuite {
  import SparkTestSession.{sf, spark}
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("asofJoin picks the latest build row at-or-before each probe, per key") {
    val probe = Seq(
      (1L, ts("2024-01-01 10:00:00"), "p1"),
      (1L, ts("2024-01-01 12:00:00"), "p2"),
      (2L, ts("2024-01-01 09:00:00"), "p3"), // before any build row for key 2
      (3L, ts("2024-01-01 09:00:00"), "p4")  // key with no build rows at all
    ).toDF("k", "t", "tag")
    val build = Seq(
      (1L, ts("2024-01-01 09:30:00"), 100L),
      (1L, ts("2024-01-01 10:00:00"), 101L), // equal time: <= includes it
      (1L, ts("2024-01-01 11:59:59"), 102L),
      (2L, ts("2024-01-01 09:30:00"), 200L)
    ).toDF("k", "t", "v")
    val got = TemporalOps.asofJoin(probe, build, Seq("k"), "t", "t", "v", Seq("v"))
      .select("tag", "asof_v").as[(String, Option[Long])].collect().toMap
    assert(got("p1").contains(101L)) // equal-time build row wins over earlier
    assert(got("p2").contains(102L))
    assert(got("p3").isEmpty)
    assert(got("p4").isEmpty)
  }

  test("asofJoin tie among equal-time build rows is deterministic (max tiebreak), struct keeps row consistency") {
    val probe = Seq((1L, ts("2024-01-01 10:00:00"), "p")).toDF("k", "t", "tag")
    val build = Seq(
      (1L, ts("2024-01-01 09:00:00"), 5L, "a"),
      (1L, ts("2024-01-01 09:00:00"), 9L, "b"),
      (1L, ts("2024-01-01 09:00:00"), 7L, "c")
    ).toDF("k", "t", "id", "payload")
    val row = TemporalOps.asofJoin(probe, build, Seq("k"), "t", "t", "id",
      Seq("id", "payload")).select("asof_id", "asof_payload").head()
    assert(row.getLong(0) == 9L && row.getString(1) == "b")
  }

  test("asofJoin plans one key shuffle and no nested-loop join") {
    val plan = TemporalOps.asofViewBeforePurchase(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  test("range_join counts clicks in the band, 0 for click-less purchases") {
    val got = TemporalOps.rangeJoinClicks(spark, sf)
    val ev = Tables.events(spark, sf).select("event_id", "user_id", "ts", "event_type").collect()
    val clicks = ev.filter(_.getString(3) == "click")
    val expected = ev.filter(_.getString(3) == "purchase").map { p =>
      val n = clicks.count(c => c.getLong(1) == p.getLong(1) &&
        math.abs(c.getTimestamp(2).getTime - p.getTimestamp(2).getTime) <= 5 * 60 * 1000L)
      (p.getLong(0), n.toLong)
    }.toMap
    val gotMap = got.select("purchase_id", "n_clicks").as[(Long, Long)].collect().toMap
    assert(gotMap == expected)
    assert(gotMap.valuesIterator.contains(0L)) // the left join matters
  }

  test("sessionize splits on >30min gaps and never inside them") {
    val sess = TemporalOps.sessionize(spark, sf).collect()
    // session count per user == 1 + number of >gap deltas in that user's timeline
    val events = Tables.events(spark, sf).select("user_id", "ts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1).getTime)).groupBy(_._1)
    val expectedSessions = events.map { case (u, rows) =>
      val sorted = rows.map(_._2).sorted
      u -> (1 + sorted.sliding(2).count(w => w.length == 2 && w(1) - w(0) > 1800 * 1000L))
    }
    val gotSessions = sess.groupBy(_.getAs[Long]("user_id")).view.mapValues(_.length).toMap
    assert(gotSessions == expectedSessions)
    // per-user event totals survive the segmentation
    val gotEvents = sess.groupBy(_.getAs[Long]("user_id"))
      .view.mapValues(_.map(_.getAs[Long]("n_events")).sum).toMap
    assert(gotEvents == events.view.mapValues(_.length.toLong).toMap)
  }

  test("rollup emits all three levels consistently") {
    val rows = RelOps.rollupSales(spark, sf).collect()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1)
    val total = Tables.lineitem(spark, sf).count()
    assert(grand.head.getAs[Long]("n_items") == total)
    val perFlag = rows.filter(r => !r.isNullAt(0) && r.isNullAt(1))
      .map(_.getAs[Long]("n_items")).sum
    val leaves = rows.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
      .map(_.getAs[Long]("n_items")).sum
    assert(perFlag == total && leaves == total)
  }

  test("anti and semi joins partition the customer table") {
    val anti = RelOps.antiJoinQuiet(spark, sf).select("c_custkey").as[Long].collect().toSet
    val semi = RelOps.semiJoinBig(spark, sf).select("c_custkey").as[Long].collect().toSet
    val all = Tables.customer(spark, sf).select("c_custkey").as[Long].collect().toSet
    assert((anti & semi).isEmpty)
    assert((anti | semi) == all)
  }

  test("hash sample is deterministic, a subset, and bucket-consistent") {
    val a = Sampling.sampleHash(spark, sf)
    val ids1 = a.select("doc_id").as[Long].collect().sorted.toSeq
    val ids2 = Sampling.sampleHash(spark, sf).select("doc_id").as[Long].collect().sorted.toSeq
    assert(ids1 == ids2 && ids1.nonEmpty)
    assert(a.filter(!substring(col("bucket"), 1, 1).isin("0", "1")).isEmpty)
    val total = Tables.documents(spark, sf).count()
    assert(ids1.length < total)
  }
}
