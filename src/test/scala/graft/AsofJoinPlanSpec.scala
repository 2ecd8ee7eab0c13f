package graft

import graft.ops.TemporalOps
import graft.plans.AsofJoinPlan
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsofJoinPlanSpec extends AnyFunSuite {
  import SparkTestSession.{sf, spark}
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private def sides() = {
    val ev = Tables.events(spark, sf)
    val probe = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
    val build = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id"))
    (probe, build)
  }

  test("native asof join matches the composed union+window formulation on real data") {
    val (probe, build) = sides()
    val native = AsofJoinPlan.asof(probe, build, Seq("user_id"), "ts", "ts",
      "event_id", Seq("event_id", "ts"))
    val composed = TemporalOps.asofJoin(probe, build, Seq("user_id"), "ts", "ts",
      "event_id", Seq("event_id", "ts"))
    assert(native.columns.toSeq ==
      Seq("purchase_id", "user_id", "ts", "asof_event_id", "asof_ts"))
    val n = native.collect().map(_.toSeq).toSet
    val c = composed.collect().map(_.toSeq).toSet
    assert(n.nonEmpty && n == c)
  }

  test("native asof join: equal-time inclusion, max-tiebreak ties, null for no prior build") {
    val probe = Seq(
      (1L, ts("2024-01-01 10:00:00"), "p1"),
      (2L, ts("2024-01-01 09:00:00"), "p2"),
      (3L, ts("2024-01-01 09:00:00"), "p3")
    ).toDF("k", "t", "tag")
    val build = Seq(
      (1L, ts("2024-01-01 10:00:00"), 5L, "lo"),
      (1L, ts("2024-01-01 10:00:00"), 9L, "hi"), // equal key+time: max id wins
      (1L, ts("2024-01-01 09:00:00"), 7L, "old"),
      (2L, ts("2024-01-01 09:30:00"), 8L, "late") // after the only probe for key 2
    ).toDF("k", "t", "id", "payload")
    val got = AsofJoinPlan.asof(probe, build, Seq("k"), "t", "t", "id",
        Seq("id", "payload"))
      .select("tag", "asof_id", "asof_payload")
      .collect().map(r => r.getString(0) ->
        (Option(r.get(1)), Option(r.get(2)))).toMap
    assert(got("p1") == (Some(9L), Some("hi")))
    assert(got("p2") == (None, None))
    assert(got("p3") == (None, None))
  }

  test("native asof join is null-safe on keys and times and matches the composed form") {
    // null keys group together (window-partitionBy semantics); a null
    // build time reads as -inf; a null-time probe sees only null-time
    // build rows — all inherited from the composed form's NullsFirst sort
    val probe = Seq(
      (Option(1L), Option(ts("2024-01-01 10:00:00")), "p1"),
      (Option.empty[Long], Option(ts("2024-01-01 10:00:00")), "pnullk"),
      (Option(1L), Option.empty[java.sql.Timestamp], "pnullt"),
      (Option.empty[Long], Option.empty[java.sql.Timestamp], "pnullkt")
    ).toDF("k", "t", "tag")
    val build = Seq(
      (Option(1L), Option(ts("2024-01-01 09:00:00")), Option(1L), "b1"),
      (Option(1L), Option.empty[java.sql.Timestamp], Option(2L), "bnullt"),
      (Option.empty[Long], Option(ts("2024-01-01 09:30:00")), Option(3L), "bnullk"),
      (Option.empty[Long], Option.empty[java.sql.Timestamp], Option(4L), "bnullkt")
    ).toDF("k", "t", "id", "payload")
    val native = AsofJoinPlan.asof(probe, build, Seq("k"), "t", "t", "id",
      Seq("id", "payload"))
    val composed = TemporalOps.asofJoin(probe, build, Seq("k"), "t", "t", "id",
      Seq("id", "payload"))
    val n = native.collect().map(_.toSeq).toSet
    val c = composed.collect().map(_.toSeq).toSet
    assert(n == c)
    val byTag = native.select("tag", "asof_id").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(byTag("p1") == Some(1L))      // latest real time beats the -inf null-time row
    assert(byTag("pnullt") == Some(2L))  // null-time probe only sees null-time builds
    assert(byTag("pnullk") == Some(3L))  // null keys join each other
    assert(byTag("pnullkt") == Some(4L))
  }

  test("native asof join plans AsofJoinExec with one clustered exchange per side and no window") {
    val (probe, build) = sides()
    val df = AsofJoinPlan.asof(probe, build, Seq("user_id"), "ts", "ts",
      "event_id", Seq("event_id"))
    val plan = df.queryExecution.executedPlan.toString
    // SparkPlan.nodeName strips the Exec suffix in plan strings
    assert(plan.contains("AsofJoin ["))
    assert(!plan.contains("Window"))
    assert(!plan.contains("BroadcastNestedLoopJoin") && !plan.contains("CartesianProduct"))
  }

  test("native asof join composes downstream (filter + agg over the joined frame)") {
    val (probe, build) = sides()
    val out = AsofJoinPlan.asof(probe, build, Seq("user_id"), "ts", "ts",
        "event_id", Seq("event_id"))
      .filter(col("asof_event_id").isNotNull)
      .groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    assert(out.collect().map(_.getLong(1)).sum > 0)
  }
}
