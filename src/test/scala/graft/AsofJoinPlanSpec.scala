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

  test("multi-key asof co-locates when one side arrives pre-partitioned on a key subset") {
    // A HashPartitioning on a SUBSET of the join keys satisfies
    // ClusteredDistribution(keys), so EnsureRequirements keeps it and
    // must reshuffle the OTHER side onto the matching key positions
    // (ShuffleSpec compatibility). If it ever co-partitioned the sides
    // differently, equal (k1,k2) pairs would land in different partition
    // indexes and the merge would emit nulls where matches exist — this
    // pins the co-location end to end.
    val probe = Seq.tabulate(64) { i =>
      (i.toLong % 8, (i.toLong / 8) % 4, ts("2024-01-01 12:00:00"), s"p$i")
    }.toDF("k1", "k2", "t", "tag")
      .repartition(7, col("k2"))                    // subset of the keys
    val build = Seq.tabulate(32) { i =>
      (i.toLong % 8, (i.toLong / 8) % 4, ts("2024-01-01 09:00:00"), i.toLong)
    }.toDF("k1", "k2", "t", "id")
    val native = AsofJoinPlan.asof(probe, build, Seq("k1", "k2"), "t", "t",
      "id", Seq("id"))
    // every (k1,k2) in [0,8)x[0,4) has exactly one earlier build row
    assert(native.filter(col("asof_id").isNull).count() == 0)
    val composed = TemporalOps.asofJoin(probe, build, Seq("k1", "k2"), "t", "t",
      "id", Seq("id"))
    assert(native.collect().map(_.toSeq).toSet ==
      composed.collect().map(_.toSeq).toSet)
  }

  test("asof refuses mismatched key/time types and empty keys loudly") {
    val probe = Seq((1L, 10L, "p")).toDF("k", "t", "tag")
    val buildIntKey = Seq((1, 5L, 1L)).toDF("k", "t", "id")
    val ek = intercept[IllegalArgumentException] {
      AsofJoinPlan.asof(probe, buildIntKey, Seq("k"), "t", "t", "id", Seq("id"))
    }
    assert(ek.getMessage.contains("asof key 'k' types differ"))
    val buildIntTime = Seq((1L, 5, 1L)).toDF("k", "t", "id")
    val et = intercept[IllegalArgumentException] {
      AsofJoinPlan.asof(probe, buildIntTime, Seq("k"), "t", "t", "id", Seq("id"))
    }
    assert(et.getMessage.contains("asof time types differ"))
    val build = Seq((1L, 5L, 1L)).toDF("k", "t", "id")
    val en = intercept[IllegalArgumentException] {
      AsofJoinPlan.asof(probe, build, Seq.empty, "t", "t", "id", Seq("id"))
    }
    assert(en.getMessage.contains("at least one key"))
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
