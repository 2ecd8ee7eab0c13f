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

  test("asofJoinForward picks the earliest build row at-or-after each probe, per key") {
    val probe = Seq(
      (1L, ts("2024-01-01 10:00:00"), "p1"),
      (1L, ts("2024-01-01 12:00:01"), "p2"), // after the last build row for key 1
      (2L, ts("2024-01-01 09:00:00"), "p3"),
      (3L, ts("2024-01-01 09:00:00"), "p4")  // key with no build rows
    ).toDF("k", "t", "tag")
    val build = Seq(
      (1L, ts("2024-01-01 09:30:00"), 100L),
      (1L, ts("2024-01-01 10:00:00"), 101L), // equal time: >= includes it
      (1L, ts("2024-01-01 12:00:00"), 102L),
      (2L, ts("2024-01-01 09:30:00"), 200L)
    ).toDF("k", "t", "v")
    val got = TemporalOps.asofJoinForward(probe, build, Seq("k"), "t", "t", "v", Seq("v"))
      .select("tag", "asof_v").as[(String, Option[Long])].collect().toMap
    assert(got("p1").contains(101L)) // equal-time row wins over the later one
    assert(got("p2").isEmpty)        // nothing at-or-after
    assert(got("p3").contains(200L))
    assert(got("p4").isEmpty)
  }

  test("asofJoinNearest picks the closer side, ties resolve backward") {
    val probe = Seq(
      (1L, ts("2024-01-01 10:00:00"), "closer_back"),   // back 10min, fwd 20min
      (1L, ts("2024-01-01 11:50:00"), "closer_fwd"),    // back 100min, fwd 10min
      (2L, ts("2024-01-01 10:00:00"), "exact_tie"),     // 30min both sides
      (3L, ts("2024-01-01 10:00:00"), "only_fwd"),
      (4L, ts("2024-01-01 10:00:00"), "none")
    ).toDF("k", "t", "tag")
    val build = Seq(
      (1L, ts("2024-01-01 09:50:00"), 100L),
      (1L, ts("2024-01-01 10:20:00"), 101L),
      (1L, ts("2024-01-01 12:00:00"), 102L),
      (2L, ts("2024-01-01 09:30:00"), 200L),
      (2L, ts("2024-01-01 10:30:00"), 201L),
      (3L, ts("2024-01-01 10:30:00"), 300L)
    ).toDF("k", "t", "v")
    val got = TemporalOps.asofJoinNearest(probe, build, Seq("k"), "t", "t", "v", Seq("v"))
      .select("tag", "asof_v").as[(String, Option[Long])].collect().toMap
    assert(got("closer_back").contains(100L))
    assert(got("closer_fwd").contains(102L))
    assert(got("exact_tie").contains(200L)) // tie → backward
    assert(got("only_fwd").contains(300L))
    assert(got("none").isEmpty)
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

  test("cube emits all four grouping levels consistently") {
    val rows = RelOps.cubeSales(spark, sf).collect()
    val total = Tables.lineitem(spark, sf).count()
    val grand = rows.filter(r => r.isNullAt(0) && r.isNullAt(1))
    assert(grand.length == 1 && grand.head.getAs[Long]("n_items") == total)
    // every marginal (flag-only, status-only) and the leaves each cover the table
    for ((nullFirst, nullSecond) <- Seq((false, true), (true, false), (false, false))) {
      val level = rows.filter(r =>
        r.isNullAt(0) == nullFirst && r.isNullAt(1) == nullSecond)
      assert(level.map(_.getAs[Long]("n_items")).sum == total)
    }
  }

  test("anti and semi joins partition the customer table") {
    val anti = RelOps.antiJoinQuiet(spark, sf).select("c_custkey").as[Long].collect().toSet
    val semi = RelOps.semiJoinBig(spark, sf).select("c_custkey").as[Long].collect().toSet
    val all = Tables.customer(spark, sf).select("c_custkey").as[Long].collect().toSet
    assert((anti & semi).isEmpty)
    assert((anti | semi) == all)
  }

  test("json_props parses with schema; malformed rows null out instead of failing") {
    val got = RelOps.jsonProps(spark, sf)
    val brute = Tables.events(spark, sf)
      .select(col("event_type"), regexp_extract(col("props"), "\"k\": (\\d+)", 1).as("ks"))
      .filter(col("ks") =!= "")
      .groupBy("event_type").agg(sum(col("ks").cast("long")).as("sum_k"))
      .as[(String, Long)].collect().toMap
    val gotMap = got.select("event_type", "sum_k").as[(String, Long)].collect().toMap
    assert(gotMap == brute && gotMap.nonEmpty)
    // malformed JSON yields null, not an exception
    val bad = Seq(("a", "{not json"), ("b", "{\"k\": 3}")).toDF("event_type", "props")
      .withColumn("k", from_json(col("props"),
        new org.apache.spark.sql.types.StructType()
          .add("k", org.apache.spark.sql.types.LongType)).getField("k"))
    assert(bad.filter(col("k").isNull).count() == 1)
  }

  test("tfidf top terms: bounded per doc, score law, df consistency, ordered") {
    val out = graft.llm.TextOps.tfidfTopTerms(spark, sf).collect()
    assert(out.nonEmpty)
    val byDoc = out.groupBy(_.getAs[Long]("doc_id"))
    assert(byDoc.values.forall(_.length <= 5))
    // score is round(tf/df, 6) exactly (HALF_UP like Spark's round)
    assert(out.forall { r =>
      val expected = BigDecimal(r.getAs[Long]("tf").toDouble / r.getAs[Long]("df"))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      r.getAs[Double]("score") == expected
    })
    // a term's df is a corpus-level constant
    val dfs = out.groupBy(_.getAs[String]("term")).view
      .mapValues(_.map(_.getAs[Long]("df")).toSet)
    assert(dfs.values.forall(_.size == 1))
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

  test("pack_bins: bins respect the budget law and cover every doc once") {
    val out = graft.llm.TextOps.packBins(spark, sf, binTokens = 512).collect()
    assert(out.length == Tables.documents(spark, sf).count())
    // within each source, bin_id is non-decreasing in doc order and equals
    // prefix-tokens div budget
    out.groupBy(_.getAs[String]("source")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("doc_id"))
      var cum = 0L
      sorted.foreach { r =>
        assert(r.getAs[Long]("bin_id") == cum / 512)
        cum += r.getAs[Long]("n_tokens")
      }
    }
  }

  test("stratified sample downsamples the dominant stratum, stays deterministic") {
    val s = Sampling.sampleStratified(spark, sf)
    val rates = s.groupBy("lang").count()
      .join(Tables.documents(spark, sf).groupBy("lang").agg(count(lit(1)).as("tot")), "lang")
      .select(col("lang"), (col("count").cast("double") / col("tot")).as("rate"))
      .as[(String, Double)].collect().toMap
    assert(rates.nonEmpty)
    // en targets 1/16, others 4/16; generous tolerance for small strata
    assert(rates.get("en").forall(_ < 0.18))
    assert(rates.filter(_._1 != "en").values.forall(r => r > 0.05 && r < 0.55))
    // subset of the unstratified bucket space: every sampled en doc is in nibble 0
    val again = Sampling.sampleStratified(spark, sf).collect().toSet
    assert(s.collect().toSet == again)
  }
}
