package graft

import graft.ops.Patterns
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PatternsSpec extends AnyFunSuite {
  import SparkTestSession.{sf, spark}

  test("patId2 equals a manual recomputation") {
    val got = Patterns.patId2Query(spark, sf)
      .select(col("CustomerName"), col("MerchantId"))
    val want = Tables.transactions(spark, sf)
      .groupBy(col("customer"), col("merchant"))
      .agg(count(lit(1)).as("c"), sum(col("amount")).as("s"))
      .filter(col("c") >= Patterns.DefaultConfig.childTxMin &&
        col("s") / col("c") < Patterns.DefaultConfig.childAvgMax)
      .select(col("customer").cast("string").as("CustomerName"),
        col("merchant").cast("string").as("MerchantId"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }

  test("patId3 only fires where female < male and female > floor") {
    val ids = Patterns.patId3Query(spark, sf)
      .select(col("MerchantId").cast("long").as("merchant_id"))
    val state = Patterns.genderSummary(spark, sf)
    val bad = ids.join(state, Seq("merchant_id"))
      .filter(!(col("female_transaction_count") < col("male_transaction_count") &&
        col("female_transaction_count") > Patterns.DefaultConfig.deiFemaleMin))
    assert(bad.count() == 0)
  }

  test("detection contract: 6 string columns, fixed clock, no nulls") {
    val df = Patterns.unionDetectionsQuery(spark, sf)
    assert(df.columns.toSeq == Seq("YStartTime", "DetectionTime", "PatternId",
      "ActionType", "CustomerName", "MerchantId"))
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
    val rows = df.collect()
    assert(rows.forall(r => (0 until 6).forall(r.getString(_) != null)))
    assert(rows.forall(_.getString(0) == Patterns.FixedClock.ystart))
  }

  test("union fold keeps per-pattern counts") {
    val u = Patterns.unionDetectionsQuery(spark, sf)
      .groupBy(col("PatternId")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(u.getOrElse("PatId2", 0L) == Patterns.patId2Query(spark, sf).count())
    assert(u.getOrElse("PatId3", 0L) == Patterns.patId3Query(spark, sf).count())
  }
}
