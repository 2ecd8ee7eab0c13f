package graft

import graft.scale.ScaleTechniques
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScaleTechniquesSpec extends AnyFunSuite {
  import SparkTestSession.{sf, spark}

  test("bucketed tables join without a shuffle exchange") {
    ScaleTechniques.writeBucketed(
      Tables.lineitem(spark, sf).select("l_orderkey", "l_extendedprice"),
      "li_bucketed", "l_orderkey")
    ScaleTechniques.writeBucketed(
      Tables.orders(spark, sf).select("o_orderkey", "o_custkey"),
      "o_bucketed", "o_orderkey")
    val joined = spark.table("li_bucketed")
      .join(spark.table("o_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
    joined.count() // materialize so AQE finalizes the plan
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("ShuffleExchange") && !plan.contains("Exchange hashpartitioning"),
      s"bucketed join should not shuffle:\n$plan")
    // sanity: same result as the plain join
    val plain = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
    assert(joined.count() == plain.count())
  }

  test("salted aggregation equals plain aggregation") {
    val got = ScaleTechniques.saltedCountSum(
        Tables.lineitem(spark, sf), col("l_suppkey"), col("l_quantity"))
      .withColumn("sum_v", round(col("sum_v"), 4))
    val want = Tables.lineitem(spark, sf)
      .groupBy(col("l_suppkey").as("k"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("l_quantity")), 4).as("sum_v"))
    assert(got.exceptAll(want).isEmpty && want.exceptAll(got).isEmpty)
  }
}
