package graft

import graft.functions.GraftFunctions
import graft.ops.RelOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FunctionsSpec extends AnyFunSuite {
  import SparkTestSession.{sf, spark}

  test("native expressions are callable from SQL after registration") {
    GraftFunctions.register(spark)
    Tables.documents(spark, sf).limit(5).createOrReplaceTempView("docs_tmp")
    val viaSql = spark.sql(
      """SELECT doc_id, size(winnowed_fingerprint(text, 8, 4)) AS n
        |FROM docs_tmp""".stripMargin).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val viaColumn = Tables.documents(spark, sf).limit(5)
      .select(col("doc_id"),
        size(graft.functions.WinnowedFingerprint.winnowed_fingerprint(col("text")))
          .as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(viaSql == viaColumn && viaSql.nonEmpty)

    val d = spark.sql(
      "SELECT float_dot(array(CAST(1.5 AS FLOAT), CAST(2.0 AS FLOAT)), " +
        "array(CAST(2.0 AS FLOAT), CAST(3.0 AS FLOAT))) AS d").collect()(0).getDouble(0)
    assert(d == 9.0)
  }

  test("GraftExtensions injects the asof planner strategy (config-driven path)") {
    // spark.sql.extensions is a static conf — unappliable to a reused
    // SparkContext in-JVM — so verify the injection product directly
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext)
    val injected = org.apache.spark.sql.GraftBridge.plannerStrategies(ext, spark)
    assert(injected.contains(graft.plans.AsofJoinPlan.AsofJoinStrategy))
  }

  test("approx_count_distinct tracks exact within 5%") {
    val joined = RelOps.countDistinctUsers(spark, sf)
      .join(Tables.events(spark, sf).groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id")).as("approx")), Seq("event_type"))
      .withColumn("relerr",
        abs(col("approx") - col("n_users")).cast("double") / col("n_users"))
    assert(joined.filter(col("relerr") > 0.05).count() == 0)
  }
}
