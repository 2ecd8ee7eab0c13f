package graft

import graft.ops.RelOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RelOpsSpec extends AnyFunSuite {
  import SparkTestSession.{sf, spark}

  test("q1 pricing summary aggregates and is non-empty") {
    val rows = RelOps.q1Pricing(spark, sf).collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("count_order")).sum
    val filtered = Tables.lineitem(spark, sf)
      .filter(col("l_shipdate") < lit("1998-09-01").cast("timestamp")).count()
    assert(total == filtered)
  }

  test("gender pivot equals conditional aggregation") {
    val pivoted = RelOps.aggGenderPivot(spark, sf)
    val cond = Tables.transactions(spark, sf)
      .groupBy(col("merchant").as("merchant_id"))
      .agg(
        sum(when(col("gender") === "M", 1L).otherwise(0L)).as("male_transaction_count"),
        sum(when(col("gender") === "F", 1L).otherwise(0L)).as("female_transaction_count"))
    assert(pivoted.exceptAll(cond).isEmpty && cond.exceptAll(pivoted).isEmpty)
  }

  test("exact percentile tracks percentile_approx within rank tolerance") {
    val exact = RelOps.weightPercentiles(spark, sf)
    val approx = Tables.importance(spark, sf)
      .groupBy(col("merchant").as("merchant_key"), col("category").as("category_key"))
      .agg(expr("percentile_approx(weight, 0.01, 10000)").as("pa"))
    val joined = exact.join(approx, Seq("merchant_key", "category_key"))
      .withColumn("diff", abs(col("p1_weight") - col("pa")))
    // tiny groups → approx == an actual element near the exact value
    assert(joined.filter(col("diff") > 0.01).count() == 0)
  }

  test("window top-n emits at most 3 rows per merchant, ranked") {
    val rows = RelOps.windowTopN(spark, sf)
      .groupBy(col("merchant_id")).agg(count(lit(1)).as("n"), max(col("rn")).as("maxrn"))
      .collect()
    assert(rows.forall(r => r.getAs[Long]("n") <= 3 && r.getAs[Int]("maxrn") <= 3))
  }

  test("every low-weight pair is below threshold in at least one category") {
    val lw = RelOps.lowWeightPairs(spark, sf)
    val withW = lw.join(Tables.importance(spark, sf), Seq("customer", "merchant"))
      .join(RelOps.weightPercentiles(spark, sf),
        col("merchant") === col("merchant_key") && col("category") === col("category_key"))
      .groupBy(col("customer"), col("merchant"))
      .agg(sum(when(col("weight") < col("p1_weight"), 1L).otherwise(0L)).as("n_below"))
    assert(withW.filter(col("n_below") === 0).count() == 0)
    assert(withW.count() == lw.count())
  }
}
