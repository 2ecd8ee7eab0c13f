package graft.scale

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The shuffle-management techniques a 100 TB deployment leans on,
  * packaged as utilities so they're testable here and liftable into any
  * pipeline: bucketed tables for shuffle-free co-located joins, and key
  * salting for skewed aggregations. (AQE's skew-join handling covers the
  * join case at runtime; salting remains the tool for skewed
  * AGGREGATIONS, where AQE can't split a hot key.)
  */
object ScaleTechniques {

  /** Write both sides bucketed (+sorted) on the join key: subsequent
    * joins between the tables read co-located buckets and plan with NO
    * shuffle exchange on either side. BucketingSpec asserts the plan. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int = 8): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Hive-style partitioned layout: one directory per value of
    * `partitionCol`. A filter on the partition column then prunes whole
    * directories at PLANNING time (`PartitionFilters` in the scan, zero
    * IO for pruned partitions) — at 100 TB this is the difference
    * between scanning a day and scanning a decade. Pair with a
    * low-cardinality column (date, source, event_type); high-cardinality
    * keys belong in bucketing instead (small-files explosion otherwise). */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)

  /** Skew-safe two-phase aggregation: spread each group over `salts`
    * sub-groups (partial agg per (key, salt)), then combine. The hot key
    * that would pin one reducer is split across `salts` tasks; results
    * are identical because count/sum compose associatively. */
  def saltedCountSum(df: DataFrame, key: Column, value: Column,
      salts: Int = 16): DataFrame =
    df.select(key.as("k"), value.as("v"))
      .withColumn("salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
      .groupBy(col("k"), col("salt"))
      .agg(count(lit(1)).as("pc"), sum(col("v")).as("ps"))
      .groupBy(col("k"))
      .agg(sum(col("pc")).as("cnt"), sum(col("ps")).as("sum_v"))

  /** Runtime bloom-filter join pruning, via Catalyst's own
    * InjectRuntimeFilter rule rather than hand-rolled UDF filtering:
    * when one join side is selective (a filtered dim too big to
    * broadcast), Spark builds a bloom filter from its creation-side keys
    * and injects `might_contain` into the OTHER side's scan, dropping
    * non-joining rows BEFORE the shuffle. At 100 TB that turns a
    * fact-table-sized exchange into a match-sized one. This helper pins
    * the confs that arm the rule (off the thresholds by default for
    * tiny test inputs) — production keeps the defaults, which arm it
    * only when the application side exceeds 10 GB.
    * ScaleTechniquesSpec plan-asserts the injected BloomFilter
    * aggregate + might_contain probe and result parity with the plain
    * join. */
  def withRuntimeBloomFilter[A](spark: SparkSession)(body: => A): A = {
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "10GB")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      // force a shuffle join: broadcast joins don't need (or get) the filter
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      body
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
