package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Parquet table loaders over the driver-generated testdata star schema
  * (TESTDATA.md) plus the derived "transactions" view that re-expresses the
  * reference's fraud-pipeline data model (transactions with customer /
  * merchant / category / amount / gender — /root/reference/mechanism_y/
  * "Mechanism Y.py":35-41) on top of the TPC-H-ish tables.
  *
  * All loaders are plain parquet scans: explicit column pruning + filter
  * pushdown stay available to Catalyst (the plans show PushedFilters /
  * ReadSchema), and at cluster scale these become distributed columnar
  * scans with partition pruning for free.
  */
object Tables {

  def lineitem(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/lineitem.parquet")
  def orders(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/orders.parquet")
  def customer(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/customer.parquet")
  def supplier(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/supplier.parquet")
  def part(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/part.parquet")
  def nation(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/nation.parquet")
  def region(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/region.parquet")
  /** events.parquet stores `ts` as TIMESTAMP(NANOS) which Spark's parquet
    * reader rejects; read nanos as long and convert (µs truncation —
    * sub-second precision beyond µs is irrelevant to every consumer
    * here, which bucket by minutes/hours). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(s"$dir/events.parquet")
      .withColumn("ts", timestamp_micros((col("ts") / lit(1000L)).cast("long")))
  }
  def documents(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/documents.parquet")
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  /** Fan a small-file scan out to every core — but ONLY when the scan
    * actually under-parallelizes. The testdata doc/embedding tables
    * arrive as one parquet file → one scan partition, so per-row compute
    * (shingling, hashing, pair joins) would run single-threaded; there
    * the shuffled bytes are tiny relative to the compute they unlock.
    * A 100 TB corpus arrives as thousands of splits already ≥ the
    * session's parallelism — repartitioning it would be a full-corpus
    * shuffle for nothing, so this is a no-op exactly then. */
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }

  /** The reference's transaction stream schema re-expressed on testdata:
    * customer = o_custkey, merchant = l_suppkey, category = l_returnflag,
    * amount = l_extendedprice, gender derived deterministically from the
    * customer key (the reference carries gender on each transaction row,
    * "Mechanism Y.py":35-41; testdata has no gender column).
    *
    * lineitem ⋈ orders is an equi-join on the orderkey; at cluster scale
    * both sides shuffle on l_orderkey/o_orderkey once (sort-merge join) —
    * or zero times if the tables are bucketed by orderkey. No driver-side
    * materialization.
    */
  def transactions(spark: SparkSession, dir: String): DataFrame = {
    val li = lineitem(spark, dir)
    val o  = orders(spark, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .select(
        o("o_custkey").as("customer"),
        li("l_suppkey").as("merchant"),
        li("l_returnflag").as("category"),
        li("l_extendedprice").as("amount"),
        when(o("o_custkey") % 2 === 0, lit("M")).otherwise(lit("F")).as("gender"))
    // deliberately NOT cached: caching an AQE-coalesced join output pins
    // its (often single-partition) layout and serializes every consumer;
    // recomputing the co-partitioned join is cheaper at every scale
  }

  /** SQL text of [[transactions]] as a DuckDB CTE body, reused by oracle
    * queries so Spark and the oracle derive from the identical view. */
  val transactionsSql: String =
    """SELECT o_custkey AS customer, l_suppkey AS merchant,
      |       l_returnflag AS category, l_extendedprice AS amount,
      |       CASE WHEN o_custkey % 2 = 0 THEN 'M' ELSE 'F' END AS gender
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey""".stripMargin

  /** The CustomerImportance analog (reference loads a static CSV of
    * (Source customer, Target merchant, typeTrans, Weight) —
    * "Mechanism Y.py":42-46, 68-70). Here the dim is derived from the data:
    * weight = average discount a (customer, merchant, category) triple sees.
    * Sum is computed over DECIMAL so Spark and the oracle agree bit-for-bit
    * (double summation order is engine-specific; decimal addition is exact).
    */
  def importance(spark: SparkSession, dir: String): DataFrame = {
    val li = lineitem(spark, dir)
    val o  = orders(spark, dir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(
        o("o_custkey").as("customer"),
        li("l_suppkey").as("merchant"),
        li("l_returnflag").as("category"))
      .agg(
        round(sum(li("l_discount").cast(DecimalType(18, 6))).cast("double") /
          count(lit(1)), 6).as("weight"))
  }

  /** S2 — static CSV read with an explicit schema and header, the
    * reference's CustomerImportance load shape ("Mechanism Y.py":68):
    * no schema inference job, types declared up front. */
  def importanceFromCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .format("csv")
      .option("header", "true")
      .schema(StructType(Seq(
        StructField("customer", LongType),
        StructField("merchant", LongType),
        StructField("category", StringType),
        StructField("weight", DoubleType))))
      .load(path)

  val importanceSql: String =
    """SELECT o_custkey AS customer, l_suppkey AS merchant,
      |       l_returnflag AS category,
      |       round(CAST(sum(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE)
      |             / count(*), 6) AS weight
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY 1, 2, 3""".stripMargin
}
