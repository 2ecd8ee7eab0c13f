package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Typed user-facing custom aggregate (the `Aggregator[IN, BUF, OUT]`
  * surface — SURVEY.md §2.10): keep the k largest values of a group.
  *
  * The buffer is a descending-sorted list capped at k, so merge cost is
  * O(k) per partial and the shuffle carries at most k doubles per group
  * regardless of group size — the map-side-combining alternative to a
  * window row_number + filter (which must shuffle and sort every row).
  * At 100 TB grouping cardinality this is the cheaper top-k shape
  * whenever k ≪ group size.
  */
case class TopKAggregator(k: Int) extends Aggregator[Double, List[Double], Seq[Double]] {
  override def zero: List[Double] = Nil

  override def reduce(buf: List[Double], v: Double): List[Double] =
    insert(buf, v)

  override def merge(a: List[Double], b: List[Double]): List[Double] =
    b.foldLeft(a)(insert)

  private def insert(buf: List[Double], v: Double): List[Double] = {
    if (buf.lengthCompare(k) >= 0 && v <= buf.last) buf
    else {
      val (hi, lo) = buf.span(_ >= v)
      (hi ::: v :: lo).take(k)
    }
  }

  override def finish(buf: List[Double]): Seq[Double] = buf
  override def bufferEncoder: Encoder[List[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[List[Double]]()
  override def outputEncoder: Encoder[Seq[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Double]]()
}

object TopKAggregator {

  /** Top-k amounts per merchant through the TYPED Dataset API
    * (case-class rows, groupByKey + Aggregator column), exploded back to
    * (merchant_id, rank, amount) so the DuckDB oracle (a window
    * row_number) can verify it. */
  def topAmounts(spark: SparkSession, dir: String, k: Int = 3): DataFrame = {
    import spark.implicits._
    val ds = graft.Tables.lineitem(spark, dir)
      .select(col("l_suppkey").as("merchant_id"),
        col("l_extendedprice").as("amount"))
      .as[(Long, Double)]
    val agg = new Aggregator[(Long, Double), List[Double], Seq[Double]] {
      private val inner = TopKAggregator(k)
      def zero = inner.zero
      def reduce(b: List[Double], r: (Long, Double)) = inner.reduce(b, r._2)
      def merge(a: List[Double], b: List[Double]) = inner.merge(a, b)
      def finish(b: List[Double]) = inner.finish(b)
      def bufferEncoder = inner.bufferEncoder
      def outputEncoder = inner.outputEncoder
    }
    ds.groupByKey(_._1)
      .agg(agg.toColumn.name("top_amounts"))
      .toDF("merchant_id", "top_amounts")
      .select(col("merchant_id"),
        posexplode(col("top_amounts")).as(Seq("pos", "amount")))
      .select(col("merchant_id"), (col("pos") + 1).cast("int").as("rank"),
        col("amount"))
  }

  val topAmountsSql: String =
    """SELECT l_suppkey AS merchant_id, CAST(rn AS INT) AS rank, amount
      |FROM (SELECT l_suppkey, l_extendedprice AS amount,
      |        row_number() OVER (PARTITION BY l_suppkey
      |          ORDER BY l_extendedprice DESC) AS rn
      |      FROM lineitem)
      |WHERE rn <= 3""".stripMargin
}
