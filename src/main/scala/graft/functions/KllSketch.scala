package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Mergeable streaming quantile sketch (the KLL/MRL compactor family:
  * Karnin-Lang-Liberty 2016, Manku-Rajagopalan-Lindsay 1998): level i
  * stores items of weight 2^i in a buffer of at most `k`; a full buffer
  * sorts, keeps every other item, and promotes the survivors one level
  * up. Space is O(k·log(n/k)) per group, merge is level-wise
  * concatenation + the same compaction — a TRUE map-side-combinable
  * aggregate, so the shuffle carries one small sketch per group instead
  * of every row.
  *
  * This is the scale story `percentile_approx` shares but with the
  * mechanics owned and inspectable (and a deterministic compaction coin,
  * so a fixed partitioning reproduces bit-identical estimates — the
  * property Spark's own sketch does not document). Rank error is the
  * compactor bound O(log(n/k)/k); FunctionsSpec pins an empirical 2%
  * envelope at k=256.
  */
case class KllSketch(k: Int, quantiles: Seq[Double],
    requireExact: Boolean = false)
    extends Aggregator[Double, KllSketch.Buf, Seq[Double]] {
  import KllSketch.Buf

  override def zero: Buf = Buf(Seq(Vector.empty), 0L, 0L)

  override def reduce(b: Buf, v: Double): Buf =
    compact(Buf(b.levels.updated(0, b.levels.head :+ v), b.count + 1,
      b.compactions))

  override def merge(a: Buf, b: Buf): Buf = {
    val depth = math.max(a.levels.size, b.levels.size)
    val lv = (0 until depth).map { i =>
      a.levels.lift(i).getOrElse(Vector.empty) ++
        b.levels.lift(i).getOrElse(Vector.empty)
    }
    compact(Buf(lv, a.count + b.count, a.compactions + b.compactions))
  }

  private def compact(b: Buf): Buf = {
    var levels = b.levels.toVector
    var coins = b.compactions
    var i = 0
    while (i < levels.size) {
      if (levels(i).size > k) {
        val sorted = levels(i).sorted
        val offset = (coins % 2).toInt
        coins += 1
        val keep = sorted.zipWithIndex.collect {
          case (x, idx) if idx % 2 == offset => x
        }
        levels = levels.updated(i, Vector.empty[Double])
        if (i + 1 >= levels.size) levels = levels :+ Vector.empty[Double]
        levels = levels.updated(i + 1, levels(i + 1) ++ keep)
      }
      i += 1
    }
    Buf(levels, b.count, coins)
  }

  /** Weighted-rank readout: the smallest stored value whose cumulative
    * weight reaches q·(W−1), W = total stored weight. */
  override def finish(b: Buf): Seq[Double] = {
    // the exact-when-wide registration (k chosen ≥ per-group n so the
    // sketch degenerates to the exact order statistic, matching a plain
    // SQL oracle) is only valid while no buffer ever fills; if the data
    // outgrows k, fail with the real cause instead of letting the
    // oracle comparison surface an opaque hash mismatch
    if (requireExact && b.compactions > 0)
      throw new IllegalStateException(
        s"KllSketch(requireExact): a compaction fired (per-group rows " +
          s"${b.count} > k=$k) — the exact-when-wide oracle registration " +
          "no longer holds; raise k or switch this query to the " +
          "approximate contract-pinned registration")
    val items = b.levels.zipWithIndex
      .flatMap { case (l, i) => l.map(v => (v, 1L << i)) }
      .sortBy(_._1)
    if (items.isEmpty) return quantiles.map(_ => Double.NaN)
    val total = items.map(_._2).sum
    quantiles.map { q =>
      val target = q * (total - 1)
      var cum = 0L
      var ans = items.last._1
      val it = items.iterator
      var found = false
      while (it.hasNext && !found) {
        val (v, w) = it.next()
        cum += w
        if (cum - 1 >= target) { ans = v; found = true }
      }
      ans
    }
  }

  override def bufferEncoder: Encoder[Buf] = ExpressionEncoder[Buf]()
  override def outputEncoder: Encoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()
}

object KllSketch {

  /** levels(i) holds items of weight 2^i; compactions drives the
    * deterministic alternating compaction coin. */
  final case class Buf(levels: Seq[Vector[Double]], count: Long,
      compactions: Long)

  /** Registered query: sketched price quantiles per return flag,
    * exploded to (l_returnflag, q, est).
    *
    * The registration runs with k = 2²⁰ ≥ n (per-group rows stay ~2·10⁵
    * even at sf0.1): no buffer ever fills, so no compaction fires, every
    * item keeps weight 1, and the readout degenerates to the EXACT order
    * statistic at index ⌈q·(n−1)⌉ — which [[quantileSketchSql]] states in
    * ANSI SQL (the DuckDB oracle computes q·(n−1) in the same IEEE double
    * arithmetic, so the chosen index is bit-identical). The production
    * k=256 approximate path keeps its 2% rank-error envelope pinned in
    * FunctionsSpec. */
  def quantileSketch(spark: SparkSession, dir: String, k: Int = 256,
      requireExact: Boolean = false): DataFrame = {
    val qs = Seq(0.25, 0.5, 0.75, 0.95)
    // untyped udaf over the typed Aggregator: the earlier
    // groupByKey(_._1) form deserialized a (String, Double) tuple and
    // evaluated a Scala keying lambda PER ROW before the aggregate even
    // saw the value — grouping in Tungsten with a Double-only input
    // encoder drops that per-row cost with bit-identical output
    // (the exact-when-wide readout is order-insensitive, and the
    // approximate path's deterministic compaction coin depends only on
    // per-partition arrival order, which groupBy preserves identically)
    val sketch = udaf(KllSketch(k, qs, requireExact),
      org.apache.spark.sql.Encoders.scalaDouble)
    graft.Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(sketch(col("l_extendedprice")).as("est"))
      .select(col("l_returnflag"), posexplode(col("est")).as(Seq("pos", "est")))
      .select(col("l_returnflag"),
        element_at(typedLit(qs), col("pos") + 1).as("q"), col("est"))
  }

  /** Oracle for the exact-when-wide (k ≥ n) registration: the smallest
    * stored value whose 0-based rank reaches q·(n−1) is the order
    * statistic at index ⌈q·(n−1)⌉. Both `q` and the product are forced
    * to DOUBLE so DuckDB picks the same index as the Scala readout even
    * where q (e.g. 0.95) is not binary-exact. */
  val quantileSketchSql: String =
    """WITH ranked AS (
      |  SELECT l_returnflag, l_extendedprice,
      |    CAST(row_number() OVER (PARTITION BY l_returnflag
      |      ORDER BY l_extendedprice) - 1 AS BIGINT) AS rk,
      |    count(*) OVER (PARTITION BY l_returnflag) AS n
      |  FROM lineitem),
      |qs AS (SELECT CAST(q AS DOUBLE) AS q
      |       FROM (VALUES (0.25),(0.5),(0.75),(0.95)) t(q))
      |SELECT l_returnflag, q, l_extendedprice AS est
      |FROM ranked JOIN qs ON rk = CAST(ceil(q * (n - 1)) AS BIGINT)""".stripMargin
}
