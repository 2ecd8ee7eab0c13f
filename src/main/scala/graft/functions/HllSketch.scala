package graft.functions

import org.apache.spark.sql.{DataFrame, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** HyperLogLog distinct-count sketch (Flajolet, Fusy, Gandouet &
  * Meunier, AofA 2007) as a typed mergeable `Aggregator`: a 64-bit
  * hash's top `p` bits pick one of m = 2^p registers, the register
  * keeps the max leading-zero rank of the remainder, and the harmonic
  * mean of 2^-register estimates the cardinality (with the standard
  * linear-counting fallback below 2.5m — the small-range correction
  * from the original paper; a 64-bit hash needs no large-range one).
  *
  * Spark's `approx_count_distinct` answers a NUMBER; this answers with
  * the STATE. Merge is element-wise register max — associative,
  * commutative, idempotent — which is what a 100 TB pipeline actually
  * needs: per-partition sketches combine map-side so the shuffle
  * carries m bytes per group instead of every value; per-day sketches
  * persist and fold into rolling uniques without re-reading history;
  * shard sketches union across a fleet. The hash is an engine-owned
  * splitmix64 finalizer, so registers are deterministic and two runs'
  * sketches are bit-identical (FunctionsSpec pins the merge law as
  * register equality, not estimate closeness).
  *
  * Approximate by construction (se ≈ 1.04/√m ≈ 1.6% at p=12), but
  * DETERMINISTIC — so the registered query still hash-checks against
  * [[HllSketch.hllDistinctSql]], a SQL replay of the splitmix64 hash
  * and the small-range estimator; FunctionsSpec additionally bounds the
  * error against exact distinct counts.
  */
case class HllSketch(p: Int) extends Aggregator[Long, Array[Byte], Long] {
  require(p >= 4 && p <= 18, s"p=$p out of [4,18]")
  private val m = 1 << p

  override def zero: Array[Byte] = new Array[Byte](m)

  override def reduce(regs: Array[Byte], v: Long): Array[Byte] = {
    val h = HllSketch.mix64(v)
    val idx = (h >>> (64 - p)).toInt
    // rank = leading zeros of the remaining 64-p bits, + 1; the
    // remainder shifted left keeps clz well-defined (all-zero remainder
    // caps at 64-p+1, the paper's convention)
    val w = h << p
    val rank = (if (w == 0L) 64 - p else java.lang.Long.numberOfLeadingZeros(w)) + 1
    val r = math.min(rank, 64 - p + 1)
    if (regs(idx) < r) regs(idx) = r.toByte
    regs
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) { if (a(i) < b(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(regs: Array[Byte]): Long = HllSketch.estimate(regs, p)

  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Long] = Encoders.scalaLong
}

object HllSketch {

  /** splitmix64 finalizer (Steele/Lea/Flood 2014; public domain
    * constants) — full-avalanche 64-bit mix, deterministic across runs
    * and engines. */
  def mix64(v0: Long): Long = {
    var v = v0 + 0x9e3779b97f4a7c15L
    v = (v ^ (v >>> 30)) * 0xbf58476d1ce4e5b9L
    v = (v ^ (v >>> 27)) * 0x94d049bb133111ebL
    v ^ (v >>> 31)
  }

  /** Raw HLL estimate + small-range linear counting. */
  def estimate(regs: Array[Byte], p: Int): Long = {
    val m = 1 << p
    val alpha =
      if (m >= 128) 0.7213 / (1.0 + 1.079 / m)
      else if (m == 64) 0.709
      else if (m == 32) 0.697
      else 0.673
    var invSum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      invSum += java.lang.Math.pow(2.0, -regs(i).toDouble)
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val e = alpha * m.toDouble * m.toDouble / invSum
    val corrected =
      if (e <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros)
      else e
    math.round(corrected)
  }

  /** Registered query: sketched distinct users per event type beside
    * the group's row count. The exact sibling is `count_distinct_users`
    * — same grouping, so the FunctionsSpec error bound reads directly
    * against it. */
  def hllDistinct(spark: SparkSession, dir: String, p: Int = 12): DataFrame = {
    import spark.implicits._
    val agg = hllOver[(String, Long)](_._2, p)
    graft.Tables.events(spark, dir)
      .select(col("event_type"), col("user_id"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .agg(agg.toColumn.name("est_users"))
      .toDF("event_type", "est_users")
  }

  /** DuckDB oracle for [[hllDistinct]] — the sketch itself is
    * deterministic (splitmix64 over the Long user_id), and splitmix64
    * replays in SQL: UBIGINT carries the 64-bit lanes for xor/logical
    * shifts, and each 64×64 multiply goes through the 32-bit-split
    * `(a0·b + ((a1·b mod 2^32)<<32)) mod 2^64` form because a direct
    * HUGEINT product of two ~2^64 operands overflows INT128.
    *
    * The estimator branch: at the registered p=12, the raw-HLL branch
    * needs est > 2.5·m ≈ 10k distinct users per event type; the test
    * corpus carries 150–1500, so the SMALL-RANGE linear-counting branch
    * `round(m·ln(m/zeros))` always fires, and `zeros` needs only the
    * count of OCCUPIED registers (any present register has rank ≥ 1) —
    * `count(DISTINCT h >> 52)`. The oracle encodes that branch alone
    * and would diverge (loudly, as a hash mismatch — never silently) if
    * regenerated testdata ever crossed ~10k distinct users per group;
    * the raw branch's register-order double sum is the one piece SQL
    * could not replay. Java round-half-up == DuckDB round
    * half-away-from-zero on the positive estimates. */
  def hllDistinctSql(p: Int = 12): String = {
    val m = 1 << p
    val mod = "18446744073709551616::HUGEINT"
    def mulmod(a: String, b: String): String =
      s"(((((${a}) & 4294967295::UBIGINT)::HUGEINT * ${b}::HUGEINT)" +
        s" + (((((${a}) >> 32)::HUGEINT * ${b}::HUGEINT) % 4294967296::HUGEINT)" +
        s" * 4294967296::HUGEINT)) % ${mod})::UBIGINT"
    s"""WITH u AS (SELECT DISTINCT event_type, user_id FROM events),
       |s1 AS (SELECT event_type,
       |  ((user_id::HUGEINT % ${mod} + ${mod} + 11400714819323198485::HUGEINT)
       |    % ${mod})::UBIGINT AS a FROM u),
       |s2 AS (SELECT event_type,
       |  ${mulmod("xor(a, a >> 30)", "13787848793156543929")} AS b FROM s1),
       |s3 AS (SELECT event_type,
       |  ${mulmod("xor(b, b >> 27)", "10723151780598845931")} AS c FROM s2),
       |h AS (SELECT event_type, xor(c, c >> 31) AS h FROM s3),
       |regs AS (SELECT event_type,
       |  count(DISTINCT h >> ${64 - p}) AS used FROM h GROUP BY event_type)
       |SELECT event_type,
       |  CAST(round(${m} * ln(${m}.0 / (${m} - used))) AS BIGINT) AS est_users
       |FROM regs""".stripMargin
  }

  /** The keyed-record adapter: sketch over `f(record)` — the same
    * wrapping move [[KllSketch.quantileSketch]] uses. */
  def hllOver[T](f: T => Long, p: Int): Aggregator[T, Array[Byte], Long] = {
    val inner = HllSketch(p)
    new Aggregator[T, Array[Byte], Long] {
      def zero = inner.zero
      def reduce(b: Array[Byte], r: T) = inner.reduce(b, f(r))
      def merge(a: Array[Byte], b: Array[Byte]) = inner.merge(a, b)
      def finish(b: Array[Byte]) = inner.finish(b)
      def bufferEncoder = inner.bufferEncoder
      def outputEncoder = inner.outputEncoder
    }
  }
}
