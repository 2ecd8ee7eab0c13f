package graft.functions

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Count-min-sketch heavy hitters — the third sketch beside HLL (how
  * many distinct) and KLL (where the quantiles are): HOW OFTEN does
  * each hot key occur, in sublinear space. The sketch is Spark's own
  * `util.sketch.CountMinSketch` (the engine ships it; rebuilding the
  * hash family would be reimplementation for its own sake), built with
  * one `df.stat.countMinSketch` pass — a treeAggregate of d×w count
  * tables, so the corpus never shuffles and the merge is the same
  * cell-wise addition the spec's merge law pins.
  *
  * Candidate keys come from a bounded frame (here the distinct user
  * ids; on a 100 TB stream where even the distinct set is too big, a
  * hash-sampled candidate slice — the sketch answers any key, the
  * candidate list only bounds the OUTPUT); the broadcast sketch scores
  * candidates per-partition, so estimation is distributed too.
  *
  * CMS guarantees (Cormode & Muthukrishnan 2005): estimate ≥ true
  * count always (one-sided), and estimate ≤ true + ε·N with
  * probability ≥ 1−δ. FunctionsSpec pins both, plus the merge law and
  * exactness when the table is wide enough that no keys collide.
  * Engine-specific hash family ⇒ no SQL oracle (`cms_topk` is
  * ContractSpec-pinned).
  */
object CmsSketch {

  /** Serialized CMS of a long column, built in one aggregate pass. */
  def sketchBytes(df: DataFrame, colName: String,
      eps: Double, confidence: Double, seed: Int): Array[Byte] = {
    val cms = df.stat.countMinSketch(colName, eps, confidence, seed)
    val out = new java.io.ByteArrayOutputStream()
    cms.writeTo(out)
    out.toByteArray
  }

  /** Estimate counts for every key in `candidates` under a broadcast
    * sketch: per-partition deserialization, no driver-side loop over
    * keys. */
  def estimate(candidates: DataFrame, keyCol: String,
      sketch: Array[Byte]): DataFrame = {
    val spark = candidates.sparkSession
    import spark.implicits._
    val bc = spark.sparkContext.broadcast(sketch)
    val keys = candidates.select(col(keyCol).cast("long")).as[Long]
    keys.mapPartitions { it =>
      val cms = CountMinSketch.readFrom(
        new java.io.ByteArrayInputStream(bc.value))
      it.map(k => (k, cms.estimateCount(k)))
    }.toDF(keyCol, "est_count")
  }

  /** Registered query: top-k event-generating users by CMS estimate.
    *
    * The registration runs EXACT-WHEN-WIDE (ε=1e-4 → width 20,000 vs
    * ~10² distinct users/10⁴ per-SF): a key's estimate exceeds its true
    * count only if it collides in EVERY depth row, P ≈ (d/w)^7 ≈ 3e-16
    * here, so the sketch output equals a plain GROUP BY — which is the
    * DuckDB oracle ([[cmsTopKSql]]). FunctionsSpec separately pins the
    * exact-when-wide law on a fixture; the narrow production
    * configuration (ε=0.005, 400 ints) keeps its one-sided ≤ ε·N error
    * contract in the same suite. */
  def cmsTopK(spark: SparkSession, dir: String, k: Int = 25,
      eps: Double = 0.005, confidence: Double = 0.99,
      seed: Int = 42, requireExact: Boolean = false): DataFrame = {
    val ev = Tables.fanOut(Tables.events(spark, dir))
    val sk = sketchBytes(ev, "user_id", eps, confidence, seed)
    val cand = ev.select(col("user_id")).distinct()
    if (requireExact) {
      // The exact-when-wide oracle registration assumes the distinct-key
      // set is far narrower than the sketch (so no key collides in all
      // depth rows and the estimate equals the plain GROUP BY). That is
      // a DATA-SCALE assumption — verify it at runtime so a regenerated
      // or larger dataset fails with the real cause, not an opaque
      // oracle hash mismatch. A key's estimate inflates only if EVERY
      // depth row collides; per row P ≤ (n−1)/w, so
      // P(any estimate inflated) ≤ n·((n−1)/w)^d; require it below 1e-9.
      val cms = CountMinSketch.readFrom(new java.io.ByteArrayInputStream(sk))
      val n = cand.count().toDouble
      val pAnyWrong = n * math.pow((n - 1) / cms.width().toDouble,
        cms.depth().toInt)
      if (!(pAnyWrong < 1e-9))
        throw new IllegalStateException(
          s"CmsSketch(requireExact): ${n.toLong} distinct keys vs " +
            s"width=${cms.width()} depth=${cms.depth()} gives collision " +
            f"probability $pAnyWrong%.2e ≥ 1e-9 — the exact-when-wide " +
            "oracle registration no longer holds; widen eps or switch " +
            "this query to the approximate contract-pinned registration")
    }
    estimate(cand, "user_id", sk)
      .orderBy(col("est_count").desc, col("user_id"))
      .limit(k)
  }

  /** Oracle for the exact-when-wide registration: the CMS top-k equals
    * the plain GROUP BY top-k when no key collides in all depth rows. */
  val cmsTopKSql: String =
    """SELECT user_id, est_count FROM (
      |  SELECT user_id, CAST(count(*) AS BIGINT) AS est_count
      |  FROM events GROUP BY 1)
      |ORDER BY est_count DESC, user_id LIMIT 25""".stripMargin
}
