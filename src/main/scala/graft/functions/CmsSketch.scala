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
  * The registered `cms_topk` runs exact-when-wide (a `requireExact`
  * guard pins the no-collision regime) and is DuckDB-oracled as the
  * exact count; narrow approximate configs keep their FunctionsSpec
  * error envelopes.
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

  /** Exact-when-wide registration geometry. The guard needs
    * n·((n−1)/w)^d < 1e-9; for a FIXED cell budget d·w, deeper-and-
    * narrower wins (w scales as (n/1e-9)^(1/d)), and the treeAggregate
    * merge traffic is proportional to cells, not to the ε the width was
    * derived from. depth 14 × width 16384 (ε=2/16384, δ=2^-14) gives
    * p ≈ 6e-12 at n=1500 — same nines as the old 7×100k config at 3.1×
    * fewer cells (1.8 MB vs 5.6 MB per merge buffer). */
  val ExactEps: Double = 2.0 / 16384
  val ExactConfidence: Double = 1.0 - 1.0 / 16384 // depth = ceil(log2(16384)) = 14

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
    * The registration runs EXACT-WHEN-WIDE ([[ExactEps]]/
    * [[ExactConfidence]] — depth 14 × width 16384 vs ~1.5k distinct
    * users): a key's estimate exceeds its true count only if it
    * collides in EVERY depth row, so the sketch output equals a plain
    * GROUP BY — which is the DuckDB oracle ([[cmsTopKSql]]); the
    * `requireExact` guard below re-derives the bound at runtime.
    * FunctionsSpec separately pins the exact-when-wide law on a
    * fixture; the narrow production configuration (ε=0.005, 400 ints)
    * keeps its one-sided ≤ ε·N error contract in the same suite. */
  def cmsTopK(spark: SparkSession, dir: String, k: Int = 25,
      eps: Double = 0.005, confidence: Double = 0.99,
      seed: Int = 42, requireExact: Boolean = false): DataFrame = {
    // memoized like every other build-once/probe-many artifact: the
    // sketch build (a fanned-out treeAggregate) and the candidate
    // distinct are paid once per session, and Bench's cold mode still
    // re-pays both via Caches.release
    val sk = graft.Caches.memoObj(spark,
        s"cmsSketch:$dir:$eps:$confidence:$seed") {
      sketchBytes(Tables.fanOut(Tables.events(spark, dir)), "user_id",
        eps, confidence, seed)
    }
    val cand = graft.Caches.memo(spark, s"cmsCandidates:$dir") {
      Tables.events(spark, dir).select(col("user_id")).distinct()
    }
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
