package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** TRIPWIRE for the round-half divergence class the `chars_per_token`
  * bug exposed (r14): Spark's `round(x, 6)` rounds the double's
  * shortest decimal repr HALF_UP, DuckDB rounds half-away on the scaled
  * binary value — they can disagree ONLY when the exact value sits
  * precisely on a `…5·10⁻⁷` boundary, which for a ratio of exact
  * integers n/d happens iff
  *
  *     (2 · n · 10⁶) mod (2 · d) == d
  *
  * (equivalently: the reduced denominator divides 10⁷ but not 10⁶ and
  * the boundary digit is the last — e.g. an odd/128 jaccard
  * = …0078125 WOULD tie). This spec sweeps every oracled `round(·, 6)`
  * site whose operand is an exact rational of the corpus's integers and
  * asserts the CURRENT testdata hits no representable tie, so a future
  * regeneration that introduces one fails the gate with the exact
  * (site, n, d) instead of a silent hash mismatch.
  *
  * Sites excluded with a proof instead of a sweep:
  *   - transcendental operands (bm25/pmi/entropy/lm/tfidf logs, the
  *     classifier sigmoid, cosine's sqrt-normalized dots): an
  *     irrational value cannot sit exactly on a decimal boundary, and a
  *     1-ulp cross-engine disagreement flips the rounded digit only
  *     within ~1e-16 of one — the measure-zero argument BASELINE
  *     already records for the sigmoid;
  *   - `round(x, 2)` over exact DECIMAL(·,2)-cast sums (q1/cube/rollup/
  *     salted_agg money columns): the double of a 2-decimal exact value
  *     shortest-prints with ≤ 2 decimals, so the scale-2 round is the
  *     identity and cannot tie;
  *   - rrf reciprocal-rank sums: closed-form enumeration below;
  *   - chars_per_token: already floor-scaled (the r14 fix).
  */
class RoundTieSpec extends AnyFunSuite {

  private val spark = SparkTestSession.spark
  private val sfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")

  /** Exact-rational DIVERGENT half-boundary test at scale 6. Building
    * this sweep falsified the folk "HALF_UP vs half-even" diagnosis and
    * pinned the REAL mechanism empirically: the corpus already carries
    * DYADIC boundary values (quality_score 3450/6400 = .5390625,
    * 3550/6400 = .5546875; source_overlap 60/2560) and their oracles
    * hash-match — because a dyadic rational is an exact double, its
    * ·10⁶ scaled multiply is exact too, and BOTH engines then round an
    * exact .5 UP (Spark HALF_UP on the decimal string, DuckDB
    * std::round half-away on the exact scaled value). Divergence needs
    * the scaled multiply to be INEXACT — a NON-dyadic boundary rational
    * (reduced denominator carrying a factor 5, i.e. 5⁷ | 10⁷·n/d):
    * Spark still sees the 7-digit shortest-repr string and rounds up,
    * while x·10⁶ in binary lands on whichever side its 54th bit fell —
    * the chars_per_token r14 bug. So the flag is: exact boundary AND
    * reduced denominator not a pure power of two. Sign-safe via abs:
    * all swept ratios are ≥ 0. */
  private def ties(n: BigInt, d: BigInt): Boolean =
    d.signum > 0 && {
      val g = n.abs.gcd(d)
      val dr = d / g
      (2 * n.abs * BigInt(1000000)).mod(2 * d) == d &&
        dr.bitCount != 1 // dyadic boundaries provably agree (see above)
    }

  private def assertNoTies(site: String, nd: Seq[(Long, Long)]): Unit = {
    val bad = nd.filter { case (n, d) => ties(BigInt(n), BigInt(d)) }
    assert(bad.isEmpty,
      s"$site: representable round-half tie at (n, d) = ${bad.take(5)} — " +
        "Spark HALF_UP and DuckDB half-away will disagree; floor-scale " +
        "the site (the chars_per_token fix pattern) before trusting " +
        "its oracle on this corpus")
  }

  test("rrf: no reciprocal-rank sum can tie at any rank pair (closed form)") {
    val k = 60
    // leg ranks are bounded by nLeg = 50 (each leg TakeOrdereds to nLeg
    // BEFORE ranking — Retrieval.hybridTopK), so 1..50 is the exact
    // domain. Do NOT raise nLeg past 67 without re-running this sweep
    // at the new bound: rank 68 contributes a 1/128 leg, and its sums
    // with any 5-carrying leg (e.g. rank 20's 1/80) are NON-dyadic
    // boundary rationals — 1/80 + 1/128 = 13/640 = .0203125 — the
    // genuinely divergent class (the sweep at 1..200 flags exactly
    // those pairs).
    val ranks = 1 to 50
    // single-leg: 1/(k+r); both-legs: 1/(k+ra) + 1/(k+rb) = (da+db)/(da·db)
    val singles = ranks.map(r => (BigInt(1), BigInt(k + r)))
    val pairs = for (ra <- ranks; rb <- ranks)
      yield (BigInt(k + ra) + BigInt(k + rb), BigInt(k + ra) * BigInt(k + rb))
    val bad = (singles ++ pairs).filter { case (n, d) => ties(n, d) }
    assert(bad.isEmpty, s"rrf rationals tie at: ${bad.take(5)}")
  }

  test("text ratios: word-length / punct / stop / quality-score / keep-rate rationals are tie-free") {
    for (sf <- sfs) {
      val toks = graft.llm.TextOps.tokens(col("text"))
      val rows = Tables.documents(spark, sf)
        .select(
          regexp_count(col("text"), lit("[.,!?;:]")).cast("long").as("punct"),
          col("n_chars"),
          size(toks).cast("long").as("wc"),
          aggregate(toks, lit(0L), (a, t) => a + length(t)).as("len_sum"),
          size(filter(toks, t => t.isInCollection(
            Seq("the", "a", "of", "and", "to", "in", "is", "it"))))
            .cast("long").as("stop"))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4)))
      assertNoTies(s"text_stats punct_ratio @$sf",
        rows.filter(_._2 > 0).map(r => (r._1, r._2)))
      assertNoTies(s"text_stats avg_word_len @$sf",
        rows.filter(_._3 > 0).map(r => (r._4, r._3)))
      assertNoTies(s"text_stats stop_ratio @$sf",
        rows.filter(_._3 > 0).map(r => (r._5, r._3)))
      // quality_score = min(wc,50)/100 + stop/(2·wc), exactly
      // (min(wc,50)·wc + 50·stop) / (100·wc)
      assertNoTies(s"text_stats quality_score @$sf",
        rows.filter(_._3 > 0).map(r =>
          (math.min(r._3, 50L) * r._3 + 50L * r._5, 100L * r._3)))
      // keep-rate rollup: n_keep / n_docs per source
      val kr = graft.llm.Quality.qualityBySource(spark, sf)
        .select(col("n_keep"), col("n_docs")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assertNoTies(s"quality_by_source keep_rate @$sf", kr.toSeq)
    }
  }

  test("containment and decontam-fingerprint rationals are tie-free") {
    for (sf <- sfs) {
      // containment_pairs divides by least(na, nb); the probe forms by
      // the probe side's n_new
      val sites = Seq(
        ("containment_pairs", col("common"), least(col("na"), col("nb"))),
        ("containment_probe", col("common"), col("n_new")),
        ("containment_probe_idx", col("common"), col("n_new")))
      for ((name, nc, dc) <- sites) {
        val nd = SparkEntry.queries(name)(spark, sf)
          .select(nc.cast("long"), dc.cast("long"))
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        assertNoTies(s"$name @$sf", nd.toSeq)
      }
      // decontam_fp's denominator is internal — recompute each bench
      // doc's winnowed-fingerprint size (the same expression the
      // operator uses) and join by bench_id
      val fpSize = Tables.documents(spark, sf)
        .filter(col("doc_id") % 20 === 7)
        .select(col("doc_id").as("bench_id"),
          size(graft.functions.WinnowedFingerprint
            .winnowed_fingerprint(col("text"))).cast("long").as("bfs"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      val nd = SparkEntry.queries("decontam_fp")(spark, sf)
        .select(col("bench_id"), col("n_shared").cast("long"))
        .collect().map(r => (r.getLong(1), fpSize(r.getLong(0))))
      assertNoTies(s"decontam_fp @$sf", nd.toSeq)
    }
  }

  test("jaccard rationals of every emitted near-dup pair are tie-free") {
    for (sf <- sfs) {
      val sets = graft.llm.Dedup.shingleArrays(spark, sf)
        .collect().map(r => (r.getLong(0), r.getSeq[String](1).toSet)).toMap
      def check(name: String): Unit = {
        val out = SparkEntry.queries(name)(spark, sf)
        val Seq(a, b) = out.columns.take(2).toSeq
        val pairs = out.select(col(a).cast("long"), col(b).cast("long"))
          .collect().map(r => (r.getLong(0), r.getLong(1)))
        assertNoTies(s"$name @$sf", pairs.toSeq.map { case (x, y) =>
          val (sx, sy) = (sets(x), sets(y))
          ((sx & sy).size.toLong, (sx | sy).size.toLong)
        })
      }
      Seq("dedup_ngram", "dedup_minhash", "dedup_incremental").foreach(check)
      // source_overlap: jaccard + containment over per-source shingle sets
      // two-step select: shinglesFromTokens needs a MATERIALIZED toks
      // column (its transform re-evaluates an inlined argument per
      // element — see the Dedup docstring)
      val bySrc = Tables.documents(spark, sf)
        .select(col("source"), graft.llm.TextOps.tokens(col("text")).as("toks"))
        .select(col("source"),
          explode(graft.llm.Dedup.shinglesFromTokens(col("toks"))).as("sh"))
        .distinct().collect()
        .groupBy(_.getString(0)).map { case (s, rs) =>
          s -> rs.map(_.getString(1)).toSet
        }
      val srcs = bySrc.keys.toSeq.sorted
      val srcNd = for {
        i <- srcs.indices; j <- (i + 1) until srcs.size
        (sa, sb) = (bySrc(srcs(i)), bySrc(srcs(j)))
      } yield Seq(
        ((sa & sb).size.toLong, (sa | sb).size.toLong),
        ((sa & sb).size.toLong, math.min(sa.size, sb.size).toLong))
      assertNoTies(s"source_overlap @$sf", srcNd.flatten)
    }
  }

  test("json_props avg_k rationals are tie-free") {
    for (sf <- sfs) {
      val nd = SparkEntry.queries("json_props")(spark, sf)
        .filter(col("n_with_k") > 0)
        .select(col("sum_k"), col("n_with_k")).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assertNoTies(s"json_props avg_k @$sf", nd.toSeq)
    }
  }
}
