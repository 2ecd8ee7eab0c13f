package graft.llm

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sampling for training-data pipelines. `df.sample()` is
  * seed-dependent on partitioning and row order, so a re-run (or another
  * engine) draws a different subset — useless for reproducible corpus
  * curation. Hash-based sampling keys the draw on the ROW ITSELF: a row
  * is in the sample iff md5(key) lands in the accepted bucket range, so
  * any engine, any partitioning, any run selects the identical subset.
  *
  * Scale: a pure scan+filter — no shuffle, no state, embarrassingly
  * parallel; the md5 is Spark's codegen'd built-in. Rates compose: a
  * 1/8 sample of a 1/8 sample (on independent key salts) is a 1/64
  * sample, and a rate can be widened later without invalidating rows
  * already drawn (bucket prefix ranges are nested).
  */
object Sampling {

  /** First hex nibble of md5(key) ∈ {0,1} — a deterministic 1/8 sample. */
  def hashSampleFilter(key: Column, nibbles: Seq[String] = Seq("0", "1")): Column =
    substring(md5(key.cast("string")), 1, 1).isin(nibbles: _*)

  /** Registered query: reproducible 1/8 sample of the documents table,
    * with the 2-hex-digit bucket carried so downstream strata are
    * inspectable. */
  def sampleHash(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .filter(hashSampleFilter(col("doc_id")))
      .select(col("doc_id"), col("lang"), col("source"),
        substring(md5(col("doc_id").cast("string")), 1, 2).as("bucket"))

  val sampleHashSql: String =
    """SELECT doc_id, lang, source,
      |  substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) AS bucket
      |FROM documents
      |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1')""".stripMargin

  /** Stratified deterministic sampling: per-stratum rates over the same
    * md5 bucket space — here the dominant language is downsampled to
    * 1/16 while the rest keep 4/16, the language-rebalancing move every
    * multilingual corpus build makes. Still a pure scan+filter; rates
    * change by widening/narrowing a stratum's accepted nibble set
    * without invalidating previously drawn rows. */
  def sampleStratified(spark: SparkSession, dir: String): DataFrame = {
    val nib = substring(md5(col("doc_id").cast("string")), 1, 1)
    Tables.documents(spark, dir)
      .filter(
        (col("lang") === "en" && nib === "0") ||
        (col("lang") =!= "en" && nib.isin("0", "1", "2", "3")))
      .select(col("doc_id"), col("lang"))
  }

  val sampleStratifiedSql: String =
    """SELECT doc_id, lang FROM documents
      |WHERE (lang = 'en' AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0')
      |   OR (lang <> 'en' AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1', '2', '3'))""".stripMargin

  /** Temperature-based mixture resampling (τ = 0.5): downsample every
    * language toward the smallest one with rate_s = √(min_cnt / cnt_s), so
    * expected kept docs per stratum is √(min_cnt · cnt_s) — the standard
    * mixture-flattening move (multilingual BERT's exponent-smoothing,
    * Gopher's domain reweighting) made DETERMINISTIC: the accept draw is
    * md5(doc_id), the rate becomes a 16-bit hex threshold, and the
    * accept test is a lexicographic compare of fixed-width lowercase hex
    * (hex strings order exactly as their numeric value).
    *
    * Every arithmetic step is engine-exact: min over integer counts,
    * one exact-int division, one IEEE sqrt (correctly rounded in both
    * engines), floor ×65536 — so Spark and the DuckDB oracle select the
    * identical subset.
    *
    * Scale: per-source counts are a tiny aggregate (|sources| rows), the
    * global min is a window over that tiny frame, and the join back to
    * the corpus broadcasts — the corpus itself sees one scan + filter,
    * no shuffle. */
  def resampleTemperature(spark: SparkSession, dir: String): DataFrame =
    resampleTemperatureBy(Tables.documents(spark, dir), "lang", "doc_id")
      .select(col("doc_id"), col("lang"), col("grp_cnt"), col("rate"))

  /** Generic form: flatten the mix over any stratum column, drawing on
    * md5 of any key column. */
  def resampleTemperatureBy(docs: DataFrame, stratum: String,
      key: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rates = docs
      .groupBy(col(stratum)).agg(count(lit(1)).as("grp_cnt"))
      // the window is over the |strata|-row aggregate, not the corpus —
      // a deliberate single-partition pass on a tiny frame
      .withColumn("min_cnt", min(col("grp_cnt")).over(Window.partitionBy()))
      .withColumn("rate",
        sqrt(col("min_cnt").cast("double") / col("grp_cnt")))
      .withColumn("thr",
        lpad(lower(hex(floor(col("rate") * 65536).cast("long"))), 4, "0"))
    docs.join(broadcast(rates), stratum)
      .filter(col("grp_cnt") === col("min_cnt") ||
        substring(md5(col(key).cast("string")), 1, 4) < col("thr"))
  }

  /** Deterministic train/val/test split (~90/5/5): the first two hex
    * digits of md5(doc_id, salt) are a uniform draw over 256 buckets;
    * lexicographic thresholds 'e6' (230) and 'f3' (243) cut them
    * 230/13/13. Salting the hash decorrelates the split from every
    * other md5(doc_id) draw in this file (sampling and resampling use
    * the unsalted key), so holding out test docs doesn't bias any
    * sample. Disjoint + exhaustive by construction; any engine
    * recomputes the identical assignment. Pure scan-side projection —
    * zero shuffle at any corpus size. */
  def splitCorpus(spark: SparkSession, dir: String): DataFrame = {
    val bucket = substring(md5(concat(col("doc_id").cast("string"),
      lit(":split"))), 1, 2)
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"),
        when(bucket < "e6", "train").when(bucket < "f3", "val")
          .otherwise("test").as("split"))
  }

  val splitCorpusSql: String =
    """SELECT doc_id, lang, source,
      |  CASE WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 2) < 'e6' THEN 'train'
      |       WHEN substr(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 2) < 'f3' THEN 'val'
      |       ELSE 'test' END AS split
      |FROM documents""".stripMargin

  /** Per-source document cap — the per-domain quota every web-scale
    * corpus applies (C4 / Gopher keep at most N pages per domain so one
    * crawler-friendly site can't dominate the mix): keep the top `cap`
    * docs per source, ranked by a deterministic quality proxy (here
    * n_chars desc, doc_id tiebreak — a learned quality score slots into
    * the same ORDER BY).
    *
    * Exact and skew-proof in two phases: phase 1 ranks inside
    * (source, doc_id % fanout) sub-buckets and keeps each bucket's top
    * `cap` — the global per-source top `cap` is contained in the union
    * of bucket top-`cap`s, so nothing true is lost — and phase 2 ranks
    * the ≤ cap·fanout survivors per source. A single hot domain with
    * 10⁹ pages hits phase 1 as `fanout` independent partitions of a
    * bounded window, never one giant sorted partition. */
  def sourceCap(spark: SparkSession, dir: String, cap: Int = 15,
      fanout: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.fanOut(Tables.documents(spark, dir))
      .select(col("doc_id"), col("source"), col("n_chars"))
    val w1 = Window.partitionBy(col("source"), pmod(col("doc_id"), lit(fanout)))
      .orderBy(col("n_chars").desc, col("doc_id"))
    val pruned = docs.withColumn("r1", row_number().over(w1))
      .filter(col("r1") <= cap).drop("r1")
    val w2 = Window.partitionBy(col("source"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    pruned.withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= cap)
      .select(col("doc_id"), col("source"), col("n_chars"), col("rank"))
  }

  def sourceCapSql(cap: Int = 15): String =
    s"""WITH r AS (SELECT doc_id, source, n_chars,
       |  CAST(row_number() OVER (PARTITION BY source
       |    ORDER BY n_chars DESC, doc_id) AS INT) AS rank
       |FROM documents)
       |SELECT doc_id, source, n_chars, rank FROM r WHERE rank <= $cap""".stripMargin

  /** Weighted sampling without replacement via PRIORITY SAMPLING
    * (Duffield, Lund & Thorup, JACM 2007): each row draws a uniform
    * u ∈ (0,1] and gets priority q = w/u; the k highest-priority rows
    * are the sample. Inclusion probability is proportional to weight
    * (up to the threshold clamp), and unlike Efraimidis–Spirakis's
    * u^(1/w) keys the transform is a single DIVISION — IEEE
    * correctly-rounded, so Spark and DuckDB compute bit-identical
    * priorities and the oracle hash-matches (pow/ln differ in the last
    * ulp across libm implementations; division never does).
    *
    * The draw is md5-keyed like every sampler in this file: u is the
    * first 52 bits of md5(doc_id) scaled to (0,1], so any engine, any
    * partitioning, any run selects the identical sample. Weight here is
    * n_chars (longer docs proportionally likelier — the usual
    * byte-budget sampling); a learned utility column drops into the
    * same expression.
    *
    * Scale: zero-shuffle scan to compute priorities + one
    * TakeOrdered(k) — no global sort, no state. */
  def weightedSample(spark: SparkSession, dir: String, k: Int = 60): DataFrame = {
    val h = conv(substring(md5(col("doc_id").cast("string")), 1, 13), 16, 10)
      .cast("long")
    val u = (h + lit(1L)).cast("double") / lit(4503599627370496.0) // 2^52
    val q = col("n_chars").cast("double") / u
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"), q.as("priority"))
      .orderBy(col("priority").desc, col("doc_id"))
      .limit(k)
  }

  def weightedSampleSql(k: Int = 60): String =
    s"""SELECT doc_id, n_chars,
       |  CAST(n_chars AS DOUBLE) /
       |    ((CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT) + 1)
       |     / 4503599627370496.0) AS priority
       |FROM documents
       |ORDER BY priority DESC, doc_id LIMIT $k""".stripMargin

  /** Per-stratum weighted quota: the same priority draw ranked INSIDE
    * each source — a weighted random quota per domain (the sampling
    * counterpart of [[sourceCap]]'s deterministic quality quota; what a
    * web-corpus build runs when each domain may contribute at most k
    * docs but the pick within a domain should be weight-proportional
    * rather than "longest wins"). One shuffle on source for the window;
    * every other step is scan-side. Skew note: a hot source makes one
    * window partition large — at a real corpus size the two-phase
    * sub-bucket trick sourceCap uses applies verbatim to the priority
    * ranking too. */
  def weightedSampleBySource(spark: SparkSession, dir: String,
      k: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = conv(substring(md5(col("doc_id").cast("string")), 1, 13), 16, 10)
      .cast("long")
    val u = (h + lit(1L)).cast("double") / lit(4503599627370496.0) // 2^52
    val w = Window.partitionBy(col("source"))
      .orderBy(col("priority").desc, col("doc_id"))
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("source"), col("n_chars"),
        (col("n_chars").cast("double") / u).as("priority"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc_id"), col("source"), col("n_chars"), col("priority"),
        col("rank"))
  }

  def weightedSampleBySourceSql(k: Int = 20): String =
    s"""WITH p AS (SELECT doc_id, source, n_chars,
       |  CAST(n_chars AS DOUBLE) /
       |    ((CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT) + 1)
       |     / 4503599627370496.0) AS priority
       |FROM documents),
       |r AS (SELECT doc_id, source, n_chars, priority,
       |        CAST(row_number() OVER (PARTITION BY source
       |          ORDER BY priority DESC, doc_id) AS INT) AS rank
       |      FROM p)
       |SELECT doc_id, source, n_chars, priority, rank FROM r WHERE rank <= $k""".stripMargin

  val resampleTemperatureSql: String =
    """WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS grp_cnt
      |           FROM documents GROUP BY lang),
      |m AS (SELECT lang, grp_cnt, min(grp_cnt) OVER () AS min_cnt FROM c),
      |r AS (SELECT lang, grp_cnt, min_cnt,
      |        sqrt(CAST(min_cnt AS DOUBLE) / grp_cnt) AS rate,
      |        lpad(lower(to_hex(CAST(floor(sqrt(CAST(min_cnt AS DOUBLE) / grp_cnt)
      |          * 65536) AS BIGINT))), 4, '0') AS thr
      |      FROM m)
      |SELECT d.doc_id, d.lang, r.grp_cnt, r.rate
      |FROM documents d JOIN r ON d.lang = r.lang
      |WHERE r.grp_cnt = r.min_cnt
      |   OR substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 4) < r.thr""".stripMargin
}
