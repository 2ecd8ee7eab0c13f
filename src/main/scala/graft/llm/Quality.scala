package graft.llm

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Gopher-style document quality filtering (Rae et al. 2021 §A1.1's rule
  * family, re-expressed over the `documents` table): hard per-document
  * rules whose conjunction decides keep/drop. Unlike
  * [[TextOps.textStats]] (which SCORES), this is the DECISION operator a
  * curation pipeline actually gates on, and every rule is exposed as its
  * own column so a mix dashboard can attribute drops to rules.
  *
  * A single narrow zero-shuffle projection — every rule derives from the
  * one token-array column inside whole-stage codegen, so the filter
  * streams over a 100 TB corpus at scan speed. All rule inputs are exact
  * integers (or exact-integer divisions in double, identical IEEE ops in
  * both engines), so the DuckDB oracle is bit-identical.
  */
object Quality {

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is", "it")

  /** Rule columns over a token array + word count:
    *  - r_nwords: 10 ≤ word_count ≤ 1000 (Gopher 50..100k, rescaled to
    *    this corpus's 25..60-token documents)
    *  - r_awl: mean word length in [2, 12]
    *  - r_stop: ≥ 2 DISTINCT stopwords present (the "real prose" check)
    *  - r_alpha: ≥ 80% of tokens purely alphabetic
    *  - r_repeat: adjacent-duplicate token ratio ≤ 0.2 (degenerate-text)
    *
    * [[gate]] adds the rule + `keep` columns to ANY frame with a text
    * column (the form the streaming curation loop consumes);
    * [[qualityFilter]] is the registered, oracle-checked projection of
    * it over the documents table. */
  def gate(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = col("toks")
    val n = col("word_count")
    val awl = col("len_sum").cast("double") / n
    val stopHits = size(filter(
      typedLit(stopwords),
      s => array_contains(toks, s))).cast("long")
    val alphaCnt = size(filter(toks, t => t.rlike("^[a-z]+$"))).cast("long")
    val repeats = size(filter(
      zip_with(
        slice(toks, lit(1), greatest(size(toks) - 1, lit(0))),
        slice(toks, lit(2), greatest(size(toks) - 1, lit(0))),
        (a, b) => a === b),
      x => x)).cast("long")

    docs
      .withColumn("toks", TextOps.tokens(col(textCol)))
      .withColumn("word_count", size(toks).cast("long"))
      .withColumn("len_sum",
        aggregate(toks, lit(0L), (acc, t) => acc + length(t)))
      .withColumn("r_nwords", (n >= 10 && n <= 1000).cast("int"))
      // n > 0 guard: a zero-token doc divides 0/0 → NaN here but NULL in
      // DuckDB; anchoring on the exact-int predicate keeps both at 0
      .withColumn("r_awl", (n > 0 && awl >= 2.0 && awl <= 12.0).cast("int"))
      .withColumn("r_stop", (stopHits >= 2).cast("int"))
      .withColumn("r_alpha",
        (alphaCnt.cast("double") >= n.cast("double") * 0.8).cast("int"))
      .withColumn("r_repeat",
        (repeats.cast("double") <= (n - 1).cast("double") * 0.2 || n <= 1)
          .cast("int"))
      .withColumn("keep",
        (col("r_nwords") === 1 && col("r_awl") === 1 && col("r_stop") === 1 &&
          col("r_alpha") === 1 && col("r_repeat") === 1).cast("int"))
      .drop("toks", "len_sum")
  }

  def qualityFilter(spark: SparkSession, dir: String): DataFrame =
    gate(Tables.documents(spark, dir))
      .select("doc_id", "word_count", "r_nwords", "r_awl", "r_stop",
        "r_alpha", "r_repeat", "keep")

  /** Compression-ratio screen ([[graft.functions.DeflateRatio]] — the
    * CCNet-style redundancy detector): deflate(text)/|text| with the
    * doc's word count for context. Repetitive machine junk compresses
    * far below prose; random blobs don't compress at all — both tails
    * are drop candidates the word-level rules miss. Zero-shuffle scan
    * projection; engine-specific codec ⇒ no SQL oracle (FunctionsSpec
    * refolds the ratio in plain Scala and pins the ordering law). */
  def compressionRatio(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), col("n_chars"),
        graft.functions.DeflateRatio.deflate_ratio(col("text")).as("deflate_ratio"))

  /** Distilled quality CLASSIFIER (the fastText-style second stage every
    * production curation pipeline runs behind its hard rules — CCNet /
    * LLaMA-data train a linear model on reference-vs-crawl labels; here
    * the teacher is [[gate]]'s rule conjunction, so the engine needs no
    * external labels): hashed token counts (feature hashing keeps the
    * dimension FIXED at any corpus size — no vocabulary shuffle) into a
    * logistic regression, then every document scored with the smooth
    * probability the hard rules can't give.
    *
    * 100 TB shape: the fit runs over `sampleFrac` of the corpus (hash-
    * sampled — a linear model on 1k dims saturates long before even a
    * 1e-4 sample of 100 TB runs out), iterating treeAggregate over
    * (hashDim+1)-sized gradient vectors; scoring broadcasts the
    * coefficient vector and streams the corpus once, zero shuffles.
    * DuckDB-oracled since r14 via [[classifierSqlFor]] (murmur3 feature
    * indexes + fitted coefficients embedded as literals, BLAS sparse-dot
    * order replayed); PiiQualitySpec additionally asserts holdout
    * agreement with the teacher rules and
    * that the probability orders rule-passing docs above rule-failing
    * ones on average. */
  def classifierScores(spark: SparkSession, dir: String,
      hashDim: Int = 1024, maxIter: Int = 25,
      sampleFrac: Double = 1.0): DataFrame = {
    import org.apache.spark.ml.functions.vector_to_array
    val feats = classifierFeats(spark, dir, hashDim)
    val model = classifierModel(spark, dir, hashDim, maxIter, sampleFrac)
    model.transform(feats)
      .select(col("doc_id"), col("label").cast("int").as("rule_keep"),
        round(element_at(vector_to_array(col("probability")), 2), 6)
          .as("prob_keep"),
        col("prediction").cast("int").as("pred_keep"))
  }

  /** The hashed-feature frame, served to every optimizer iteration AND
    * the final scoring pass — without the memo each treeAggregate step
    * re-tokenizes the corpus. */
  private def classifierFeats(spark: SparkSession, dir: String,
      hashDim: Int): DataFrame =
    graft.Caches.memo(spark, s"qcFeats:$dir:$hashDim") {
      val labeled = gate(Tables.fanOut(Tables.documents(spark, dir)))
        .withColumn("toks", TextOps.tokens(col("text")))
        .select(col("doc_id"), col("toks"),
          col("keep").cast("double").as("label"))
      new org.apache.spark.ml.feature.HashingTF()
        .setInputCol("toks").setOutputCol("features")
        .setNumFeatures(hashDim)
        .transform(labeled)
    }

  /** The fitted model. The fit runs ~maxIter treeAggregate jobs EAGERLY
    * at query-build time; LBFGS on the same input is deterministic, so
    * the model is memoized per (session, inputs) — cold mode's release
    * re-fits. Public to [[classifierSqlFor]], which embeds its
    * coefficients into the oracle replay. */
  def classifierModel(spark: SparkSession, dir: String,
      hashDim: Int = 1024, maxIter: Int = 25, sampleFrac: Double = 1.0)
      : org.apache.spark.ml.classification.LogisticRegressionModel =
    graft.Caches.memoObj(spark,
        s"qcModel:$dir:$hashDim:$maxIter:$sampleFrac") {
      val feats = classifierFeats(spark, dir, hashDim)
      val train =
        if (sampleFrac >= 1.0) feats
        else feats.filter(pmod(xxhash64(col("doc_id"), lit(7)), lit(1000000))
          < lit((sampleFrac * 1e6).toLong))
      new org.apache.spark.ml.classification.LogisticRegression()
        .setMaxIter(maxIter).setRegParam(0.01)
        .setFeaturesCol("features").setLabelCol("label")
        .fit(train)
    }

  /** Per-SOURCE quality profile — the drill-down behind the corpus
    * quality gate: for each source, document/token mass, how many docs
    * pass each Gopher-style rule, and the overall keep rate. The table
    * an operator reads when a source's keep rate collapses ("which rule
    * started failing").
    *
    * Scale: [[gate]]'s per-row projections (it carries every input
    * column through, `source` included) + one map-side-combinable
    * rollup to |sources| rows — zero joins. */
  def qualityBySource(spark: org.apache.spark.sql.SparkSession,
      dir: String): DataFrame = {
    gate(graft.Tables.fanOut(graft.Tables.documents(spark, dir)))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("word_count")).as("n_tokens"),
        sum(col("r_nwords")).cast("long").as("pass_nwords"),
        sum(col("r_awl")).cast("long").as("pass_awl"),
        sum(col("r_stop")).cast("long").as("pass_stop"),
        sum(col("r_alpha")).cast("long").as("pass_alpha"),
        sum(col("r_repeat")).cast("long").as("pass_repeat"),
        sum(col("keep")).cast("long").as("n_keep"))
      .withColumn("keep_rate",
        round(col("n_keep").cast("double") / col("n_docs"), 6))
  }

  def qualityBySourceSql(): String =
    s"""SELECT d.source,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(q.word_count) AS BIGINT) AS n_tokens,
       |  CAST(sum(q.r_nwords) AS BIGINT) AS pass_nwords,
       |  CAST(sum(q.r_awl) AS BIGINT) AS pass_awl,
       |  CAST(sum(q.r_stop) AS BIGINT) AS pass_stop,
       |  CAST(sum(q.r_alpha) AS BIGINT) AS pass_alpha,
       |  CAST(sum(q.r_repeat) AS BIGINT) AS pass_repeat,
       |  CAST(sum(q.keep) AS BIGINT) AS n_keep,
       |  round(CAST(sum(q.keep) AS DOUBLE) / count(*), 6) AS keep_rate
       |FROM ($qualityFilterSql) q
       |JOIN documents d ON q.doc_id = d.doc_id
       |GROUP BY 1""".stripMargin

  val qualityFilterSql: String = {
    val stopList = stopwords.map("'" + _ + "'").mkString(", ")
    s"""WITH t AS (SELECT doc_id, ${TextOps.tokensSql} AS toks FROM documents),
       |c AS (SELECT doc_id,
       |        CAST(len(toks) AS BIGINT) AS word_count,
       |        CAST(list_sum(list_transform(toks, x -> len(x))) AS BIGINT) AS len_sum,
       |        CAST(len(list_filter([$stopList], s -> list_contains(toks, s))) AS BIGINT) AS stop_hits,
       |        CAST(len(list_filter(toks, x -> regexp_full_match(x, '[a-z]+'))) AS BIGINT) AS alpha_cnt,
       |        CAST(len(list_filter(
       |          list_zip(toks[1:len(toks)-1], toks[2:]),
       |          x -> x[1] = x[2])) AS BIGINT) AS repeats
       |      FROM t),
       |r AS (SELECT doc_id, word_count,
       |        CAST(word_count >= 10 AND word_count <= 1000 AS INT) AS r_nwords,
       |        CAST(word_count > 0
       |         AND CAST(len_sum AS DOUBLE) / word_count >= 2.0
       |         AND CAST(len_sum AS DOUBLE) / word_count <= 12.0 AS INT) AS r_awl,
       |        CAST(stop_hits >= 2 AS INT) AS r_stop,
       |        CAST(CAST(alpha_cnt AS DOUBLE) >= CAST(word_count AS DOUBLE) * 0.8 AS INT) AS r_alpha,
       |        CAST(CAST(repeats AS DOUBLE) <= CAST(word_count - 1 AS DOUBLE) * 0.2
       |             OR word_count <= 1 AS INT) AS r_repeat
       |      FROM c)
       |SELECT doc_id, word_count, r_nwords, r_awl, r_stop, r_alpha, r_repeat,
       |  CAST(r_nwords = 1 AND r_awl = 1 AND r_stop = 1 AND r_alpha = 1
       |       AND r_repeat = 1 AS INT) AS keep
       |FROM r""".stripMargin
  }

  /** DuckDB oracle for [[classifierScores]] — the trained-constant
    * recipe applied to the distilled classifier: the verify session's
    * own memoized model supplies intercept + coefficients, and feature
    * hashing is replayed by enumerating the corpus's DISTINCT tokens
    * (bounded vocabulary) and embedding each token's murmur3 feature
    * index (`HashingTF.indexOf` — the exact hash the engine used) with
    * its coefficient as a VALUES table. The margin rebuilds BLAS's
    * sparse-dense dot bit for bit: per-feature counts fold in feature-
    * index order from 0.0 (`list_reduce` over `list(... ORDER BY f)`),
    * then + intercept. The only transcendental is the final sigmoid's
    * exp() — not correctly rounded in either engine, but a 1-ulp exp
    * difference moves the 6-decimal-rounded probability only if the
    * true value sits within ~1e-16 of a rounding boundary (p ≈ 1e-10
    * per row). rule_keep/pred_keep are exact. */
  def classifierSqlFor(spark: SparkSession, dir: String,
      hashDim: Int = 1024, maxIter: Int = 25,
      sampleFrac: Double = 1.0): String = {
    // same memo as [[classifierScores]]: the model the verify run's
    // query actually scored with (fitted here if the session somehow
    // never ran the query — identical bits either way, the fit is
    // deterministic on this input)
    val model = classifierModel(spark, dir, hashDim, maxIter, sampleFrac)
    val htf = new org.apache.spark.ml.feature.HashingTF()
      .setNumFeatures(hashDim)
    // VERIFY-SCALE-ONLY COLLECT, bounded by a loud guard: the VALUES
    // table must map EVERY distinct corpus token to its murmur3 bucket
    // (one representative per bucket would silently drop the counts of
    // every non-representative token — the join is by token string),
    // so the collect scales with corpus VOCABULARY, not hashDim. That
    // is fine for the oracle generator (it only ever runs at verify
    // scale against DuckDB) and wrong for anything serving-path; the
    // guard turns a misuse into an error instead of a driver OOM.
    val toks = Tables.fanOut(Tables.documents(spark, dir))
      .select(explode(TextOps.tokens(col("text"))).as("tok"))
      .distinct().limit(65537).collect().map(_.getString(0)).sorted
    require(toks.length <= 65536,
      "classifierSqlFor is a verify-scale oracle generator: corpus " +
        "vocabulary exceeds 65536 distinct tokens; the exact replay " +
        "would need a corpus-vocab-sized VALUES table. Run it against " +
        "verify-scale data only.")
    val coef = model.coefficients
    val rows = toks.map { t =>
      val f = htf.indexOf(t)
      s"('${t.replace("'", "''")}', ${f}, ${fmtD(coef(f))})"
    }.mkString(",\n    ")
    s"""WITH tw(tok, f, w) AS (VALUES
       |    ${rows}),
       |t AS (SELECT doc_id, unnest(${TextOps.tokensSql}) AS tok FROM documents),
       |g AS (SELECT t.doc_id, tw.f, CAST(count(*) AS DOUBLE) AS cnt,
       |        min(tw.w) AS w
       |      FROM t JOIN tw ON tw.tok = t.tok
       |      GROUP BY t.doc_id, tw.f),
       |mg AS (SELECT doc_id,
       |         coalesce(list_reduce(list(w * cnt ORDER BY f),
       |           (a, b) -> a + b), 0.0) + ${fmtD(model.intercept)} AS margin
       |       FROM g GROUP BY doc_id),
       |q AS (${qualityFilterSql})
       |SELECT q.doc_id, q.keep AS rule_keep,
       |  round(1.0 / (1.0 + exp(-(coalesce(mg.margin, ${fmtD(model.intercept)})))), 6)
       |    AS prob_keep,
       |  CASE WHEN coalesce(mg.margin, ${fmtD(model.intercept)}) > 0.0
       |       THEN 1 ELSE 0 END AS pred_keep
       |FROM q LEFT JOIN mg ON mg.doc_id = q.doc_id""".stripMargin
  }

  /** DOUBLE-parsing literal (exponent suffix forces DuckDB's strtod
    * path — a bare decimal parses as DECIMAL). */
  private def fmtD(d: Double): String = {
    val s = d.toString
    if (s.contains("E") || s.contains("e")) s else s + "e0"
  }
}
