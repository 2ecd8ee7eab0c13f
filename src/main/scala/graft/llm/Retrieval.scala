package graft.llm

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lexical retrieval over the documents table: Okapi BM25 (Robertson &
  * Walker, SIGIR '94; the `(k1+1)`/`+1`-idf shape is the Lucene
  * variant), the scorer every data-pipeline relevance screen starts
  * from — "keep documents related to these seed terms" is a BM25 query
  * over the corpus.
  *
  * Shape, chosen for 100 TB rather than translated from a search
  * engine: the query's terms are a handful of literals, so per-document
  * term frequencies are ARRAY ops on the token list (`size(filter(…))`,
  * zero shuffle, whole-stage codegen) — no posting-list explode, no
  * (doc, term) shuffle at all. The corpus-level constants (N, Σdl, per-
  * term document frequencies) are ONE scalar-aggregate row broadcast
  * back over the scan, and the only wide operation in the whole plan is
  * the final TakeOrdered(k). Two corpus scans total (stats + scoring),
  * both column-pruned to (doc_id, text).
  *
  * Determinism across engines (the oracle hash-matches): tf/df/dl are
  * exact integers; the score arithmetic is written with identical
  * association in both engines (each double op is IEEE
  * correctly-rounded, so identical expression trees give identical
  * bits); per-document scores sum the per-term components in one fixed
  * literal order instead of an order-dependent SUM over an exploded
  * frame; ranking ties break on doc_id.
  */
object Retrieval {

  /** The seed-term query every example runs; fixed so the oracle can
    * mirror it. */
  val queryTerms: Seq[String] = Seq("query", "join", "vector", "stream")

  private val K1 = 1.2
  private val B = 0.75

  /** BM25 score of one term given its tf/df columns plus the document
    * and corpus stats. `tf = 0` yields exactly 0.0 in both engines (the
    * numerator is a multiply by zero), so absent terms need no CASE. */
  private def termScore(tf: Column, df: Column, dl: Column,
      nDocs: Column, avgdl: Column): Column = {
    val idf = log((nDocs - df + lit(0.5)) / (df + lit(0.5)) + lit(1.0))
    (idf * (tf * lit(K1 + 1))) /
      (tf + lit(K1) * (lit(1 - B) + lit(B) * (dl / avgdl)))
  }

  /** Top-k documents by BM25 against [[queryTerms]]. */
  def bm25TopK(spark: SparkSession, dir: String, k: Int = 25): DataFrame =
    topKOf(bm25ScoredDir(spark, dir), k)

  /** The scorer over an explicit (doc_id, text) relation — the testable
    * core of [[bm25TopK]]. */
  def bm25TopKFromDocs(docs: DataFrame, k: Int): DataFrame =
    topKOf(bm25Scored(docs), k)

  private def topKOf(scored: DataFrame, k: Int): DataFrame =
    scored
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("dl"), round(col("score"), 6).as("bm25"))

  /** [[bm25Scored]] with the per-doc tf frame MEMOIZED per (session,
    * dir): the stats pass and the scoring pass both read it, so without
    * the cache every BM25 evaluation tokenizes the corpus twice — and
    * `bm25_topk` + `hybrid_topk`'s lexical leg share one tokenize per
    * session instead of four (the tfidf_tf discipline). The frame is
    * 2+|queryTerms| narrow columns per doc, far smaller than the text
    * it replaces. */
  def bm25ScoredDir(spark: SparkSession, dir: String): DataFrame =
    scoredOf(graft.Caches.memo(spark, s"bm25PerDoc:$dir") {
      perDocOf(Tables.fanOut(Tables.documents(spark, dir)))
    })

  /** Every document's raw BM25 score against [[queryTerms]] — the
    * shared scoring frame behind [[bm25TopKFromDocs]] and the lexical
    * leg of [[hybridTopK]]. Columns: doc_id, dl, score. */
  def bm25Scored(docs: DataFrame): DataFrame = scoredOf(perDocOf(docs))

  private def perDocOf(docs: DataFrame): DataFrame = docs
    .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
    .select(
      col("doc_id") +: size(col("toks")).cast("long").as("dl") +:
        queryTerms.map(t =>
          size(filter(col("toks"), x => x === lit(t))).cast("long")
            .as(s"tf_$t")): _*)

  private def scoredOf(perDoc: DataFrame): DataFrame = {
    val statCols = count(lit(1)).as("n_docs") +: sum(col("dl")).as("sum_dl") +:
      queryTerms.map(t =>
        sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t"))
    val stats = perDoc.agg(statCols.head, statCols.tail: _*)
    val avgdl = col("sum_dl") / col("n_docs")
    val score = queryTerms
      .map(t => termScore(col(s"tf_$t"), col(s"df_$t"), col("dl"),
        col("n_docs"), avgdl))
      .reduceLeft(_ + _) // fixed literal order — no order-dependent SUM
    perDoc.crossJoin(broadcast(stats)) // 1-row stats frame (PlanGuardrailSpec-pinned)
      .withColumn("score", score)
      .select(col("doc_id"), col("dl"), col("score"))
  }

  /** RRF discount constant — the k=60 of Cormack, Clarke & Buettcher
    * (SIGIR '09), the de-facto default every hybrid search stack ships. */
  private val RRF_K = 60

  /** Hybrid lexical + dense retrieval via Reciprocal Rank Fusion: the
    * BM25 leg over [[queryTerms]] and a cosine leg against the query
    * document's embedding (`vec_id = queryId`), fused as
    * Σ_legs 1/(60 + rank). RRF is how production retrieval stacks
    * combine incommensurable scores — ranks, not raw values, so neither
    * leg's scale dominates. The query document itself is excluded from
    * BOTH legs (it would trivially rank first in each).
    *
    * Scale shape: each leg is a TakeOrdered(nLeg) reduction over one
    * corpus scan (BM25's stats broadcast + the broadcast 1-row query
    * vector — both legs shuffle nothing but their top-N). The fusion
    * join touches 2·nLeg rows total, so rank assignment and the
    * full-outer fuse are driver-scale no matter the corpus size. A doc
    * absent from a leg contributes nothing for that leg (rank reported
    * as 0 in the output). */
  def hybridTopK(spark: SparkSession, dir: String, queryId: Long = 0L,
      nLeg: Int = 50, k: Int = 25): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // per-leg rank: TakeOrdered(nLeg) first, then row_number inside the
    // nLeg-row frame — the unpartitioned window is deliberate (≤ nLeg
    // rows by then), keeping the full-corpus sort out of the plan
    val lexTop = bm25ScoredDir(spark, dir)
      .filter(col("doc_id") =!= queryId) // mirror the dense leg's self-exclusion
      .orderBy(col("score").desc, col("doc_id")).limit(nLeg)
      .withColumn("lex_rank", row_number().over(
        Window.orderBy(col("score").desc, col("doc_id"))))
      .select(col("doc_id"), col("lex_rank"))
    // greatest(): the zero-norm clamp every other cosine path carries
    // (see Vectors.clampNorm — an all-zero embedding would NaN the
    // cosine and seize rank 1 in BOTH engines); no real norm is near
    // the floor, so scores are unchanged on any non-degenerate corpus
    val emb = Tables.fanOut(Tables.embeddings(spark, dir))
      .withColumn("nrm", greatest(
        sqrt(Vectors.dotF32(col("embedding"), col("embedding"))), lit(1e-12)))
    val q = emb.filter(col("vec_id") === queryId)
      .select(col("embedding").as("qvec"), col("nrm").as("qnrm"))
    val denseTop = emb.filter(col("vec_id") =!= queryId)
      .crossJoin(broadcast(q)) // 1-row query frame
      .withColumn("cos", round(Vectors.dotF32(col("qvec"), col("embedding"))
        / (col("qnrm") * col("nrm")), 6))
      .orderBy(col("cos").desc, col("vec_id")).limit(nLeg)
      .withColumn("vec_rank", row_number().over(
        Window.orderBy(col("cos").desc, col("vec_id"))))
      .select(col("vec_id").as("doc_id"), col("vec_rank"))
    lexTop.join(denseTop, Seq("doc_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(RRF_K) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(RRF_K) + col("vec_rank")), lit(0.0)), 6))
      .orderBy(col("rrf").desc, col("doc_id")).limit(k)
      .select(col("doc_id"),
        coalesce(col("lex_rank"), lit(0)).as("lex_rank"),
        coalesce(col("vec_rank"), lit(0)).as("vec_rank"),
        col("rrf"))
  }

  /** The shared BM25 scoring CTE chain (tk → t → s → sc; sc carries
    * doc_id, dl, score) — both oracle generators build on it, so the
    * lexical pipeline cannot silently diverge between `bm25_topk` and
    * `hybrid_topk`'s lexical leg. Returned pre-stripped. */
  private def bm25ScoreCtes: String = {
    val tfCols = queryTerms.map(t =>
      s"CAST(len(list_filter(toks, x -> x = '$t')) AS BIGINT) AS tf_$t").mkString(",\n|        ")
    val dfCols = queryTerms.map(t =>
      s"CAST(sum(CASE WHEN tf_$t > 0 THEN 1 ELSE 0 END) AS BIGINT) AS df_$t").mkString(",\n|        ")
    val scoreExpr = queryTerms.map(t =>
      s"(ln((n_docs - df_$t + 0.5) / (df_$t + 0.5) + 1.0) * (tf_$t * ${K1 + 1})) / " +
        s"(tf_$t + $K1 * (${1 - B} + $B * (dl / avgdl)))").mkString("\n|          + ")
    s"""tk AS (SELECT doc_id, ${TextOps.tokensSql} AS toks FROM documents),
       |t AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
       |        $tfCols
       |      FROM tk),
       |s AS (SELECT CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(dl) AS BIGINT) AS sum_dl,
       |        $dfCols
       |      FROM t),
       |sc AS (SELECT doc_id, dl,
       |          $scoreExpr AS score
       |       FROM t CROSS JOIN (SELECT *, sum_dl / n_docs AS avgdl FROM s))""".stripMargin
  }

  def hybridTopKSql(queryId: Long = 0L, nLeg: Int = 50, k: Int = 25): String = {
    s"""WITH $bm25ScoreCtes,
       |lex AS (SELECT doc_id, rn AS lex_rank FROM (
       |          SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rn
       |          FROM sc WHERE doc_id <> $queryId) WHERE rn <= $nLeg),
       |q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = $queryId),
       |dsc AS (SELECT e.vec_id AS doc_id,
       |          round(CAST(list_dot_product(q.qvec, e.embedding) AS DOUBLE)
       |            / (greatest(sqrt(CAST(list_dot_product(q.qvec, q.qvec) AS DOUBLE)), 1e-12)
       |               * greatest(sqrt(CAST(list_dot_product(e.embedding, e.embedding) AS DOUBLE)), 1e-12)), 6) AS cos
       |        FROM embeddings e CROSS JOIN q WHERE e.vec_id <> $queryId),
       |den AS (SELECT doc_id, rn AS vec_rank FROM (
       |          SELECT doc_id, CAST(row_number() OVER (ORDER BY cos DESC, doc_id) AS INT) AS rn
       |          FROM dsc) WHERE rn <= $nLeg),
       |f AS (SELECT coalesce(l.doc_id, d.doc_id) AS doc_id, l.lex_rank, d.vec_rank,
       |        round(coalesce(CAST(1 AS DOUBLE) / ($RRF_K + l.lex_rank), CAST(0 AS DOUBLE))
       |          + coalesce(CAST(1 AS DOUBLE) / ($RRF_K + d.vec_rank), CAST(0 AS DOUBLE)), 6) AS rrf
       |      FROM lex l FULL OUTER JOIN den d ON l.doc_id = d.doc_id)
       |SELECT doc_id, coalesce(lex_rank, 0) AS lex_rank,
       |  coalesce(vec_rank, 0) AS vec_rank, rrf
       |FROM f ORDER BY rrf DESC, doc_id LIMIT $k""".stripMargin
  }

  def bm25TopKSql(k: Int = 25): String =
    s"""WITH $bm25ScoreCtes
       |SELECT doc_id, dl, round(score, 6) AS bm25
       |FROM sc ORDER BY score DESC, doc_id LIMIT $k""".stripMargin
}
