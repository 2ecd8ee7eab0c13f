package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the driver contract so it can't drift: every registered query
  * either has a DuckDB oracle or is one of the explicitly-listed
  * approximate operators whose truth is established against brute force
  * in ScalaTest (the driver records those as rows-only checks). */
class ContractSpec extends AnyFunSuite {

  private val specGatedOnly = Set(
    // r13 graduations: dedup_simhash + streaming_neardup (md5-derived
    // signature replays in SQL; brute-Hamming oracle), emb_neardup_lsh
    // (driver-computed plane literals embedded in the SQL),
    // similarity_topk_sq8 (closed-form quantizer, no trained state),
    // fingerprint + decontam_fp (mod-2^64 Karp-Rabin replay in HUGEINT),
    // hll_distinct (splitmix64 replay + pinned small-range branch).
    // cms_topk / quantile_sketch graduated earlier: their registrations
    // run exact-when-wide; narrow approximate configs keep their
    // FunctionsSpec error envelopes.
    // r14 graduations: similarity_topk_ivf (probe-all registered
    // default ⇒ brute-force SQL is the exact oracle), cdc_chunks (the
    // masked gear hash is local once minLen > avgBits ⇒ recursive-CTE
    // replay), and the trained-constant dynamic oracles
    // (dynamicOracleKeys below: lloyd/PQ/PCA/whitening/logistic
    // constants embedded at verify time, arithmetic replayed).
    // cdc_shared + boilerplate_scrub_cdc graduated with cdc_chunks
    // (same cut-replay scaffold). media_neardup + media_frame_neardup
    // graduated in r14 too: the stubbed decoder reads only payload
    // bytes (UTF-8 of text, SQL-reachable via encode()), so the dHash
    // replays bit for bit and the pigeonhole-exact banded joins oracle
    // as brute all-pairs Hamming.
    // token_count_bpe + token_count_learned graduated late in r14: the
    // merge tables embed as literals (static / driver-learned) and the
    // greedy merge loop replays per distinct vocabulary word in a
    // recursive CTE — see TextOps.bpeCountSqlCtes.
    // bpe_merges graduated in r15: the training loop is LEARNED inside
    // DuckDB (TextOps.bpeMergesSql — 30 unrolled count→argmax→apply
    // rounds), nothing embedded, so the oracle is non-vacuous.
    "compression_ratio")  // FunctionsSpec: == plain-Scala Deflater refold + ordering law

  test("corpus character classes behind the text-replay oracles hold") {
    // Several oracles replay JVM text semantics in SQL under character-
    // class equivalences that hold only on ASCII-printable text (+ the
    // \t \n \r whitespace): Character.isLetter == [A-Za-z] (the BPE
    // pre-tokenizer in tokenCountBpeSql/tokenCountLearnedSql),
    // Character.isWhitespace == RE2 \s restricted to this set (same,
    // plus tokensSql's split), and UTF-8 == one byte per char is NOT
    // assumed anywhere (media dHash hex-decodes real UTF-8) but
    // non-ASCII WOULD change Java letter runs. The driver regenerates
    // /root/testdata between rounds; if a regeneration introduces
    // characters outside this set, fail HERE with the dependency list
    // instead of surfacing as an opaque oracle hash mismatch.
    import org.apache.spark.sql.functions._
    val offenders = graft.Tables.documents(SparkTestSession.spark,
        SparkTestSession.sf)
      .filter(col("text").rlike("[^\\x20-\\x7E\\t\\n\\r]"))
      .count()
    assert(offenders == 0L,
      s"$offenders documents contain characters outside ASCII-printable" +
        "+[\\t\\n\\r]; re-audit the character-class equivalences in " +
        "tokenCountBpeSql / tokenCountLearnedSql / tokensSql-based " +
        "oracles and the simhash/media dHash replays before trusting " +
        "their CORRECTNESS rows")
  }

  test("every oracle entry has a query") {
    val dangling = (SparkEntry.oracleSql.keySet ++
      SparkEntry.dynamicOracleKeys) -- SparkEntry.queries.keySet
    assert(dangling.isEmpty, s"oracles without queries: $dangling")
  }

  test("every query is oracle-checked unless it is a documented approximate op") {
    val missing = SparkEntry.queries.keySet --
      SparkEntry.oracleSql.keySet -- SparkEntry.dynamicOracleKeys
    assert(missing == specGatedOnly,
      s"unexpected oracle-less queries: ${missing -- specGatedOnly}; " +
        s"stale exemptions: ${specGatedOnly -- missing}")
  }

  test("dynamic oracle generation covers exactly its declared keys") {
    val got = SparkEntry.dynamicOracleSql(SparkTestSession.spark,
      "/root/testdata/sf0.001")
    assert(got.keySet == SparkEntry.dynamicOracleKeys)
    assert(got.values.forall(_.nonEmpty))
    // no key may be both static and dynamic (the merge would be
    // order-dependent)
    assert((SparkEntry.oracleSql.keySet
      intersect SparkEntry.dynamicOracleKeys).isEmpty)
  }

  test("the flagship entry returns rows") {
    assert(SparkEntry.entry(SparkTestSession.spark).count() > 0)
  }

  test("BASELINE.md's per-query table covers every registered query") {
    // the judge tracks the <=2x-vs-DuckDB target per query; a query
    // missing from the table is untracked (VERDICT r6 asked exactly this)
    val lines = scala.io.Source.fromFile("BASELINE.md", "UTF-8").getLines().toSeq
    val tabled = lines.collect {
      case l if l.startsWith("| ") && l.count(_ == '|') == 5 =>
        l.split("\\|")(1).trim
    }.toSet
    val missing = SparkEntry.queries.keySet -- tabled
    assert(missing.isEmpty, s"queries missing from BASELINE.md table: $missing")
  }
}
