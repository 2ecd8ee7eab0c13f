package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.GraftBridge

/** Subword token counting by greedy byte-pair merges (Sennrich et al.,
  * ACL 2016 — the BPE scheme every modern tokenizer family descends
  * from), as a native Catalyst expression: pre-tokenize into lowercased
  * alphabetic runs / single digits / single punctuation marks, then
  * within each alphabetic run repeatedly apply the highest-priority
  * merge from an engine-owned rank table until none applies; the token
  * count is the number of surviving symbols.
  *
  * This is what `pack_bins` / `corpus_mix`-style token budgeting should
  * run on: whitespace words undercount what a trainer's tokenizer sees
  * by 30–50%, while merge-based counts track it closely. The merge
  * table here is a small engine-owned set of the highest-frequency
  * English pairs (derived from public letter-bigram frequency tables,
  * not any external model file), so counts are deterministic and
  * self-contained; swapping in a production tokenizer's learned merges
  * is a data change, not a code change.
  *
  * A native `Expression` (not a UDF) keeps the counter inside
  * whole-stage codegen — `doGenCode` emits a static call, no boxing on
  * the scan path. DuckDB-oracled since r14: the merge table embeds as
  * literals and the greedy loop replays per DISTINCT word in a
  * recursive CTE ([[graft.llm.TextOps.tokenCountBpeSql]]);
  * FunctionsSpec also pins it against an independent plain-Scala
  * reimplementation.
  */
case class BpeTokenCount(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    BpeTokenCount.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.BpeTokenCount.count($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "bpe_token_count"
}

object BpeTokenCount {

  /** Ranked merge table, highest priority first. First tier: the most
    * frequent English letter bigrams (public frequency tables — Norvig's
    * Google-books counts order); second tier: merges over symbols the
    * first tier produces (common trigram/suffix units). Engine-owned and
    * deliberately small — the POINT is the mergeable-rank machinery, not
    * tokenizer fidelity. */
  val merges: Vector[(String, String)] = Vector(
    ("t", "h"), ("h", "e"), ("i", "n"), ("e", "r"), ("a", "n"),
    ("r", "e"), ("o", "n"), ("a", "t"), ("e", "n"), ("n", "d"),
    ("t", "i"), ("e", "s"), ("o", "r"), ("t", "e"), ("o", "f"),
    ("e", "d"), ("i", "s"), ("i", "t"), ("a", "l"), ("a", "r"),
    ("s", "t"), ("n", "t"), ("n", "g"), ("s", "e"), ("h", "a"),
    ("a", "s"), ("o", "u"), ("i", "o"), ("l", "e"), ("v", "e"),
    ("c", "o"), ("m", "e"), ("d", "e"), ("h", "i"), ("r", "i"),
    ("r", "o"), ("i", "c"), ("n", "e"), ("e", "a"), ("r", "a"),
    ("c", "e"), ("l", "i"), ("c", "h"), ("l", "l"), ("b", "e"),
    ("m", "a"), ("s", "i"), ("o", "m"), ("u", "r"), ("w", "a"),
    // second tier: units built from first-tier symbols
    ("th", "e"), ("in", "g"), ("an", "d"), ("ti", "on"), ("e", "nt"),
    ("f", "or"), ("th", "at"), ("er", "s"), ("it", "h"), ("w", "ith"),
    ("ing", "s"), ("a", "tion"), ("er", "e"), ("th", "er"), ("es", "s"))

  /** The default engine-owned counter; [[count]] (the codegen target of
    * the static-table expression) delegates here. */
  val defaultCounter: BpeMergeCounter = new BpeMergeCounter(merges)

  /** Pre-tokenize + merge-count with the engine-owned table. Static so
    * [[BpeTokenCount]]'s generated code calls straight into it. */
  def count(text: UTF8String): Long = defaultCounter.count(text)

  /** Column-level entry point. */
  def bpe_token_count(c: Column): Column =
    GraftBridge.column(BpeTokenCount(GraftBridge.expression(c)))

  /** Counting under an arbitrary (e.g. corpus-LEARNED) merge table. */
  def bpe_token_count_with(c: Column, merges: Seq[(String, String)]): Column =
    GraftBridge.column(BpeTokenCountWith(GraftBridge.expression(c), merges))

  /** LEARN a merge table from a corpus (Sennrich et al. ACL 2016, the
    * original BPE training loop) — making the claim above ("swapping in
    * learned merges is a data change") operational. The Spark-scale
    * part is ONE aggregation: the corpus collapses to its (word, freq)
    * vocabulary, which is many orders smaller than the corpus (Heaps'
    * law), and the iterative merge selection then runs driver-side over
    * that bounded vocabulary exactly like every BPE trainer does —
    * iterating Spark jobs per merge would add a cluster round-trip per
    * step to save memory nobody needs saved. Ties break
    * lexicographically so the learned table is deterministic.
    *
    * `vocab` is (word, freq) — from something like
    * `tokens(text) → explode → groupBy count` ([[graft.llm.TextOps]]).
    */
  def learnMerges(vocab: Seq[(String, Long)], nMerges: Int): Vector[(String, String)] = {
    // each word as its symbol sequence, carrying the word's frequency
    var words: Vector[(Vector[String], Long)] =
      vocab.iterator.filter(_._1.nonEmpty)
        .map { case (w, f) => (w.map(String.valueOf(_)).toVector, f) }
        .toVector
    val learned = Vector.newBuilder[(String, String)]
    var k = 0
    var done = false
    while (k < nMerges && !done) {
      val counts = scala.collection.mutable.HashMap[(String, String), Long]()
      for ((syms, f) <- words; i <- 0 until syms.length - 1)
        counts.updateWith((syms(i), syms(i + 1)))(c => Some(c.getOrElse(0L) + f))
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        learned += best
        words = words.map { case (syms, f) =>
          val next = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i < syms.length - 1 && syms(i) == best._1 && syms(i + 1) == best._2) {
              next += syms(i) + syms(i + 1); i += 2
            } else { next += syms(i); i += 1 }
          }
          (next.result(), f)
        }
        k += 1
      }
    }
    learned.result()
  }
}

/** The merge-count engine, parameterized by its rank table — one
  * instance per table (the static expression uses
  * [[BpeTokenCount.defaultCounter]]; [[BpeTokenCountWith]] builds one
  * from learned merges). Serializable: it ships inside the expression
  * to executors and into generated code as a reference object. */
final class BpeMergeCounter(mergeTable: Seq[(String, String)])
    extends Serializable {

  /** Rank-table key for a candidate merge pair. Symbols are lowercase
    * alphabetic units, so a plain space can never appear inside one and
    * is an unambiguous, printable separator; both the put and the get
    * side MUST build keys through this one helper so they cannot
    * diverge. */
  private def pairKey(a: String, b: String): String = a + " " + b

  private val rank: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer]()
    mergeTable.zipWithIndex.foreach { case ((a, b), i) =>
      m.put(pairKey(a, b), Integer.valueOf(i))
    }
    m
  }

  /** Merge-count one lowercased alphabetic run. O(len · merges-applied)
    * with small constants; words are short so this dominates nothing. */
  private def countWord(word: String): Long = {
    var syms = new java.util.ArrayList[String](word.length)
    var i = 0
    while (i < word.length) { syms.add(String.valueOf(word.charAt(i))); i += 1 }
    var done = false
    while (!done && syms.size > 1) {
      // best-ranked pair present in the current symbol sequence
      var best = -1
      var bestRank = Integer.MAX_VALUE
      i = 0
      while (i < syms.size - 1) {
        val r = rank.get(pairKey(syms.get(i), syms.get(i + 1)))
        if (r != null && r.intValue() < bestRank) { bestRank = r.intValue(); best = i }
        i += 1
      }
      if (best < 0) done = true
      else {
        // merge ALL occurrences of that pair, left to right, non-overlapping
        val a = syms.get(best)
        val b = syms.get(best + 1)
        val next = new java.util.ArrayList[String](syms.size)
        i = 0
        while (i < syms.size) {
          if (i < syms.size - 1 && syms.get(i) == a && syms.get(i + 1) == b) {
            next.add(a + b); i += 2
          } else { next.add(syms.get(i)); i += 1 }
        }
        syms = next
      }
    }
    syms.size.toLong
  }

  /** Pre-tokenize + merge-count a whole document. Alphabetic runs are
    * lowercased and BPE-merged; each digit and each non-alphanumeric,
    * non-whitespace character is one token (the GPT-2-style pre-token
    * split, minus the byte-level escapes). */
  def count(text: UTF8String): Long = {
    val s = text.toString
    var total = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (Character.isWhitespace(c)) i += 1
      else if (Character.isLetter(c)) {
        val start = i
        while (i < n && Character.isLetter(s.charAt(i))) i += 1
        total += countWord(s.substring(start, i).toLowerCase(java.util.Locale.ROOT))
      } else { total += 1L; i += 1 }
    }
    total
  }
}

/** [[BpeTokenCount]] under an ARBITRARY merge table — the counting side
  * of the train → count loop ([[BpeTokenCount.learnMerges]] /
  * [[graft.llm.TextOps.bpeMerges]] produce the table; this expression
  * consumes it). The table can't be a static call target, so the
  * counter ships into generated code as a codegen reference object —
  * still one virtual call per row, no boxing, inside whole-stage
  * codegen. */
case class BpeTokenCountWith(child: Expression,
    merges: Seq[(String, String)]) extends UnaryExpression {

  @transient private lazy val counter = new BpeMergeCounter(merges)

  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    counter.count(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bpeCounter", counter,
      classOf[BpeMergeCounter].getName)
    defineCodeGen(ctx, ev, c => s"$ref.count($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "bpe_token_count_with"
}
