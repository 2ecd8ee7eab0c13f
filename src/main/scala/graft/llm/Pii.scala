package graft.llm

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** PII detection and redaction — the scrub pass every pre-training corpus
  * makes before anything else sees the text (emails, SSNs, IP addresses,
  * phone numbers, long opaque ID runs).
  *
  * Rules apply IN ORDER, each over the previous rule's output, and each
  * rule's hit count is taken on the text as that rule saw it — so an SSN
  * is counted once as an SSN, not again as a phone-shaped digit run. The
  * whole chain is a single narrow projection of codegen'd
  * `regexp_replace`/`regexp_count` calls: zero shuffle, streams over a
  * 100 TB corpus at scan speed.
  *
  * Pattern dialect is the RE2/Java common subset (character classes,
  * bounded repetition, `\b`, `\d`) so the DuckDB oracle's RE2 and Spark's
  * java.util.regex agree match-for-match; no backreferences, no
  * lookaround.
  */
object Pii {

  /** One redaction rule: every match of `pattern` becomes `replacement`. */
  final case class PiiRule(name: String, pattern: String, replacement: String)

  /** Default rule chain, most-specific first: an SSN must be taken before
    * the phone rule sees its digit groups, and both before the bare
    * digit-run fallback. */
  val defaultRules: Seq[PiiRule] = Seq(
    PiiRule("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "[EMAIL]"),
    PiiRule("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "[SSN]"),
    PiiRule("ip", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "[IP]"),
    PiiRule("phone", "\\d{2,4}([- ]\\d{2,4}){2,}", "[PHONE]"),
    PiiRule("id", "\\d{6,}", "[ID]"))

  /** Apply `rules` to `textCol`: adds one `n_<rule>` count column per rule
    * (counted on the text AFTER all earlier rules applied) and
    * `clean_text` with every rule's matches replaced. */
  def scrub(df: DataFrame, textCol: String,
      rules: Seq[PiiRule] = defaultRules): DataFrame = {
    val staged = rules.zipWithIndex.foldLeft(
      df.withColumn("_pii_s0", col(textCol))) { case (d, (r, i)) =>
      d.withColumn(s"n_${r.name}",
          regexp_count(col(s"_pii_s$i"), lit(r.pattern)).cast("long"))
        .withColumn(s"_pii_s${i + 1}",
          regexp_replace(col(s"_pii_s$i"), r.pattern, r.replacement))
    }
    staged
      .withColumn("clean_text", col(s"_pii_s${rules.size}"))
      .drop((0 to rules.size).map(i => s"_pii_s$i"): _*)
  }

  /** Registered query: scrub the customer name column (the one testdata
    * column with PII-shaped content — `Customer#000000042`'s 9-digit ID
    * run). The email/SSN/IP/phone rules run over the same chain and
    * count 0 here; the crafted-text cases live in PiiSpec. */
  def piiScrub(spark: SparkSession, dir: String): DataFrame =
    scrub(Tables.customer(spark, dir), "c_name")
      .select(col("c_custkey") +: defaultRules.map(r => col(s"n_${r.name}"))
        :+ col("clean_text").as("masked_name"): _*)

  /** DuckDB oracle: the identical staged chain as nested CTEs — counts on
    * stage i's text, replace with the 'g' flag (DuckDB replaces only the
    * first match without it; Spark always replaces all). */
  val piiScrubSql: String = {
    // the Scala literal "\\d" is the two chars `\d`, which is exactly what
    // the DuckDB single-quoted literal needs (no backslash processing)
    val stages = defaultRules.zipWithIndex.map { case (r, i) =>
      s"""s${i + 1} AS (SELECT * EXCLUDE (t),
         |        CAST(len(regexp_extract_all(t, '${r.pattern}')) AS BIGINT) AS n_${r.name},
         |        regexp_replace(t, '${r.pattern}', '${r.replacement}', 'g') AS t
         |      FROM s$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH s0 AS (SELECT c_custkey, c_name AS t FROM customer),
       |$stages
       |SELECT c_custkey, ${defaultRules.map(r => s"n_${r.name}").mkString(", ")},
       |  t AS masked_name
       |FROM s${defaultRules.size}""".stripMargin
  }
}
