package graft.state

import java.sql.{Connection, DriverManager}
import java.util.Properties
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** JDBC-backed state store mirroring the reference's PostgreSQL channel
  * ("Mechanism Y.py":136-218): per batch, (K2) write the aggregate delta
  * to a temp table with df.write.jdbc, (K3) merge it into the target with
  * one set-based additive upsert statement on the driver's plain JDBC
  * connection, (S4) read state back with spark.read.jdbc.
  *
  * Runs on embedded Derby (ships with Spark — no extra dependency) with
  * ANSI `MERGE INTO`; a `jdbc:postgresql:` URL selects the reference's
  * own `INSERT … ON CONFLICT DO UPDATE` statement shape instead
  * ([[UpsertDialect]] — PG14 has no MERGE). DDL shapes per
  * sql/postgres_tables.sql: VARCHAR keys, BIGINT counts, DECIMAL(18,2)
  * sums, TIMESTAMP last_updated.
  *
  * Scale notes vs the reference (SURVEY.md §4 anti-patterns, fixed here):
  *   - reads accept a key predicate (pruned read) instead of full-table;
  *   - epoch fencing gives idempotent replay (opt-in; default preserves
  *     the reference's at-least-once semantics for parity).
  */
class JdbcUpsertStore(url: String, driverClass: String =
    "org.apache.derby.jdbc.EmbeddedDriver") extends StateStore {

  Class.forName(driverClass)

  private val dialect = UpsertDialect.forUrl(url)

  private def props: Properties = {
    val p = new Properties()
    p.setProperty("driver", driverClass)
    p
  }

  private def withConn[A](f: Connection => A): A = {
    val c = DriverManager.getConnection(url)
    try f(c) finally c.close()
  }

  private def exec(c: Connection, sql: String): Unit = {
    val st = c.createStatement()
    try st.executeUpdate(sql) finally st.close()
  }

  private def tableExists(c: Connection, name: String): Boolean = {
    val rs = c.getMetaData.getTables(null, null, name.toUpperCase, null)
    try rs.next() finally rs.close()
  }

  /** DDL per sql/postgres_tables.sql:3-25 (types mapped to Derby). */
  def init(): Unit = withConn { c =>
    if (!tableExists(c, "MERCHANT_SUMMARY")) {
      exec(c, """CREATE TABLE merchant_summary (
        merchant_id VARCHAR(255) NOT NULL PRIMARY KEY,
        total_transactions BIGINT NOT NULL,
        last_updated TIMESTAMP)""")
      exec(c, """CREATE TABLE customer_merchant_summary (
        customer_id VARCHAR(255) NOT NULL,
        merchant_id VARCHAR(255) NOT NULL,
        transaction_count BIGINT NOT NULL,
        total_amount_sum DECIMAL(18,2) NOT NULL,
        last_updated TIMESTAMP,
        PRIMARY KEY (customer_id, merchant_id))""")
      exec(c, """CREATE TABLE merchant_gender_summary (
        merchant_id VARCHAR(255) NOT NULL PRIMARY KEY,
        male_transaction_count BIGINT NOT NULL,
        female_transaction_count BIGINT NOT NULL,
        last_updated TIMESTAMP)""")
      exec(c, """CREATE TABLE applied_epochs (
        table_name VARCHAR(64) NOT NULL,
        epoch_id BIGINT NOT NULL,
        PRIMARY KEY (table_name, epoch_id))""")
    }
  }

  /** Idempotence fence: record (table, epoch); false if already applied. */
  private def fence(c: Connection, table: String, epoch: Option[Long]): Boolean =
    epoch match {
      case None => true
      case Some(e) =>
        try { exec(c, s"INSERT INTO applied_epochs VALUES ('$table', $e)"); true }
        catch { case _: java.sql.SQLIntegrityConstraintViolationException => false }
    }

  private def mergeSql(target: String, temp: String, keys: Seq[String],
      adds: Seq[String]): String = {
    // Spark's JDBC writer creates the temp table with QUOTED (lowercase)
    // identifiers; unquoted refs would resolve against Derby's uppercase
    // canon and miss — so every s.<col> is quoted.
    def q(c: String) = "\"" + c + "\""
    val on = keys.map(k => s"t.$k = s.${q(k)}").mkString(" AND ")
    val sets = (adds.map(a => s"t.$a = t.$a + s.${q(a)}") :+
      s"t.last_updated = s.${q("last_updated")}").mkString(", ")
    val cols = (keys ++ adds :+ "last_updated").mkString(", ")
    val vals = (keys ++ adds :+ "last_updated").map(x => s"s.${q(x)}").mkString(", ")
    s"""MERGE INTO $target t USING $temp s ON ($on)
       |WHEN MATCHED THEN UPDATE SET $sets
       |WHEN NOT MATCHED THEN INSERT ($cols) VALUES ($vals)""".stripMargin
  }

  private def upsert(delta: DataFrame, target: String, temp: String,
      keys: Seq[String], adds: Seq[String], epoch: Option[Long]): Unit = {
    if (delta.isEmpty) return
    // K2: batch delta → temp table (executors write over JDBC).
    // Key columns must be VARCHAR, not Derby's default CLOB mapping for
    // StringType — CLOB can't join against the VARCHAR PKs in MERGE.
    delta.withColumn("last_updated", current_timestamp())
      .write.mode("overwrite")
      .option("createTableColumnTypes",
        keys.map(k => s"$k VARCHAR(255)").mkString(", "))
      .jdbc(url, temp, props)
    // K3: one set-based additive merge on the driver connection.
    withConn { c =>
      if (fence(c, target, epoch)) exec(c, mergeSql(target, temp, keys, adds))
    }
  }

  override def applyDeltas(merchantDelta: DataFrame,
      custMerchantDelta: DataFrame, genderDelta: DataFrame,
      epochId: Option[Long] = None): Unit = {
    upsert(merchantDelta, "merchant_summary", "temp_mts_updates",
      Seq("merchant_id"), Seq("total_transactions"), epochId)
    upsert(custMerchantDelta, "customer_merchant_summary", "temp_cms_updates",
      Seq("customer_id", "merchant_id"),
      Seq("transaction_count", "total_amount_sum"), epochId)
    upsert(genderDelta, "merchant_gender_summary", "temp_mgs_updates",
      Seq("merchant_id"),
      Seq("male_transaction_count", "female_transaction_count"), epochId)
  }

  private def read(spark: SparkSession, table: String): DataFrame =
    spark.read.jdbc(url, table, props)

  override def merchantSummary(spark: SparkSession): DataFrame =
    read(spark, "merchant_summary").drop("last_updated")
  override def custMerchantSummary(spark: SparkSession): DataFrame =
    read(spark, "customer_merchant_summary").drop("last_updated")
  override def genderSummary(spark: SparkSession): DataFrame =
    read(spark, "merchant_gender_summary").drop("last_updated")

  /** Pruned state read — the key predicate is pushed into the JDBC scan
    * (shows up as a WHERE on the remote side), so per-batch state IO is
    * O(batch keys), not O(state). */
  override def merchantSummaryFor(spark: SparkSession,
      merchantIds: Seq[String]): DataFrame = {
    val in = merchantIds.map(id => s"'${id.replace("'", "''")}'").mkString(",")
    val pred = if (in.isEmpty) "1=0" else s"merchant_id IN ($in)"
    spark.read.jdbc(url, "merchant_summary", Array(pred), props)
      .drop("last_updated")
  }

  override def close(): Unit =
    try DriverManager.getConnection(s"$url;shutdown=true").close()
    catch { case _: java.sql.SQLException => () } // Derby signals shutdown via exception
}

object JdbcUpsertStore {
  /** Embedded Derby store under the given directory. */
  def derby(dir: String): JdbcUpsertStore = {
    val s = new JdbcUpsertStore(s"jdbc:derby:$dir;create=true")
    s.init()
    s
  }

  /** In-memory Derby (no fsync per merge) — the right mode when state
    * durability is delegated to checkpoint + replay rather than the
    * store itself. */
  def derbyMemory(name: String): JdbcUpsertStore = {
    val s = new JdbcUpsertStore(s"jdbc:derby:memory:$name;create=true")
    s.init()
    s
  }
}
