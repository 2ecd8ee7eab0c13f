package graft

import graft.state.JdbcUpsertStore
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalatest.funsuite.AnyFunSuite

/** Derby-backed state store: additive merge semantics (K2/K3/J5/A7) and
  * the batch-vs-stream parity invariant (SURVEY.md §5.3): state after N
  * incremental batches equals a one-shot whole-table aggregation. */
class StateSpec extends AnyFunSuite {
  import SparkTestSession.{sf, spark}

  private def freshStore(tag: String) =
    JdbcUpsertStore.derby(s"target/derby-test-$tag-${System.nanoTime()}")

  private def txWithBucket(n: Int) =
    Tables.transactions(spark, sf).withColumn("b", pmod(col("customer"), lit(n)))

  private def deltas(df: org.apache.spark.sql.DataFrame) = (
    df.groupBy(col("merchant").cast("string").as("merchant_id"))
      .agg(count(lit(1)).as("total_transactions")),
    df.groupBy(col("customer").cast("string").as("customer_id"),
        col("merchant").cast("string").as("merchant_id"))
      .agg(count(lit(1)).as("transaction_count"),
        sum(col("amount").cast(DecimalType(18, 2))).as("total_amount_sum")),
    df.groupBy(col("merchant").cast("string").as("merchant_id"))
      .agg(sum(when(col("gender") === "M", 1L).otherwise(0L)).as("male_transaction_count"),
        sum(when(col("gender") === "F", 1L).otherwise(0L)).as("female_transaction_count")))

  test("N incremental batches == one-shot aggregation (additive merge)") {
    val store = freshStore("parity")
    try {
      val tx = txWithBucket(3).cache()
      for (b <- 0 until 3) {
        val (m, cm, g) = deltas(tx.filter(col("b") === b))
        store.applyDeltas(m, cm, g)
      }
      val (me, cme, ge) = deltas(tx)
      val gotM = store.merchantSummary(spark)
      assert(gotM.exceptAll(me).isEmpty && me.exceptAll(gotM).isEmpty)
      val gotCm = store.custMerchantSummary(spark)
        .withColumn("total_amount_sum", col("total_amount_sum").cast(DecimalType(28, 2)))
      val wantCm = cme.withColumn("total_amount_sum",
        col("total_amount_sum").cast(DecimalType(28, 2)))
      assert(gotCm.exceptAll(wantCm).isEmpty && wantCm.exceptAll(gotCm).isEmpty)
      val gotG = store.genderSummary(spark)
      assert(gotG.exceptAll(ge).isEmpty && ge.exceptAll(gotG).isEmpty)
    } finally store.close()
  }

  test("a wide-decimal delta keeps its cents (DerbyDialect precision>31 cap)") {
    // sum(sum(DECIMAL(18,2))) = DECIMAL(38,2): without the store-side
    // coercion to the DDL's DECIMAL(18,2), Spark's DerbyDialect maps the
    // temp column to DECIMAL(31,0) and the cents vanish
    val store = freshStore("widecents")
    try {
      import spark.implicits._
      val wide = Seq(("c1", "m1", 2L, BigDecimal("123.45")))
        .toDF("customer_id", "merchant_id", "transaction_count", "total_amount_sum")
        .withColumn("total_amount_sum",
          col("total_amount_sum").cast(DecimalType(38, 2)))
      val (m, _, g) = deltas(txWithBucket(2).filter(col("b") === 0).limit(1))
      store.applyDeltas(m, wide, g)
      store.applyDeltas(m, wide, g) // accumulate once more: 246.90
      val got = store.custMerchantSummary(spark)
        .filter(col("customer_id") === "c1")
        .select(col("total_amount_sum").cast("string")).collect()
      assert(got.map(_.getString(0)).toSeq == Seq("246.90"))
    } finally store.close()
  }

  test("at-least-once default double-counts a replayed batch (reference parity)") {
    val store = freshStore("alo")
    try {
      val (m, cm, g) = deltas(txWithBucket(3).filter(col("b") === 0))
      store.applyDeltas(m, cm, g)
      store.applyDeltas(m, cm, g) // replay
      val doubled = store.merchantSummary(spark)
        .join(m.withColumnRenamed("total_transactions", "once"), Seq("merchant_id"))
        .filter(col("total_transactions") =!= col("once") * 2)
      assert(doubled.count() == 0)
    } finally store.close()
  }

  test("epoch-fenced mode is idempotent under replay") {
    val store = freshStore("idem")
    try {
      val (m, cm, g) = deltas(txWithBucket(3).filter(col("b") === 0))
      store.applyDeltas(m, cm, g, Some(7L))
      store.applyDeltas(m, cm, g, Some(7L)) // same epoch: fenced out
      val changed = store.merchantSummary(spark)
        .join(m.withColumnRenamed("total_transactions", "once"), Seq("merchant_id"))
        .filter(col("total_transactions") =!= col("once"))
      assert(changed.count() == 0)
    } finally store.close()
  }

  test("pruned read returns exactly the requested keys") {
    val store = freshStore("prune")
    try {
      val (m, cm, g) = deltas(txWithBucket(1))
      store.applyDeltas(m, cm, g)
      val keys = m.select("merchant_id").limit(3).collect().map(_.getString(0)).toSeq
      val got = store.merchantSummaryFor(spark, keys)
      assert(got.count() == keys.size)
      assert(got.select("merchant_id").collect().map(_.getString(0)).toSet == keys.toSet)
      // the two other pruned reads: every returned row is for a requested
      // merchant, and every requested merchant with state shows up
      val gotCm = store.custMerchantSummaryFor(spark, keys)
      assert(gotCm.select("merchant_id").distinct().collect()
        .map(_.getString(0)).toSet == keys.toSet)
      val gotG = store.genderSummaryFor(spark, keys)
      assert(gotG.select("merchant_id").collect()
        .map(_.getString(0)).toSet == keys.toSet)
      // empty key list → empty frame, not a full scan
      assert(store.merchantSummaryFor(spark, Nil).isEmpty)
    } finally store.close()
  }

  test("semi-join pruned read (wide batches) returns the same rows as the IN-list form") {
    // threshold 0 forces every pruned read through the keys-temp-table
    // semi-join — the O(1)-statement path wide batches take
    val dir = s"target/derby-test-semijoin-${System.nanoTime()}"
    val store = new graft.state.JdbcUpsertStore(
      s"jdbc:derby:$dir;create=true", semiJoinKeyThreshold = 0)
    store.init()
    try {
      val (m, cm, g) = deltas(txWithBucket(1))
      store.applyDeltas(m, cm, g)
      val keys = m.select("merchant_id").collect().map(_.getString(0)).toSeq
      val some = keys.take(7)
      val gotM = store.merchantSummaryFor(spark, some)
      val wantM = m.filter(col("merchant_id").isin(some: _*))
      assert(gotM.exceptAll(wantM).isEmpty && wantM.exceptAll(gotM).isEmpty)
      val gotCm = store.custMerchantSummaryFor(spark, some)
      assert(gotCm.select("merchant_id").distinct().collect()
        .map(_.getString(0)).toSet == some.toSet)
      assert(store.merchantSummaryFor(spark, Nil).isEmpty)
    } finally store.close()
  }

  test("dialect golden strings: postgresql URL → ON CONFLICT, Derby → MERGE INTO") {
    // a jdbc:postgresql: store must emit the reference's upsert form —
    // PG14 has no MERGE ("Mechanism Y.py":152-160); constructing the
    // store does not connect, so the SQL shape is testable without PG
    val pg = new JdbcUpsertStore("jdbc:postgresql://host/db")
    val pgSql = pg.upsertSql("customer_merchant_summary", "temp_cms_updates",
      Seq("customer_id", "merchant_id"), Seq("transaction_count", "total_amount_sum"))
    assert(pgSql.contains("ON CONFLICT (customer_id, merchant_id) DO UPDATE"))
    assert(pgSql.contains(
      "total_amount_sum = COALESCE(customer_merchant_summary.total_amount_sum, 0) " +
        "+ COALESCE(EXCLUDED.total_amount_sum, 0)"))
    assert(!pgSql.contains("MERGE INTO"))
    assert(pg.fenceStatement("merchant_summary", 7L)
      .contains("ON CONFLICT (table_name, epoch_id) DO NOTHING"))

    val derby = freshStore("dialect")
    try {
      val dSql = derby.upsertSql("merchant_summary", "temp_mts_updates",
        Seq("merchant_id"), Seq("total_transactions"))
      assert(dSql.contains("MERGE INTO merchant_summary"))
      assert(dSql.contains("t.total_transactions = t.total_transactions + s.\"total_transactions\""))
      assert(!dSql.contains("ON CONFLICT"))
      assert(derby.fenceStatement("merchant_summary", 7L).contains("WHERE NOT EXISTS"))
    } finally derby.close()
  }

  test("fence + merge are one transaction: a failed merge leaves the epoch replayable") {
    val dir = s"target/derby-test-atomic-${System.nanoTime()}"
    val store = JdbcUpsertStore.derby(dir)
    def raw(sql: String): Unit = {
      val c = java.sql.DriverManager.getConnection(s"jdbc:derby:$dir")
      try { val st = c.createStatement(); try st.executeUpdate(sql) finally st.close() }
      finally c.close()
    }
    try {
      val (m, cm, g) = deltas(txWithBucket(3).filter(col("b") === 0))
      // break the merge target AFTER init: the fence insert will succeed,
      // then the merge throws — with two autocommitted statements the
      // epoch would now be permanently fenced out and the delta lost
      raw("RENAME TABLE merchant_summary TO merchant_summary_bak")
      intercept[Exception] { store.applyDeltas(m, cm, g, Some(5L)) }
      raw("RENAME TABLE merchant_summary_bak TO merchant_summary")
      // replaying the SAME epoch must apply (fence was rolled back)
      store.applyDeltas(m, cm, g, Some(5L))
      val gotM = store.merchantSummary(spark)
      assert(gotM.exceptAll(m).isEmpty && m.exceptAll(gotM).isEmpty)
    } finally store.close()
  }
}
