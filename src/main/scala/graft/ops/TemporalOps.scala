package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join/segmentation operators the reference engine lacks and
  * Spark has no built-in operator for, each composed from existing
  * Catalyst operators (the brief's preference (a)) so the optimizer keeps
  * full visibility: as-of join, bounded range join, and gap-based
  * sessionization. Every query here has a DuckDB oracle in
  * [[graft.SparkEntry.oracleSql]].
  *
  * Scale notes up front, since these are the shapes that go quadratic
  * when written naively:
  *   - [[asofJoin]] is the union+window formulation: ONE shuffle on the
  *     join keys, a sort within each partition, zero row multiplication.
  *     The naive formulation (theta-join on `build.t <= probe.t` + keep
  *     latest) explodes to O(|probe|·|build|) pairs per key before
  *     pruning; this one never materializes a pair at all.
  *   - [[rangeJoinClicks]] is an equi+band join: the equi key drives a
  *     hash shuffle and the band predicate filters inside the sorted
  *     partition — no BroadcastNestedLoopJoin. A keyless band join would
  *     instead bucket time into band-width bins and equi-join on the bin
  *     (each probe checks its own and adjacent bins), same technique as
  *     [[graft.llm.Dedup]]'s banded joins.
  *   - [[sessionize]] is two window passes over one shuffle on user_id
  *     (lag → break flags → running sum), then a hash agg on
  *     (user, session) that reuses the same partitioning.
  */
object TemporalOps {

  private val tsFmt = "yyyy-MM-dd HH:mm:ss"

  /** As-of join (pandas `merge_asof` / Flink temporal-join semantics,
    * backward direction): for every probe row, attach the single latest
    * build row with the same `keys` and `build.timeCol <= probe.timeCol`.
    *
    * Formulation: union the two sides (probe columns ∪ build columns,
    * nulls elsewhere), sort each key partition by (time, side, tiebreak)
    * with build rows ordered BEFORE probe rows at equal time (`<=`
    * semantics), and carry the latest build row forward with
    * `last(struct(...), ignoreNulls)` over an unbounded-preceding row
    * frame. The struct keeps all attached columns from the SAME build
    * row (independent per-column `last` calls could mix rows when build
    * columns contain nulls). `tiebreak` makes the choice among build
    * rows with identical (key, time) deterministic: the greatest wins.
    *
    * Probe rows with no prior build row keep null attached columns
    * (left-join semantics).
    */
  def asofJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
      probeTime: String, buildTime: String, tiebreak: String,
      attach: Seq[String]): DataFrame = {
    val probeCols = probe.columns.toSeq
    val b = build.select(
      (keys.map(col) :+ col(buildTime).as("__t")) ++
        attach.map(c => col(c).as(s"__b_$c")): _*)
      .withColumn("__is_probe", lit(0))
    val p = probe.withColumn("__t", col(probeTime)).withColumn("__is_probe", lit(1))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__is_probe").asc,
        col(s"__b_$tiebreak").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val lastBuild = last(
      when(col("__is_probe") === 0, struct(attach.map(c => col(s"__b_$c").as(c)): _*)),
      ignoreNulls = true).over(w)
    p.unionByName(b, allowMissingColumns = true)
      .withColumn("__last", lastBuild)
      .filter(col("__is_probe") === 1)
      .select(probeCols.map(col) ++
        attach.map(c => col(s"__last.$c").as(s"asof_$c")): _*)
  }

  /** Registered query: each purchase event picks up the same user's
    * latest view event at or before the purchase time. */
  def asofViewBeforePurchase(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id"))
    asofJoin(purchases, views, Seq("user_id"), "ts", "ts", "event_id",
        Seq("event_id", "ts"))
      .select(
        col("purchase_id"), col("user_id"),
        date_format(col("ts"), tsFmt).as("purchase_ts"),
        col("asof_event_id").as("view_id"),
        date_format(col("asof_ts"), tsFmt).as("view_ts"))
  }

  /** The same query through the native operator
    * ([[graft.plans.AsofJoinPlan]]): custom LogicalPlan → Strategy →
    * sort-merge AsofJoinExec. Shares [[asofViewBeforePurchaseSql]] as its
    * oracle, so the whole-operator extension is hash-checked against
    * DuckDB like every composed query. */
  def asofViewBeforePurchaseNative(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id"))
    graft.plans.AsofJoinPlan.asof(purchases, views, Seq("user_id"), "ts", "ts",
        "event_id", Seq("event_id", "ts"))
      .select(
        col("purchase_id"), col("user_id"),
        date_format(col("ts"), tsFmt).as("purchase_ts"),
        col("asof_event_id").as("view_id"),
        date_format(col("asof_ts"), tsFmt).as("view_ts"))
  }

  /** As-of join, FORWARD direction (pandas `merge_asof(direction=
    * 'forward')`): for every probe row, attach the single EARLIEST build
    * row with the same `keys` and `build.timeCol >= probe.timeCol`.
    * Mirror of [[asofJoin]]: same union + one-shuffle window formulation,
    * with the partition sorted by time DESCENDING so the running
    * `last(ignoreNulls)` carries the nearest future build row backward
    * onto each probe. Among build rows at identical (key, time) the
    * greatest `tiebreak` wins, matching the backward direction. */
  def asofJoinForward(probe: DataFrame, build: DataFrame, keys: Seq[String],
      probeTime: String, buildTime: String, tiebreak: String,
      attach: Seq[String]): DataFrame = {
    val probeCols = probe.columns.toSeq
    val b = build.select(
      (keys.map(col) :+ col(buildTime).as("__t")) ++
        attach.map(c => col(c).as(s"__b_$c")): _*)
      .withColumn("__is_probe", lit(0))
    val p = probe.withColumn("__t", col(probeTime)).withColumn("__is_probe", lit(1))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").desc, col("__is_probe").asc,
        col(s"__b_$tiebreak").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val firstBuild = last(
      when(col("__is_probe") === 0, struct(attach.map(c => col(s"__b_$c").as(c)): _*)),
      ignoreNulls = true).over(w)
    p.unionByName(b, allowMissingColumns = true)
      .withColumn("__next", firstBuild)
      .filter(col("__is_probe") === 1)
      .select(probeCols.map(col) ++
        attach.map(c => col(s"__next.$c").as(s"asof_$c")): _*)
  }

  /** As-of join, NEAREST direction (pandas `merge_asof(direction=
    * 'nearest')`): attach whichever of the backward and forward matches
    * is closer in time; exact-distance ties (including a build row AT the
    * probe time) resolve BACKWARD. One shuffle on the keys, two in-
    * partition sorts (asc + desc) over the same union frame — never a
    * row-multiplying time-range join. `timeCol` of the attached build
    * row must be in `attach` (the distance is computed from it). */
  def asofJoinNearest(probe: DataFrame, build: DataFrame, keys: Seq[String],
      probeTime: String, buildTime: String, tiebreak: String,
      attach: Seq[String]): DataFrame = {
    val probeCols = probe.columns.toSeq
    val b = build.select(
      (keys.map(col) :+ col(buildTime).as("__t")) ++
        attach.map(c => col(c).as(s"__b_$c")): _*)
      .withColumn("__is_probe", lit(0))
    val p = probe.withColumn("__t", col(probeTime)).withColumn("__is_probe", lit(1))
    def w(desc: Boolean) = {
      val t = if (desc) col("__t").desc else col("__t").asc
      Window.partitionBy(keys.map(col): _*)
        .orderBy(t, col("__is_probe").asc, col(s"__b_$tiebreak").asc_nulls_first)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    }
    val buildStruct = when(col("__is_probe") === 0,
      struct((col("__t").as("__bt") +: attach.map(c => col(s"__b_$c").as(c))): _*))
    val back = last(buildStruct, ignoreNulls = true).over(w(desc = false))
    val fwd = last(buildStruct, ignoreNulls = true).over(w(desc = true))
    // distance axis: timestamps compare as epoch micros; any other time
    // type (numeric ticks — the backward/forward variants accept them,
    // so nearest must too) subtracts directly
    val axis: Column => Column =
      probe.schema(probeTime).dataType match {
        case org.apache.spark.sql.types.TimestampType => unix_micros(_)
        case _ => identity
      }
    val backD = axis(col("__t")) - axis(col("__back.__bt"))
    val fwdD = axis(col("__fwd.__bt")) - axis(col("__t"))
    val chosen = when(col("__back").isNull, col("__fwd"))
      .when(col("__fwd").isNull, col("__back"))
      .when(fwdD < backD, col("__fwd"))
      .otherwise(col("__back")) // tie → backward
    p.unionByName(b, allowMissingColumns = true)
      .withColumn("__back", back)
      .withColumn("__fwd", fwd)
      .filter(col("__is_probe") === 1)
      .withColumn("__near", chosen)
      .select(probeCols.map(col) ++
        attach.map(c => col(s"__near.$c").as(s"asof_$c")): _*)
  }

  /** Registered query (forward): each purchase picks up the same user's
    * EARLIEST view at or after the purchase time. */
  def asofViewAfterPurchase(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id"))
    asofJoinForward(purchases, views, Seq("user_id"), "ts", "ts", "event_id",
        Seq("event_id", "ts"))
      .select(
        col("purchase_id"), col("user_id"),
        date_format(col("ts"), tsFmt).as("purchase_ts"),
        col("asof_event_id").as("view_id"),
        date_format(col("asof_ts"), tsFmt).as("view_ts"))
  }

  val asofViewAfterPurchaseSql: String =
    """WITH p AS (SELECT event_id AS purchase_id, user_id, ts FROM events WHERE event_type = 'purchase'),
      |v AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'),
      |j AS (
      |  SELECT p.purchase_id, p.user_id, p.ts AS pts, v.event_id AS vid, v.ts AS vts,
      |    row_number() OVER (PARTITION BY p.purchase_id
      |      ORDER BY v.ts ASC NULLS LAST, v.event_id DESC NULLS LAST) AS rn
      |  FROM p LEFT JOIN v ON v.user_id = p.user_id AND v.ts >= p.ts)
      |SELECT purchase_id, user_id,
      |  strftime(pts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
      |  vid AS view_id,
      |  strftime(vts, '%Y-%m-%d %H:%M:%S') AS view_ts
      |FROM j WHERE rn = 1""".stripMargin

  /** Registered query (nearest): each purchase picks up the same user's
    * view CLOSEST in time, ties resolved backward. */
  def asofViewNearestPurchase(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id"))
    asofJoinNearest(purchases, views, Seq("user_id"), "ts", "ts", "event_id",
        Seq("event_id", "ts"))
      .select(
        col("purchase_id"), col("user_id"),
        date_format(col("ts"), tsFmt).as("purchase_ts"),
        col("asof_event_id").as("view_id"),
        date_format(col("asof_ts"), tsFmt).as("view_ts"))
  }

  /** Oracle mirror of the nearest semantics: min |Δt| first, then the
    * backward side (v.ts <= p.ts), then greatest event_id — exactly the
    * engine's per-side max-tiebreak + tie-to-backward resolution. */
  val asofViewNearestPurchaseSql: String =
    """WITH p AS (SELECT event_id AS purchase_id, user_id, ts FROM events WHERE event_type = 'purchase'),
      |v AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'),
      |j AS (
      |  SELECT p.purchase_id, p.user_id, p.ts AS pts, v.event_id AS vid, v.ts AS vts,
      |    row_number() OVER (PARTITION BY p.purchase_id
      |      ORDER BY abs(epoch_us(v.ts) - epoch_us(p.ts)) ASC NULLS LAST,
      |        CASE WHEN v.ts <= p.ts THEN 0 ELSE 1 END ASC,
      |        v.event_id DESC NULLS LAST) AS rn
      |  FROM p LEFT JOIN v ON v.user_id = p.user_id)
      |SELECT purchase_id, user_id,
      |  strftime(pts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
      |  vid AS view_id,
      |  strftime(vts, '%Y-%m-%d %H:%M:%S') AS view_ts
      |FROM j WHERE rn = 1""".stripMargin

  /** As-of join with a TOLERANCE bound (pandas `merge_asof(tolerance=…)`
    * semantics): the latest view before each purchase counts only if it
    * happened within `toleranceMinutes`; staler matches become NULL.
    * Because build rows at a probe are ordered by time, "latest match
    * outside tolerance" implies every other match is too — so the bound
    * is a null-out of the plain as-of result, not a different join (no
    * extra shuffle, same one window pass). */
  def asofViewWithinTolerance(spark: SparkSession, dir: String,
      toleranceMinutes: Int = 30): DataFrame = {
    val ev = Tables.events(spark, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id"))
    val inTol = col("asof_ts") >=
      col("ts") - expr(s"INTERVAL $toleranceMinutes MINUTES")
    asofJoin(purchases, views, Seq("user_id"), "ts", "ts", "event_id",
        Seq("event_id", "ts"))
      .select(
        col("purchase_id"), col("user_id"),
        date_format(col("ts"), tsFmt).as("purchase_ts"),
        when(inTol, col("asof_event_id")).as("view_id"),
        when(inTol, date_format(col("asof_ts"), tsFmt)).as("view_ts"))
  }

  def asofViewWithinToleranceSql(toleranceMinutes: Int = 30): String =
    s"""WITH p AS (SELECT event_id AS purchase_id, user_id, ts FROM events WHERE event_type = 'purchase'),
       |v AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'),
       |j AS (
       |  SELECT p.purchase_id, p.user_id, p.ts AS pts, v.event_id AS vid, v.ts AS vts,
       |    row_number() OVER (PARTITION BY p.purchase_id
       |      ORDER BY v.ts DESC NULLS LAST, v.event_id DESC NULLS LAST) AS rn
       |  FROM p LEFT JOIN v ON v.user_id = p.user_id AND v.ts <= p.ts
       |    AND v.ts >= p.ts - INTERVAL $toleranceMinutes MINUTE)
       |SELECT purchase_id, user_id,
       |  strftime(pts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
       |  vid AS view_id,
       |  strftime(vts, '%Y-%m-%d %H:%M:%S') AS view_ts
       |FROM j WHERE rn = 1""".stripMargin

  val asofViewBeforePurchaseSql: String =
    """WITH p AS (SELECT event_id AS purchase_id, user_id, ts FROM events WHERE event_type = 'purchase'),
      |v AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'),
      |j AS (
      |  SELECT p.purchase_id, p.user_id, p.ts AS pts, v.event_id AS vid, v.ts AS vts,
      |    row_number() OVER (PARTITION BY p.purchase_id
      |      ORDER BY v.ts DESC NULLS LAST, v.event_id DESC NULLS LAST) AS rn
      |  FROM p LEFT JOIN v ON v.user_id = p.user_id AND v.ts <= p.ts)
      |SELECT purchase_id, user_id,
      |  strftime(pts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
      |  vid AS view_id,
      |  strftime(vts, '%Y-%m-%d %H:%M:%S') AS view_ts
      |FROM j WHERE rn = 1""".stripMargin

  /** Bounded range join: clicks within ±5 minutes of each purchase by the
    * same user, counted per purchase. Left join so click-less purchases
    * report 0. */
  def rangeJoinClicks(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
        col("event_id").as("c_id"))
    p.join(c,
        c("c_user") === p("p_user") &&
        c("c_ts") >= p("p_ts") - expr("INTERVAL '5' MINUTE") &&
        c("c_ts") <= p("p_ts") + expr("INTERVAL '5' MINUTE"),
        "left_outer")
      .groupBy(col("purchase_id"), col("p_user").as("user_id"))
      .agg(count(col("c_id")).as("n_clicks"))
  }

  val rangeJoinClicksSql: String =
    """SELECT p.event_id AS purchase_id, p.user_id,
      |  CAST(count(c.event_id) AS BIGINT) AS n_clicks
      |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
      |LEFT JOIN (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
      |  ON c.user_id = p.user_id
      |  AND c.ts >= p.ts - INTERVAL 5 MINUTE
      |  AND c.ts <= p.ts + INTERVAL 5 MINUTE
      |GROUP BY 1, 2""".stripMargin

  /** Gap-based sessionization (batch form of the streaming sessionizer in
    * [[graft.streaming.EventStreams]]): a session breaks when a user is
    * idle longer than `gap`. Comparisons run on exact epoch microseconds
    * so both engines agree at the boundary. */
  def sessionize(spark: SparkSession, dir: String, gapSeconds: Long = 1800): DataFrame = {
    val perUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    Tables.events(spark, dir)
      .select(col("user_id"), col("ts"), col("value"))
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(perUser))
      .withColumn("brk",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapSeconds * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_seq",
        sum(col("brk")).over(perUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        date_format(min(col("ts")), tsFmt).as("session_start"),
        date_format(max(col("ts")), tsFmt).as("session_end"),
        RelOps.moneySum(col("value")).as("sum_value"))
  }

  /** Merge-on-read changelog snapshot — the core apply of every
    * upsert-capable lakehouse table format (Delta/Hudi/Iceberg MERGE,
    * Paimon changelog compaction): the events stream is read as a
    * changelog keyed by user (each event upserts the user's row;
    * `error` events are tombstones), and the snapshot is the LATEST
    * surviving row per key. One shuffle on the key, a per-key window
    * max — never a sort of the whole log, never a pairwise self-join;
    * at 100 TB the same plan runs per key-range partition, which is
    * exactly how the formats' compaction services shard it.
    * (event_id breaks ts ties so the snapshot is total-order
    * deterministic even where timestamps collide.) */
  def changelogSnapshot(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.fanOut(Tables.events(spark, dir))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("event_type") =!= "error")
      .select(col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("as_of"),
        col("event_type").as("last_op"),
        // decimal-quantize then back to DOUBLE (RelOps.moneySum recipe):
        // raw DECIMAL output hashes differently between engines' wire
        // canonicalizations; a 2-decimal double is bit-identical in both
        col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2))
          .cast("double").as("last_value"))
  }

  val changelogSnapshotSql: String =
    """WITH r AS (
      |  SELECT user_id, ts, event_type, value,
      |    CAST(row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts DESC, event_id DESC) AS BIGINT) AS rn
      |  FROM events)
      |SELECT user_id,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS as_of,
      |  event_type AS last_op,
      |  CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS last_value
      |FROM r WHERE rn = 1 AND event_type <> 'error'""".stripMargin

  /** SCD type-2 history build — the warehouse-canonical "versions with
    * validity intervals" derivation: each event opens a version of its
    * user's row valid from its own timestamp until the next event's
    * (lead), the newest version open-ended and flagged current. Same
    * single-shuffle-one-window shape as [[changelogSnapshot]]; the
    * interval columns come from lead() inside the sorted partition, so
    * history for a 100 TB log builds without any self-join. */
  def scd2History(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.fanOut(Tables.events(spark, dir))
      .withColumn("next_ts", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("event_type"),
        col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2))
          .cast("double").as("value"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("valid_from"),
        date_format(col("next_ts"), "yyyy-MM-dd HH:mm:ss").as("valid_to"),
        when(col("next_ts").isNull, 1).otherwise(0).as("is_current"))
  }

  val scd2HistorySql: String =
    """WITH l AS (
      |  SELECT user_id, event_type, value, ts,
      |    lead(ts) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS next_ts
      |  FROM events)
      |SELECT user_id, event_type,
      |  CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS value,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
      |  strftime(next_ts, '%Y-%m-%d %H:%M:%S') AS valid_to,
      |  CAST(CASE WHEN next_ts IS NULL THEN 1 ELSE 0 END AS INT) AS is_current
      |FROM l""".stripMargin

  /** Per-entity lag features — the feature-engineering pass every
    * sequence model trains on (time-since-previous, value delta):
    * one shuffle on the entity key, lag() inside the sorted partition,
    * exact arithmetic (epoch-second BIGINT difference; DECIMAL value
    * delta — float subtraction would be engine-order-dependent). Same
    * single-window shape as [[scd2History]]. */
  def lagFeatures(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val dec = org.apache.spark.sql.types.DecimalType(18, 2)
    Tables.fanOut(Tables.events(spark, dir))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("prev_value", lag(col("value").cast(dec), 1).over(w))
      .select(col("user_id"), col("event_id"), col("event_type"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("at"),
        // microsecond-exact difference then integer division: second-
        // truncating each endpoint first (unix_timestamp) disagrees
        // with the oracle by ±1 s whenever the fractional parts
        // straddle a second boundary
        expr("(unix_micros(ts) - unix_micros(prev_ts)) div 1000000")
          .as("secs_since_prev"),
        // exact decimal subtraction, then DOUBLE for cross-engine hashing
        (col("value").cast(dec) - col("prev_value")).cast("double")
          .as("delta_value"))
  }

  val lagFeaturesSql: String =
    """WITH l AS (
      |  SELECT user_id, event_id, event_type, ts, value,
      |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts,
      |    lag(CAST(value AS DECIMAL(18,2))) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS prev_value
      |  FROM events)
      |SELECT user_id, event_id, event_type,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS at,
      |  (epoch_us(ts) - epoch_us(prev_ts)) // 1000000 AS secs_since_prev,
      |  CAST(CAST(value AS DECIMAL(18,2)) - prev_value AS DOUBLE) AS delta_value
      |FROM l""".stripMargin

  val sessionizeSql: String =
    """WITH l AS (
      |  SELECT user_id, ts, value,
      |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
      |  FROM events),
      |g AS (
      |  SELECT user_id, ts, value,
      |    CAST(sum(CASE WHEN prev_ts IS NULL OR ts - prev_ts > INTERVAL 30 MINUTE
      |      THEN 1 ELSE 0 END) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      |  FROM l)
      |SELECT user_id, session_seq,
      |  CAST(count(*) AS BIGINT) AS n_events,
      |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
      |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS session_end,
      |  round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 2) AS sum_value
      |FROM g GROUP BY 1, 2""".stripMargin
}
