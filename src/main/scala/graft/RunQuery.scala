package graft

import org.apache.spark.sql.SparkSession

/** Runs ONE registered query end to end and prints the row count — the
  * single-query debugging loop Bench can't give (it swallows stacks):
  *
  *   sbt "runMain graft.RunQuery <name> [sfDir] [outDir]"
  *
  * With a third arg, also writes the result to <outDir>/<name> and the
  * query's oracle SQL to <outDir>/oracle_sql.json so tools/check.py can
  * compare just this query against DuckDB.
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val outDir = if (args.length > 2) Some(args(2)) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    // SPARK_GRAFT_EXPLAIN=1: dump the formatted physical plan before
    // executing — the per-operator plan-audit loop (exchange count,
    // PushedFilters, WholeStageCodegen spans)
    if (sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1"))
      println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    outDir match {
      case Some(out) =>
        df.coalesce(1).write.mode("overwrite").parquet(s"$out/$name")
        // evaluate ONLY this query's oracle: each dynamic thunk trains
        // its own model, and a one-query run should not pay the other
        // six driver-side fits
        val sql = SparkEntry.dynamicOracles.get(name)
          .map(f => f(spark, sfDir))
          .orElse(SparkEntry.oracleSql.get(name)).map(s =>
          "{\"" + name + "\": \"" + s.replace("\\", "\\\\").replace("\"", "\\\"")
            .replace("\n", "\\n").replace("\t", "\\t") + "\"}").getOrElse("{}")
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$out/oracle_sql.json"), sql)
        println(s"[runquery] $name: written to $out")
      case None =>
        val t0 = System.nanoTime()
        val n = df.queryExecution.toRdd.count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"[runquery] $name: $n rows in $sec%.2f s")
    }
    spark.stop()
  }
}
