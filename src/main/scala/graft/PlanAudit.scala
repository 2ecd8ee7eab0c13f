package graft

import org.apache.spark.sql.SparkSession

/** Prints the formatted physical plan of selected SparkEntry queries —
  * the `.explain("formatted")` iteration loop as a runnable main, so
  * plan regressions (a lost partial aggregate, an unexpected exchange, a
  * scan that stopped pruning columns) are inspectable per round:
  *
  *   sbt "runMain graft.PlanAudit [sfDir] [query ...]"
  *
  * With no query args, audits every registered query.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names) {
      println(s"\n========== $name ==========")
      SparkEntry.queries.get(name) match {
        case Some(fn) => fn(spark, sfDir).explain("formatted")
        case None => println(s"no such query: $name")
      }
    }
    spark.stop()
  }
}
