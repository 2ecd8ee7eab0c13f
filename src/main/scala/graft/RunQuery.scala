package graft

import org.apache.spark.sql.SparkSession

/** Runs ONE registered query end to end and prints the row count — the
  * single-query debugging loop Bench can't give (it swallows stacks):
  *
  *   sbt "runMain graft.RunQuery <name> [sfDir]"
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val n = SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
    println(s"[runquery] $name: $n rows")
    spark.stop()
  }
}
