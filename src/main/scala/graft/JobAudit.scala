package graft

import org.apache.spark.sql.SparkSession

/** Per-query JOB/STAGE count audit (r21). The bench host's dominant
  * noise mode penalizes many-small-jobs shapes (the `canaryJobs` floor
  * swings 0.011→0.07 s/job in degraded windows), so a query's wall
  * time there is ≈ compute + jobs×floor: the job count is the lever
  * that defends the suite against scheduler-floor inflation — and at
  * cluster scale each job is a scheduling barrier anyway. Runs each
  * query once cold-ish then once warm, printing the WARM pass's job
  * and stage deltas (memos hot — the steady-state shape).
  *
  *   sbt "runMain graft.JobAudit /root/testdata/sf0.1 [query ...]"
  */
object JobAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sc = spark.sparkContext
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()

    @volatile var jobs = 0
    @volatile var stages = 0
    sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(
          j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs += 1; stages += j.stageInfos.size
      }
    })

    println(f"${"query"}%-34s ${"jobs"}%5s ${"stages"}%7s ${"warm_s"}%8s")
    for (n <- names) {
      try {
        // first pass: build memos so the counted pass is steady-state
        SparkEntry.queries(n)(spark, sfDir).queryExecution.toRdd.count()
        Thread.sleep(50) // let listener events drain
        val (j0, s0) = (jobs, stages)
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).queryExecution.toRdd.count()
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(50)
        println(f"$n%-34s ${jobs - j0}%5d ${stages - s0}%7d $sec%8.3f")
      } catch { case e: Throwable => println(s"$n FAILED: ${e.getClass.getSimpleName}") }
    }
    spark.stop()
  }
}
