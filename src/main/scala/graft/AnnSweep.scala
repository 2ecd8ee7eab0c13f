package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One-off knob sweep for the residual IVF-PQ sizing rule: measures
  * recall@k + warm latency for candidate (m, nCodes, refine, nProbe)
  * configs on a given corpus, against the brute truth. This is the
  * measurement loop behind [[graft.llm.Vectors.scaledPqKnobs]] — the
  * committed ANN_RECALL.json ladder records the chosen rule; this
  * records why it was chosen, and prints the rule's own pick (RULE
  * line) beside the swept candidates so the harness stays honest.
  *
  *   sbt "runMain graft.AnnSweep <dir> m8:c256:r256,m16:c64:r32,..."
  */
object AnnSweep {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val configs = args(1).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$dir/embeddings.parquet").count()

    import graft.llm.Vectors
    val n = Vectors.nVectors(spark, dir)
    val cells = Vectors.scaledCells(n)
    val ts = Vectors.trainSampleFor(cells)

    def topkSets(df: DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (q, v) => q -> v.map(_._2).toSet }

    println(f"TIGHTNESS cells=$cells v=${Vectors.assignmentTightness(spark, dir, cells, ts)}%.4f " +
      f"c16=${Vectors.assignmentTightness(spark, dir, 16)}%.4f probe=${Vectors.promotedProbe(spark, dir, cells, ts)}")
    val (rm, rc, rr) = Vectors.scaledPqKnobs(n, dim = 64)
    println(s"RULE n=$n cells=$cells m=$rm c=$rc r=$rr " +
      s"p=${Vectors.promotedProbe(spark, dir, cells, ts)}")
    val truth = topkSets(Vectors.simTopK(spark, dir))
    configs.foreach { cfg =>
      val kv = cfg.split(":").map { t =>
        (t.head.toString, t.tail.takeWhile(_.isDigit).toInt)
      }.toMap
      val m = kv.getOrElse("m", 8)
      val c = kv.getOrElse("c", 64)
      val r = kv.getOrElse("r", 32)
      val p = kv.getOrElse("p", Int.MaxValue)
      def run() = Vectors.simTopKIvfPq(spark, dir, nCells = cells, m = m,
        nCodes = c, refine = r, trainSample = ts, nProbe = p)
      val t0 = System.nanoTime()
      val got = topkSets(run())
      val first = (System.nanoTime() - t0) / 1e9
      val recall = truth.keys.toSeq.map { q =>
        got.getOrElse(q, Set.empty).intersect(truth(q)).size.toDouble /
          truth(q).size
      }.sum / truth.size
      val t1 = System.nanoTime()
      run().queryExecution.toRdd.count()
      val warm = (System.nanoTime() - t1) / 1e9
      println(f"SWEEP $cfg cells=$cells recall=$recall%.4f warm=$warm%.3f first=$first%.3f")
    }
    spark.stop()
  }
}
