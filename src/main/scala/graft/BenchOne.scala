package graft

/** Time a single catalog query (diagnostics): sbt "runMain graft.BenchOne <name> [sfDir] [reps|explain]"
  *
  * Honors SPARK_GRAFT_CPUS like graft.Bench, so single-query
  * investigations reproduce catalog rows measured at any core count, and
  * GRAFT_CONF="k=v;k2=v2" for config A/Bs (both via Sessions). */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = Sessions.builder("graft-bench-one", Sessions.cpus()).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val ms = for {
          s <- si.submissionTime; c <- si.completionTime
        } yield c - s
        println(f"  STAGE ${si.stageId}%3d ${si.numTasks}%4d tasks ${ms.getOrElse(-1L)}%6d ms  ${si.name.takeWhile(_ != '(')}")
      }
    })
    if (args.contains("explain")) SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    val reps = if (args.length > 2 && args(2).nonEmpty && args(2).forall(_.isDigit)) args(2).toInt else 1
    for (i <- 1 to reps) {
      // build INSIDE the timer: several operators do bounded eager work at
      // construction (edge-count probe + driver union-find, LSH geometry
      // sizing) that graft.Bench's timed() also includes — timing only the
      // materialization would under-report them
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val tBuild = (System.nanoTime() - t0) / 1e9
      df.write.mode("overwrite").format("noop").save()
      val phases = df.queryExecution.tracker.phases
        .map { case (k, s) => f"$k=${s.durationMs}ms" }.mkString(" ")
      println(f"TIMING $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s (build=$tBuild%.2f) $phases")
    }
    spark.stop()
  }
}
