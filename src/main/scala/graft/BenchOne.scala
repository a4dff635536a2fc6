package graft

import org.apache.spark.sql.SparkSession

/** Time a single catalog query (diagnostics): sbt "runMain graft.BenchOne <name> [sfDir] [explain]" */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val builder = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      // match graft.Bench's small-frame parallelism floor (see Bench.scala)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PART_SIZE", "64k"))
    // experiment hook: GRAFT_CONF="k=v;k2=v2" applies extra spark confs
    sys.env.get("GRAFT_CONF").foreach(_.split(';').filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); builder.config(k, v) })
    val spark = builder
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
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
