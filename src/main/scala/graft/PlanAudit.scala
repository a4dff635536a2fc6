package graft

import org.apache.spark.sql.SparkSession

/**
 * Whole-catalog plan audit: executes every catalog query at a small SF with
 * broadcast joins disabled (the 100 TB join shape) and prints one line per
 * query with its DISTINCT shuffle-exchange count from the FINAL adaptive
 * plan — the same counting rule PlanBudgetSpec pins for the hottest
 * queries. Sorted descending, so plan outliers (a query whose exchange
 * count exceeds its semantic step count) surface at the top.
 *
 *   sbt "runMain graft.PlanAudit [sfDir]"
 */
object PlanAudit {

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def shuffles(plan: org.apache.spark.sql.execution.SparkPlan): Int = {
      import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
      import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeLike}
      plan match {
        case a: AdaptiveSparkPlanExec => shuffles(a.executedPlan)
        case q: QueryStageExec        => shuffles(q.plan)
        case _: ReusedExchangeExec    => 0
        case s: ShuffleExchangeLike   => 1 + s.children.map(shuffles).sum
        case other                    => other.children.map(shuffles).sum
      }
    }

    val rows = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        df.collect() // finalize AQE
        Some(name -> shuffles(df.queryExecution.executedPlan))
      } catch {
        case e: Throwable =>
          System.err.println(s"AUDIT FAIL $name: ${e.getMessage}"); None
      }
    }
    rows.sortBy(-_._2).foreach { case (n, c) => println(f"$c%3d  $n") }
    println(f"TOTAL ${rows.map(_._2).sum} exchanges over ${rows.size} queries")
    spark.stop()
  }
}
