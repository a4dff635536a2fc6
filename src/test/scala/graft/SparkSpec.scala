package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (one JVM, one session). */
object TestSpark {
  lazy val spark: SparkSession = {
    // local[16] / shuffle.partitions=4: more executor threads drain the
    // suites' many small sequential stages faster (the r13 full run took
    // 24 min at local[4] and starved the driver's verify budget), while
    // the UNCHANGED shuffle partition count keeps every plan-shape and
    // partition-count assertion exactly as before.
    val s = SparkSession.builder()
      .master("local[16]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}

abstract class SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSpark.spark

  /** FileSourceScanExec leaves of an executed plan, AQE-unwrapped — the
    * shared walker for every plan-shape assertion (partition pruning,
    * table-scan counting). */
  protected def fileScans(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    p match {
      case a: AdaptiveSparkPlanExec => fileScans(a.executedPlan)
      case q: QueryStageExec        => fileScans(q.plan)
      case f: FileSourceScanExec    => Seq(f) ++ f.children.flatMap(fileScans)
      case other                    => other.children.flatMap(fileScans)
    }
  }
}
