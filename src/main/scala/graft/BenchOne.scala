package graft

import org.apache.spark.sql.SparkSession

/** Time a single catalog query (diagnostics): sbt "runMain graft.BenchOne <name> [sfDir] [explain]" */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    if (args.length > 2) df.explain("formatted")
    val t0 = System.nanoTime()
    df.write.mode("overwrite").format("noop").save()
    println(f"TIMING $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    spark.stop()
  }
}
