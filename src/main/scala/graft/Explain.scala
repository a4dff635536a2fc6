package graft

import graft.asl.Asl
import graft.core.EvalContext
import graft.planner.Planner
import graft.sources.Datapoints
import org.apache.spark.sql.SparkSession

/**
 * Plan diagnostic: prints the physical plan of an ASL query with the scan /
 * filter / exchange lines highlighted, for verifying that tag predicates
 * push down to the parquet scan and shuffles land where expected.
 *
 *   sbt "runMain graft.Explain name,click,:eq,:sum [sfDir]"
 */
object Explain {

  def main(args: Array[String]): Unit = {
    val program = if (args.nonEmpty) args(0) else "name,click,:eq,:sum"
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val f = Planner.eval(Asl.parse(program), Datapoints.events(spark, sfDir), EvalContext.testdata)
    println(s"=== $program ===")
    f.df.explain("formatted")
    spark.stop()
  }
}
