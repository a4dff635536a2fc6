package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Adapters from the driver's parquet testdata to the engine's canonical
 * datapoint frame: `tags: map<string,string>`, `ts: long (epoch ms)`,
 * `value: double` (FIXTURES.md §1/§4).
 *
 * The tags map is constructed from plain columns, so Catalyst still pushes
 * tag-key predicates down to the parquet scan (the map is built after the
 * filter once the optimizer collapses the projection).
 */
object Datapoints {

  /** Read options needed for the testdata (events.ts is parquet TIMESTAMP(NANOS)). */
  def configure(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

  /**
   * events table as datapoints:
   *   name = event_type, usr = zero-padded user id, grp = user id mod 5,
   *   hi   = "y" only when value > 300 (an optional tag, for :has tests).
   * `ts` arrives as nanoseconds (long) and is floored to milliseconds with
   * integer arithmetic — nanos exceed 2^53 so double math would lose
   * precision.
   */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    configure(spark)
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
    ev.select(
      map_filter(
        map(
          lit("name"), col("event_type"),
          lit("usr"), concat(lit("u"), lpad(col("user_id").cast("string"), 3, "0")),
          lit("grp"), concat(lit("g"), pmod(col("user_id"), lit(5)).cast("string")),
          lit("hi"), when(col("value") > 300, lit("y")).otherwise(lit(null: String))
        ),
        (_, v) => v.isNotNull
      ).as("tags"),
      expr("ts div 1000000").as("ts"),
      col("value").as("value")
    )
  }

  /**
   * lineitem table as datapoints: one series per (returnflag, linestatus),
   * value = extendedprice, timestamp = shipdate.
   */
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = {
    configure(spark)
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    li.select(
      map(
        lit("name"), lit("lineitem"),
        lit("returnflag"), col("l_returnflag"),
        lit("linestatus"), col("l_linestatus")
      ).as("tags"),
      unix_millis(col("l_shipdate")).as("ts"),
      col("l_extendedprice").as("value")
    )
  }
}
