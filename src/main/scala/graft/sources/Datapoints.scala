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

  /** Read options needed for the testdata: timestamps must resolve in UTC so
    * the epoch extracted from a TIMESTAMP_NTZ column matches the DuckDB
    * oracle's `epoch_ms` (DuckDB treats a naive timestamp as-is). */
  def configure(spark: SparkSession): Unit =
    spark.conf.set("spark.sql.session.timeZone", "UTC")

  /** Epoch milliseconds of a parquet timestamp column, whether the file
    * carries TIMESTAMP (UTC-adjusted) or TIMESTAMP_NTZ (naive): the cast is
    * a no-op for the former and interprets the wall clock in the session
    * zone (pinned to UTC by [[configure]]) for the latter — both match the
    * oracle's `epoch_ms(ts)`. */
  def epochMs(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    unix_millis(c.cast("timestamp"))

  /**
   * events table as datapoints:
   *   name = event_type, usr = zero-padded user id, grp = user id mod 5,
   *   hi   = "y" only when value > 300 (an optional tag, for :has tests).
   * `ts` arrives as a parquet timestamp and is floored to epoch ms via
   * [[epochMs]].
   */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    configure(spark)
    val ev = Pq.read(spark, s"$sfDir/events.parquet")
    // The optional `hi` tag is a null VALUE in a plain CreateMap, not a
    // map_filter-pruned entry: QueryCompiler treats null-valued keys as
    // absent (getItem(k).isNotNull), and a bare CreateMap lets Catalyst's
    // SimplifyExtractValueOps collapse tags[k] to the source column so tag
    // predicates push down to the parquet scan — with map_filter in the way
    // the scan had PushedFilters: [] and every query was a full scan.
    ev.select(
      map(
        lit("name"), col("event_type"),
        lit("usr"), concat(lit("u"), lpad(col("user_id").cast("string"), 3, "0")),
        lit("grp"), concat(lit("g"), pmod(col("user_id"), lit(5)).cast("string")),
        lit("hi"), when(col("value") > 300, lit("y")).otherwise(lit(null: String))
      ).as("tags"),
      epochMs(col("ts")).as("ts"),
      col("value").as("value")
    )
  }

  /**
   * events as percentile-bucket counter datapoints, the shape published by a
   * spectator PercentileDistributionSummary: one datapoint per event with a
   * `percentile` tag holding the D%04X bucket id of the (truncated) value
   * and value = 1 (a count). Bucketing is plain column arithmetic
   * (PercentileBuckets.indexOfCol) so it stays in whole-stage codegen.
   */
  def eventsBucketed(spark: SparkSession, sfDir: String): DataFrame = {
    configure(spark)
    import graft.functions.PercentileBuckets
    val ev = Pq.read(spark, s"$sfDir/events.parquet")
    val idx = PercentileBuckets.indexOfCol(floor(col("value")).cast("long"))
    ev.select(
      map(
        lit("name"), col("event_type"),
        lit("grp"), concat(lit("g"), pmod(col("user_id"), lit(5)).cast("string")),
        lit("percentile"), concat(lit("D"), lpad(hex(idx), 4, "0"))
      ).as("tags"),
      epochMs(col("ts")).as("ts"),
      lit(1.0).as("value")
    )
  }

  /**
   * events as HLL register datapoints, the shape published by a distinct-
   * count sketch client: per event, the user id hashes (md5, reproducible
   * in the DuckDB oracle) to a register in [0,64) with value = rho; the
   * `:approx-distinct` fetch merges registers with max.
   */
  def eventsRegisters(spark: SparkSession, sfDir: String): DataFrame = {
    configure(spark)
    import graft.functions.Hll
    val ev = Pq.read(spark, s"$sfDir/events.parquet")
    val usr = concat(lit("u"), lpad(col("user_id").cast("string"), 3, "0"))
    val h = md5(usr)
    // pre-aggregated per hourly slot (max rho), the shape a sketch client
    // publishes — sum-on-ingest normalization must see one point per slot
    ev.select(
        col("event_type"),
        (epochMs(col("ts")) - pmod(epochMs(col("ts")), lit(3600000L))).as("t"),
        Hll.registerCol(h).as("reg"),
        Hll.rhoCol(h).as("rho"))
      .groupBy(col("event_type"), col("t"), col("reg"))
      .agg(max(col("rho")).as("rho"))
      .select(
        map(
          lit("name"), col("event_type"),
          lit("distinct"), format_string("R%02X", col("reg"))
        ).as("tags"),
        col("t").as("ts"),
        col("rho").as("value")
      )
  }

  /**
   * events as distribution-summary statistic datapoints (statistic =
   * count / totalAmount / totalOfSquares / max), pre-aggregated per hourly
   * slot like a client publishing at step granularity — this keeps the
   * sum-on-ingest normalization correct for the max series too.
   */
  def eventsDistStats(spark: SparkSession, sfDir: String): DataFrame = {
    configure(spark)
    val ev = Pq.read(spark, s"$sfDir/events.parquet")
      .select(
        col("event_type"),
        (epochMs(col("ts")) - pmod(epochMs(col("ts")), lit(3600000L))).as("t"),
        col("value"))
    val agg = ev.groupBy(col("event_type"), col("t")).agg(
      count(lit(1)).cast("double").as("count"),
      sum(col("value")).as("totalAmount"),
      sum(col("value") * col("value")).as("totalOfSquares"),
      max(col("value")).as("max"))
    val stats = Seq("count", "totalAmount", "totalOfSquares", "max")
    val stacked = agg.select(
      col("event_type"), col("t"),
      explode(map(stats.flatMap(s => Seq(lit(s), col(s))): _*)).as(Seq("statistic", "value")))
    stacked.select(
      map(
        lit("name"), col("event_type"),
        lit("statistic"), col("statistic")
      ).as("tags"),
      col("t").as("ts"),
      col("value")
    )
  }

  /**
   * events as MONOTONIC COUNTER datapoints (the shape a spectator Counter
   * publishes): one series per (event_type, user-group), sampled at the raw
   * event times, value = running total of `value`, tagged
   * `atlas.dstype=counter` so the ingest pipeline (Normalize.rateConvert ->
   * weightedNormalize) converts to per-second rates. The cumulative-sum
   * window shuffles once by series — an ingest-shaping cost, not a query
   * cost.
   */
  def eventsCounters(spark: SparkSession, sfDir: String): DataFrame = {
    configure(spark)
    import org.apache.spark.sql.expressions.Window
    val ev = Pq.read(spark, s"$sfDir/events.parquet")
    val base = ev.select(
      col("event_type"),
      concat(lit("g"), pmod(col("user_id"), lit(5)).cast("string")).as("grp"),
      epochMs(col("ts")).as("tms"),
      col("value"))
    // collapse same-ms samples first: a counter has ONE value per instant
    val perInstant = base
      .groupBy(col("event_type"), col("grp"), col("tms"))
      .agg(sum(col("value")).as("dv"))
    val cum = perInstant.withColumn("cum",
      sum(col("dv")).over(Window.partitionBy(col("event_type"), col("grp")).orderBy(col("tms"))))
    cum.select(
      map(
        lit("name"), col("event_type"),
        lit("grp"), col("grp"),
        lit("atlas.dstype"), lit("counter")
      ).as("tags"),
      col("tms").as("ts"),
      col("cum").cast("double").as("value"))
  }

  /**
   * events as gauge datapoints: like [[events]] but pre-aggregated per
   * hourly slot with max (a sampled gauge publishes one value per step) and
   * tagged `atlas.dstype=gauge`, for the gauge-vs-rate consolidation
   * semantics.
   */
  def eventsGauge(spark: SparkSession, sfDir: String): DataFrame = {
    configure(spark)
    val ev = Pq.read(spark, s"$sfDir/events.parquet")
    ev.select(
        col("event_type"),
        (epochMs(col("ts")) - pmod(epochMs(col("ts")), lit(3600000L))).as("t"),
        col("value"))
      .groupBy(col("event_type"), col("t"))
      .agg(max(col("value")).as("v"))
      .select(
        map(
          lit("name"), col("event_type"),
          lit("atlas.dstype"), lit("gauge")
        ).as("tags"),
        col("t").as("ts"),
        col("v").as("value"))
  }

  /**
   * lineitem table as datapoints: one series per (returnflag, linestatus),
   * value = extendedprice, timestamp = shipdate.
   */
  def lineitem(spark: SparkSession, sfDir: String): DataFrame = {
    configure(spark)
    val li = Pq.read(spark, s"$sfDir/lineitem.parquet")
    li.select(
      map(
        lit("name"), lit("lineitem"),
        lit("returnflag"), col("l_returnflag"),
        lit("linestatus"), col("l_linestatus")
      ).as("tags"),
      epochMs(col("l_shipdate")).as("ts"),
      col("l_extendedprice").as("value")
    )
  }
}
