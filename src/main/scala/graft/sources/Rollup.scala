package graft.sources

import graft.planner.Planner
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Pre-aggregated rollups: the parquet analog of the reference's
 * RollupBlock, which serves Sum/Count/Min/Max read modes from per-block
 * sub-arrays without touching raw data (model/Block.scala:823-,
 * MemoryDatabase.blockAggr db/MemoryDatabase.scala:207-216).
 *
 * A rollup table holds, per (series, coarse slot), the four statistics of
 * the RAW datapoint values inside the slot: (sum, count, min, max). Because
 * each statistic composes with itself (sum of sums, min of mins, ...), a
 * fetch whose slot consolidation function is sum/min/max — or avg, as
 * sum/count — over ANY step that is a multiple of the rollup step reads the
 * matching column instead of raw datapoints and gets the bit-identical
 * answer with `rollupStep/step` times fewer rows scanned. At 100 TB this is
 * the dashboard-refresh lever: a 30-day hourly window over a 6h rollup
 * scans 1/6th of the bytes and skips ingest normalization entirely.
 *
 * Layout matches [[Store]]: hash-bucketed and sorted by the series key, so
 * the planner's per-(series, slot) aggregation is satisfied by the scan's
 * bucket partitioning — no exchange touches the rollup rows either.
 */
object Rollup {

  val Columns = Seq("v_sum", "v_count", "v_min", "v_max")

  /**
   * Materialize a rollup table at `rollupStep` from a canonical datapoint
   * frame (`tags`, `ts`, `value`). One datapoint-cardinality shuffle keyed
   * by (series, slot) — the same key the write's bucketing then preserves;
   * tags re-attach at series cardinality (carrying the map through the hot
   * aggregate would force SortAggregate).
   */
  def materialize(dp: DataFrame, table: String, rollupStep: Long, buckets: Int = 64,
      partitioned: Boolean = false): Unit = {
    Store.dropStale(dp.sparkSession, table)
    val f = frame(dp, rollupStep)
    // same UTC-day partition layout as the store ([[Store.writeBucketed]]):
    // long-retention rollups prune to the query window at plan time too
    Store.writeLayout(f, table, buckets, partitioned)
  }

  /** The rollup frame materialize() writes. Fed a pre-keyed frame (a
    * [[Store]] bucketed table), the materialized `key` ATTRIBUTE is reused
    * so the scan's bucket partitioning satisfies both the per-(series,
    * slot) aggregate and the tags re-attach join: building a rollup from
    * the store shuffles NOTHING (RollupSpec asserts the plan) — the
    * periodic maintenance job is a single pass over each bucket. */
  private[graft] def frame(dp: DataFrame, rollupStep: Long): DataFrame = {
    require(rollupStep > 0, "rollupStep must be > 0")
    val keyCol =
      if (dp.columns.contains("key")) col("key") else Planner.seriesId(col("tags"))
    val agg = dp
      .select(
        keyCol.as("key"),
        (col("ts") - pmod(col("ts"), lit(rollupStep))).as("ts"),
        col("value"))
      .groupBy(col("key"), col("ts"))
      .agg(
        sum(col("value")).as("v_sum"),
        count(col("value")).cast("double").as("v_count"),
        min(col("value")).as("v_min"),
        max(col("value")).as("v_max"))
    val tagsOf = dp
      .select(keyCol.as("key"), col("tags"))
      .dropDuplicates("key")
    agg
      .join(tagsOf, "key")
      .select(col("key"), col("tags"), col("ts"),
        col("v_sum"), col("v_count"), col("v_min"), col("v_max"))
  }

  /**
   * Read a rollup table back as a planner-consumable frame. `queryStep` is
   * the step the consuming EvalContext will consolidate to — it must be a
   * multiple of the table's `rollupStep`, otherwise slot boundaries would
   * split rollup rows and the pre-aggregates could not reconstruct the
   * answer (the caller falls back to the raw store in that case, like the
   * reference falling back from blockAggr to the raw block).
   */
  def read(spark: SparkSession, table: String, rollupStep: Long, queryStep: Long): DataFrame = {
    require(queryStep >= rollupStep && queryStep % rollupStep == 0,
      s"query step $queryStep is not a multiple of rollup step $rollupStep; read the raw store instead")
    spark.table(table)
  }

  /** Whether a rollup at `rollupStep` can serve a query at `queryStep`. */
  def serves(rollupStep: Long, queryStep: Long): Boolean =
    queryStep >= rollupStep && queryStep % rollupStep == 0

  /**
   * Build a COARSER rollup from a finer one — the cascade maintenance
   * path (1m -> 1h -> 1d): every statistic composes with itself (sum of
   * sums, summed counts, min of mins, max of maxes), so re-aggregating
   * rollup rows is bit-identical to rolling up raw datapoints, while
   * scanning `coarserStep/rollupStep` times fewer rows — at 100 TB the
   * difference between a daily maintenance job that reads an hour-level
   * table and one that re-reads the raw store. The input table's bucket
   * partitioning satisfies the per-series aggregate, so the build
   * shuffles nothing datapoint-shaped (RollupSpec asserts both the
   * equivalence and that the raw store is never scanned).
   */
  def materializeFrom(
      spark: SparkSession,
      fromTable: String,
      fromStep: Long,
      table: String,
      coarserStep: Long,
      buckets: Int = 64,
      partitioned: Boolean = false
  ): Unit = {
    require(serves(fromStep, coarserStep),
      s"coarser step $coarserStep is not a multiple of the source rollup step $fromStep")
    Store.dropStale(spark, table)
    val src = spark.table(fromTable)
    val agg = src
      .groupBy(col("key"),
        (col("ts") - pmod(col("ts"), lit(coarserStep))).as("ts"))
      .agg(
        sum(col("v_sum")).as("v_sum"),
        sum(col("v_count")).as("v_count"),
        min(col("v_min")).as("v_min"),
        max(col("v_max")).as("v_max"))
    val tagsOf = src.select(col("key"), col("tags")).dropDuplicates("key")
    val out = agg
      .join(tagsOf, "key")
      .select(col("key"), col("tags"), col("ts"),
        col("v_sum"), col("v_count"), col("v_min"), col("v_max"))
    Store.writeLayout(out, table, buckets, partitioned)
  }

  /**
   * Compact the streaming rollup append log (StreamRunner.ingest's rollup
   * sink: append-only fragments, several per coarse slot across
   * micro-batches, unbounded small files over a long stream) into the
   * series-bucketed rollup table — [[Store.compact]]'s analog for rollups,
   * the periodic maintenance job that keeps long-horizon reads on the
   * zero-shuffle bucketed path. Fragments covering the same (series, slot)
   * merge EXACTLY because every rollup statistic composes with itself
   * (sum of sums, min of mins, count as summed counts).
   */
  def compactFragments(spark: SparkSession, rollupPath: String, table: String,
      buckets: Int = 64): Unit = {
    Store.dropStale(spark, table)
    val frags = spark.read.parquet(rollupPath)
    val merged = frags
      .groupBy(col("key"), col("ts"))
      .agg(
        sum(col("v_sum")).as("v_sum"),
        sum(col("v_count")).as("v_count"),
        min(col("v_min")).as("v_min"),
        max(col("v_max")).as("v_max"))
    val tagsOf = frags.select(col("key"), col("tags")).dropDuplicates("key")
    val compacted = merged
      .join(tagsOf, "key")
      .select(col("key"), col("tags"), col("ts"),
        col("v_sum"), col("v_count"), col("v_min"), col("v_max"))
    Store.writeLayout(compacted, table, buckets, partitioned = false)
  }

  /**
   * Automatic source selection (the reference picks the block read mode
   * per request in MemoryDatabase.blockAggr): serve the fetch from the
   * COARSEST aligned rollup, falling back to the raw store when no rollup
   * divides the query step. `rollups` maps rollup table name -> its step.
   * The planner needs no hint — it keys off the frame's columns.
   */
  def readBest(
      spark: SparkSession,
      storeTable: String,
      rollups: Map[String, Long],
      queryStep: Long
  ): DataFrame =
    rollups.filter { case (_, rs) => serves(rs, queryStep) } match {
      case eligible if eligible.nonEmpty =>
        val (table, rs) = eligible.maxBy(_._2)
        read(spark, table, rs, queryStep)
      case _ => Store.read(spark, storeTable)
    }
}
