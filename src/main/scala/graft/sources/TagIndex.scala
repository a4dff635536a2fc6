package graft.sources

import graft.planner.Planner
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Tag metadata index (reference §1.3: atlas-core index/RoaringTagIndex,
 * rebuilt from the in-memory block store every few seconds and backing the
 * tags API + query-time series lookup).
 *
 * The Spark-native analog is a compact SERIES CATALOG table: one row per
 * distinct series (series id + tags map), derived from the datapoint store
 * and kept as parquet. Series cardinality is datapoint cardinality divided
 * by points-per-series — at 100 TB of datapoints the catalog is typically
 * 4-6 orders of magnitude smaller — so metadata queries (tag keys, tag
 * values, matching-series counts) run against the catalog instead of
 * scanning raw datapoints: the same 1000x index-vs-scan gap the reference
 * benchmarks (RoaringTagIndexBench.scala:28-32).
 *
 * The catalog frame has the canonical `tags` column, so every
 * [[graft.api.Api]] metadata entry point (tagKeys/tagValues/tags) runs on
 * it unchanged — the index is a drop-in, faster `dp` argument.
 */
object TagIndex {

  /** Distinct-series catalog of a datapoint frame: (series, tags). */
  def seriesCatalog(dp: DataFrame): DataFrame =
    dp.groupBy(Planner.seriesId(col("tags")).as("series"))
      .agg(first(col("tags")).as("tags"))

  /** Persist the catalog (full rebuild, the reference's rebuild-frequency
    * analog; incremental appends from an ingest micro-batch may duplicate
    * series across files — [[load]] dedups on read, compaction = rewrite). */
  def write(dp: DataFrame, path: String): Unit =
    seriesCatalog(dp).write.mode("overwrite").parquet(path)

  /** Append the distinct new series of one ingest micro-batch. */
  def append(batch: DataFrame, path: String): Unit =
    seriesCatalog(batch).write.mode("append").parquet(path)

  def load(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).dropDuplicates("series")

  /**
   * Inverted index summary: one row per (tag key, tag value) with the
   * number of distinct series carrying it — the `findValues` /
   * index-statistics shape. Null-valued map entries mean "tag absent" and
   * are excluded, like everywhere else in the engine.
   */
  def inverted(catalog: DataFrame): DataFrame =
    catalog
      .select(col("series"), explode(map_entries(col("tags"))).as("kv"))
      .filter(col("kv.value").isNotNull)
      .groupBy(col("kv.key").as("key"), col("kv.value").as("value"))
      .agg(count(lit(1)).cast("double").as("n_series"))
}
