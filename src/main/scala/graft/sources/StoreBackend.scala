package graft.sources

import graft.asl.Query
import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Store-backed evaluation mode: the planner's DEFAULT query path over a
 * physical deployment, mirroring the reference where EVERY fetch resolves
 * its predicate on the tag index before touching blocks
 * (`MemoryDatabase.executeImpl`, db/MemoryDatabase.scala:218-229 —
 * `index.findItems(TagQuery)` is the only way in) and the block read mode
 * is picked automatically per request (`blockAggr`,
 * db/MemoryDatabase.scala:207-216).
 *
 * Passed to `Planner.eval`/`Api.graph` in place of a raw datapoint frame,
 * each DataExpr fetch is resolved here: the coarsest rollup aligned to the
 * query step serves the scan ([[Rollup.readBest]]), and the expression's
 * tag predicate is evaluated once per SERIES on the catalog table with the
 * matching keys semi-joined into the bucketed scan ([[Store.semiJoinKeys]],
 * broadcast only under the size gate). A user issuing `name,x,:re,:sum`
 * against a 100 TB store gets the index path without hand-wiring anything.
 *
 * @param storeTable       series-bucketed store written by
 *                         [[Store.writeBucketed]] with `catalog = true`
 *                         (the `<table>_catalog` series catalog must exist)
 * @param rollups          rollup table name -> its step, as materialized by
 *                         [[Rollup.materialize]]; empty means raw-only
 * @param maxBroadcastKeys broadcast-hint gate for the index semi-join
 */
final case class StoreBackend(
    spark: SparkSession,
    storeTable: String,
    rollups: Map[String, Long] = Map.empty,
    maxBroadcastKeys: Long = Store.DefaultMaxBroadcastKeys) {

  /** The raw bucketed store, pre-keyed and unfiltered — the source for
    * paths that need raw per-datapoint values regardless of rollups
    * (sketch reshapes, fused-arithmetic leaf projection). */
  def raw: DataFrame = Store.read(spark, storeTable).drop("d")

  /** Resolve a fetch: coarsest aligned rollup (or the raw store when none
    * divides `queryStep`), index-filtered to the series matching `q`. The
    * returned frame is complete for `q` — tag predicates are per-series —
    * so the consumer must not re-apply the predicate per datapoint.
    *
    * When the store is date-partitioned ([[Store.writeBucketed]] with
    * `partitioned = true`) and the caller supplies the query's time range,
    * partitions outside `[startMs, endMs)` are pruned at plan time
    * ([[Store.pruneRange]]) — the 100 TB lever where a dashboard window
    * touches days, not years. `startMs >= endMs` (the default) skips
    * pruning. */
  def fetch(q: Query, queryStep: Long, startMs: Long = 0L, endMs: Long = 0L): DataFrame =
    indexFiltered(
      Store.pruneRange(
        Rollup.readBest(spark, storeTable, rollups, queryStep), startMs, endMs).drop("d"),
      q)

  /** Raw-store fetch with the index filter — for consumers that need the
    * per-datapoint `value` column (never a rollup row). */
  def fetchRaw(q: Query): DataFrame = indexFiltered(raw, q)

  private def indexFiltered(frame: DataFrame, q: Query): DataFrame = q match {
    // :true matches every series: scanning is cheaper than joining the
    // full catalog back into itself
    case Query.True => frame
    case _ =>
      Store.semiJoinKeys(frame, Store.indexKeys(spark, storeTable, q), maxBroadcastKeys)
  }
}
