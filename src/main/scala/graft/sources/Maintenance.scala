package graft.sources

import org.apache.spark.sql.SparkSession

/**
 * The scheduled store-maintenance pass — ONE operator a deployment crons,
 * composing every maintenance primitive in dependency order (the
 * reference's analog is the block rollover + index rebuild cadence of
 * `db/MemoryBlockStore` / the periodic tag-index rebuild):
 *
 *   1. [[Store.compact]]: the streaming ingest append log (write-optimized,
 *      date-partitioned) rewrites into the series-bucketed read-optimized
 *      store, catalog included.
 *   2. [[Rollup.compactFragments]]: the streaming rollup fragment log
 *      merges into the finest bucketed rollup table (exact — every rollup
 *      statistic composes with itself).
 *   3. [[Rollup.materializeFrom]]: coarser rollups cascade from the finest
 *      (1m -> 1h -> 1d), each level reading the previous one, never raw.
 *   4. [[Store.expireDays]] with `compactCatalog = true`: retention expiry
 *      retires whole day partitions and drops dead/duplicate series from
 *      the catalog.
 *   5. index compaction: the streaming dedup signature index
 *      ([[graft.streaming.StreamRunner.compactDedupIndex]]) and any
 *      persisted ANN indexes ([[graft.ops.Similarity.compactAnnIndex]] —
 *      IVF/LSH/IVF-PQ) fold their per-batch append files back into a
 *      bounded layout. Both appenders are deliberately zero-shuffle, so
 *      file-count growth is their design debt and this pass is where it
 *      gets paid.
 *
 * Returns the [[StoreBackend]] wired to every table it maintained — the
 * cron job's output IS the default query path — plus a report of what ran.
 *
 * Scale shape: each step is the documented shape of its primitive (one
 * datapoint-cardinality bucketed write for compact, rollup-cardinality
 * aggregations for 2-3, metadata-only partition drops plus a
 * series-cardinality catalog rebuild for 4); the steps share nothing, so
 * a deployment can also cron them at different cadences by calling the
 * primitives directly.
 */
object Maintenance {

  final case class Report(
      expiredDays: Seq[String],
      rollups: Map[String, Long],
      compactedIndexes: Seq[String] = Nil,
      retunedIndexes: Seq[String] = Nil)

  /** Probe-tuning configuration for the maintained ANN indexes: the
    * corpus frame + query predicate [[graft.ops.Similarity.optimalProbes]]
    * sweeps against. Tuning runs AFTER compaction and only for indexes
    * whose generation moved ([[graft.ops.Similarity.retuneIfStale]]); the
    * chosen (nProbe, refineFactor) persists beside the index and the
    * serving paths use it by default. */
  final case class AnnTune(
      emb: org.apache.spark.sql.DataFrame,
      queryPred: org.apache.spark.sql.Column,
      k: Int,
      recallBar: Double = 0.9,
      nProbes: Seq[Int] = Seq(1, 2, 4, 8),
      refineFactors: Seq[Int] = Seq(1, 4, 8),
      idCol: String = "vec_id",
      vecCol: String = "embedding")

  /** Naming convention for maintained rollup tables. */
  def rollupTable(table: String, stepMs: Long): String = s"${table}_rollup_$stepMs"

  def run(
      spark: SparkSession,
      table: String,
      storePath: Option[String] = None,
      rollupPath: Option[String] = None,
      rollupStepMs: Long = 0L,
      cascadeSteps: Seq[Long] = Nil,
      keepDays: Int = 0,
      nowMs: Long = 0L,
      buckets: Int = 64,
      partitioned: Boolean = true,
      dedupIndexes: Seq[String] = Nil,
      annIndexes: Seq[String] = Nil,
      annTune: Option[AnnTune] = None
  ): (StoreBackend, Report) = {
    // a forgotten nowMs would silently expire nothing (cutoff lands in
    // 1969) — retention misconfiguration must fail loudly, not accumulate
    require(keepDays == 0 || nowMs > 0L,
      "keepDays is set but nowMs is not — pass the current epoch millis")
    storePath.foreach(p =>
      Store.compact(spark, p, table, buckets, partitioned = partitioned, catalog = true))
    val rollups = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    if (rollupStepMs > 0L) rollupPath.foreach { p =>
      Rollup.compactFragments(spark, p, rollupTable(table, rollupStepMs), buckets)
      rollups += rollupTable(table, rollupStepMs) -> rollupStepMs
    }
    var fromStep = if (rollups.nonEmpty) rollupStepMs else 0L
    cascadeSteps.sorted.foreach { s =>
      require(fromStep > 0L,
        "cascadeSteps need a finest rollup (rollupPath + rollupStepMs) to build from")
      Rollup.materializeFrom(
        spark, rollupTable(table, fromStep), fromStep, rollupTable(table, s), s, buckets)
      rollups += rollupTable(table, s) -> s
      fromStep = s
    }
    val expired =
      if (keepDays > 0) Store.expireDays(spark, table, keepDays, nowMs, compactCatalog = true)
      else Nil
    dedupIndexes.foreach(p => graft.streaming.StreamRunner.compactDedupIndex(spark, p))
    annIndexes.foreach(p => graft.ops.Similarity.compactAnnIndex(spark, p))
    // 6. probe retuning, AFTER compaction (the tune stamps the compacted
    //    generation's row count): once per index generation, persisted
    //    beside the index, served by default
    val retuned = annTune.toSeq.flatMap { t =>
      annIndexes.filter(p => graft.ops.Similarity.retuneIfStale(
        spark, p, t.emb, t.queryPred, t.k, t.recallBar,
        t.nProbes, t.refineFactors, t.idCol, t.vecCol))
    }
    (StoreBackend(spark, table, rollups.toMap),
      Report(expired, rollups.toMap, dedupIndexes ++ annIndexes, retuned))
  }
}
