package graft.sources

import graft.planner.Planner
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Series-bucketed datapoint store: the parquet analog of the reference's
 * by-series layout (MemoryDatabase's ConcurrentHashMap[ItemId, ...],
 * db/MemoryDatabase.scala:81), and the layout choice that matters most at
 * 100 TB: with the table hash-bucketed by the series key, the planner's
 * per-(series, slot) normalization aggregation is satisfied by the scan's
 * bucket partitioning — NO shuffle touches raw datapoints; the only
 * exchange left in a fetch is the (small) cross-series aggregate. Bucket
 * files are also sorted by (key, ts), so per-series scans are sequential.
 *
 * The written table carries the materialized `key` column; the planner
 * detects it and groups on the attribute (bucketing only satisfies a
 * distribution over the COLUMN, not over a recomputed expression).
 */
object Store {

  /** Above this many matching series keys the index semi-join is NOT
    * broadcast-hinted: ~2^20 keys at the observed ~60-100 B/key is tens of
    * MB serialized — past the point where shipping the set to every
    * executor beats exchanging it once into the store's buckets. */
  val DefaultMaxBroadcastKeys: Long = 1L << 20

  /** Drop a stale managed-table location left by a previous session: the
    * in-memory catalog starts empty each run, so `overwrite` plans as a
    * CREATE and fails on the leftover directory instead of replacing it.
    * Only the in-memory-catalog scenario is handled — with a persistent
    * (Hive) metastore the table either exists (overwrite works) or its
    * warehouse path is not ours to guess, and deleting a computed path
    * under a shared warehouse could destroy another catalog's data. */
  private[sources] def dropStale(spark: SparkSession, table: String): Unit = {
    require(!table.contains("."), s"unqualified session-catalog table expected, got: $table")
    val inMemoryCatalog =
      spark.conf.get("spark.sql.catalogImplementation", "in-memory") == "in-memory"
    if (inMemoryCatalog && !spark.catalog.tableExists(table)) {
      val wh = spark.conf.get("spark.sql.warehouse.dir")
      val path = new org.apache.hadoop.fs.Path(wh, table.toLowerCase)
      val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(path)) fs.delete(path, true)
    }
  }

  /** Partition-date column: UTC day of the epoch-millis timestamp,
    * computed timezone-free (`date_from_unix_date` of the floored day
    * number — `to_date` would read the session zone and move datapoints
    * across partition boundaries between differently-configured jobs). */
  private[sources] def dayOf(ts: Column): Column =
    date_from_unix_date(floor(ts / lit(86400000L)).cast("int"))

  /** Write a canonical datapoint frame (`tags`, `ts`, `value`) as a
    * series-bucketed, time-sorted managed table. With `catalog = true`,
    * also write the series-cardinality catalog table (`<table>_catalog`,
    * one row per series) that [[readIndexed]] resolves predicates on.
    *
    * With `partitioned = true` the table is ALSO hive-partitioned by UTC
    * day (`d`), the layout that matters second-most at 100 TB: a 6-hour
    * dashboard query against two years of history prunes ~729/731 of the
    * bytes BEFORE any file is opened ([[pruneRange]] turns the query's
    * time range into partition filters), while the bucket files inside
    * each day keep the zero-datapoint-shuffle fetch — Spark's bucketed
    * scan groups same-bucket files ACROSS partition directories into one
    * task, so the scan's output partitioning is still hash(key) and the
    * per-(series, slot) normalization stays exchange-free (StoreSpec
    * asserts both properties on the partitioned layout). The reference's
    * analog is block retention/rotation: queries touch only the blocks
    * overlapping the requested window (db/MemoryBlockStore.blocks). */
  def writeBucketed(dp: DataFrame, table: String, buckets: Int = 64,
      catalog: Boolean = false, partitioned: Boolean = false): Unit = {
    dropStale(dp.sparkSession, table)
    val keyed = dp.select(
      Planner.seriesId(col("tags")).as("key"),
      col("tags"), col("ts"), col("value"))
    writeLayout(keyed, table, buckets, partitioned)
    if (catalog) {
      dropStale(dp.sparkSession, table + "_catalog")
      TagIndex.seriesCatalog(dp)
        .write.mode("overwrite").format("parquet").saveAsTable(table + "_catalog")
    }
  }

  /**
   * Shared physical writer for every bucketed table (the store and all
   * rollup layouts): optional UTC-day partitioning, zstd over the default
   * snappy — these tables are write-once/read-many long retention, where
   * ~25-30% fewer bytes on disk is also that many fewer bytes scanned per
   * query (at 100 TB the decode CPU is far cheaper than the saved IO),
   * and the (key, ts)-sorted files compress especially well under zstd's
   * larger windows. One edit site for the next layout change.
   */
  private[sources] def writeLayout(df: DataFrame, table: String, buckets: Int,
      partitioned: Boolean): Unit = {
    val w0 = (if (partitioned) df.withColumn("d", dayOf(col("ts"))) else df)
      .write
      .mode("overwrite")
      .format("parquet")
      .option("compression", "zstd")
    val w1 = if (partitioned) w0.partitionBy("d") else w0
    w1.bucketBy(buckets, "key")
      .sortBy("key", "ts")
      .saveAsTable(table)
  }

  /** Read the store back as a pre-keyed datapoint frame. A partitioned
    * table keeps its `d` column so [[pruneRange]] can still prune;
    * consumers drop it after pruning. */
  def read(spark: SparkSession, table: String): DataFrame = {
    val t = spark.table(table)
    val base = Seq("key", "tags", "ts", "value")
    val cols = if (t.columns.contains("d")) base :+ "d" else base
    t.select(cols.map(col): _*)
  }

  /**
   * Restrict a store/rollup frame to the partitions overlapping
   * `[startMs, endMs)`. A no-op for unpartitioned frames (no `d` column).
   * The day filter compares the PARTITION column against literals, so it
   * resolves at planning time (FileSourceScanExec partition filters) —
   * directories outside the window are never listed, let alone read. The
   * exact `ts` bounds still apply downstream; this only prunes whole days.
   */
  def pruneRange(frame: DataFrame, startMs: Long, endMs: Long): DataFrame =
    if (!frame.columns.contains("d") || endMs <= startMs) frame
    else {
      val d0 = java.time.LocalDate.ofEpochDay(Math.floorDiv(startMs, 86400000L))
      val d1 = java.time.LocalDate.ofEpochDay(Math.floorDiv(endMs - 1, 86400000L))
      frame.filter(col("d") >= lit(java.sql.Date.valueOf(d0)) &&
        col("d") <= lit(java.sql.Date.valueOf(d1)))
    }

  /** Resolve a tag predicate on the series catalog: one row per series, so
    * a `:re` regex runs ~#series times instead of once per datapoint
    * (reference TagIndex.findItems, index/RoaringTagIndex.scala). */
  def indexKeys(spark: SparkSession, table: String, q: graft.asl.Query): DataFrame =
    spark.table(table + "_catalog")
      .filter(graft.planner.QueryCompiler.compile(q, col("tags")))
      .select(col("series").as("key"))

  /**
   * Semi-join a resolved key set into a pre-keyed frame, size-gating the
   * broadcast: the hint is only attached when the catalog-side count (a
   * cheap action — series cardinality, not datapoints) stays under
   * `maxBroadcastKeys`. A non-selective predicate (`:true`, a broad `:re`)
   * over 10^8 series would otherwise ship GBs to every executor — and a
   * hard-coded hint overrides Spark's own size logic. Past the gate the
   * join is left unhinted: the frame is bucketed by `key`, so the
   * sort-merge fallback exchanges only the key SIDE into the buckets,
   * never the datapoints.
   */
  def semiJoinKeys(frame: DataFrame, keys: DataFrame,
      maxBroadcastKeys: Long = DefaultMaxBroadcastKeys): DataFrame = {
    // persist(): the catalog-filter plan executes ONCE — the gate count
    // materializes the blocks and the semi-join reads them (without it,
    // every fetch ran the catalog predicate twice: once for the eager
    // count, again inside the join). Chosen over localCheckpoint on the
    // DEFAULT query path because persist keeps the lineage: a lost
    // executor recomputes the partition instead of failing the fetch
    // (and eviction under memory pressure degrades to recompute, never
    // to error). Blocks are freed by the ContextCleaner when the fetch
    // frame is collected and dereferenced.
    val k = keys.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // a TRUE left_semi: a key duplicated on the catalog side (possible
    // after incremental [[backfillDays]] appends) cannot multiply the
    // joined datapoints, and no dedup shuffle is ever needed
    if (k.count() <= maxBroadcastKeys) {
      // broadcast branch: the key set is bounded, so take it to the
      // driver NOW (broadcast would collect it there anyway), release the
      // cached blocks immediately, and join against a LocalRelation. The
      // catalog predicate still runs once total, and repeated
      // index-driven fetches in a long-lived session no longer
      // accumulate MEMORY_AND_DISK blocks until the ContextCleaner
      // happens to run.
      val rows = k.collect()
      k.unpersist(blocking = false)
      val local = keys.sparkSession.createDataFrame(
        java.util.Arrays.asList(rows: _*), keys.schema)
      frame.join(broadcast(local), Seq("key"), "left_semi")
    } else
      // non-broadcast branch: the blocks back BOTH the count and the
      // sort-merge join, and the join executes only when the caller runs
      // the returned fetch frame — so the lifecycle is the caller's:
      // blocks are freed by the ContextCleaner once the fetch frame is
      // dereferenced, or eagerly via frame.unpersist on the keys frame a
      // long-lived service should hold on to.
      frame.join(k, Seq("key"), "left_semi")
  }

  /**
   * Index-driven fetch — the reference's core query path (TagIndex.
   * findItems resolves the predicate on the index, then only matching
   * items' blocks are read: `db/MemoryDatabase.scala:218-229`). The
   * predicate is evaluated ON THE CATALOG via [[indexKeys]]; matching keys
   * semi-join the store ([[semiJoinKeys]], broadcast only under the size
   * gate). Tag predicates are per-series (they read only `tags`), so the
   * series-level filter is complete: the returned frame is exactly the
   * matching datapoints, pre-keyed; callers evaluate with `Query.True`.
   * `:true` itself matches every series and skips the join entirely.
   */
  def readIndexed(spark: SparkSession, table: String, q: graft.asl.Query,
      maxBroadcastKeys: Long = DefaultMaxBroadcastKeys): DataFrame =
    q match {
      case graft.asl.Query.True => read(spark, table)
      case _ => semiJoinKeys(read(spark, table), indexKeys(spark, table, q), maxBroadcastKeys)
    }

  /**
   * Replace exactly the UTC-day partitions covered by `dp` in a
   * date-partitioned store ([[writeBucketed]] with `partitioned = true`)
   * — the backfill/correction path at 100 TB: re-deriving one bad day
   * rewrites that day's directories and NOTHING else (dynamic partition
   * overwrite), and the insert honors the table's bucket spec, so the
   * zero-datapoint-shuffle fetch property survives the rewrite (StoreSpec
   * asserts both). When the store has a series catalog, the batch's
   * distinct series append to it — [[indexKeys]] dedups at read, and a
   * full [[TagIndex]] rebuild stays the periodic compaction job.
   */
  def backfillDays(dp: DataFrame, table: String): Unit = {
    val spark = dp.sparkSession
    require(spark.table(table).columns.contains("d"),
      s"$table is not date-partitioned; backfillDays needs the partitioned layout")
    val write = dp.select(
        Planner.seriesId(col("tags")).as("key"),
        col("tags"), col("ts"), col("value"),
        dayOf(col("ts")).as("d"))
      .write.mode("overwrite")
    // insertInto ignores DataFrameWriter options BY CONTRACT (per-write
    // partitionOverwriteMode/compression never reach the command — a
    // writer-option variant was tried and statically wiped the untouched
    // partitions), so both knobs must ride the session conf. Scoping the
    // mutation under the Store lock serializes concurrent backfills — the
    // finally blocks can no longer restore each other's values; OTHER
    // writers on the same session during a backfill still observe
    // dynamic/zstd, the documented single-maintenance-writer expectation.
    Store.synchronized {
      val prevMode = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
      val prevCodec = spark.conf.get("spark.sql.parquet.compression.codec", "snappy")
      spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
      spark.conf.set("spark.sql.parquet.compression.codec", "zstd")
      try write.insertInto(table)
      finally {
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prevMode)
        spark.conf.set("spark.sql.parquet.compression.codec", prevCodec)
      }
    }
    if (spark.catalog.tableExists(table + "_catalog"))
      TagIndex.seriesCatalog(dp)
        .write.mode("append").format("parquet").saveAsTable(table + "_catalog")
  }

  /**
   * Drop day partitions older than the retention horizon — the
   * reference's block expiry (MemoryBlockStore rotates fixed-count block
   * arrays; a partitioned table retires whole directories). The partition
   * drop is metadata + file deletion only: no data is read, queries
   * running against newer days never notice. Returns the dropped
   * partition dates.
   *
   * With `compactCatalog = true` (and a `<table>_catalog` present) the
   * series catalog is rebuilt after the drop: series whose datapoints all
   * expired are removed, and duplicate series rows accumulated by
   * incremental [[backfillDays]] appends collapse to one — without this,
   * a long retention cycle inflates every [[indexKeys]] scan and the
   * semi-join key set with series that can never match a datapoint.
   * Scale shape: one column-pruned distinct-key scan of the surviving
   * store (map-side partial agg at series cardinality) semi-joins the
   * catalog; the kept rows materialize through a localCheckpoint before
   * the overwrite (the source table cannot be read and replaced in one
   * plan).
   */
  def expireDays(spark: SparkSession, table: String,
      keepDays: Int, nowMs: Long, compactCatalog: Boolean = false): Seq[String] = {
    require(keepDays > 0, "keepDays must be positive")
    val cutoff = java.time.LocalDate
      .ofEpochDay(Math.floorDiv(nowMs, 86400000L) - keepDays + 1)
    val stale = spark.sql(s"SHOW PARTITIONS $table").collect()
      .map(_.getString(0)) // "d=2024-01-01"
      .collect { case p if p.startsWith("d=") &&
        java.time.LocalDate.parse(p.drop(2)).isBefore(cutoff) => p.drop(2) }
      .toSeq.sorted
    stale.foreach(d =>
      spark.sql(s"ALTER TABLE $table DROP IF EXISTS PARTITION (d = '$d')"))
    if (compactCatalog && stale.nonEmpty &&
        spark.catalog.tableExists(table + "_catalog")) {
      val live = spark.table(table).select(col("key")).distinct()
      val kept = spark.table(table + "_catalog")
        .join(live, col("series") === col("key"), "left_semi")
        .dropDuplicates("series")
        .localCheckpoint()
      kept.write.mode("overwrite").format("parquet").saveAsTable(table + "_catalog")
    }
    stale
  }

  /**
   * Compact the streaming ingest sink's append log
   * (StreamRunner.ingest's date-partitioned parquet: the write-optimized
   * layout) into the series-bucketed read-optimized table — the periodic
   * maintenance job a deployment runs so historical queries get the
   * zero-datapoint-shuffle fetch path while live data keeps appending
   * cheaply. The reference's analog is the block rollover from the live
   * in-memory update buffer into immutable compressed blocks
   * (db/MemoryBlockStore.update rotation).
   */
  def compact(spark: SparkSession, storePath: String, table: String, buckets: Int = 64,
      partitioned: Boolean = false, catalog: Boolean = false): Unit =
    writeBucketed(
      spark.read.parquet(storePath)
        .select(col("tags"), col("t").as("ts"), col("value")),
      table, buckets, catalog = catalog, partitioned = partitioned)
}
