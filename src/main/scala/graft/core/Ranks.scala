package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Distributed EXACT global ranking — the scale-safe replacement for
 * `row_number().over(Window.orderBy(...))`, whose unpartitioned window is a
 * single-task sort of the whole input (the classic 100 TB wall; AQE cannot
 * split window partitions). The classic two-phase construction instead:
 *
 *  1. `repartitionByRange` on the sort keys — one range exchange; partition
 *     `i` holds a contiguous, non-overlapping key slice below partition
 *     `i+1`'s. The rank itself is boundary-independent (the key tuple is a
 *     total order); only the offset bookkeeping cares where the cuts fell.
 *  2. a LOCAL `row_number` window keyed by the materialized partition id —
 *     at most `partitions` rows per window partition, balanced by the range
 *     partitioner, never a global sort.
 *  3. the locally-ranked frame is MATERIALIZED (localCheckpoint), then its
 *     per-partition counts (a `partitions`-row aggregate) are collected,
 *     prefix-summed into offsets, and joined back broadcast-style:
 *     `rank = offset(pid) + local_row_number`.
 *
 * The checkpoint in step 3 is correctness, not convenience: the offsets
 * and the final plan MUST observe the same partition cut, but
 * RangePartitioner's reservoir sampling depends on the upstream's
 * intra-partition row ORDER, which Spark does not stabilize across
 * separate executions when the input comes out of a join or an AQE-planned
 * shuffle — a count job and a consumer job can legitimately cut different
 * boundaries over identical data (observed: positions off by dozens at
 * sf0.1 when this helper's rank-2 input was a join output; a raw scan
 * upstream masked it at smaller scales). Freezing the ranked blocks makes
 * both reads see one partitioning, and as a bonus the range exchange runs
 * once instead of twice.
 *
 * Cost: two exchanges (range + the window's hash on pid) + the checkpoint
 * materialization + one tiny count job, versus the
 * one-exchange-but-one-task global window. localCheckpoint trades lineage
 * fault tolerance for the guarantee (the adjudicated dedup-index trade);
 * blocks free via the ContextCleaner when the frame goes unreachable.
 *
 * Callers pass fully tie-broken sort expressions (include an id column) —
 * equal key tuples would otherwise rank arbitrarily. For oracle-compared
 * output over nullable keys, pass `asc_nulls_last` explicitly (Spark ASC
 * defaults NULLS FIRST, DuckDB NULLS LAST).
 */
object Ranks {

  /**
   * Append 1-based global rank by `keys` as `rankCol`; returns the ranked
   * frame and the total row count (free — the offset job already counted).
   */
  def globalRank(
      df: DataFrame,
      keys: Seq[Column],
      rankCol: String,
      partitions: Int = 0
  ): (DataFrame, Long) = {
    require(keys.nonEmpty, "need at least one sort key")
    val spark = df.sparkSession
    import org.apache.spark.sql.expressions.Window
    val p =
      if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val ranged = df
      .repartitionByRange(p, keys: _*)
      .withColumn("__gr_pid", spark_partition_id())
    val w = Window.partitionBy(col("__gr_pid")).orderBy(keys: _*)
    // materialize BEFORE reading twice: the offsets and the final plan
    // must see the same range cut (see the scaladoc — re-executing the
    // range exchange can sample different boundaries)
    val local = ranged
      .withColumn("__gr_lr", row_number().over(w).cast("long"))
      .localCheckpoint()
    val counts = local
      .groupBy(col("__gr_pid")).agg(count(lit(1)).as("__gr_c"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (pid, c) =>
      val off = acc; acc += c; (pid, off)
    }
    val total = acc
    val offDf = spark.createDataFrame(offsets.toSeq).toDF("__gr_pid", "__gr_off")
    val ranked = local
      .join(broadcast(offDf), Seq("__gr_pid"))
      .withColumn(rankCol, col("__gr_lr") + col("__gr_off"))
      .drop("__gr_pid", "__gr_lr", "__gr_off")
    (ranked, total)
  }

  /**
   * Distributed exact rank WITHIN groups — `row_number().over(
   * Window.partitionBy(groups).orderBy(keys))` without the per-group
   * window task, which is a wall whenever one group dominates (the CCNet
   * giant-domain case: a group's whole population sorts in ONE task, and
   * AQE cannot split window partitions). Same construction as
   * [[globalRank]] with the group columns leading the range keys, plus:
   * the per-(pid, group) counts stay a DATAFRAME (group-cardinality x
   * partitions rows — never collected to the driver), offsets come from a
   * prefix-sum window over that tiny frame (<= `partitions` rows per
   * window partition, safe at any group cardinality), and the per-group
   * total rides along as `totalCol` (what a closed-form ntile needs). The
   * offset join-back AUTO-SELECTS broadcast vs shuffle: the offsets frame
   * is group-cardinality-sized — tiny next to the data for shard/source
   * groups, but past millions of groups it outgrows a broadcast, so a
   * cheap count of that frame picks the join (threshold
   * `graft.ranks.offsets.broadcastMaxRows`, override via
   * `broadcastOffsets = Some(_)`). The same materialize-before-
   * reading-twice checkpoint guarantees offsets and consumers observe one
   * range cut.
   */
  def groupedRank(
      df: DataFrame,
      groupCols: Seq[String],
      keys: Seq[Column],
      rankCol: String,
      totalCol: Option[String] = None,
      partitions: Int = 0,
      broadcastOffsets: Option[Boolean] = None
  ): DataFrame =
    // rank = exclusive prefix COUNT + 1; the per-group total of lit(1L)
    // is the group row count
    groupedPrefixSum(df, groupCols, keys, lit(1L), rankCol, totalCol,
      partitions, broadcastOffsets)
      .withColumn(rankCol, col(rankCol) + 1L)

  /**
   * Distributed exclusive PREFIX SUM of `value` within groups —
   * `sum(value).over(Window.partitionBy(groups).orderBy(keys)
   * .rowsBetween(unboundedPreceding, -1))` without the per-group window
   * task: the running-offset engine behind sequence packing and budget
   * fills, where a dominant shard/source would otherwise sort its whole
   * population in ONE task. Same two-phase construction as [[globalRank]]
   * with group columns leading the range keys; per-(pid, group) value
   * sums stay a DataFrame, offsets come from a prefix window over that
   * tiny frame, and the per-group value total rides along as `totalCol`.
   * ROWS-frame semantics: every physical row gets its own prefix (ties on
   * the full key tuple are interchangeable, exactly like the single
   * window). The checkpoint freezes the range cut for both reads.
   */
  def groupedPrefixSum(
      df: DataFrame,
      groupCols: Seq[String],
      keys: Seq[Column],
      value: Column,
      sumCol: String,
      totalCol: Option[String] = None,
      partitions: Int = 0,
      // the offsets frame is (group-cardinality x partitions) rows — tiny
      // for shard/source groups, but at extreme group cardinality
      // (millions of groups) it outgrows a broadcast and one more data
      // exchange is the right price. None (the default) CHOOSES: one cheap
      // count of the offsets frame (a small aggregate over the already-
      // checkpointed blocks) picks broadcast iff it holds at most
      // `graft.ranks.offsets.broadcastMaxRows` rows (default 1e6 — tens of
      // MB of (group, pid, 3 longs) rows). Some(true)/Some(false) force a
      // regime; output is identical either way (OpsSpec/CoreSpec pin it).
      broadcastOffsets: Option[Boolean] = None
  ): DataFrame = {
    require(groupCols.nonEmpty, "need at least one group column")
    require(keys.nonEmpty, "need at least one sort key")
    val spark = df.sparkSession
    import org.apache.spark.sql.expressions.Window
    val p =
      if (partitions > 0) partitions
      else spark.conf.get("spark.sql.shuffle.partitions", "32").toInt
    val rangeKeys = groupCols.map(col) ++ keys
    val ranged = df
      .withColumn("__gr_v", value.cast("long"))
      .repartitionByRange(p, rangeKeys: _*)
      .withColumn("__gr_pid", spark_partition_id())
    val w = Window
      .partitionBy((col("__gr_pid") +: groupCols.map(col)): _*)
      .orderBy(keys: _*)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = ranged
      .withColumn("__gr_ps", coalesce(sum(col("__gr_v")).over(w), lit(0L)))
      .localCheckpoint()
    val counts0 = local
      .groupBy((col("__gr_pid") +: groupCols.map(col)): _*)
      .agg(sum(col("__gr_v")).as("__gr_c"))
    // auto mode needs the frame's row count BEFORE building the join; a
    // bare count() would run the aggregation once for the decision and
    // AGAIN inside the final plan — checkpointing the tiny (pid x group)
    // frame makes both reads one materialization (blocks free via the
    // ContextCleaner, like the `local` checkpoint above)
    val counts =
      if (broadcastOffsets.isEmpty) counts0.localCheckpoint() else counts0
    // a range partition holds one contiguous key slice, so within a group
    // the pids appear in key order: the group-prefix sum over pid IS the
    // offset of this partition's local prefixes
    val wOff = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(col("__gr_pid").asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wTot = Window.partitionBy(groupCols.map(col): _*)
    // null-SAFE join-back: a null group value is a regular group (exactly
    // like Window.partitionBy treats it) — Seq-keyed equi-joins would
    // silently DROP null-group rows, so the condition uses <=> on every
    // group column (pid is never null; === keeps it codegen-simple)
    val offs0 = counts
      .withColumn("__gr_off", coalesce(sum(col("__gr_c")).over(wOff), lit(0L)))
      .withColumn("__gr_tot", sum(col("__gr_c")).over(wTot))
      .drop("__gr_c")
      .withColumnRenamed("__gr_pid", "__gr_pid2")
    val offs = groupCols.zipWithIndex.foldLeft(offs0) { case (f, (g, i)) =>
      f.withColumnRenamed(g, s"__gr_g$i")
    }
    val cond = groupCols.zipWithIndex
      .map { case (g, i) => col(g) <=> col(s"__gr_g$i") }
      .foldLeft(col("__gr_pid") === col("__gr_pid2"))(_ && _)
    val useBroadcast = broadcastOffsets.getOrElse {
      val maxRows = spark.conf.getOption("graft.ranks.offsets.broadcastMaxRows")
        .map(_.toLong).getOrElse(1000000L)
      // decision job over the checkpointed blocks: counting the tiny
      // (pid x group) aggregate, not the data — the one number that
      // actually bounds the broadcast
      counts.count() <= maxRows
    }
    val joined = local
      .join(if (useBroadcast) broadcast(offs) else offs, cond)
      .withColumn(sumCol, col("__gr_ps") + col("__gr_off"))
      .drop(groupCols.indices.map(i => s"__gr_g$i"): _*)
    totalCol.fold(joined.drop("__gr_tot"))(t => joined.withColumnRenamed("__gr_tot", t))
      .drop("__gr_pid", "__gr_pid2", "__gr_ps", "__gr_off", "__gr_v")
  }

  /**
   * Spark/DuckDB `ntile(buckets)` as a CLOSED FORM over a precomputed
   * global rank (both engines share the semantics: with `n` rows the first
   * `n % buckets` buckets hold one extra row). Pure column arithmetic —
   * zero additional shuffle — so an equal-population cut never needs the
   * single-task global window `ntile` itself would cost.
   */
  def ntileFromRank(rank: Column, n: Long, buckets: Int): Column = {
    require(buckets >= 1, "buckets must be positive")
    val q = n / buckets
    val rem = n % buckets
    if (q == 0L) rank.cast("int") // more buckets than rows: rank IS the bucket
    else {
      val cut = rem * (q + 1) // ranks <= cut land in the first `rem` buckets
      // integer `div`, not `/`: Column./ is double division, which loses
      // exactness once the rank passes 2^53 (the packSequences convention)
      when(rank <= cut, call_function("div", rank - 1, lit(q + 1)) + 1)
        .otherwise(lit(rem) + call_function("div", rank - 1 - cut, lit(q)) + 1)
        .cast("int")
    }
  }

  /**
   * [[ntileFromRank]] with a PER-ROW total — the form a grouped cut needs
   * (`n` = [[groupedRank]]'s `totalCol`, different per group). Lazy
   * CaseWhen evaluation guards the `div` legs: the q-is-0 branch
   * (more buckets than rows: rank IS the bucket) is decided first, so
   * the integral divisions never see a zero divisor under ANSI.
   */
  def ntileFromRankCol(rank: Column, n: Column, buckets: Int): Column = {
    require(buckets >= 1, "buckets must be positive")
    val q = call_function("div", n, lit(buckets.toLong))
    val rem = n % buckets
    val cut = rem * (q + 1)
    when(q === 0L, rank)
      .when(rank <= cut, call_function("div", rank - 1, q + 1) + 1)
      .otherwise(rem + call_function("div", rank - 1 - cut, q) + 1)
      .cast("int")
  }

  /**
   * Rows BEFORE bucket `bucket` under [[ntileFromRank]]'s cut — the rank
   * offset where a bucket starts. Lets a per-bucket position be derived
   * from a global rank without any bucket-keyed window.
   */
  def ntileOffset(bucket: Column, n: Long, buckets: Int): Column = {
    val q = n / buckets
    val rem = n % buckets
    (bucket - 1).cast("long") * q + least(bucket.cast("long") - 1, lit(rem))
  }
}
