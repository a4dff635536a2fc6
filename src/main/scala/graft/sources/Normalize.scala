package graft.sources

import graft.planner.Planner
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Batch ingest normalization: the columnar equivalents of the reference's
 * per-series online value functions (atlas-core norm package), applied to a
 * canonical datapoint frame (`tags`, `ts`, `value`). These are INGEST-time
 * transforms — in a deployed pipeline they run once as data lands (the
 * streaming forms live in graft.streaming.StreamRunner) and queries read the
 * normalized store; evaluating them per query, as the test catalog does,
 * still scales (two datapoint-cardinality shuffles keyed by series) but
 * repeats work the store would amortize.
 *
 * DsType semantics (model/DsType.scala:17-36): the `atlas.dstype` tag decides
 * the pipeline per series — `counter` values are monotonic totals converted
 * to per-second rates before alignment; everything else publishes values
 * that are already per-slot meaningful.
 */
object Normalize {

  val DsTypeTag = "atlas.dstype"

  /**
   * Counter -> per-second rate (norm/RateValueFunction.scala:22-40): for
   * series tagged `atlas.dstype=counter`, rate_i = (v_i - v_{i-1}) /
   * ((t_i - t_{i-1})/1000), clamped to 0 on non-positive delta or duration
   * (counter resets), first sample dropped. Non-counter rows pass through
   * unchanged. One window shuffle keyed by series id — the same key the
   * downstream normalization groups on.
   */
  def rateConvert(dp: DataFrame): DataFrame = {
    val isCounter = coalesce(col("tags").getItem(DsTypeTag) === "counter", lit(false))
    val others = dp.filter(!isCounter).select(col("tags"), col("ts"), col("value"))
    val sid = Planner.seriesId(col("tags"))
    // Duplicate timestamps within a series would make the lag-based rates
    // order-dependent (arbitrary tie order, one dup sees duration 0):
    // collapse to one row per (series, ts) first, keeping the max value —
    // the same dedup rule weightedNormalize applies downstream. The dedup
    // window shares the rate window's partitioning and its sort is a
    // prefix-compatible extension, so this costs no extra exchange or sort.
    val wDedup = Window.partitionBy(sid).orderBy(col("ts").asc, col("value").desc)
    val w = Window.partitionBy(sid).orderBy(col("ts"))
    val deduped = dp
      .filter(isCounter)
      .withColumn("_dupTs", lag(col("ts"), 1).over(wDedup))
      .filter(col("_dupTs").isNull || col("_dupTs") =!= col("ts"))
      .drop("_dupTs")
    val prevTs = lag(col("ts"), 1).over(w)
    val prevV = lag(col("value"), 1).over(w)
    val durationSec = (col("ts") - prevTs).cast("double") / lit(1000.0)
    val delta = col("value") - prevV
    val rate = when(durationSec <= 0.0 || delta <= 0.0, 0.0).otherwise(delta / durationSec)
    val converted = deduped
      .withColumn("_rate", when(prevTs.isNull, lit(null)).otherwise(rate))
      .filter(col("_rate").isNotNull)
      .select(col("tags"), col("ts"), col("_rate").cast("double").as("value"))
    others.unionByName(converted)
  }

  /**
   * RRDtool-style weighted alignment with heartbeat expiry
   * (norm/NormalizeValueFunction.scala:36-120), as a columnar plan instead
   * of a per-series recurrence. A sample (t, v) covers the span since the
   * series' previous sample — or exactly one step when there is none or the
   * gap exceeds `heartbeat` — and every step interval it overlaps receives
   * v scaled by the covered fraction; the slot value is the sum of its
   * pieces. The open-slot partial that the online form carries in state is
   * reproduced by the "carry" pieces, which are emitted only when the slot
   * is actually finalized by a later sample within the heartbeat (otherwise
   * they die exactly like the reference's heartbeatExpire path).
   *
   * Requires heartbeat >= step (every wiring in the reference satisfies
   * this; it guarantees expiry can only happen on a slot-crossing gap, which
   * is what lets the carry survival be decided per slot instead of per
   * sample chain).
   *
   * Output: one row per (series, slot-with-data) with `ts` = interval START
   * (graft's frame convention; the reference stamps the interval end).
   * Plan shape at scale: one shuffle keyed by series (both windows reuse
   * it), one keyed by (series, slot) for the piece sum — the same keys the
   * planner's own normalization uses.
   */
  def weightedNormalize(dp: DataFrame, step: Long, heartbeat: Long): DataFrame = {
    require(heartbeat >= step, s"heartbeat ($heartbeat) must be >= step ($step)")

    val keyed = dp
      .select(Planner.seriesId(col("tags")).as("_k"), col("ts"), col("value"))
      // duplicate timestamps: the online form keeps the first arrival; batch
      // has no arrival order, so take the max for determinism
      .groupBy(col("_k"), col("ts"))
      .agg(max(col("value")).as("v"))

    val w = Window.partitionBy(col("_k")).orderBy(col("ts"))
    val prevTs = lag(col("ts"), 1).over(w)
    val nextTs = lead(col("ts"), 1).over(w)
    // span covered by this sample: (cov, ts], one step on first/expired
    val cov = when(prevTs.isNull || col("ts") - prevTs > heartbeat, col("ts") - step)
      .otherwise(prevTs)
    // smallest boundary >= ts (the slot this sample's carry piece feeds)
    val ceilB = col("ts") - lit(1) - pmod(col("ts") - lit(1), lit(step)) + lit(step)
    val marked = keyed
      .withColumn("_cov", cov)
      .withColumn("_ceil", ceilB)
      .withColumn("_next", nextTs)

    // Carry survival per (series, slot): the open slot is finalized iff the
    // LAST sample inside it has a successor within the heartbeat. With
    // heartbeat >= step, gaps between samples inside one slot can never
    // expire, so this single flag decides every carry piece in the slot.
    val wSlot = Window.partitionBy(col("_k"), col("_ceil"))
    val lastInSlot = max(col("ts")).over(wSlot)
    val crossOk = col("_next").isNotNull && (col("_next") - col("ts") <= heartbeat)
    val withCarry = marked.withColumn("_carryOk",
      max(when(col("ts") === lastInSlot && crossOk, 1).otherwise(0)).over(wSlot) === 1)

    // explode each sample into its overlapped slots; boundary b covers
    // (b - step, b]; pieces beyond the sample's own time are the carry
    val pieces = withCarry
      .select(col("_k"), col("v"), col("ts"), col("_cov"), col("_carryOk"),
        explode(sequence(
          col("_cov") - pmod(col("_cov"), lit(step)) + lit(step),
          col("_ceil"),
          lit(step))).as("_b"))
      .filter(col("_b") <= col("ts") || col("_carryOk"))
      .withColumn("_piece",
        col("v") * (least(col("ts"), col("_b")) - greatest(col("_cov"), col("_b") - lit(step)))
          .cast("double") / lit(step.toDouble))

    val slots = pieces
      .groupBy(col("_k"), col("_b"))
      .agg(sum(col("_piece")).as("value"))

    // re-attach tags at series cardinality (carrying the map through the
    // hot aggregations would force SortAggregate on the big frames)
    val tagsOf = dp
      .select(Planner.seriesId(col("tags")).as("_k"), col("tags"))
      .dropDuplicates("_k")
    slots
      .join(tagsOf, "_k")
      .select(col("tags"), (col("_b") - lit(step)).as("ts"), col("value"))
  }

  /**
   * Counter pipeline (NormalizationCache.updateCounter wiring): rate
   * conversion, then weighted alignment with the reference's heartbeat
   * rule (2*step, floored at two minutes for sub-minute steps).
   *
   * Runs as a ONE-shuffle kernel: group by series with a secondary sort on
   * (ts, value desc), then the per-series online forms (core.IngestNorm —
   * the exact objects streaming carries in GroupState) consume the sorted
   * run; duplicate timestamps keep the max value, the same dedup rule as
   * the columnar forms. Composing [[rateConvert]] + [[weightedNormalize]]
   * instead costs four datapoint-cardinality exchanges (dedup window, rate
   * window, slot-carry window, piece sum) plus a tags re-attach join —
   * IngestNormSpec pins columnar == online, and the driver's recursive
   * DuckDB rate oracle checks this pipeline end to end, so the columnar
   * building blocks stay as the independently-tested specification.
   */
  def counters(dp: DataFrame, step: Long): DataFrame = {
    val spark = dp.sparkSession
    import spark.implicits._
    // non-counter (client-computed rate) heartbeat = step, the same shared
    // rule streaming uses — the two ingest paths must agree on expiry
    val rateHb = graft.core.IngestNorm.heartbeatFor(isCounter = false, step)
    // The series-keyed exchange ships (k, ctr, ts, value) ONLY — the tags
    // map (the widest column, and a per-row Catalyst->Scala map decode in
    // the kernel) is re-attached at SERIES cardinality after the kernel
    // (guide §2.3: shuffle keys and metadata, not payloads). The map is a
    // pure function of the series id, so the dedup keeps one arbitrary
    // (identical) copy per key and the join reproduces the old per-row
    // tags exactly. The tags branch shares dp's lineage; its shuffle is
    // series-cardinality after map-side partial aggregation, and identical
    // dp exchanges are deduplicated by ReuseExchange where dp itself ends
    // in one.
    val keyed = dp
      .select(
        Planner.seriesId(col("tags")).as("k"),
        coalesce(col("tags").getItem(DsTypeTag) === "counter", lit(false)).as("ctr"),
        col("ts"), col("value"))
      .as[(String, Boolean, Long, Double)]
    val slots = keyed
      .groupByKey(_._1)
      .flatMapSortedGroups(col("ts").asc, col("value").desc) { (k, it) =>
        var algo: graft.core.IngestNorm.OnlineIngest = null
        var lastTs = Long.MinValue
        val out = List.newBuilder[(String, Long, Double)]
        it.foreach { case (_, ctr, t, v) =>
          if (algo == null) {
            algo =
              if (ctr) new graft.core.IngestNorm.OnlineCounter(step)
              else new graft.core.IngestNorm.OnlineWeightedNorm(step, rateHb)
          }
          if (t != lastTs) { // duplicate timestamps: first row of the run = max
            lastTs = t
            // online form stamps the interval END; the frame convention is START
            algo.next(t, v).foreach { case (b, sv) => out += ((k, b - step, sv)) }
          }
        }
        out.result()
      }
      .toDF("k", "ts", "value")
    val tagsOf = dp
      .select(Planner.seriesId(col("tags")).as("k"), col("tags"))
      .dropDuplicates("k")
    slots
      .join(tagsOf, "k")
      .select(col("tags"), col("ts"), col("value"))
  }
}
