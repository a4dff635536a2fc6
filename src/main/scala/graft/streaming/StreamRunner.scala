package graft.streaming

import graft.core.{EvalContext, OnlineAlgorithm}
import graft.asl.Query
import graft.planner.{Planner, QueryCompiler}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Streaming evaluation (reference atlas-eval Evaluator pipeline, SURVEY §3.3):
 *
 *  1. raw datapoints -> step-aligned per-series partial aggregates with a
 *     watermark late-data policy (the `TimeGrouped` analog: events older
 *     than the rolling window are dropped by Spark and surfaced via
 *     StreamingQueryListener metrics);
 *  2. per-step cross-series aggregation (`FinalExprEval`'s DataExpr stage);
 *  3. stateful operators via flatMapGroupsWithState, carrying the online
 *     algorithm's state across triggers keyed by series — gaps between a
 *     series' datapoints are advanced with NaN exactly like the batch
 *     planner's dense grid (StatefulExpr.OnlineExpr.eval advance-with-NaN,
 *     reference StatefulExpr.scala:310-321).
 *
 * At scale each stage is a single keyed shuffle: (series, window) for the
 * partial agg, series id for the stateful stage — the same keys the batch
 * planner shuffles on, so a 1000-executor cluster partitions identically.
 */
object StreamRunner {

  /** One normalized slot of one series. */
  final case class SlotValue(key: String, t: Long, value: Double)

  /**
   * Step-aligned ingest normalization: datapoints within (series, slot) sum,
   * like the batch planner. Emits append-mode rows once the watermark passes
   * the slot end.
   */
  def normalize(
      datapoints: DataFrame,
      q: Query,
      step: Long,
      watermark: String = "10 minutes"
  ): DataFrame = {
    // Note: Catalyst pushes the tag predicate below the EventTimeWatermark
    // node, so the watermark advances on MATCHING rows only — windows close
    // when the subscribed series' own data advances, and a quiet query simply
    // holds its last windows open rather than emitting empty results.
    datapoints
      .withColumn("event_time", timestamp_millis(col("ts")))
      .withWatermark("event_time", watermark)
      .filter(QueryCompiler.compile(q, col("tags")))
      .groupBy(
        window(col("event_time"), s"$step milliseconds"),
        Planner.seriesId(col("tags")).as("key")
      )
      .agg(sum(col("value")).as("value"))
      .select(col("window"), col("key"),
        unix_millis(col("window.start")).as("t"), col("value"))
  }

  /**
   * Cross-series per-step sum on top of normalized slots (`:sum`). Chained
   * stateful aggregation: groups on the upstream `window` struct directly so
   * the watermark propagates (the Spark 3.4+ multi-stateful-operator form —
   * re-watermarking a derived column would stall the second aggregation).
   */
  def sumAll(normalized: DataFrame): DataFrame =
    normalized
      .groupBy(col("window"))
      .agg(sum(col("value")).as("value"))
      .select(unix_millis(col("window.start")).as("t"), col("value"))

  /** Serializable online-algorithm state carried in GroupState. */
  final case class AlgoState(
      lastT: Long,
      currentSample: Int,
      missing: Int,
      sp: Double,
      bp: Double
  )

  /**
   * Streaming `:des`: per-series double exponential smoothing with state
   * carried across triggers. Slots missing between a series' datapoints are
   * fed as NaN so the result matches the batch dense-grid evaluation.
   *
   * Input must be the append-mode output of [[normalize]] (slots arrive in
   * event-time order per key once finalized by the watermark).
   */
  def streamingDes(
      normalized: Dataset[SlotValue],
      ctx: EvalContext,
      training: Int,
      alpha: Double,
      beta: Double
  ): Dataset[SlotValue] = {
    val spark = normalized.sparkSession
    import spark.implicits._
    val step = ctx.step
    val start = ctx.start

    def advance(state: AlgoState, v: Double): (AlgoState, Double) = {
      // OnlineDes.next (reference OnlineDes.scala:29-55) on explicit state.
      val retval = if (state.currentSample >= training) state.sp else Double.NaN
      val next =
        if (!v.isNaN) {
          if (state.currentSample == 0)
            state.copy(currentSample = 1, sp = v, bp = 0.0)
          else {
            val sn = alpha * v + (1 - alpha) * (state.sp + state.bp)
            val bn = beta * (sn - state.sp) + (1 - beta) * state.bp
            state.copy(currentSample = state.currentSample + 1, sp = sn, bp = bn)
          }
        } else state.copy(missing = state.missing + 1)
      (next, retval)
    }

    normalized
      .groupByKey(_.key)
      .flatMapGroupsWithState[AlgoState, SlotValue](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[SlotValue], gstate: GroupState[AlgoState]) =>
          var st = gstate.getOption.getOrElse(
            AlgoState(start - step, 0, 0, Double.NaN, Double.NaN))
          val out = List.newBuilder[SlotValue]
          rows.toSeq.sortBy(_.t).foreach { row =>
            // advance-with-NaN over slots with no data for this series
            var t = st.lastT + step
            while (t < row.t) {
              val (s2, v) = advance(st, Double.NaN)
              st = s2.copy(lastT = t)
              if (!v.isNaN) out += SlotValue(key, t, v)
              t += step
            }
            val (s3, v) = advance(st, row.value)
            st = s3.copy(lastT = row.t)
            if (!v.isNaN) out += SlotValue(key, row.t, v)
          }
          gstate.update(st)
          out.result().iterator
      }
  }
}
