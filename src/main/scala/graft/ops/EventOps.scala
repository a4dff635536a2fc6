package graft.ops

import graft.asl.{EventExpr, Query}
import graft.planner.QueryCompiler
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Raw-event operators (reference EventExpr / atlas-lwc-events, SURVEY §2.9):
 * events are arbitrary rows matched by tag queries; `:table` projects named
 * columns, `:sample` counts per group per step and carries a deterministic
 * sample of the projected columns (we use min() as the sample so results are
 * stable under parallel execution — the reference's "first" is
 * arrival-order-dependent, which has no stable meaning in a distributed
 * scan).
 */
object EventOps {

  /** The driver's events table with a tags view for query matching, native
    * columns preserved, timestamps in epoch ms. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    graft.sources.Datapoints.configure(spark)
    spark.read.parquet(s"$sfDir/events.parquet")
      .withColumn("tms", graft.sources.Datapoints.epochMs(col("ts")))
      .withColumn(
        "tags",
        map(
          lit("name"), col("event_type"),
          lit("usr"), concat(lit("u"), lpad(col("user_id").cast("string"), 3, "0"))
        )
      )
  }

  /** Evaluate a parsed [[graft.asl.EventExpr]] against an event frame. */
  def eval(expr: EventExpr, events: DataFrame, stepMs: Long): DataFrame = expr match {
    case EventExpr.Raw(q)           => events.filter(QueryCompiler.compile(q, col("tags")))
    case EventExpr.Table(q, cols)   => table(events, q, cols)
    case EventExpr.Sample(q, by, p) => sample(events, q, by, p, stepMs)
  }

  /** `:table` — pass events matching the query, projecting `cols`. */
  def table(events: DataFrame, q: Query, cols: Seq[String]): DataFrame =
    events
      .filter(QueryCompiler.compile(q, col("tags")))
      .select(cols.map(col): _*)

  /**
   * Streaming `:sample` (the lwc-events delivery shape): watermarked
   * per-step windows over an event stream; append mode emits each
   * (group, window) row once the watermark finalizes it. `:table` and raw
   * queries need no streaming variant — they are stateless filters and
   * projections, so [[eval]] applies to a streaming frame unchanged.
   */
  def streamingSample(
      events: DataFrame,
      q: Query,
      sampleBy: Seq[String],
      projections: Seq[String],
      stepMs: Long,
      watermark: String = "10 minutes"
  ): DataFrame = {
    val aggs = count(lit(1)).cast("double").as("n_events") +:
      projections.map(p => min(col(p)).as(s"sample_$p"))
    events
      .withColumn("event_time", timestamp_millis(col("tms")))
      .withWatermark("event_time", watermark)
      .filter(QueryCompiler.compile(q, col("tags")))
      .groupBy(sampleBy.map(col) :+ window(col("event_time"), s"$stepMs milliseconds"): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(
        sampleBy.map(col) ++
          (unix_millis(col("window.start")).as("t") +:
            (col("n_events") +: projections.map(p => col(s"sample_$p")))): _*)
  }

  /**
   * `:sample` — per (group keys, step interval): event count plus a stable
   * sample of each projection column.
   */
  def sample(
      events: DataFrame,
      q: Query,
      sampleBy: Seq[String],
      projections: Seq[String],
      stepMs: Long
  ): DataFrame = {
    val bucket = (col("tms") - pmod(col("tms"), lit(stepMs))).as("t")
    val aggs = count(lit(1)).cast("double").as("n_events") +:
      projections.map(p => min(col(p)).as(s"sample_$p"))
    events
      .filter(QueryCompiler.compile(q, col("tags")))
      .groupBy(sampleBy.map(col) :+ bucket: _*)
      .agg(aggs.head, aggs.tail: _*)
  }

  /**
   * Gap-based sessionization: group each user's events into sessions
   * separated by more than `gapMs` of inactivity and emit one row per
   * session (start/end epoch-ms, event count, value sum). The standard
   * clickstream / interaction-log preparation step before per-session
   * features feed a training pipeline.
   *
   * Built on Spark's `session_window`, whose merge bound is INCLUSIVE
   * (events exactly gapMs apart share a session; a new session starts when
   * the gap to the previous event exceeds gapMs — the gaps-and-islands
   * rule with `diff > gap`). Grouping by (user_id, session_window) plans as ONE
   * exchange on user_id; the session merge itself is a sort within the
   * partition, and works unchanged over a watermarked stream (the
   * Structured Streaming native session-window path).
   *
   * Scale note: state per partition is bounded by one open session per
   * user, not by event volume; a key whose events are pathologically dense
   * degrades only its own partition's sort, which AQE skew handling splits.
   */
  def sessionize(
      events: DataFrame,
      gapMs: Long,
      watermark: Option[String] = None
  ): DataFrame = {
    val timed = events.withColumn("event_time", timestamp_millis(col("tms")))
    // streaming callers bound lateness so append mode can finalize a session
    // once the watermark passes its close; batch callers need no watermark
    watermark.fold(timed)(w => timed.withWatermark("event_time", w))
      .groupBy(
        col("user_id"),
        session_window(col("event_time"), s"$gapMs milliseconds").as("sw"))
      .agg(
        min(col("tms")).as("session_start"),
        max(col("tms")).as("session_end"),
        count(lit(1)).cast("double").as("n_events"),
        round(sum(col("value")) + graft.core.NanMath.RoundEps, 4).as("sum_value"))
      .select(
        col("user_id"), col("session_start"), col("session_end"),
        col("n_events"), col("sum_value"))
  }
}
