package graft.ops

import graft.asl.{EventExpr, Query}
import graft.sources.Pq
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
    Pq.read(spark, s"$sfDir/events.parquet")
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

  /**
   * Schema-on-read extraction of the JSON properties payload — the
   * semi-structured half of an event record (`props`) becomes typed
   * columns the planner can push down and aggregate on. `fields` maps
   * field name -> Spark SQL type string (e.g. "k" -> "bigint").
   *
   * Scale shape: `from_json` with an explicit schema is a codegen'd
   * projection over the scan — no shuffle, no inference pass over the
   * corpus (schema inference at 100 TB is a full extra read; declaring
   * the handful of fields a query needs is both faster and pruning-
   * friendly, since only those fields are parsed out of each payload).
   */
  def extractProps(
      events: DataFrame,
      fields: Map[String, String],
      propsCol: String = "props"
  ): DataFrame = {
    require(fields.nonEmpty, "declare at least one field to extract")
    val ddl = fields.toSeq.sortBy(_._1)
      .map { case (n, t) => s"`$n` $t" }.mkString(", ")
    val schema = org.apache.spark.sql.types.StructType.fromDDL(ddl)
    val parsed = events.withColumn("__props", from_json(col(propsCol), schema))
    fields.keys.toSeq.sorted
      .foldLeft(parsed) { (df, f) => df.withColumn(f, col("__props").getField(f)) }
      .drop("__props")
  }

  /**
   * Funnel analysis: how many users complete each prefix of an ordered
   * step sequence. The chain is anchored at the user's EARLIEST step-0
   * event; each later step is taken greedily — the earliest qualifying
   * event strictly after the previous step's — and must land within
   * `windowMs` of the anchor. Greedy-earliest is optimal for prefix
   * existence, so this is the standard funnel definition, and the DuckDB
   * oracle's chained-min CTEs reproduce it exactly (same-timestamp events
   * can advance at most one step because each step requires a strictly
   * later time, so tie order never changes the result).
   *
   * Scale shape: events filter to the step types AT THE SCAN, then ONE
   * exchange on the user; flatMapSortedGroups streams each user's events
   * in time order through an O(1)-state matcher — no per-user collect, no
   * self-joins per step. Output is step-cardinality.
   */
  def funnel(
      events: DataFrame,
      steps: Seq[String],
      windowMs: Long,
      typeCol: String = "event_type",
      userCol: String = "user_id",
      tsCol: String = "tms"
  ): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    require(windowMs > 0, "windowMs must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    val stepsArr = steps.toArray
    // a funnel is a per-IDENTITY chain: NULL users (anonymous events)
    // have no identity to chain, so they are excluded outright — the
    // same WHERE user_id IS NOT NULL the oracle applies; pooling them as
    // one pseudo-user would chain unrelated anonymous events
    val reached = events
      .filter(col(userCol).isNotNull && col(typeCol).isin(steps: _*))
      .select(col(userCol).cast("long"), col(tsCol).cast("long"), col(typeCol))
      .as[(Long, Long, String)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col(tsCol)) { (_, it) =>
        var r = 0
        var anchor = 0L
        var last = 0L
        it.foreach { case (_, ts, tp) =>
          if (r == 0) {
            if (tp == stepsArr(0)) { anchor = ts; last = ts; r = 1 }
          } else if (r < stepsArr.length && tp == stepsArr(r) &&
              ts > last && ts - anchor <= windowMs) {
            last = ts; r += 1
          }
        }
        if (r > 0) Iterator.single(r) else Iterator.empty
      }
    val counts = reached
      .toDF("reached")
      .select(explode(sequence(lit(1L), col("reached").cast("long"))).as("step"))
      .groupBy("step")
      .agg(count(lit(1)).as("n_users"))
    // every step appears in the output, zero-reached ones included —
    // matching the oracle's per-step UNION arms (a funnel report with a
    // silently missing tail step reads as "no data", not "zero users")
    val allSteps = spark.range(1, steps.length + 1).select(col("id").as("step"))
    allSteps
      .join(counts, Seq("step"), "left")
      .select(col("step"), coalesce(col("n_users"), lit(0L)).as("n_users"))
  }

  /**
   * Time-to-convert distribution per funnel step: for every user the
   * [[funnel]] greedy-earliest matcher reaches step `s >= 2`, the delay
   * `t_s - t_anchor` in ms; reported per step as user count + exact
   * quantile_cont percentiles (via [[Quantiles.groupedExact]] — the
   * funnel's k-row step cardinality makes the exact path cheap). The
   * greedy-earliest chain equals the chained-min recurrence, so the
   * DuckDB oracle reproduces the per-user times exactly.
   *
   * Scale shape: same single user-keyed exchange as [[funnel]] (events
   * filter to step types at the scan); the quantile stage runs over
   * (step, dt) rows at converted-user cardinality, grouped into at most
   * |steps|-1 cells.
   */
  def funnelTimes(
      events: DataFrame,
      steps: Seq[String],
      windowMs: Long,
      pcts: Seq[Double] = Seq(0.5, 0.9),
      names: Seq[String] = Seq("p50_ms", "p90_ms"),
      typeCol: String = "event_type",
      userCol: String = "user_id",
      tsCol: String = "tms"
  ): DataFrame = {
    require(steps.length >= 2, "time-to-convert needs at least two steps")
    require(windowMs > 0, "windowMs must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    val stepsArr = steps.toArray
    // NULL users excluded — the per-identity chain rule (see funnel)
    val dts = events
      .filter(col(userCol).isNotNull && col(typeCol).isin(steps: _*))
      .select(col(userCol).cast("long"), col(tsCol).cast("long"), col(typeCol))
      .as[(Long, Long, String)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col(tsCol)) { (_, it) =>
        // the funnel matcher, recording each reached step's time
        var r = 0
        var anchor = 0L
        var last = 0L
        val times = new Array[Long](stepsArr.length)
        it.foreach { case (_, ts, tp) =>
          if (r == 0) {
            if (tp == stepsArr(0)) { anchor = ts; last = ts; times(0) = ts; r = 1 }
          } else if (r < stepsArr.length && tp == stepsArr(r) &&
              ts > last && ts - anchor <= windowMs) {
            times(r) = ts; last = ts; r += 1
          }
        }
        (1 until r).iterator.map(s => ((s + 1).toLong, (times(s) - anchor).toDouble))
      }
      .toDF("step", "dt")
      .localCheckpoint() // two consumers (counts + quantiles): match once
    val counts = dts.groupBy(col("step")).agg(count(lit(1)).as("n_users"))
    counts.join(
      Quantiles.groupedExact(dts, "step", "dt", pcts, names), Seq("step"))
  }

  /**
   * Rolling window of distinct active users (DAU/WAU/MAU): for every UTC
   * day OBSERVED in the data, the count of distinct users active in the
   * trailing `windowDays` days — the growth-dashboard staple next to
   * [[retention]].
   *
   * Scale shape: per-user distinct active days collapse first (ONE user
   * exchange, calendar-bounded like retention); each user-day then fans
   * out to the <= windowDays output days it contributes to (explode of a
   * bounded sequence, user-day x window cardinality — never event
   * cardinality), a semi-join restricts to observed days, and the final
   * count runs over distinct (day, user) rows.
   */
  def rollingActiveUsers(
      events: DataFrame,
      windowDays: Int = 7,
      userCol: String = "user_id",
      tsCol: String = "tms"
  ): DataFrame = {
    require(windowDays >= 1, "windowDays must be positive")
    // count(DISTINCT user_id) semantics: NULL users (anonymous events)
    // are not countable identities and are excluded — exactly what the
    // oracle's count(DISTINCT) does with NULL
    val ud = events
      .filter(col(userCol).isNotNull)
      .select(col(userCol).cast("long").as("user"),
        floor(col(tsCol).cast("long") / lit(86400000L)).as("day"))
      .distinct()
    val days = ud.select(col("day")).distinct()
    ud
      .select(col("user"),
        explode(sequence(col("day"), col("day") + (windowDays - 1))).as("rday"))
      .join(days.select(col("day").as("rday")), Seq("rday"), "left_semi")
      .distinct()
      .groupBy(col("rday").as("day"))
      .agg(count(lit(1)).as("active_users"))
  }

  /**
   * Last-touch attribution: each conversion event credits the most recent
   * PRECEDING touch event of the same user (strictly earlier in the
   * (time, event_id) order) within `windowMs`; conversions with no
   * in-window touch bucket as `direct`. Returns (touch_type,
   * n_conversions) — the marketing-attribution staple.
   *
   * Scale shape: one user-keyed exchange; the running last-touch carry is
   * a within-partition `last(_, ignoreNulls)` window (the join_asof
   * union-carry shape — no touches-x-conversions range join), and the
   * final count aggregates into at most |touchTypes| + 1 cells.
   *
   * Anonymous traffic (public contract, all three attribution kernels):
   * NULL-user events pool into ONE pseudo-identity — an anonymous
   * conversion can credit a DIFFERENT visitor's anonymous touch. That is
   * deliberate (the funnel family instead excludes NULL users, because a
   * funnel asserts one identity's ordered journey; attribution only
   * distributes credit), but it means meaningful per-visitor anonymous
   * attribution requires resolving an upstream session/device key into
   * `userCol` BEFORE calling — or pre-filtering `userCol IS NOT NULL` to
   * get the funnel family's exclusion semantics.
   */
  def lastTouchAttribution(
      events: DataFrame,
      conversionType: String,
      touchTypes: Seq[String],
      windowMs: Long,
      typeCol: String = "event_type",
      userCol: String = "user_id",
      tsCol: String = "tms",
      idCol: String = "event_id"
  ): DataFrame = {
    require(touchTypes.nonEmpty && !touchTypes.contains(conversionType),
      "touch types must be non-empty and distinct from the conversion type")
    require(windowMs > 0, "windowMs must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol))
      .orderBy(col("t"), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .filter(col(typeCol).isin(conversionType +: touchTypes: _*))
      .select(col(userCol), col(tsCol).cast("long").as("t"), col(idCol), col(typeCol))
      .withColumn("lt",
        last(when(col(typeCol) =!= conversionType,
          struct(col("t").as("tt"), col(typeCol).as("ty"))), ignoreNulls = true).over(w))
      .filter(col(typeCol) === conversionType)
      .select(
        when(col("lt").isNotNull && col("t") - col("lt.tt") <= windowMs, col("lt.ty"))
          .otherwise(lit("direct")).as("touch_type"))
      .groupBy(col("touch_type"))
      .agg(count(lit(1)).as("n_conversions"))
  }

  /**
   * First-touch attribution — the [[lastTouchAttribution]] twin crediting
   * the EARLIEST in-window preceding touch. A running-carry window cannot
   * express it (the window's left edge depends on each conversion's own
   * time), so this is a sorted-group kernel: per user, touches enter a
   * time-ordered deque, each conversion evicts expired entries from the
   * front and credits the head — O(events) per user, same single
   * user-keyed exchange. Anonymous traffic pools into one pseudo-identity
   * — see the contract note on [[lastTouchAttribution]].
   */
  def firstTouchAttribution(
      events: DataFrame,
      conversionType: String,
      touchTypes: Seq[String],
      windowMs: Long,
      typeCol: String = "event_type",
      userCol: String = "user_id",
      tsCol: String = "tms",
      idCol: String = "event_id"
  ): DataFrame = {
    require(touchTypes.nonEmpty && !touchTypes.contains(conversionType),
      "touch types must be non-empty and distinct from the conversion type")
    require(windowMs > 0, "windowMs must be positive")
    val spark = events.sparkSession
    import spark.implicits._
    events
      .filter(col(typeCol).isin(conversionType +: touchTypes: _*))
      .select(col(userCol).cast("long"), col(tsCol).cast("long"),
        col(idCol).cast("long"), col(typeCol))
      .as[(Option[Long], Long, Long, String)] // NULL user = ONE anonymous group
      .groupByKey(_._1)
      .flatMapSortedGroups(col(tsCol), col(idCol)) { (_, it) =>
        val touches = new java.util.ArrayDeque[(Long, String)]()
        it.flatMap { case (_, t, _, tp) =>
          if (tp != conversionType) {
            touches.addLast((t, tp))
            Iterator.empty
          } else {
            while (!touches.isEmpty && t - touches.peekFirst()._1 > windowMs)
              touches.pollFirst()
            Iterator.single(
              if (touches.isEmpty) "direct" else touches.peekFirst()._2)
          }
        }
      }
      .toDF("touch_type")
      .groupBy(col("touch_type"))
      .agg(count(lit(1)).as("n_conversions"))
  }

  /**
   * Multi-touch attribution — EVERY in-window preceding touch of a
   * conversion shares its credit, under one of the standard weighting
   * models marketing analytics actually runs:
   *
   *   - `linear`: 1/n to each of the n in-window touches;
   *   - `time_decay`: weight ∝ 2^(-(t_conv - t_touch)/halfLifeMs),
   *     normalized per conversion — recency-biased credit;
   *   - `position` (U-shaped): 40% first touch, 40% last, the remaining
   *     20% split over the middles (n = 1 takes 1.0, n = 2 split 0.5/0.5).
   *
   * A conversion with no in-window touch credits `direct` with 1.0.
   * "Preceding" is the same (t, id) lexicographic order the first/last-
   * touch operators use, so the three model families agree on which
   * touches are eligible. Every conversion distributes exactly 1.0 of
   * credit, so `sum(credit) == conversions` — the invariant the spec pins.
   *
   * Scale shape: one user-keyed exchange into a sorted-group kernel
   * (same as [[firstTouchAttribution]]): touches enter a time-ordered
   * deque, expired entries evict from the front as time advances (memory
   * bounded by the window span), each conversion walks only its in-window
   * deque, and credits pre-aggregate PER USER inside the kernel — the
   * final exchange moves (touch_type, credit) partials, touch-type
   * cardinality per user, never per-pair rows. The join-shaped
   * formulation (conversions × in-window touches) that the DuckDB oracle
   * replays would shuffle the full pair set.
   *
   * Anonymous traffic pools into one pseudo-identity — see the contract
   * note on [[lastTouchAttribution]].
   */
  def multiTouchAttribution(
      events: DataFrame,
      conversionType: String,
      touchTypes: Seq[String],
      windowMs: Long,
      model: String = "linear",
      halfLifeMs: Long = 0L,
      typeCol: String = "event_type",
      userCol: String = "user_id",
      tsCol: String = "tms",
      idCol: String = "event_id"
  ): DataFrame = {
    require(touchTypes.nonEmpty && !touchTypes.contains(conversionType),
      "touch types must be non-empty and distinct from the conversion type")
    require(windowMs > 0, "windowMs must be positive")
    require(Set("linear", "time_decay", "position")(model),
      s"unknown attribution model '$model' (linear | time_decay | position)")
    require(model != "time_decay" || halfLifeMs > 0,
      "time_decay needs halfLifeMs > 0")
    val spark = events.sparkSession
    import spark.implicits._
    val (conv, win, mdl, hl) = (conversionType, windowMs, model, halfLifeMs)
    events
      .filter(col(typeCol).isin(conversionType +: touchTypes: _*))
      .select(col(userCol).cast("long"), col(tsCol).cast("long"),
        col(idCol).cast("long"), col(typeCol))
      .as[(Option[Long], Long, Long, String)] // NULL user = ONE anonymous group
      .groupByKey(_._1)
      .flatMapSortedGroups(col(tsCol), col(idCol)) { (_, it) =>
        val touches = new java.util.ArrayDeque[(Long, String)]()
        val credits = scala.collection.mutable.LinkedHashMap.empty[String, Double]
        def add(ty: String, w: Double): Unit =
          credits.update(ty, credits.getOrElse(ty, 0.0) + w)
        it.foreach { case (_, t, _, tp) =>
          if (tp != conv) touches.addLast((t, tp))
          else {
            while (!touches.isEmpty && t - touches.peekFirst()._1 > win)
              touches.pollFirst()
            if (touches.isEmpty) add("direct", 1.0)
            else {
              val arr = touches.toArray(new Array[(Long, String)](touches.size))
              val n = arr.length
              mdl match {
                case "linear" =>
                  val w = 1.0 / n
                  arr.foreach(x => add(x._2, w))
                case "time_decay" =>
                  // anchored at the NEWEST in-window touch (max-
                  // subtraction softmax): its weight is exactly 1, so
                  // the normalizer can never underflow to 0 however
                  // small the halflife is next to the touch ages — the
                  // unanchored form emitted NaN credits (0/0) once every
                  // 2^(-age/halflife) underflowed. Ratios are unchanged;
                  // the oracle applies the same anchor.
                  val dt0 = t - arr(n - 1)._1
                  val ws = arr.map(x => math.pow(0.5, (t - x._1 - dt0).toDouble / hl))
                  val s = ws.sum
                  var i = 0
                  while (i < n) { add(arr(i)._2, ws(i) / s); i += 1 }
                case "position" =>
                  if (n == 1) add(arr(0)._2, 1.0)
                  else if (n == 2) { add(arr(0)._2, 0.5); add(arr(1)._2, 0.5) }
                  else {
                    add(arr(0)._2, 0.4)
                    add(arr(n - 1)._2, 0.4)
                    val mid = 0.2 / (n - 2)
                    var i = 1
                    while (i < n - 1) { add(arr(i)._2, mid); i += 1 }
                  }
              }
            }
          }
        }
        credits.iterator
      }
      .toDF("touch_type", "credit")
      .groupBy(col("touch_type"))
      .agg(round(sum(col("credit")) + graft.core.NanMath.RoundEps, 4).as("credit"))
  }

  /**
   * Event-flow transition matrix: counts of consecutive (event_type ->
   * next event_type) pairs within each user's time-ordered stream — the
   * aggregate behind a sankey/path-analysis view. Ordering ties break on
   * the event id, so the matrix is deterministic and the window-`lead`
   * oracle reproduces it exactly.
   *
   * Scale shape: ONE exchange on the user; `lead` is a within-partition
   * sort (no second shuffle), and the final (from, to) count aggregates
   * map-side into at most |types|^2 cells.
   */
  def transitions(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "tms",
      typeCol: String = "event_type",
      idCol: String = "event_id"
  ): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(userCol)).orderBy(col(tsCol), col(idCol))
    events
      .select(col(userCol), col(tsCol), col(idCol), col(typeCol).as("from_type"))
      .withColumn("to_type", lead(col("from_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
  }

  /**
   * Cohort retention: users bucket by their first active UTC day (the
   * cohort); for each (cohort, age) the count of cohort users active
   * `age` days later — the triangle a growth dashboard plots.
   *
   * Scale shape: ONE exchange on the user — per-user distinct active
   * days collapse via collect_set, whose size is bounded by the CALENDAR
   * (days in retention horizon), not event volume; cohort = array_min of
   * the same set, so no second per-user pass; ages explode at user-day
   * cardinality and the final (cohort, age) count is a plain count — the
   * exploded rows are already distinct user-days.
   */
  def retention(
      events: DataFrame,
      userCol: String = "user_id",
      tsCol: String = "tms"
  ): DataFrame = {
    // a NULL user has no identity to retain across days — excluded, the
    // same answer the oracle's USING(user_id) cohort join gives NULL
    val userDays = events
      .filter(col(userCol).isNotNull)
      .select(col(userCol).as("user"), floor(col(tsCol) / 86400000L).cast("long").as("day"))
      .groupBy("user")
      .agg(collect_set(col("day")).as("days"))
      .select(col("user"), array_min(col("days")).as("cohort"), explode(col("days")).as("day"))
    userDays
      .groupBy(col("cohort"), (col("day") - col("cohort")).as("age"))
      .agg(count(lit(1)).as("n_users"))
  }
}
