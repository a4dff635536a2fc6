package graft.streaming

import graft.core.{EvalContext, OnlineAlgorithm, OnlineDes}
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

  /** [[SlotValue]] carrying its watermarked slot-end event time (the ticking
    * runner's input row — public so the Dataset encoder can reach it). */
  final case class SlotTick(key: String, t: Long, value: Double, event_time: java.sql.Timestamp)

  /**
   * Late-data accounting (the reference TimeGrouped droppedOld counter,
   * stream/TimeGrouped.scala:77-78): rows behind the watermark are dropped
   * by Spark's stateful operators; this listener accumulates the per-query
   * drop counts from progress events so operators can alert on silent loss.
   */
  final class DropMetricsListener
      extends org.apache.spark.sql.streaming.StreamingQueryListener {
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    private val counts = new java.util.concurrent.ConcurrentHashMap[java.util.UUID, Long]()

    def droppedRows(queryId: java.util.UUID): Long = counts.getOrDefault(queryId, 0L)

    override def onQueryStarted(e: QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: QueryProgressEvent): Unit = {
      val dropped = e.progress.stateOperators.map(_.numRowsDroppedByWatermark).sum
      if (dropped > 0) counts.merge(e.progress.id, dropped, (a, b) => a + b)
    }
  }

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
  ): DataFrame = normalizeWith(datapoints, q, step, watermark, "sum")

  /** [[normalize]] with an explicit slot consolidation function — register
    * sketches merge with max, not sum (the :cf-* analog for streaming). */
  def normalizeWith(
      datapoints: DataFrame,
      q: Query,
      step: Long,
      watermark: String,
      cf: String
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
      .agg(cfAgg(cf).as("value"), first(col("tags")).as("tags"))
      .select(col("window"), col("key"), col("tags"),
        unix_millis(col("window.start")).as("t"), col("value"))
  }

  private def cfAgg(cf: String) = cf match {
    case "avg" => avg(col("value"))
    case "min" => min(col("value"))
    case "max" => max(col("value"))
    case _     => sum(col("value"))
  }

  /**
   * Streaming `:approx-distinct`: registers merge with max under the
   * watermark, then the HLL estimate is a plain per-window aggregation —
   * the whole thing chains as two stateful aggregations, no custom state.
   */
  def streamingApproxDistinct(
      datapoints: DataFrame,
      q: Query,
      step: Long,
      watermark: String = "10 minutes"
  ): DataFrame = {
    import graft.functions.Hll
    val norm = normalizeWith(datapoints, q, step, watermark, "max")
    val rho = when(isnan(col("value")) || col("value") <= 0.0, lit(null)).otherwise(col("value"))
    norm
      .withColumn("_pow", pow(lit(2.0), -rho))
      .groupBy(col("window"))
      .agg(sum(col("_pow")).as("_sumPow"), count(col("_pow")).as("_nSet"))
      .select(
        unix_millis(col("window.start")).as("t"),
        Hll.estimateCol(col("_sumPow"), col("_nSet")).cast("double").as("value"))
      .filter(col("value").isNotNull && !isnan(col("value")))
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

  /**
   * Streaming `:by`: per-step aggregation grouped by tag values (series
   * missing a key were already dropped by the query or drop here via the
   * null group). Same chained-stateful form as [[sumAll]]; the shuffle key
   * is (window, group values) — identical partitioning to the batch plan.
   */
  def sumBy(normalized: DataFrame, keys: Seq[String]): DataFrame = {
    val kcols = keys.map(k => col("tags").getItem(k).as(s"gk_$k"))
    val present = keys.map(k => col("tags").getItem(k).isNotNull).reduce(_ && _)
    normalized
      .filter(present)
      .groupBy(col("window") +: kcols: _*)
      .agg(sum(col("value")).as("value"))
      .select(
        keys.map(k => col(s"gk_$k").as(k)) ++
          Seq(unix_millis(col("window.start")).as("t"), col("value")): _*)
  }

  /**
   * Serialized online-algorithm state carried in GroupState (the AlgoState
   * analog, reference algorithm/AlgoState.scala): the algorithm object
   * itself plus the last slot it consumed.
   */
  final case class CarriedState(lastT: Long, blob: Array[Byte])

  private def serialize(a: AnyRef): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(a); oos.close()
    bos.toByteArray
  }

  private def deserialize[T](b: Array[Byte]): T = {
    val ois = new java.io.ObjectInputStream(new java.io.ByteArrayInputStream(b))
    ois.readObject().asInstanceOf[T]
  }

  /** Raw ingest row for the counter/rate normalizer (public for the
    * Dataset encoder). `event_time` is the watermarked column — it must
    * survive the projection into the stateful operator for the watermark
    * to filter late rows and for EventTimeTimeout to resolve. */
  final case class IngestRow(
      key: String,
      dstype: String,
      ts: Long,
      value: Double,
      event_time: java.sql.Timestamp)

  /**
   * Streaming counter/rate ingest normalization (the reference
   * NormalizationCache wiring, norm/NormalizationCache.scala:57-85):
   * per-series online state in flatMapGroupsWithState — `atlas.dstype=
   * counter` series difference to per-second rates then weighted-align to
   * step boundaries with heartbeat 2*step; anything else is treated as a
   * client-computed rate and weighted-aligns with heartbeat = step (the
   * over-counting guard the reference documents). Sum/gauge publishing
   * keeps using [[normalize]]/[[normalizeWith]] (slot sum/max, the
   * RollingValueFunction analogs).
   *
   * Heartbeat expiry is the streaming-visible behavior: a series that goes
   * silent past its heartbeat DROPS the open slot's partial value — no
   * stale smear into the silent span — and its next sample restarts as a
   * fresh series. Semantics are the per-series online forms in
   * core.IngestNorm; the batch pipeline (sources.Normalize) is the columnar
   * equivalent and IngestNormSpec ties the two together.
   *
   * Emits SlotValue(series key, slot START, value) as slots finalize.
   */
  def streamingIngestNormalize(
      datapoints: DataFrame,
      q: Query,
      step: Long,
      watermark: String = "10 minutes",
      evictAfterMs: Option[Long] = None
  ): Dataset[SlotValue] = {
    val spark = datapoints.sparkSession
    import spark.implicits._
    val rows = datapoints
      .withColumn("event_time", timestamp_millis(col("ts")))
      .withWatermark("event_time", watermark)
      .filter(QueryCompiler.compile(q, col("tags")))
      .select(
        Planner.seriesId(col("tags")).as("key"),
        coalesce(col("tags").getItem(graft.sources.Normalize.DsTypeTag), lit("rate"))
          .as("dstype"),
        col("ts"), col("value"), col("event_time"))
      .as[IngestRow]
    // State lifecycle: the reference's NormalizationCache evicts any entry
    // untouched for 4*step (removeEldestEntry, NormalizationCache.scala:45-
    // 52) — the event-time analog is a timeout at lastTs + max(4*step,
    // counter heartbeat), after which the open-slot partial AND the state
    // entry are dropped; the series' next sample restarts fresh. Without
    // this, permanently-silent series leak GroupState forever.
    // `evictAfterMs` overrides the grace: eviction is a live-ops GC policy,
    // and a BATCH replay of the same samples keeps every series' baseline
    // for the whole corpus — a parity harness that replays history in a few
    // large micro-batches (watermark leaping hours per trigger) passes a
    // long grace so GC timing artifacts don't diverge from the batch
    // kernel's gap semantics. Production feeds keep the default.
    val evictAfter = evictAfterMs.getOrElse(
      math.max(4 * step, graft.core.IngestNorm.counterHeartbeat(step)))
    rows
      .groupByKey(_.key)
      .flatMapGroupsWithState[CarriedState, SlotValue](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, it: Iterator[IngestRow], gstate: GroupState[CarriedState]) =>
          if (gstate.hasTimedOut) {
            gstate.remove()
            Iterator.empty
          } else {
            val batch = it.toArray.sortBy(_.ts)
            if (batch.isEmpty) Iterator.empty
            else {
              val algo = gstate.getOption
                .map(s => deserialize[graft.core.IngestNorm.OnlineIngest](s.blob))
                .getOrElse {
                  if (batch.head.dstype == "counter")
                    new graft.core.IngestNorm.OnlineCounter(step)
                  else
                    new graft.core.IngestNorm.OnlineWeightedNorm(step,
                      graft.core.IngestNorm.heartbeatFor(isCounter = false, step))
                }
              val out = batch.iterator
                .flatMap(r => algo.next(r.ts, r.value))
                .map { case (b, v) => SlotValue(key, b - step, v) }
                .toList
              gstate.update(CarriedState(batch.last.ts, serialize(algo)))
              gstate.setTimeoutTimestamp(math.max(
                batch.last.ts + evictAfter, gstate.getCurrentWatermarkMs() + 1))
              out.iterator
            }
          }
      }
  }

  /**
   * Streaming evaluation of ANY stateful operator: per-series online
   * algorithm with state carried across triggers. Slots missing between a
   * series' datapoints are fed as NaN so the result matches the batch
   * dense-grid evaluation (advance-with-NaN, StatefulExpr.scala:310-321).
   *
   * Input must be the append-mode output of [[normalize]] (slots arrive in
   * event-time order per key once finalized by the watermark).
   */
  def streamingStateful(
      normalized: Dataset[SlotValue],
      ctx: EvalContext,
      mkAlgo: () => OnlineAlgorithm
  ): Dataset[SlotValue] = {
    val spark = normalized.sparkSession
    import spark.implicits._
    val step = ctx.step
    val start = ctx.start

    normalized
      .groupByKey(_.key)
      .flatMapGroupsWithState[CarriedState, SlotValue](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[SlotValue], gstate: GroupState[CarriedState]) =>
          var (lastT, algo) = gstate.getOption match {
            case Some(s) => (s.lastT, deserialize[OnlineAlgorithm](s.blob))
            case None    => (start - step, mkAlgo())
          }
          val out = List.newBuilder[SlotValue]
          def emit(t: Long, v: Double): Unit = if (!v.isNaN) out += SlotValue(key, t, v)
          rows.toSeq.sortBy(_.t).foreach { row =>
            // advance-with-NaN over slots with no data for this series
            var t = lastT + step
            while (t < row.t) { emit(t, algo.next(Double.NaN)); t += step }
            emit(row.t, algo.next(row.value))
            lastT = row.t
          }
          gstate.update(CarriedState(lastT, serialize(algo)))
          out.result().iterator
      }
  }

  /**
   * [[streamingStateful]] with wall-clock heartbeat ticking (the reference
   * advances EVERY subscribed series once per interval, feeding NaN for
   * series with no data — StatefulExpr.scala:310-321 via the eval loop's
   * per-interval tick). The plain runner only catches a series up when its
   * NEXT datapoint arrives, so a series that goes silent freezes — e.g. a
   * :rolling-count alert signal never decays back to zero. Here an
   * event-time timeout fires once the watermark passes the next slot
   * boundary and feeds NaN for every slot the watermark has finalized,
   * exactly like the batch dense grid. Ticking stops at ctx.end.
   *
   * Input is the append-finalized slot stream of [[normalize]]; the
   * event-time column is the slot END, so a slot ticks exactly when the
   * upstream watermark would have finalized it.
   */
  def streamingStatefulTicking(
      normalized: Dataset[SlotValue],
      ctx: EvalContext,
      mkAlgo: () => OnlineAlgorithm,
      watermark: String = "0 seconds"
  ): Dataset[SlotValue] = {
    val spark = normalized.sparkSession
    import spark.implicits._
    val step = ctx.step
    val start = ctx.start
    val endT = ctx.end

    normalized
      .withColumn("event_time", timestamp_millis(col("t") + step))
      .withWatermark("event_time", watermark)
      .select(col("key"), col("t"), col("value"), col("event_time"))
      .as[SlotTick] // the watermarked event-time column must reach the
                    // stateful operator for EventTimeTimeout to resolve
      .groupByKey(_.key)
      .flatMapGroupsWithState[CarriedState, SlotValue](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (key: String, rows: Iterator[SlotTick], gstate: GroupState[CarriedState]) =>
          var (lastT, algo) = gstate.getOption match {
            case Some(s) => (s.lastT, deserialize[OnlineAlgorithm](s.blob))
            case None    => (start - step, mkAlgo())
          }
          val out = List.newBuilder[SlotValue]
          def emit(t: Long, v: Double): Unit = if (!v.isNaN) out += SlotValue(key, t, v)
          if (!gstate.hasTimedOut) {
            rows.toSeq.sortBy(_.t).foreach { row =>
              var t = lastT + step
              while (t < row.t) { emit(t, algo.next(Double.NaN)); t += step }
              emit(row.t, algo.next(row.value))
              lastT = row.t
            }
          }
          // heartbeat: tick every further slot the watermark has finalized
          val wm = gstate.getCurrentWatermarkMs()
          var t = lastT + step
          while (t + step <= math.min(wm, endT)) {
            emit(t, algo.next(Double.NaN))
            lastT = t
            t += step
          }
          gstate.update(CarriedState(lastT, serialize(algo)))
          if (lastT + step < endT)
            gstate.setTimeoutTimestamp(math.max(lastT + 2 * step, wm + step))
          out.result().iterator
      }
  }

  /**
   * Publish/ingest sink (reference PublishApi -> MemoryDatabase.update,
   * SURVEY §2.1): validated datapoints -> step normalization -> parquet
   * series store appended per micro-batch, partitioned by slot date so
   * batch queries prune partitions by time range. Invalid rows are dropped
   * by the codegen validation predicate (route them to a dead-letter sink
   * in foreachBatch if they must be kept).
   */
  def ingest(
      datapoints: DataFrame,
      storePath: String,
      checkpointPath: String,
      step: Long,
      watermark: String = "10 minutes",
      catalogPath: Option[String] = None,
      rollup: Option[(String, Long)] = None
  ): org.apache.spark.sql.streaming.StreamingQuery = {
    val valid = datapoints.filter(graft.sources.Validation.validTags(col("tags")))
    val normalized = valid
      .withColumn("event_time", timestamp_millis(col("ts")))
      .withWatermark("event_time", watermark)
      .groupBy(
        window(col("event_time"), s"$step milliseconds"),
        col("tags")
      )
      .agg(sum(col("value")).as("value"))
      .select(
        col("tags"),
        unix_millis(col("window.start")).as("t"),
        col("value"),
        to_date(col("window.start")).as("date"))
    normalized.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.write.mode("append").partitionBy("date").parquet(storePath)
        // series-catalog maintenance (§1.3 index rebuild analog): append the
        // batch's distinct series; readers dedup, compaction is a rewrite
        catalogPath.foreach(p => graft.sources.TagIndex.append(batch, p))
        // incremental rollup maintenance (RollupBlock analog): append this
        // batch's (sum,count,min,max) per (series, coarse slot). Fragments
        // from different micro-batches may cover the SAME coarse slot —
        // that is fine by construction: every rollup statistic re-composes
        // with itself, and the planner's rollup read re-aggregates rows
        // per (series, slot) anyway, so append-only maintenance stays
        // EXACT with no read-time compaction.
        rollup.foreach { case (p, rollupStep) =>
          graft.sources.Rollup
            .frame(batch.select(col("tags"), col("t").as("ts"), col("value")), rollupStep)
            .write.mode("append").parquet(p)
        }
      }
      .start()
  }

  /** Per-shard packing state: the next sequence id to assign and the
    * partial tail sequence (< seqLen ids) awaiting more tokens. */
  final case class PackState(nextSeq: Long, tail: Array[Int])

  /**
   * Streaming [[graft.ops.Curate.packTokenIds]]: a LIVE document stream
   * packs into fixed-length token-id training sequences continuously —
   * the ingest-to-tensor path with no batch rebuild. Per shard the state
   * is O(seqLen): the next sequence id and the partial tail; a sequence
   * row emits the moment it fills, exactly once.
   *
   * Ordering contract: documents pack in (micro-batch arrival, doc id)
   * order per shard — the stream-prefix analog of the batch operator's
   * id order. Feeding a corpus in one batch reproduces the batch
   * operator's FULL sequences row-for-row (StreamSpec pins it); the
   * final short tail stays in state rather than emitting (a stream has
   * no end — a deployment flushes by sending an end-of-corpus sentinel
   * document or padding). Processing-time stateful op: no watermark
   * needed, nothing is ever dropped as late.
   */
  def streamingPackTokenIds(
      docs: DataFrame,
      bpe: graft.ops.BpeTokenizer,
      seqLen: Int = 512,
      shardCol: String = "source",
      idCol: String = "doc_id",
      textCol: String = "text",
      eos: Option[Int] = None
  ): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val spark = docs.sparkSession
    import spark.implicits._
    val bc = graft.core.BroadcastGate.gated(spark, bpe, "streamingPackTokenIds tokenizer")
    docs
      .select(col(shardCol).cast("string"), col(idCol).cast("long"), col(textCol))
      .as[(String, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState[PackState, (String, Long, Long, Array[Int])](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (shard: String, rows: Iterator[(String, Long, String)],
            gstate: GroupState[PackState]) =>
          val tok = bc.value
          val st = gstate.getOption.getOrElse(PackState(0L, Array.empty[Int]))
          var seq = st.nextSeq
          val buf = scala.collection.mutable.ArrayBuffer.empty[Int]
          buf ++= st.tail
          val out = scala.collection.mutable.ArrayBuffer
            .empty[(String, Long, Long, Array[Int])]
          // within the batch, id order (the batch operator's order); the
          // sort buffers one group's batch slice, not stream history
          rows.toSeq.sortBy(_._2).foreach { case (_, _, text) =>
            val encoded = tok.encodeIds(text)
            val ids = eos.fold(encoded)(e => encoded :+ e)
            var i = 0
            while (i < ids.length) {
              val take = math.min(seqLen - buf.length, ids.length - i)
              var j = 0
              while (j < take) { buf += ids(i + j); j += 1 }
              i += take
              if (buf.length == seqLen) {
                out += ((shard, seq, seqLen.toLong, buf.toArray))
                seq += 1
                buf.clear()
              }
            }
          }
          gstate.update(PackState(seq, buf.toArray))
          out.iterator
      }
      .toDF("shard", "seq_id", "n_tokens", "token_ids")
  }

  /**
   * Dead-letter sink for the ingest pipeline: every datapoint [[ingest]]'s
   * validation gate drops is captured here WITH its human-readable reasons
   * — the observability half of the reference publish API's per-datapoint
   * failure messages (207 partial-success responses). Runs as its own
   * query over the same source; the codegen Column predicate selects the
   * (presumed-rare) rejects, and only those pay the scalar validator that
   * produces the reason strings.
   */
  def ingestDlq(
      datapoints: DataFrame,
      dlqPath: String,
      checkpointPath: String,
      rules: graft.sources.Validation.Rules = graft.sources.Validation.default
  ): org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = datapoints.sparkSession
    import spark.implicits._
    datapoints
      .filter(!graft.sources.Validation.validTags(col("tags"), rules))
      .select(col("tags"), col("ts"), col("value"))
      .as[(Map[String, String], Long, Double)]
      .mapPartitions(_.map { case (tags, ts, v) =>
        (tags, ts, v, graft.sources.Validation.validate(tags, rules).mkString("; "))
      })
      .toDF("tags", "ts", "value", "reasons")
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .format("parquet")
      .option("path", dlqPath)
      .start()
  }

  /** Read the ingested series store back as a canonical datapoint frame. */
  def readStore(spark: SparkSession, storePath: String): DataFrame =
    spark.read.parquet(storePath).select(col("tags"), col("t").as("ts"), col("value"))

  /** Read the incrementally-maintained rollup back as a planner-consumable
    * pre-aggregated frame (fragments re-aggregate exactly in evalData). */
  def readRollup(spark: SparkSession, rollupPath: String): DataFrame =
    spark.read.parquet(rollupPath)
      .select(col("key"), col("tags"), col("ts"),
        col("v_sum"), col("v_count"), col("v_min"), col("v_max"))

  /** Per-user funnel matcher state: `t0` = earliest step-0 event time seen
    * (-1 until one arrives), `buf` = later-step (ts, eventType) events
    * still relevant — bounded by the funnel window once the anchor is
    * known, and by the watermark lateness horizon before that. The TYPE
    * (not a precomputed step index) is buffered so repeated step names —
    * Seq("click", "click") — replay through the same stepsArr(r) matcher
    * the batch kernel runs (an index map would collapse duplicates).
    * CHECKPOINT COMPATIBILITY: this schema replaced the former
    * (ts, stepIdx: Int) form — a streamingFunnel query upgraded across
    * that change must restart from a fresh checkpoint (the state-store
    * encoder cannot read the old row shape). */
  final case class FunnelState(t0: Long, buf: List[(Long, String)])

  /**
   * Streaming funnel — EXACTLY the batch [[graft.ops.EventOps.funnel]]
   * semantics (earliest-anchor, greedy-earliest strictly-ordered chain
   * within `windowMs` of the anchor), finalized per user once the
   * watermark passes `anchor + windowMs`: from that point no in-watermark
   * event can change the outcome (later events are outside the window,
   * and any NEW step-0 event would have an event time >= the watermark,
   * so it cannot lower the anchor), so each user emits ONE
   * (user_id, reached) row, exact, with state removed.
   *
   * State is O(events inside one funnel window) per user, not event
   * history: pre-anchor buffering is pruned against the watermark (an
   * event older than the watermark can never gain a new anchor below it),
   * post-anchor buffering keeps only `(anchor, anchor + windowMs]`.
   * Anchor-less users garbage-collect on a rolling event-time timeout.
   */
  def streamingFunnel(
      events: DataFrame,
      steps: Seq[String],
      windowMs: Long,
      watermark: String = "10 minutes",
      typeCol: String = "event_type",
      userCol: String = "user_id",
      tsCol: String = "tms"
  ): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val spark = events.sparkSession
    import spark.implicits._
    val stepsArr = steps.toArray
    val step0 = stepsArr(0)
    // types that can advance a rank PAST the anchor; with repeated step
    // names an anchor-typed event buffers TOO (it may serve a later rank)
    val tailTypes = steps.drop(1).toSet
    val nSteps = steps.length
    val typed = events
      .filter(col(typeCol).isin(steps: _*))
      .select(col(userCol).cast("long").as("user"),
        col(tsCol).cast("long").as("ts"), col(typeCol).as("tp"))
      // the watermarked column must survive into the stateful operator's
      // input for EventTimeTimeout to bind to it
      .withColumn("event_time", timestamp_millis(col("ts")))
      .withWatermark("event_time", watermark)
      .as[(Long, Long, String, java.sql.Timestamp)]
    typed
      .groupByKey(_._1)
      .flatMapGroupsWithState[FunnelState, (Long, Long)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[(Long, Long, String, java.sql.Timestamp)],
            gstate: GroupState[FunnelState]) =>
          val wm = gstate.getCurrentWatermarkMs()
          if (gstate.hasTimedOut) {
            val st = gstate.get
            if (st.t0 >= 0) {
              // watermark passed anchor + window: outcome is final —
              // replay is the batch kernel's matcher verbatim (advance on
              // type == stepsArr(r)), so repeated step names behave
              // identically to EventOps.funnel
              var r = 1
              var last = st.t0
              st.buf.sortBy(identity).foreach { case (ts, tp) =>
                if (r < nSteps && tp == stepsArr(r) && ts > last && ts - st.t0 <= windowMs) {
                  r += 1; last = ts
                }
              }
              gstate.remove()
              Iterator.single((user, r.toLong))
            } else {
              // GC horizon for anchor-less users: drop events the
              // watermark has made unusable, vanish when nothing is left
              val kept = st.buf.filter(_._1 >= wm)
              if (kept.isEmpty) gstate.remove()
              else {
                gstate.update(FunnelState(-1L, kept))
                gstate.setTimeoutTimestamp(wm + windowMs + 1)
              }
              Iterator.empty
            }
          } else {
            val prev = gstate.getOption.getOrElse(FunnelState(-1L, Nil))
            var t0 = prev.t0
            var buf = prev.buf
            rows.foreach { case (_, ts, tp, _) =>
              if (tp == step0 && (t0 < 0 || ts < t0)) t0 = ts
              if (tailTypes.contains(tp)) buf ::= (ts, tp)
            }
            // prune ONLY what no possible future can use. The anchor can
            // still move DOWN (a step-0 event at-or-above the watermark),
            // so an event at-or-below the current anchor stays buffered
            // while its timestamp is >= the watermark — a lower anchor
            // could land under it and re-qualify it. Events past
            // anchor + window are gone for good (a lower anchor only
            // lowers the window's end).
            buf =
              if (t0 >= 0) buf.filter(x =>
                x._1 - t0 <= windowMs && (x._1 > t0 || x._1 >= wm))
              else buf.filter(_._1 >= wm)
            if (t0 < 0 && buf.isEmpty) {
              gstate.remove()
            } else {
              gstate.update(FunnelState(t0, buf))
              val target = if (t0 >= 0) t0 + windowMs + 1 else wm + windowMs + 1
              gstate.setTimeoutTimestamp(math.max(target, wm + 1))
            }
            Iterator.empty
          }
      }
      .toDF(userCol, "reached")
  }

  /**
   * Streaming near-dup-free corpus ingest — the daily-ingest dedup loop as
   * a continuous pipeline. Each micro-batch of documents:
   *
   *  1. dedups WITHIN the batch (plain minhash-LSH pairs -> keep the
   *     minimum id per near-dup cluster, [[graft.ops.Curate.dedupKeep]]);
   *  2. drops batch docs near-duplicating the ACCUMULATED corpus via the
   *     persisted signature index ([[graft.ops.Dedup.minhashPairsVsIndex]]
   *     against `indexPath` — the corpus itself is never re-read, never
   *     self-joined);
   *  3. appends the survivors to `keptPath` and their signature groups to
   *     `indexPath`, so the index stays current with no rebuild.
   *
   * Scale shape: per-batch cost is batch-cardinality signature building
   * plus a bucket equi-join against the index (~1 KB per distinct corpus
   * shingle set). The index only grows with KEPT documents. Exactly-once
   * caveat: the appends are not transactional with the checkpoint — a
   * crash between them can re-append a batch's survivors on replay
   * (readers dedup on doc id, as with the ingest sink's fragments).
   */
  /**
   * Compact [[streamingDedupIngest]]'s append-only signature index: a
   * long-running stream appends one small file set per micro-batch, and
   * file-count growth — not data growth — is what eventually slows the
   * per-batch bucket join. Rewrites the index into `max(1, rows/rowsPerFile)`
   * files, swapped in backup-first: write aside, rename the live index to
   * a backup, rename the compacted copy into place, then delete the
   * backup. Every step is recoverable — a failure before the swap leaves
   * the live index untouched, a failed swap restores the backup and
   * throws, and debris from an interrupted earlier run is cleared on the
   * next attempt. The index path is absent only between two metadata
   * renames (not across a bulk file delete, which previously left a
   * window where a concurrent ingest trigger saw no index and silently
   * skipped cross-batch dedup). Still run it between batches or against a
   * paused stream — the ingest re-lists the directory per trigger and
   * picks up the compacted layout on its next one.
   */
  def compactDedupIndex(spark: SparkSession, indexPath: String,
      rowsPerFile: Long = 4000000L): Unit =
    // dedup = false: index rows are signature GROUPS whose duplication is
    // already tolerated by the self-pair guard on the match side; the
    // compactor only folds files
    graft.sources.Dirs.compactFlat(spark, indexPath, rowsPerFile, dedup = false)

  def streamingDedupIngest(
      docs: DataFrame,
      indexPath: String,
      keptPath: String,
      checkpointPath: String,
      textCol: String = "text",
      shingleSize: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      threshold: Double = 0.5
  ): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        import graft.ops.{Curate, Dedup}
        val intraPairs = Dedup.minhashLsh(batch, textCol = textCol,
          shingleSize = shingleSize, bands = bands, rowsPerBand = rowsPerBand,
          threshold = threshold)
        val intraKept = Curate.dedupKeep(batch, intraPairs).localCheckpoint()
        val fs = new org.apache.hadoop.fs.Path(indexPath)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val kept =
          if (!fs.exists(new org.apache.hadoop.fs.Path(indexPath))) intraKept
          else {
            val index = spark.read.parquet(indexPath)
            val dupIds = Dedup.minhashPairsVsIndex(index, intraKept,
                textCol, shingleSize, bands, rowsPerBand, threshold)
              .select(col("batch_id").as("doc_id")).distinct()
            intraKept.join(dupIds, Seq("doc_id"), "left_anti").localCheckpoint()
          }
        // kept BEFORE index: a crash between the writes replays the batch
        // with its signatures absent, so the recomputed kept set is
        // identical and rows at worst duplicate (at-least-once). The
        // reverse order replayed against the batch's OWN signatures —
        // the self-pair guard in pairGroups now also defuses that, but
        // the ordering keeps the failure mode duplication, never loss.
        kept.write.mode("append").parquet(keptPath)
        Dedup.minhashIndex(kept, textCol, shingleSize, bands, rowsPerBand)
          .write.mode("append").parquet(indexPath)
      }
      .start()

  /**
   * Streaming rolling active users (DAU/WAU/MAU) — the continuous form of
   * [[graft.ops.EventOps.rollingActiveUsers]]: per micro-batch, the
   * batch's novel (user, day) pairs join the persisted user-day state,
   * and every OBSERVED day whose trailing `windowDays` window those pairs
   * touch gets its distinct-user count recomputed and appended to
   * `outPath` as `(day, active_users, seq)` — late events update past
   * days, a fresh day materializes immediately. Readers take the
   * latest `seq` per day ([[readActiveUsers]]); after any prefix of the
   * stream that view equals the batch operator over the same events
   * (StreamSpec pins it, late data included).
   *
   * Scale shape per trigger: batch-cardinality distinct + one anti-join
   * against the user-day state (user-day cardinality, calendar-bounded —
   * never event cardinality), then the window fan-out ONLY over the
   * state slice the affected days can see (`windowDays`-bounded span).
   * The state is day-partitioned and both its reads carry day-range
   * filters, so a long-retention state prunes to the batch/window span
   * at plan time — per-trigger I/O never grows with total retention.
   *
   * Crash-replay adjudication: counts are computed from state ∪ fresh
   * and written BEFORE the state append, so a crash between the two
   * replays the batch with its pairs still novel — the counts rewrite
   * (same values, latest-seq read collapses them) and the state append
   * completes. Duplication, never loss; duplicate state pairs from an
   * append-then-crash collapse in the distinct().
   */
  def streamingActiveUsers(
      events: DataFrame,
      statePath: String,
      outPath: String,
      checkpointPath: String,
      windowDays: Int = 7,
      userCol: String = "user_id",
      tsCol: String = "tms"
  ): org.apache.spark.sql.streaming.StreamingQuery = {
    require(windowDays >= 1, "windowDays must be positive")
    events.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        // NULL users excluded — the batch twin's count(DISTINCT)
        // semantics, and a null key would also never match the
        // novelty anti-join, re-counting the same anonymous rows
        // every batch
        val ud = batch
          .filter(col(userCol).isNotNull)
          .select(col(userCol).cast("long").as("user"),
            floor(col(tsCol).cast("long") / lit(86400000L)).as("day"))
          .distinct()
          .localCheckpoint()
        if (!ud.isEmpty) {
          // the state is day-PARTITIONED, and every state read below
          // carries a day-range filter, so both the novelty anti-join
          // (same-day pairs only) and the window slice prune to the
          // batch/window span at plan time instead of scanning the full
          // retention twice per trigger
          val hasState = graft.sources.Dirs.exists(spark, statePath)
          // one-time layout migration: a state dir written FLAT (by the
          // pre-partitioned variant of this sink) must be rewritten into
          // day partitions BEFORE the first partitioned append lands
          // beside its root files — that mix trips Spark's partition
          // discovery ("conflicting directory structures") and kills the
          // query until the dir is rebuilt by hand
          if (hasState && graft.sources.Dirs.hasRootDataFiles(spark, statePath)) {
            val flat = spark.read.parquet(statePath)
              .select(col("user").cast("long").as("user"), col("day").cast("long").as("day"))
              .localCheckpoint()
            graft.sources.Dirs.swapInPlace(spark, statePath) { tmp =>
              flat.write.mode("overwrite").partitionBy("day").parquet(tmp)
            }
          }
          def state(loD: Long, hiD: Long): DataFrame =
            spark.read.parquet(statePath)
              .select(col("user").cast("long").as("user"), col("day").cast("long").as("day"))
              .filter(col("day").between(loD, hiD))
          val span = ud.agg(min(col("day")), max(col("day"))).head()
          val (bLo, bHi) = (span.getLong(0), span.getLong(1))
          val fresh =
            (if (!hasState) ud
             else ud.join(state(bLo, bHi), Seq("user", "day"), "left_anti"))
              .localCheckpoint()
          if (!fresh.isEmpty) {
            val r = fresh.agg(min(col("day")), max(col("day"))).head()
            val (minD, maxD) = (r.getLong(0), r.getLong(1))
            val lo = minD - (windowDays - 1)
            val hi = maxD + (windowDays - 1)
            // state ∪ fresh, BEFORE the state append (see the crash story)
            val merged =
              (if (hasState) state(lo, hi).unionByName(fresh) else fresh).distinct()
            val affected = merged.select(col("day")).distinct()
              .filter(col("day").between(minD, hi))
            merged
              .select(col("user"),
                explode(sequence(col("day"), col("day") + (windowDays - 1))).as("rday"))
              .join(affected.select(col("day").as("rday")), Seq("rday"), "left_semi")
              .distinct()
              .groupBy(col("rday").as("day"))
              .agg(count(lit(1)).as("active_users"))
              .withColumn("seq", lit(batchId))
              .write.mode("append").parquet(outPath)
            fresh.write.mode("append").partitionBy("day").parquet(statePath)
          }
        }
      }
      .start()
  }

  /** Latest per-day view of [[streamingActiveUsers]]' append log: the
    * highest-`seq` row per day is the current count (superseded rows and
    * replay duplicates collapse here — the dedup-on-read contract every
    * append sink in this module shares). */
  def readActiveUsers(spark: SparkSession, outPath: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("day")).orderBy(col("seq").desc)
    spark.read.parquet(outPath)
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .select(col("day"), col("active_users"))
  }

  /**
   * Streaming ANN index ingest — the [[streamingDedupIngest]] symmetric
   * for embeddings: per micro-batch, new vectors assign through the
   * STORED geometry (coarse quantizer / LSH hyperplanes / PQ codebooks,
   * read from the index, never re-trained) and append into the persisted
   * index, so the continuously-arriving corpus is queryable without a
   * rebuild. The layout under `indexPath` says which appender applies:
   * `pq/` -> [[graft.ops.Similarity.ivfPqAppendIndex]], else
   * `centroids/` -> [[graft.ops.Similarity.ivfAppendIndex]], else
   * `meta/` -> [[graft.ops.Similarity.lshAppendIndex]]. The index must be
   * BUILT before the stream starts — training inside a trigger would let
   * the geometry drift between batches, which is exactly what the
   * persisted-index contract forbids.
   *
   * Scale shape per trigger: one broadcast-geometry kernel scan of the
   * batch + the append write — zero shuffle, the [[streamingDedupIngest]]
   * cost profile. Crash-replay adjudication (same as the dedup ingest):
   * the append is not transactional with the checkpoint, so a crash
   * between them replays the batch and re-appends byte-identical rows —
   * at-least-once, never loss. Exact duplicates cannot distort answers
   * (the rank kernel collapses adjacent duplicates in-window) and are
   * physically removed by the next [[graft.ops.Similarity
   * .compactAnnIndex]] pass ([[graft.sources.Maintenance]] composes it).
   */
  def streamingAnnIngest(
      emb: DataFrame,
      indexPath: String,
      checkpointPath: String,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): org.apache.spark.sql.streaming.StreamingQuery =
    emb.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        import graft.ops.Similarity
        def has(d: String) = graft.sources.Dirs.exists(spark, s"$indexPath/$d")
        if (has("pq")) Similarity.ivfPqAppendIndex(batch, indexPath, idCol, vecCol)
        else if (has("centroids")) Similarity.ivfAppendIndex(batch, indexPath, idCol, vecCol)
        else if (has("meta")) Similarity.lshAppendIndex(batch, indexPath, idCol, vecCol)
        else throw new IllegalStateException(
          s"no persisted ANN index at $indexPath — build one " +
            "(ivfBuildIndex / lshBuildIndex / ivfPqBuildIndex) before streaming ingest")
      }
      .start()

  /**
   * Streaming CURATION ingest — the whole training-data front door as one
   * continuous pipeline: per micro-batch, (1) the [[Curate.qualityFilter]]
   * lexical gate, (2) an optional [[graft.ops.Classifier]] probability
   * gate under broadcast weights, (3) intra-batch + vs-index near-dup
   * removal (the [[streamingDedupIngest]] machinery), then the survivors
   * append to `keptPath` + the signature index, and EVERY rejected doc
   * lands in `rejectPath` as `(doc_id, reason)` with reason in
   * {quality, classifier, duplicate} — the [[ingestDlq]] pattern, so a
   * drop is always attributable and re-playable.
   *
   * Scale shape per trigger: the two gates are pure kernel/codegen scans
   * of the batch; dedup is the per-batch bucket join vs the persisted
   * index (batch-sized left side, signature-pruned right); rejects are
   * batch-sized anti joins. Same exactly-once caveat as
   * [[streamingDedupIngest]]: parquet appends are not transactional
   * across the three sinks — a crash between writes can duplicate a
   * batch's rows on restart (checkpointed offsets bound it to one
   * batch). The kept-before-index write order plus the self-pair guard
   * in the index match keep that failure mode DUPLICATION: a replayed
   * batch is never re-classified as duplicates of its own signatures
   * and silently dropped.
   */
  def streamingCurationIngest(
      docs: DataFrame,
      indexPath: String,
      keptPath: String,
      rejectPath: String,
      checkpointPath: String,
      lang: String = "en",
      minTokens: Double = 5.0,
      minTtr: Double = 0.2,
      clfWeights: Option[Array[Double]] = None,
      minProb: Double = 0.5,
      textCol: String = "text",
      shingleSize: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      threshold: Double = 0.5
  ): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (rawBatch: DataFrame, _: Long) =>
        val spark = rawBatch.sparkSession
        import graft.ops.{Classifier, Curate, Dedup}
        val batch = rawBatch.localCheckpoint()
        def ids(df: DataFrame) = df.select(col("doc_id"))

        val gated = Curate.qualityFilter(batch, lang, minTokens, minTtr,
          textCol = textCol).localCheckpoint()
        val qualityRejects = batch.join(ids(gated), Seq("doc_id"), "left_anti")

        val scored = clfWeights match {
          case Some(w) =>
            val pass = Classifier.score(gated, w, "doc_id", textCol)
              .filter(col("prob") >= minProb)
              .select(col("id").as("doc_id"))
            gated.join(pass, Seq("doc_id")).localCheckpoint()
          case None => gated
        }
        val clfRejects = gated.join(ids(scored), Seq("doc_id"), "left_anti")

        val intraPairs = Dedup.minhashLsh(scored, textCol = textCol,
          shingleSize = shingleSize, bands = bands, rowsPerBand = rowsPerBand,
          threshold = threshold)
        val intraKept = Curate.dedupKeep(scored, intraPairs).localCheckpoint()
        val fs = new org.apache.hadoop.fs.Path(indexPath)
          .getFileSystem(spark.sparkContext.hadoopConfiguration)
        val kept =
          if (!fs.exists(new org.apache.hadoop.fs.Path(indexPath))) intraKept
          else {
            val index = spark.read.parquet(indexPath)
            val dupIds = Dedup.minhashPairsVsIndex(index, intraKept,
                textCol, shingleSize, bands, rowsPerBand, threshold)
              .select(col("batch_id").as("doc_id")).distinct()
            intraKept.join(dupIds, Seq("doc_id"), "left_anti").localCheckpoint()
          }
        val dupRejects = scored.join(ids(kept), Seq("doc_id"), "left_anti")

        // kept before index (see streamingDedupIngest): replay after a
        // crash between the two at worst duplicates rows, never drops them
        kept.write.mode("append").parquet(keptPath)
        Dedup.minhashIndex(kept, textCol, shingleSize, bands, rowsPerBand)
          .write.mode("append").parquet(indexPath)
        ids(qualityRejects).withColumn("reason", lit("quality"))
          .unionByName(ids(clfRejects).withColumn("reason", lit("classifier")))
          .unionByName(ids(dupRejects).withColumn("reason", lit("duplicate")))
          .write.mode("append").parquet(rejectPath)
      }
      .start()

  /**
   * The STREAMING front door — [[graft.ops.Curate.frontDoor]]'s full
   * stage chain (line filter -> quality -> optional classifier -> near-dup
   * removal -> optional decontamination -> temperature mixture -> pack) as
   * a continuous pipeline with the SAME DLQ/audit contract: every dropped
   * doc lands in `rejectPath` as (batch_id, doc_id, reason), every batch
   * appends its (batch_id, stage_order, stage, n_in, n_out) audit frame,
   * and the packed layout continues ACROSS batches through per-shard
   * carried token offsets. Fed a whole corpus as one batch, kept / packed
   * / rejects / audit equal the batch operator's frames exactly (StreamSpec
   * pins it) — the established parity contract of this module.
   *
   * Streaming-specific semantics, each the honest per-batch reading of its
   * batch stage:
   *  - **dedup** removes intra-batch near-dups first (min-id
   *    representative, exactly the batch stage), then drops docs matching
   *    the PERSISTED signature index of prior batches' stage-4 survivors
   *    (the [[streamingCurationIngest]] machinery) — "seen corpus" means
   *    everything that ever passed the dedup gate, whether or not a later
   *    gate dropped it.
   *  - **mixture weights** are learned per micro-batch over that batch's
   *    kept slice unless `fixedWeights` pins them — a deployment wanting
   *    corpus-stable proportions passes the map it learned offline.
   *  - **pack offsets** carry per shard: batch b's layout starts at the
   *    cumulative token total of batches < b (state rows keyed
   *    (source, batch_id), so an at-least-once REPLAY recomputes the same
   *    base — the additive-statistic replay rule). The per-batch audit
   *    `pack` row counts the loader examples the batch COMPLETED:
   *    ceil(cum_after/seqLen) − ceil(cum_before/seqLen) per shard, which
   *    telescopes to the batch operator's total over any prefix.
   *
   * Crash story: kept-before-index ordering per [[streamingCurationIngest]];
   * row-set sinks (kept/packed/rejects) tolerate replay duplication, the
   * two statistic sinks (audit, offset state) dedup on read by batch_id.
   */
  def streamingFrontDoor(
      docs: DataFrame,
      indexPath: String,
      keptPath: String,
      packedPath: String,
      rejectPath: String,
      auditPath: String,
      statePath: String,
      checkpointPath: String,
      evalDocs: Option[DataFrame] = None,
      lineMinWords: Int = 3,
      lineBlocklist: Seq[String] = Seq("lorem ipsum", "javascript", "{"),
      lang: String = "en",
      minTokens: Double = 5.0,
      minTtr: Double = 0.2,
      minStopRatio: Double = 0.0,
      clfWeights: Option[Array[Double]] = None,
      minProb: Double = 0.5,
      shingleSize: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      threshold: Double = 0.5,
      decontamN: Int = 5,
      maxContamination: Double = 0.1,
      mixtureAlpha: Double = 1.0,
      fixedWeights: Option[Map[String, Double]] = None,
      seqLen: Long = 512L
  ): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (rawBatch: DataFrame, batchId: Long) =>
        frontDoorBatch(rawBatch, batchId, indexPath, keptPath, packedPath,
          rejectPath, auditPath, statePath, evalDocs, lineMinWords,
          lineBlocklist, lang, minTokens, minTtr, minStopRatio, clfWeights,
          minProb, shingleSize, bands, rowsPerBand, threshold, decontamN,
          maxContamination, mixtureAlpha, fixedWeights, seqLen)
      }
      .start()

  /**
   * The per-trigger unit of [[streamingFrontDoor]], exposed so replay /
   * stress harnesses can RE-DELIVER a batch (same data, same `batchId`)
   * outside a streaming query — exactly what an at-least-once foreachBatch
   * does after a crash between the sink writes and the checkpoint commit.
   * The replay contract it must (and does) satisfy: row-set sinks
   * (kept/packed/rejects) at worst duplicate rows (distinct-set
   * invariant), the statistic sinks (audit, pack-offset state) re-append
   * byte-identical rows collapsed on read by (batch_id, …) keys, the
   * signature index tolerates duplicated groups (the pairGroups
   * self-pair guard keeps a replayed batch from matching its own
   * signatures), and a LATER batch packs at identical offsets either way.
   * [[graft.StressReplay]] pins all four at skewed-corpus volume.
   */
  def frontDoorBatch(
      rawBatch: DataFrame,
      batchId: Long,
      indexPath: String,
      keptPath: String,
      packedPath: String,
      rejectPath: String,
      auditPath: String,
      statePath: String,
      evalDocs: Option[DataFrame] = None,
      lineMinWords: Int = 3,
      lineBlocklist: Seq[String] = Seq("lorem ipsum", "javascript", "{"),
      lang: String = "en",
      minTokens: Double = 5.0,
      minTtr: Double = 0.2,
      minStopRatio: Double = 0.0,
      clfWeights: Option[Array[Double]] = None,
      minProb: Double = 0.5,
      shingleSize: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      threshold: Double = 0.5,
      decontamN: Int = 5,
      maxContamination: Double = 0.1,
      mixtureAlpha: Double = 1.0,
      fixedWeights: Option[Map[String, Double]] = None,
      seqLen: Long = 512L
  ): Unit = {
        val spark = rawBatch.sparkSession
        import spark.implicits._
        import graft.ops.{Classifier, Curate, Dedup, TextOps}
        def idsOf(df: DataFrame) = df.select(col("doc_id"))
        val base = rawBatch
          .select(col("doc_id").cast("long").as("doc_id"), col("source"), col("text"))
          .localCheckpoint()

        // 1-2: line cleanup (downstream sees the CLEANED text) + quality
        val cleaned = TextOps.lineFilter(base, lineMinWords,
            requireTerminalPunct = false, lineBlocklist)
          .select(col("doc_id"), col("text"))
          .join(base.select(col("doc_id"), col("source")), Seq("doc_id"))
          .localCheckpoint()
        val lineRejects = base.join(idsOf(cleaned), Seq("doc_id"), "left_anti")
        val gated = Curate.qualityFilter(cleaned, lang, minTokens, minTtr, minStopRatio)
          .localCheckpoint()
        val qualityRejects = cleaned.join(idsOf(gated), Seq("doc_id"), "left_anti")

        // 3: optional classifier gate
        val scored = clfWeights match {
          case Some(w) =>
            val pass = Classifier.score(gated, w)
              .filter(col("prob") >= minProb)
              .select(col("id").as("doc_id"))
            gated.join(pass, Seq("doc_id")).localCheckpoint()
          case None => gated
        }
        val clfRejects = gated.join(idsOf(scored), Seq("doc_id"), "left_anti")

        // 4: intra-batch near-dup removal, then vs the persisted index
        val intraPairs = Dedup.minhashLsh(scored, shingleSize = shingleSize,
          bands = bands, rowsPerBand = rowsPerBand, threshold = threshold)
        val intraKept = Curate.dedupKeep(scored, intraPairs).localCheckpoint()
        val deduped =
          if (!graft.sources.Dirs.exists(spark, indexPath)) intraKept
          else {
            val index = spark.read.parquet(indexPath)
            val dupIds = Dedup.minhashPairsVsIndex(index, intraKept,
                "text", shingleSize, bands, rowsPerBand, threshold)
              .select(col("batch_id").as("doc_id")).distinct()
            intraKept.join(dupIds, Seq("doc_id"), "left_anti").localCheckpoint()
          }
        val dupRejects = scored.join(idsOf(deduped), Seq("doc_id"), "left_anti")

        // 5: optional eval-set decontamination
        val kept = evalDocs match {
          case Some(ev) =>
            val rep = TextOps.decontaminate(deduped, ev, decontamN)
            deduped.join(
              rep.filter(col("frac") <= maxContamination).select(col("doc_id")),
              Seq("doc_id")).localCheckpoint()
          case None => deduped
        }
        val contamRejects = deduped.join(idsOf(kept), Seq("doc_id"), "left_anti")

        // 6: temperature mixture (per-batch weights unless pinned)
        // an ALL-REJECTED micro-batch (every doc dropped by stages 1-5)
        // must not kill the STREAM: learn no weights, emit empty
        // mixed/packed frames and a zero-count audit like any other batch
        val weights = fixedWeights.getOrElse(
          if (kept.isEmpty) Map.empty[String, Double]
          else Curate.temperatureWeights(kept, mixtureAlpha))
        val maxW = weights.values.foldLeft(0.0)(math.max)
        require(maxW < 1000.0,
          s"mixture weight $maxW >= 1000 would collide rid = doc_id*1000 + copy")
        val mixed = Curate.temperatureMixtureSample(kept, weights, "source", "doc_id")
          .localCheckpoint()
        val mixRejects = kept.join(idsOf(mixed).distinct(), Seq("doc_id"), "left_anti")

        // 7: pack with per-shard CARRIED offsets — the batch layout shifts
        // by the shard's cumulative token total from prior batches; the
        // shifted columns recompute from start = seq_id*seqLen + seq_offset
        val packed0 = Curate.packSequences(
          mixed.withColumn("rid", col("doc_id") * 1000L + col("copy")),
          seqLen, idCol = "rid")
        val bases: DataFrame =
          if (!graft.sources.Dirs.exists(spark, statePath))
            Seq.empty[(String, Long)].toDF("source", "base_tok")
          else
            spark.read.parquet(statePath)
              .filter(col("batch_id") < batchId)
              // replay dedup: a re-appended (source, batch_id) row is
              // byte-identical, first() collapses it
              .groupBy(col("source"), col("batch_id"))
              .agg(first(col("n_tok")).as("n_tok"))
              .groupBy(col("source")).agg(sum(col("n_tok")).as("base_tok"))
        val packed = packed0
          .join(broadcast(bases), packed0("source") <=> bases("source"), "left")
          .drop(bases("source"))
          .withColumn("__start",
            coalesce(col("base_tok"), lit(0L)) +
              col("seq_id").cast("long") * seqLen + col("seq_offset").cast("long"))
          .select(col("rid"), packed0("source"), col("n_tokens"),
            expr(s"__start div $seqLen").cast("double").as("seq_id"),
            (col("__start") % seqLen).cast("double").as("seq_offset"),
            when(col("__start") % seqLen + col("n_tokens") > seqLen, 1.0)
              .otherwise(0.0).as("spans_boundary"))
          .localCheckpoint()

        // audit pack n_out: loader examples COMPLETED by this batch
        val batchTotals = packed0.groupBy(col("source"))
          .agg(sum(col("n_tokens")).cast("long").as("n_tok"))
          .localCheckpoint()
        // integer div, not double ceil: cumulative token totals past 2^53
        // would round a double across a seqLen multiple and break the
        // telescoping parity with the batch chain's (tot + L-1) div L
        val nSeqs = batchTotals
          .join(broadcast(bases), batchTotals("source") <=> bases("source"), "left")
          .drop(bases("source"))
          .withColumn("__b", coalesce(col("base_tok"), lit(0L)))
          .select((expr(s"(__b + n_tok + ${seqLen - 1}) div $seqLen") -
            expr(s"(__b + ${seqLen - 1}) div $seqLen")).as("d"))
          .agg(coalesce(sum(col("d")), lit(0L))).head().getLong(0)

        val counts = Seq(base, cleaned, gated, scored, deduped, kept, mixed).map(_.count())
        val audit = Seq(
          (batchId, 1, "line_filter", counts(0), counts(1)),
          (batchId, 2, "quality", counts(1), counts(2)),
          (batchId, 3, "classifier", counts(2), counts(3)),
          (batchId, 4, "dedup", counts(3), counts(4)),
          (batchId, 5, "decontaminate", counts(4), counts(5)),
          (batchId, 6, "mixture", counts(5), counts(6)),
          (batchId, 7, "pack", counts(6), nSeqs)
        ).toDF("batch_id", "stage_order", "stage", "n_in", "n_out")

        val rejects = idsOf(lineRejects).withColumn("reason", lit("line_filter"))
          .unionByName(idsOf(qualityRejects).withColumn("reason", lit("quality")))
          .unionByName(idsOf(clfRejects).withColumn("reason", lit("classifier")))
          .unionByName(idsOf(dupRejects).withColumn("reason", lit("duplicate")))
          .unionByName(idsOf(contamRejects).withColumn("reason", lit("contaminated")))
          .unionByName(idsOf(mixRejects).withColumn("reason", lit("mixture")))
          .withColumn("batch_id", lit(batchId))

        // kept before index (replay duplicates, never drops); statistic
        // sinks last so a crash before them replays the whole batch
        kept.write.mode("append").parquet(keptPath)
        Dedup.minhashIndex(deduped, "text", shingleSize, bands, rowsPerBand)
          .write.mode("append").parquet(indexPath)
        packed.write.mode("append").parquet(packedPath)
        rejects.write.mode("append").parquet(rejectPath)
        audit.write.mode("append").parquet(auditPath)
        batchTotals.withColumn("batch_id", lit(batchId))
          .write.mode("append").parquet(statePath)
  }

  /** Replay-safe reader for [[streamingFrontDoor]]'s audit sink: an
    * at-least-once re-append writes byte-identical rows per
    * (batch_id, stage_order), collapsed here (the statistic-sink rule). */
  def readFrontDoorAudit(spark: SparkSession, auditPath: String): DataFrame =
    spark.read.parquet(auditPath)
      .groupBy(col("batch_id"), col("stage_order"))
      .agg(first(col("stage")).as("stage"),
        first(col("n_in")).as("n_in"), first(col("n_out")).as("n_out"))

  /**
   * Streaming loader for the SQL-backed store — the "data loading is
   * managed separately" half of the reference's Postgres backend
   * (PostgresDatabase.scala:38-40) as a continuous pipeline: each
   * micro-batch of canonical datapoints lands in its block-suffix tables
   * through [[graft.sources.JdbcStore.writeBatch]], which keys rows by
   * batch id and deletes-then-inserts so an at-least-once replay
   * reproduces the store EXACTLY (duplicated datapoint rows would
   * double-count every sum at read — the additive-statistic replay
   * rule). Serving continues through [[graft.sources.JdbcStore.fetch]]
   * with no coordination: a block table only ever grows by whole
   * batches.
   */
  def streamingJdbcIngest(
      datapoints: DataFrame,
      url: String,
      tdef: graft.sources.JdbcStore.TableDef,
      blockMs: Long,
      checkpointPath: String
  ): org.apache.spark.sql.streaming.StreamingQuery =
    datapoints.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        graft.sources.JdbcStore.writeBatch(batch, url, tdef, blockMs, batchId)
      }
      .start()

  /**
   * Streaming PCA maintenance: each micro-batch of vectors appends ONE
   * additive moment row ([[graft.ops.Pca.appendMoments]], seq = the
   * micro-batch id), so an up-to-date basis is always
   * `Pca.fromMoments(path)` away without re-reading any prior batch —
   * the model-maintenance analog of the streaming dedup index.
   */
  def streamingPcaMoments(
      vectors: DataFrame,
      momentsPath: String,
      checkpointPath: String,
      vecCol: String = "embedding"
  ): org.apache.spark.sql.streaming.StreamingQuery =
    vectors.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) graft.ops.Pca.appendMoments(batch, momentsPath, batchId, vecCol)
      }
      .start()

  /**
   * Streaming vocabulary-drift monitor: every micro-batch of incoming
   * documents is scored against a FIXED reference corpus with
   * [[graft.ops.Curate.vocabDrift]] and one `(batch_id, n_docs, kl_ab,
   * kl_ba, jsd)` row appends to `driftPath` — the live data-drift alarm
   * (a JSD step change means the source mix moved; alert thresholds are
   * the caller's read-side query over the drift log). `a` in the KL
   * direction is the REFERENCE, `b` the batch. Same at-least-once caveat
   * as the other foreachBatch sinks: a crash between the append and the
   * checkpoint commit replays the batch, duplicating its (recomputed,
   * identical) drift row — read-side consumers should take one row per
   * batch_id, exactly as [[graft.ops.Pca.fromMoments]] does for the
   * moment log.
   *
   * Scale shape per trigger: the reference side's token counts are
   * recomputed per batch by design — cache/persist the reference frame
   * before starting the stream to pay its scan once; the batch side is
   * micro-batch-sized. Empty batches write nothing (no spurious zero-JSD
   * rows).
   */
  def streamingDriftMonitor(
      docs: DataFrame,
      reference: DataFrame,
      driftPath: String,
      checkpointPath: String,
      textCol: String = "text"
  ): org.apache.spark.sql.streaming.StreamingQuery =
    docs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val n = batch.count()
        if (n > 0) {
          graft.ops.Curate.vocabDrift(reference, batch, textCol)
            .select(lit(batchId).as("batch_id"), lit(n).as("n_docs"),
              col("kl_ab"), col("kl_ba"), col("jsd"))
            .write.mode("append").parquet(driftPath)
        }
      }
      .start()

  /**
   * Streaming `:percentiles`: per-slot bucket counts finalize under the
   * watermark (all buckets of a window evict in the same trigger, so each
   * micro-batch sees complete windows); the estimation itself needs window
   * functions, which streaming plans exclude, so it runs per batch inside
   * foreachBatch — the FinalExprEval analog for sketch operators.
   */
  def streamingPercentiles(
      datapoints: DataFrame,
      q: Query,
      pcts: List[Double],
      step: Long,
      watermark: String = "10 minutes"
  )(sink: DataFrame => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    val norm = normalize(datapoints, q, step, watermark)
    val byBucket = norm
      .groupBy(col("window"), col("tags").getItem("percentile").as("bucket"))
      .agg(sum(col("value")).as("c"))
      .select(unix_millis(col("window.start")).as("t"), col("bucket"), col("c"))
    byBucket.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        sink(estimatePercentiles(batch, pcts))
      }
      .start()
  }

  /** Batch percentile estimation over (t, bucket, c) rows — same cumulative
    * interpolation as the planner (Planner.evalPercentiles). */
  private[streaming] def estimatePercentiles(counts: DataFrame, pcts: List[Double]): DataFrame = {
    import graft.functions.PercentileBuckets
    import org.apache.spark.sql.expressions.Window
    val sorted = pcts.distinct.sorted
    val idx = conv(substring(col("bucket"), 2, 4), 16, 10).cast("long")
    val isTimer = substring(col("bucket"), 1, 1) === "T"
    val wOrd = Window.partitionBy(col("t")).orderBy(col("_idx"))
    val wAll = Window.partitionBy(col("t"))
    val cum = counts
      .withColumn("_idx", idx)
      .withColumn("_timer", isTimer)
      .withColumn("_cum", sum(col("c")).over(wOrd))
      .withColumn("_tot", sum(col("c")).over(wAll))
    val withPct = cum
      .withColumn("_p", explode(lit(sorted.toArray)))
      .withColumn("_np", lit(100.0) * col("_cum") / col("_tot"))
      .withColumn("_pp", lit(100.0) * (col("_cum") - col("c")) / col("_tot"))
      .filter(col("_np") >= col("_p"))
      .withColumn("_rn",
        row_number().over(Window.partitionBy(col("t"), col("_p")).orderBy(col("_idx"))))
      .filter(col("_rn") === 1)
    val b = PercentileBuckets.boundaryCol(col("_idx"))
    val prevB = when(col("_idx") === 0, 0.0)
      .otherwise(PercentileBuckets.boundaryCol(col("_idx") - 1))
    val f = when(col("_np") > col("_pp"),
      (col("_p") - col("_pp")) / (col("_np") - col("_pp"))).otherwise(0.0)
    val est = (prevB + f * (b - prevB)) * when(col("_timer"), 1e-9).otherwise(1.0)
    withPct.select(col("t"), col("_p").as("percentile"), est.cast("double").as("value"))
  }

  /** Streaming `:des` (kept as the named entry point for the common case). */
  def streamingDes(
      normalized: Dataset[SlotValue],
      ctx: EvalContext,
      training: Int,
      alpha: Double,
      beta: Double
  ): Dataset[SlotValue] =
    streamingStateful(normalized, ctx, () => new OnlineDes(training, alpha, beta))
}
