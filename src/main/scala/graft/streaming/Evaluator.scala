package graft.streaming

import graft.asl._
import graft.core.EvalContext
import graft.planner.Planner
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** One streaming subscription: an opaque id plus an ASL program. */
final case class Subscription(id: String, program: String)

/**
 * Subscription fan-out evaluation (reference atlas-eval Evaluator / the LWC
 * subscribe flow, SURVEY §3.3): many concurrently-subscribed ASL expressions
 * evaluated against ONE datapoint stream, emitting TimeSeriesMessage JSON
 * rows tagged with the subscription id.
 *
 * Execution shape, designed for a wide fleet of subscriptions at 100 TB/day
 * ingest:
 *
 *  1. **Shared scan ("AggrDatapoint" stage)**: the union (OR) of every
 *     subscription's data queries drives a single [[StreamRunner.normalize]]
 *     pass — one watermarked (series, slot) aggregation regardless of how
 *     many subscriptions are attached, the analog of the reference
 *     evaluating all LWC expressions against each datapoint once at the
 *     publish edge.
 *  2. **Per-interval final eval ("FinalExprEval" stage)**: append mode emits
 *     each window exactly once, when the watermark finalizes it — so every
 *     micro-batch holds complete (series, slot) rows and the full batch
 *     planner (math/filter/style layers, binary-op joins, CSE across each
 *     subscription's tree) runs on slot-cardinality data inside
 *     foreachBatch. No state is needed outside the one shared aggregation.
 *
 * Stateful words are rejected: their state lives across intervals, which is
 * exactly what [[StreamRunner.streamingStateful]] (and its ticking variant)
 * carries in GroupState — route those through it.
 */
object Evaluator {

  /** Collect every DataExpr leaf of an expression tree. */
  private def dataExprs(e: TimeSeriesExpr): List[DataExpr] = {
    val buf = List.newBuilder[DataExpr]
    Rewrite.mapData(e, { d => buf += d; d })
    buf.result()
  }

  private def containsStateful(e: Any): Boolean = e match {
    case _: StatefulExpr => true
    case p: Product      => p.productIterator.exists(containsStateful)
    case _               => false
  }

  private def parseAndCheck(subs: Seq[Subscription]): Seq[(String, List[StyleExpr])] = {
    val parsed = subs.map(s => s.id -> Asl.parseAll(s.program))
    parsed.foreach { case (id, styled) =>
      styled.foreach { se =>
        require(
          !containsStateful(se.expr),
          s"subscription '$id' uses a stateful operator: carry it through " +
            "StreamRunner.streamingStateful/streamingStatefulTicking instead")
      }
    }
    parsed
  }

  /** Process-wide count of (subscription, interval-group) evaluations
    * dropped by the datapoint budget — the droppedCounter analog of the
    * reference's AggregatorSettings (eval/model/AggrDatapoint.scala:
    * 105-130). Per-drop detail goes to the sink as a diagnostic row. */
  val droppedDatapointsLimitExceeded = new java.util.concurrent.atomic.AtomicLong

  /**
   * The SOUND form of the couldMatch pre-filter: prune only queries in
   * couldMatch's sound fragment (every `:not` body `:not`-free — there
   * `matches` is monotone under added tags, so a definite sub-match
   * refutes the negation for EVERY extension); anything outside the
   * fragment passes unpruned. AslSpec's ScalaCheck property pins
   * soundness over random query trees: a subscription that matches any
   * admitted series is never dropped — the failure mode that matters;
   * an unprunable nested-`:not` query just gets evaluated.
   */
  private[graft] def soundPreFilter(q: Query, tags: Map[String, String]): Boolean =
    q.couldMatchSound(tags)

  /**
   * Attach a FIXED set of subscriptions to a datapoint stream. The shared
   * normalize pass is scoped to the OR of their data queries. `sink`
   * receives, per micro-batch with finalized slots, a DataFrame of
   * (subscription: string, json: string) TimeSeriesMessage rows.
   *
   * `maxDatapointsPerExpr` is the per-expression cardinality guardrail
   * (reference AggrDatapoint.AggregatorSettings.maxIntermediateDatapoints,
   * eval/model/AggrDatapoint.scala:105-130): the most normalized (series,
   * slot) rows any single subscription may consume in one interval. One
   * pathological subscription (`:all` on a huge match) on a shared
   * evaluator otherwise saturates every other subscriber's stream. On
   * breach, THAT subscription's interval group is dropped with a counted
   * diagnostic row (`{"type":"error",...}`, the LWC DiagnosticMessage
   * shape) while the others evaluate exactly. Unlimited by default.
   */
  def attach(
      datapoints: DataFrame,
      subs: Seq[Subscription],
      step: Long,
      watermark: String = "10 minutes",
      maxDatapointsPerExpr: Long = Long.MaxValue
  )(sink: DataFrame => Unit): StreamingQuery = {
    require(subs.nonEmpty, "no subscriptions")
    val parsed = parseAndCheck(subs)
    val queries = parsed.flatMap(_._2).flatMap(se => dataExprs(se.expr)).map(_.query).distinct
    val combined = queries
      .reduceOption((a, b) => Query.Or(a, b): Query)
      .getOrElse(Query.True: Query)
    attachImpl(datapoints, combined, () => parsed, step, watermark, maxDatapointsPerExpr)(sink)
  }

  /**
   * Attach a DYNAMIC subscription set (the LWC subscribe/unsubscribe
   * lifecycle): `current` is re-read at every micro-batch, so
   * subscriptions added or dropped between triggers take effect on the
   * next interval without restarting the stream. The shared scan is scoped
   * by `scope` — the superset query the stream is provisioned for (the
   * analog of an LWC cluster's configured expression universe); a
   * subscription outside the scope sees only the series the scope admits.
   */
  def attachDynamic(
      datapoints: DataFrame,
      scope: Query,
      current: () => Seq[Subscription],
      step: Long,
      watermark: String = "10 minutes",
      maxDatapointsPerExpr: Long = Long.MaxValue
  )(sink: DataFrame => Unit): StreamingQuery =
    attachImpl(datapoints, scope, () => parseAndCheck(current()), step, watermark,
      maxDatapointsPerExpr)(sink)

  private def attachImpl(
      datapoints: DataFrame,
      scope: Query,
      parsed: () => Seq[(String, List[StyleExpr])],
      step: Long,
      watermark: String,
      maxDatapointsPerExpr: Long
  )(sink: DataFrame => Unit): StreamingQuery = {
    val norm = StreamRunner.normalize(datapoints, scope, step, watermark)
    norm.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // cheap subscription pre-filter (the reference's couldMatch use in
        // its LWC event client, lwc-events AbstractLwcEventClient): every
        // series the scope admits carries the scope's exact tags, so a
        // subscription whose data queries could NOT match that partial tag
        // set can never match any admitted series — skip its whole
        // per-interval eval instead of running the batch planner to
        // produce nothing. Conservative by construction: couldMatch treats
        // missing keys as indeterminate, an Or-shaped scope has no exact
        // tags (nothing is pruned), and queries OUTSIDE couldMatch's sound
        // fragment are never pruned (see soundPreFilter — a dropped live
        // subscription is a correctness bug, a wasted eval is not).
        val scopeTags = scope.exactTags
        val subs = parsed().filter { case (_, styled) =>
          Evaluator.soundPreFilter(
            styled.flatMap(se => dataExprs(se.expr)).map(_.query).distinct
              .reduceOption((a, b) => Query.Or(a, b): Query)
              .getOrElse(Query.True: Query),
            scopeTags)
        }
        val slots = batch.select(col("tags"), col("t").as("ts"), col("value"))
        val range = slots.agg(min(col("ts")).as("lo"), max(col("ts")).as("hi")).collect()(0)
        if (!range.isNullAt(0) && subs.nonEmpty) {
          // the interval group of this batch: every window in it is complete
          val ctx = EvalContext(range.getLong(0), range.getLong(1) + step, step)
          // Per-expression budget check: ONE conditional-count pass over
          // the batch measures, per subscription, the most (series, slot)
          // rows its data queries admit in any single interval — the
          // quantity the reference's aggregators bound per step.
          val overLimit: Set[String] =
            if (maxDatapointsPerExpr == Long.MaxValue) Set.empty
            else {
              val preds = subs.map { case (_, styled) =>
                styled.flatMap(se => dataExprs(se.expr)).map(_.query).distinct
                  .reduceOption((a, b) => Query.Or(a, b): Query)
                  .getOrElse(Query.True: Query)
              }
              val perSlot = preds.zipWithIndex.map { case (q, i) =>
                sum(when(graft.planner.QueryCompiler.compile(q, col("tags")), 1L)
                  .otherwise(0L)).as(s"_n$i")
              }
              val peak = slots.groupBy(col("ts")).agg(perSlot.head, perSlot.tail: _*)
                .agg(
                  max(col("_n0")).as("_n0"),
                  preds.indices.tail.map(i => max(col(s"_n$i")).as(s"_n$i")): _*)
                .collect()(0)
              subs.indices.collect {
                case i if !peak.isNullAt(i) && peak.getLong(i) > maxDatapointsPerExpr =>
                  subs(i)._1
              }.toSet
            }
          val out = subs.map { case (id, styled) =>
            if (overLimit(id)) {
              // drop THIS subscription's interval group, keep the others
              // exact; counted + surfaced as an LWC DiagnosticMessage row
              droppedDatapointsLimitExceeded.incrementAndGet()
              val msg = "{\"type\":\"error\",\"message\":\"datapoints limit exceeded: " +
                s"more than $maxDatapointsPerExpr datapoints in an interval" + "\"}"
              slots.sparkSession.range(1)
                .select(lit(id).as("subscription"), lit(msg).as("json"))
            } else styled.map { se =>
              val expr: TimeSeriesExpr = if (se.settings.isEmpty) se.expr else se
              val frame = Planner.eval(expr, slots, ctx)
              graft.api.Api.message(frame, se.expr, ctx, se.settings)
                .select(lit(id).as("subscription"), col("json"))
            }.reduce(_ unionByName _)
          }.reduce(_ unionByName _)
          sink(out)
        }
      }
      .start()
  }
}
