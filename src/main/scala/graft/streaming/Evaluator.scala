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

  /**
   * Attach a FIXED set of subscriptions to a datapoint stream. The shared
   * normalize pass is scoped to the OR of their data queries. `sink`
   * receives, per micro-batch with finalized slots, a DataFrame of
   * (subscription: string, json: string) TimeSeriesMessage rows.
   */
  def attach(
      datapoints: DataFrame,
      subs: Seq[Subscription],
      step: Long,
      watermark: String = "10 minutes"
  )(sink: DataFrame => Unit): StreamingQuery = {
    require(subs.nonEmpty, "no subscriptions")
    val parsed = parseAndCheck(subs)
    val queries = parsed.flatMap(_._2).flatMap(se => dataExprs(se.expr)).map(_.query).distinct
    val combined = queries
      .reduceOption((a, b) => Query.Or(a, b): Query)
      .getOrElse(Query.True: Query)
    attachImpl(datapoints, combined, () => parsed, step, watermark)(sink)
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
      watermark: String = "10 minutes"
  )(sink: DataFrame => Unit): StreamingQuery =
    attachImpl(datapoints, scope, () => parseAndCheck(current()), step, watermark)(sink)

  private def attachImpl(
      datapoints: DataFrame,
      scope: Query,
      parsed: () => Seq[(String, List[StyleExpr])],
      step: Long,
      watermark: String
  )(sink: DataFrame => Unit): StreamingQuery = {
    val norm = StreamRunner.normalize(datapoints, scope, step, watermark)
    norm.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val subs = parsed()
        val slots = batch.select(col("tags"), col("t").as("ts"), col("value"))
        val range = slots.agg(min(col("ts")).as("lo"), max(col("ts")).as("hi")).collect()(0)
        if (!range.isNullAt(0) && subs.nonEmpty) {
          // the interval group of this batch: every window in it is complete
          val ctx = EvalContext(range.getLong(0), range.getLong(1) + step, step)
          val out = subs.map { case (id, styled) =>
            styled.map { se =>
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
