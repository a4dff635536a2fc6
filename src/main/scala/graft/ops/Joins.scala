package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Temporal join operators Spark has no built-in word for.
 *
 * [[asof]] is the point-in-time ("as-of") join: each left row picks up the
 * payload of the LATEST right row with the same key whose timestamp is at
 * or before the left row's timestamp (`left.t >= right.t`), or nulls when
 * no such row exists. DuckDB's native `ASOF LEFT JOIN` computes the same
 * relation and serves as the oracle.
 *
 * Implementation is the scale-right union-of-streams plan rather than a
 * range join: both sides are tagged and unioned, ONE shuffle co-partitions
 * them by key, and a running `last(payload, ignoreNulls)` over the
 * time-sorted partition carries each right payload forward to the left
 * rows it covers. Cost is a single exchange + per-partition sort —
 * per-row work is O(1), there is no candidate-interval explosion the way
 * a `BETWEEN` range join explodes, and no per-left-row binary search. At
 * 100 TB both inputs stream through the same hash partitioning; a hot key
 * is bounded by that key's own row count, never by a cross product.
 */
object Joins {

  /**
   * As-of join `left` to `right` on equal `keyCols` with
   * `left(leftTime) >= right(rightTime)`.
   *
   * Every column of `left` is preserved; each of `valueCols` from `right`
   * arrives as `prefix + name`, plus `prefix + rightTime` carrying the
   * matched row's timestamp. Ties: a right row at exactly the left row's
   * timestamp matches (>= semantics); if several right rows share one
   * (key, timestamp) the one with the greatest payload struct wins —
   * deterministic, and irrelevant when (key, time) is unique on the right
   * (the common case; DuckDB's ASOF leaves this unspecified).
   *
   * `tolerance` bounds staleness: a match older than `tolerance` ms before
   * the left timestamp is discarded (payload nulls, as if never matched) —
   * a projection on the carried result, costing nothing extra.
   */
  def asof(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      valueCols: Seq[String],
      prefix: String = "asof_",
      tolerance: Option[Long] = None
  ): DataFrame = {
    require(keyCols.nonEmpty, "asof join needs at least one key column")
    val leftCols = left.columns.toSeq
    val payFields = valueCols :+ rightTime
    val payType = right
      .select(struct(payFields.map(col): _*))
      .schema.head.dataType
    // only columns not already in the union schema ride the struct — keys
    // and the timestamp reconstruct from the shuffled row itself, so the
    // exchange carries each byte once
    val lrowCols = leftCols.filterNot(n => keyCols.contains(n) || n == leftTime)
    val lrowType = left
      .select(struct(lrowCols.map(col): _*))
      .schema.head.dataType

    val l = left.select(
      keyCols.map(col) ++ Seq(
        col(leftTime).as("__t"),
        lit(1).as("__side"),
        struct(lrowCols.map(col): _*).as("__lrow"),
        lit(null).cast(payType).as("__pay")): _*)
    val r = right.select(
      keyCols.map(col) ++ Seq(
        col(rightTime).as("__t"),
        lit(0).as("__side"),
        lit(null).cast(lrowType).as("__lrow"),
        struct(payFields.map(col): _*).as("__pay")): _*)

    // right rows order BEFORE left rows at the same timestamp (so an
    // equal-time right row is visible to the left row), and equal-time
    // right rows order by payload (greatest wins under last()).
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc, col("__pay").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = l.unionByName(r)
      .withColumn("__match", last(col("__pay"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val matched = tolerance.fold(col("__match")) { tol =>
      when(col(s"__match.$rightTime") >= col("__t") - tol, col("__match"))
    }
    carried.select(
      leftCols.map {
        case n if keyCols.contains(n) => col(n)
        case n if n == leftTime       => col("__t").as(n)
        case n                        => col(s"__lrow.$n").as(n)
      } ++
        payFields.map(n => matched.getField(n).as(s"$prefix$n")): _*)
  }

  /**
   * Point-in-interval join: each `points` row joins every `intervals` row
   * with the same key whose `[startCol, endCol]` (inclusive both ends)
   * contains the point's `pointTime`. Non-matching points are dropped
   * (inner semantics). Oracle: a plain `BETWEEN` join.
   *
   * The plan is the grid ("bucketed range") join, not a range cross
   * product: every interval is exploded to the time buckets of width
   * `bucketMs` it overlaps, every point maps to its single containing
   * bucket, and the two sides meet in an EQUI-join on (key..., bucket)
   * with the exact containment as a post-filter. Each matching pair is
   * produced exactly once — through the point's own bucket — so no
   * distinct() is needed. Spark can hash-partition and AQE-skew-split an
   * equi-join; it can do neither for a raw `BETWEEN` condition, which
   * plans as a per-key cross product. Pick `bucketMs` near the typical
   * interval length: the interval side inflates by ~(length/bucketMs + 1)
   * copies while each bucket's candidate population stays small.
   */
  def intervalJoin(
      points: DataFrame,
      intervals: DataFrame,
      keyCols: Seq[String],
      pointTime: String,
      startCol: String,
      endCol: String,
      valueCols: Seq[String],
      bucketMs: Long,
      prefix: String = "iv_"
  ): DataFrame = {
    require(keyCols.nonEmpty, "interval join needs at least one key column")
    require(bucketMs > 0, "bucketMs must be positive")
    val pointCols = points.columns.toSeq
    val payFields = (Seq(startCol, endCol) ++ valueCols).distinct
    // integer `div`, not `/`: Column./ is double division, inexact past 2^53
    def bucket(c: String) = expr(s"$c div ${bucketMs}L")
    val iv = intervals.select(
      (keyCols.map(col) ++ payFields.map(col) :+
        explode(sequence(bucket(startCol), bucket(endCol))).as("__b")): _*)
    val pt = points.withColumn("__b", bucket(pointTime))
    pt.join(iv, keyCols :+ "__b")
      .filter(col(pointTime) >= col(startCol) && col(pointTime) <= col(endCol))
      .select(
        pointCols.map(col) ++
          payFields.map(n => col(n).as(s"$prefix$n")): _*)
  }

  /**
   * Streaming [[intervalJoin]]: the same point-in-interval pairing over
   * two LIVE streams, as a Spark stream-stream inner join. The exact
   * containment predicate doubles as the state-cleanup bound: with both
   * sides watermarked and `maxIntervalMs` capping interval length, Spark
   * derives how long each side's rows can still match and evicts join
   * state past it — state is bounded by (watermark delay + max interval)
   * per key, not stream history. Same output rows as the batch operator
   * on the same data (StreamSpec pins equivalence); late rows beyond the
   * watermark drop instead of blocking eviction.
   *
   * `maxIntervalMs` is a DATA CONTRACT, not advice: an interval longer
   * than the cap cannot be held in bounded state, so it is EXCLUDED from
   * the join explicitly (filtered before the state ever sees it) rather
   * than silently half-matched — batch equivalence holds exactly for the
   * rows satisfying the contract, and violations are a visible upstream
   * bug, not a quiet divergence.
   *
   * The batch operator's grid-bucket trick exists because a batch BETWEEN
   * join would plan a per-key cross product; the streaming join's
   * symmetric hash join handles the range predicate natively, so no grid
   * is needed here.
   */
  /** Per-key streaming as-of state: left rows waiting for their watermark
    * finalize and the right rows that can still answer a future left.
    * Both lists are watermark-bounded; once only the carry right remains
    * it persists like the batch operator's running last() (key-cardinality
    * state — add an application TTL if keys churn forever). */
  final case class AsofState(lefts: List[(Long, String)], rights: List[(Long, String)])

  /**
   * Streaming [[asof]]: latest right row at-or-before each left row, over
   * two live streams, EXACTLY the batch semantics. A left row finalizes
   * once the watermark passes its timestamp — from then on no right row
   * at-or-before it can still arrive (later arrivals sit at-or-above the
   * watermark, and older ones are dropped by it), so the answer is final
   * and the row emits exactly once. Rights prune to the single latest one
   * at-or-below the watermark (any earlier right is dominated for every
   * future left) plus whatever sits inside the lateness window; payloads
   * ride as JSON through the state and re-type on the way out
   * (from_json with the source schema), so the operator stays fully
   * generic over the carried columns.
   *
   * Ties: several rights sharing one (key, timestamp) resolve by greatest
   * payload STRUCT, exactly the batch rule — all rows tied at the winning
   * timestamp ride the state as a JSON array and `array_max` over the
   * typed structs picks the winner at output (StreamSpec pins batch
   * equality on a duplicate-(key, ts) corpus).
   */
  def streamingAsof(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String,
      valueCols: Seq[String],
      prefix: String = "asof_",
      tolerance: Option[Long] = None,
      watermark: String = "10 minutes"
  ): DataFrame = {
    require(keyCols.nonEmpty, "asof join needs at least one key column")
    val spark = left.sparkSession
    import spark.implicits._
    val leftCols = left.columns.toSeq
    val payFields = valueCols :+ rightTime
    val lrowSchema = left.select(struct(leftCols.map(col): _*)).schema.head.dataType
    val paySchema = right.select(struct(payFields.map(col): _*)).schema.head.dataType

    def keyed(df: DataFrame, t: String, side: Int, payload: Column): DataFrame = df.select(
      to_json(struct(keyCols.map(col): _*)).as("__k"),
      col(t).cast("long").as("__t"),
      lit(side).as("__side"),
      payload.as("__json"))
    val unioned = keyed(left, leftTime, 1, to_json(struct(leftCols.map(col): _*)))
      .unionByName(keyed(right, rightTime, 0, to_json(struct(payFields.map(col): _*))))
      .withColumn("__et", timestamp_millis(col("__t")))
      .withWatermark("__et", watermark)
      .as[(String, Long, Int, String, java.sql.Timestamp)]

    val emitted = unioned
      .groupByKey(_._1)
      .flatMapGroupsWithState[AsofState, (String, String)](
        org.apache.spark.sql.streaming.OutputMode.Append(),
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout()) {
        (_, rows, gstate) =>
          val wm = gstate.getCurrentWatermarkMs()
          val prev = gstate.getOption.getOrElse(AsofState(Nil, Nil))
          var lefts = prev.lefts
          var rights = prev.rights
          if (!gstate.hasTimedOut) rows.foreach {
            case (_, t, side, json, _) =>
              if (side == 1) lefts ::= (t, json) else rights ::= (t, json)
          }
          // finalize every left the watermark has passed: the latest right
          // at-or-below its timestamp is now definitive
          val (done, pending) = lefts.partition(_._1 < wm)
          val out = done.sortBy(_._1).map { case (t, lrow) =>
            val m = rights.filter(_._1 <= t)
            // ALL rights tied at the winning timestamp emit as a JSON
            // array; the output projection resolves the tie with
            // array_max over the TYPED structs — the same greatest-struct
            // rule the batch operator's last() ordering applies (a string
            // max here would rank "9.0" above "10.0")
            val pay =
              if (m.isEmpty) null
              else {
                val tmax = m.iterator.map(_._1).max
                m.collect { case (`tmax`, j) => j }.mkString("[", ",", "]")
              }
            (lrow, pay)
          }
          // prune rights: the latest at-or-below the watermark dominates
          // all earlier ones for every future left. EVERY row tied at the
          // carried timestamp stays — picking one by string order here
          // would pre-empt the typed struct tie-break at output
          val (recent, old) = rights.partition(_._1 >= wm)
          val carry = if (old.isEmpty) Nil else {
            val tmax = old.iterator.map(_._1).max
            old.filter(_._1 == tmax)
          }
          val kept = recent ++ carry
          if (pending.isEmpty && kept.isEmpty) gstate.remove()
          else {
            gstate.update(AsofState(pending, kept))
            // wake when the next pending left can finalize, or on the next
            // watermark advance to re-prune early rights
            val target = pending.map(_._1 + 1) match {
              case Nil => if (recent.nonEmpty) wm + 1 else Long.MaxValue
              case ts  => ts.min
            }
            if (target != Long.MaxValue)
              gstate.setTimeoutTimestamp(math.max(target, wm + 1))
          }
          out.iterator
      }

    val outDF = emitted.toDF("__lrow", "__pay")
      .select(from_json(col("__lrow"), lrowSchema).as("__l"),
        array_max(from_json(col("__pay"),
          org.apache.spark.sql.types.ArrayType(paySchema))).as("__m"))
    val matched = tolerance.fold(col("__m")) { tol =>
      when(col(s"__m.$rightTime") >= col(s"__l.$leftTime") - tol, col("__m"))
    }
    outDF.select(
      leftCols.map(n => col(s"__l.$n").as(n)) ++
        payFields.map(n => matched.getField(n).as(s"$prefix$n")): _*)
  }

  /**
   * The rows [[streamingIntervalJoin]]'s length cap rejects: intervals
   * longer than `maxIntervalMs` cannot be held in bounded join state and
   * never enter the join, so an upstream bug producing long intervals
   * would otherwise lose matches silently. Run THIS complement over the
   * same interval frame — batch or streaming — and route it to a
   * dead-letter sink or a count metric (the `StreamRunner.ingestDlq`
   * pattern), making the contract violation observable. By construction
   * `overCapIntervals ∪ (what the join consumes) = intervals`.
   */
  def overCapIntervals(
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      maxIntervalMs: Long
  ): DataFrame = {
    require(maxIntervalMs > 0, "maxIntervalMs must be positive")
    intervals.filter(col(endCol) - col(startCol) > maxIntervalMs)
  }

  def streamingIntervalJoin(
      points: DataFrame,
      intervals: DataFrame,
      keyCols: Seq[String],
      pointTime: String,
      startCol: String,
      endCol: String,
      valueCols: Seq[String],
      maxIntervalMs: Long,
      watermark: String = "10 minutes",
      prefix: String = "iv_"
  ): DataFrame = {
    require(keyCols.nonEmpty, "interval join needs at least one key column")
    require(maxIntervalMs > 0, "maxIntervalMs must be positive")
    val pointCols = points.columns.toSeq
    val payFields = (Seq(startCol, endCol) ++ valueCols).distinct
    val pt = points
      .withColumn("__pt", timestamp_millis(col(pointTime)))
      .withWatermark("__pt", watermark)
    val iv = intervals
      // the length cap is the data contract: an over-cap interval cannot
      // be held in bounded join state, so it never enters the join. The
      // rejected complement is exposed by [[overCapIntervals]] — route it
      // to a dead-letter/metric sink so the violation is OBSERVED, not a
      // quiet divergence
      .filter(col(endCol) - col(startCol) <= maxIntervalMs)
      .select((keyCols.map(c => col(c).as(s"__i_$c")) ++
        payFields.map(n => col(n).as(s"$prefix$n"))): _*)
      .withColumn("__it", timestamp_millis(col(s"$prefix$startCol")))
      .withWatermark("__it", watermark)
    val keyEq = keyCols.map(c => col(c) === col(s"__i_$c")).reduce(_ && _)
    val contained =
      col(pointTime) >= col(s"$prefix$startCol") &&
        col(pointTime) <= col(s"$prefix$endCol") &&
        // event-time range bound Spark uses to size and evict join state
        col("__pt") >= col("__it") &&
        col("__pt") <= col("__it") + expr(s"INTERVAL ${maxIntervalMs} MILLISECONDS")
    pt.join(iv, keyEq && contained, "inner")
      .select(pointCols.map(col) ++ payFields.map(n => col(s"$prefix$n")): _*)
  }
}
