package graft.core

/**
 * Evaluation window on a fixed step grid, half-open `[start, end)`, all in
 * epoch milliseconds. Mirrors the reference's evaluation context semantics
 * (atlas-core model/EvalContext.scala:24-39) but uses interval-start
 * timestamps for buckets: slot i covers `[start + i*step, start + (i+1)*step)`.
 *
 * `tz` is the request's display zone (the `tz` graph param, reference
 * eval/graph/GraphConfig.scala:55-61): `:time-span` and zone-less date
 * parsing resolve in it. `:time` calendar fields stay UTC like the
 * reference (MathExpr.Time.usingCalendar); the grid itself is epoch ms.
 */
final case class EvalContext(start: Long, end: Long, step: Long, tz: String = "UTC") {
  require(step > 0, "step must be > 0")
  require(start < end, "start must be < end")
  require(start % step == 0, "start must be step-aligned")
  require(java.time.ZoneId.of(tz) != null)

  /** Number of grid slots in the window. */
  def bufferSize: Int = ((end - start) / step).toInt

  /** `offset` floored to a whole number of slots — a shift below the step
    * resolution cannot be represented on the grid. */
  def alignedOffset(offset: Long): Long = offset - math.floorMod(offset, step)

  /** Shift the fetch window back by `offset` ms (for `:offset`). */
  def withOffset(offset: Long): EvalContext = {
    val aligned = alignedOffset(offset)
    if (aligned == 0L) this else copy(start = start - aligned, end = end - aligned)
  }

  /** Re-step to a coarser grid (consolidation). */
  def withStep(newStep: Long): EvalContext = {
    require(newStep % step == 0, s"new step $newStep must be a multiple of $step")
    copy(start = start - math.floorMod(start, newStep), step = newStep)
  }

  /**
   * Split the window into chunks of at most `chunkSlots` slots for streamed
   * fetch delivery (reference model/EvalContext.scala:41-57).
   */
  def partition(chunkSlots: Int): Seq[EvalContext] = {
    require(chunkSlots >= 1)
    val span = chunkSlots.toLong * step
    (start until end by span).map(s => copy(start = s, end = math.min(s + span, end)))
  }
}

object EvalContext {

  /** The driver testdata window: 2024-01-01T00:00Z to 2024-01-31T00:00Z, 1h step (720 slots). */
  val testdata: EvalContext =
    EvalContext(1704067200000L, 1706659200000L, 3600000L)
}
