package graft.core

/**
 * Step planning (reference atlas-core util/Step.scala + GraphConfig
 * stepSize, atlas-eval graph/GraphConfig.scala:70-82): round a requested
 * step to a supported size and auto-coarsen so each rendered line has at
 * most min(maxDatapoints, width) points. The coarsened step is always a
 * multiple of the primary step, so consolidation re-windows evenly.
 */
object Step {

  private val oneSecond = 1000L
  private val oneMinute = 60000L
  private val oneHour = 60 * oneMinute
  private val oneDay = 24 * oneHour

  /** Supported step sizes: even divisors of a minute/hour plus sub-day hours. */
  val allowedStepSizes: List[Long] = {
    val subSecond = List(1L, 5L, 10L, 50L, 100L, 500L)
    val div60 = List(1, 2, 3, 4, 5, 6, 10, 12, 15, 20, 30)
    val subMinute = div60.map(_ * oneSecond)
    val subHour = div60.map(_ * oneMinute)
    val subDay = List(1, 2, 3, 4, 6, 8, 12).map(_ * oneHour)
    subSecond ::: subMinute ::: subHour ::: subDay
  }

  private def roundToDayBoundary(step: Long): Long =
    if (step % oneDay == 0) step else step / oneDay * oneDay + oneDay

  /** Round an arbitrary step UP to the next allowed step >= max(primary, step). */
  def round(primary: Long, step: Long): Long = {
    val max = math.max(primary, step)
    allowedStepSizes.filter(s => s % primary == 0 || primary % s == 0)
      .find(_ >= max)
      .getOrElse(roundToDayBoundary(step))
  }

  private def datapointsPerPixel(datapoints: Long, width: Int): Long = {
    val v = datapoints / width
    if (datapoints % width == 0) v else v + 1
  }

  /**
   * Step size so that at most `width` datapoints render per line; always a
   * multiple of `primary`.
   */
  def compute(primary: Long, width: Int, start: Long, end: Long): Long = {
    val datapoints = (end - start) / primary
    val minStep = math.max(1L, datapointsPerPixel(datapoints, width)) * primary
    round(primary, minStep)
  }
}
