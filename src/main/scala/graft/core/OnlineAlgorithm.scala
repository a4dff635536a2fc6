package graft.core

/**
 * Online (one-pass, resumable) algorithms applied sequentially along the time
 * axis of one series. Semantics re-implement the reference's
 * atlas-core/core/algorithm package (OnlineDes.scala, OnlineSlidingDes.scala,
 * OnlineIgnoreN.scala, Pipeline.scala). Only the algorithms that can't be
 * expressed as Spark window frames live here (DES variants); rolling
 * min/max/sum/mean/count/delay/integral compile to window functions in the
 * planner. State is a plain case class so Structured Streaming can carry it
 * in flatMapGroupsWithState.
 */
trait OnlineAlgorithm extends Serializable {
  def next(v: Double): Double
  def reset(): Unit
}

/**
 * Double exponential smoothing. Emits NaN until `training` non-NaN samples
 * have been observed, then the smoothed prediction (reference
 * OnlineDes.scala:29-55).
 */
final class OnlineDes(val training: Int, val alpha: Double, val beta: Double)
    extends OnlineAlgorithm {

  private var currentSample = 0
  private var sp = Double.NaN
  private var bp = Double.NaN

  def next(v: Double): Double = {
    val retval = if (currentSample >= training) sp else Double.NaN
    if (!v.isNaN) {
      if (currentSample == 0) {
        sp = v; bp = 0.0
      } else {
        val sn = alpha * v + (1 - alpha) * (sp + bp)
        val bn = beta * (sn - sp) + (1 - beta) * bp
        sp = sn; bp = bn
      }
      currentSample += 1
    }
    retval
  }

  def reset(): Unit = {
    currentSample = 0
    sp = Double.NaN
    bp = Double.NaN
  }
}

/**
 * Deterministic DES: two DES instances alternate, the active one resetting
 * after each training window, so the estimate never depends on data older
 * than two windows (reference OnlineSlidingDes.scala).
 */
final class OnlineSlidingDes(training: Int, alpha: Double, beta: Double)
    extends OnlineAlgorithm {

  private val des1 = new OnlineDes(training, alpha, beta)
  private val des2 = new OnlineDes(training, alpha, beta)
  private var useOne = true
  private var currentSample = 0

  def next(v: Double): Double = {
    currentSample += 1
    val v1 = des1.next(v)
    val v2 = des2.next(v)
    val retval = if (useOne) v1 else v2
    if (currentSample % training == 0) {
      if (useOne) des1.reset() else des2.reset()
      useOne = !useOne
    }
    retval
  }

  def reset(): Unit = {
    des1.reset(); des2.reset()
    useOne = true
    currentSample = 0
  }
}

/** Emit NaN for the first n samples, then pass through (OnlineIgnoreN). */
final class OnlineIgnoreN(n: Int) extends OnlineAlgorithm {

  private var pos = 0

  def next(v: Double): Double = {
    val i = pos
    pos += 1
    if (i >= n) v else Double.NaN
  }

  def reset(): Unit = pos = 0
}

/** Compose algorithms left-to-right (algorithm/Pipeline.scala). */
final class OnlinePipeline(stages: OnlineAlgorithm*) extends OnlineAlgorithm {
  def next(v: Double): Double = stages.foldLeft(v)((acc, a) => a.next(acc))
  def reset(): Unit = stages.foreach(_.reset())
}

/** Circular last-n buffer (reference algorithm/RollingBuffer.scala). */
final class RollingBuffer(n: Int) extends Serializable {
  private val buf = Array.fill(n)(Double.NaN)
  private var pos = 0
  /** Push v, return the evicted value. */
  def add(v: Double): Double = {
    val old = buf(pos)
    buf(pos) = v
    pos = (pos + 1) % n
    old
  }
  def values: Array[Double] = buf.clone()
}

/**
 * Rolling aggregates over the last n slots, matching the batch planner's
 * window-frame forms exactly (NaN-skipping; all-NaN window -> NaN).
 * `f` folds the non-NaN values of the window.
 */
final class OnlineRollingAgg(n: Int, agg: String) extends OnlineAlgorithm {
  private val buf = new RollingBuffer(n)
  def next(v: Double): Double = {
    buf.add(v)
    val vs = buf.values.filter(!_.isNaN)
    if (vs.isEmpty) Double.NaN
    else agg match {
      case "sum" => vs.sum
      case "min" => vs.min
      case "max" => vs.max
    }
  }
  def reset(): Unit = (0 until n).foreach(_ => buf.add(Double.NaN))
}

/** Mean of last n non-NaN values, NaN unless >= minNum present. */
final class OnlineRollingMean(n: Int, minNum: Int) extends OnlineAlgorithm {
  private val buf = new RollingBuffer(n)
  def next(v: Double): Double = {
    buf.add(v)
    val vs = buf.values.filter(!_.isNaN)
    if (vs.length >= minNum) vs.sum / vs.length else Double.NaN
  }
  def reset(): Unit = (0 until n).foreach(_ => buf.add(Double.NaN))
}

/** Count of truthy values in the last n slots (always a number). */
final class OnlineRollingCount(n: Int) extends OnlineAlgorithm {
  private val buf = new RollingBuffer(n)
  def next(v: Double): Double = {
    buf.add(if (NanMath.toBoolean(v)) 1.0 else 0.0)
    // unfilled slots are NaN during warmup; the batch frame sums over the
    // rows that exist, so skip them rather than poisoning the sum
    buf.values.filter(!_.isNaN).sum
  }
  def reset(): Unit = (0 until n).foreach(_ => buf.add(0.0))
}

/** Shift values n slots forward (OnlineDelay). */
final class OnlineDelay(n: Int) extends OnlineAlgorithm {
  private val buf = new RollingBuffer(n)
  def next(v: Double): Double = buf.add(v)
  def reset(): Unit = (0 until n).foreach(_ => buf.add(Double.NaN))
}

/** v(t) - v(t-1), NaN at the first slot and across NaN gaps. */
final class OnlineDerivative extends OnlineAlgorithm {
  private var prev = Double.NaN
  def next(v: Double): Double = { val d = v - prev; prev = v; d }
  def reset(): Unit = prev = Double.NaN
}

/** Running NaN-skipping sum; NaN until the first non-NaN value. */
final class OnlineIntegral extends OnlineAlgorithm {
  private var acc = Double.NaN
  def next(v: Double): Double = {
    if (!v.isNaN) acc = if (acc.isNaN) v else acc + v
    acc
  }
  def reset(): Unit = acc = Double.NaN
}

/** Running NaN-skipping max. */
final class OnlineCumulativeMax extends OnlineAlgorithm {
  private var acc = Double.NaN
  def next(v: Double): Double = {
    if (!v.isNaN && (acc.isNaN || v > acc)) acc = v
    acc
  }
  def reset(): Unit = acc = Double.NaN
}

/** Moving average over n slots divided by the FULL window size, NaN until
  * the window has filled once and while the window holds no data. */
final class OnlineTrend(n: Int) extends OnlineAlgorithm {
  private val buf = new RollingBuffer(n)
  private var seen = 0
  def next(v: Double): Double = {
    buf.add(v)
    seen += 1
    val vs = buf.values.filter(!_.isNaN)
    if (seen >= n && vs.nonEmpty) vs.sum / n else Double.NaN
  }
  def reset(): Unit = { seen = 0; (0 until n).foreach(_ => buf.add(Double.NaN)) }
}

object OnlineAlgorithm {

  /**
   * Factory: the online form of a stateful operator, for the streaming
   * runner. Matches the batch planner's window-frame semantics so
   * streaming-vs-batch equivalence holds per slot.
   */
  def forExpr(s: graft.asl.StatefulExpr, ctx: EvalContext): () => OnlineAlgorithm = {
    import graft.asl.StatefulExpr._
    s match {
      case Delay(_, n)          => () => new OnlineDelay(n)
      case RollingCount(_, n)   => () => new OnlineRollingCount(n)
      case RollingMin(_, n)     => () => new OnlineRollingAgg(n, "min")
      case RollingMax(_, n)     => () => new OnlineRollingAgg(n, "max")
      case RollingSum(_, n)     => () => new OnlineRollingAgg(n, "sum")
      case RollingMean(_, n, m) => () => new OnlineRollingMean(n, m)
      case Des(_, t, a, b)      => () => new OnlineDes(t, a, b)
      case Derivative(_)        => () => new OnlineDerivative
      case Integral(_)          => () => new OnlineIntegral
      case CumulativeMax(_)     => () => new OnlineCumulativeMax
      case Trend(_, window)     => () => new OnlineTrend(math.max(1L, window / ctx.step).toInt)
      case SlidingDes(_, t, a, b) =>
        val trainingStep = ctx.step * t
        val alignedStart =
          if (ctx.start % trainingStep == 0) ctx.start
          else ctx.start / trainingStep * trainingStep + trainingStep
        val skip = ((alignedStart - ctx.start) / ctx.step).toInt
        () =>
          if (skip > 0) new OnlinePipeline(new OnlineIgnoreN(skip), new OnlineSlidingDes(t, a, b))
          else new OnlineSlidingDes(t, a, b)
    }
  }
}
