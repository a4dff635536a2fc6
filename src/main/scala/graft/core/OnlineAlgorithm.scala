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
