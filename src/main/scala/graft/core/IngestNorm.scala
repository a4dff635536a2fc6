package graft.core

/**
 * Online (per-series, resumable) ingest-normalization functions, the
 * sequential forms used by Structured Streaming state. Semantics follow the
 * reference's atlas-core norm package:
 *
 *  - [[OnlineRate]]: monotonic counter -> per-second rate
 *    (norm/RateValueFunction.scala:22-40);
 *  - [[OnlineWeightedNorm]]: RRDtool-style weighted alignment of irregular
 *    samples to step boundaries, with heartbeat expiry — a series that stops
 *    publishing for longer than `heartbeat` drops its partial state instead
 *    of smearing a stale value forward
 *    (norm/NormalizeValueFunction.scala:36-120);
 *  - wired per DsType like the reference's NormalizationCache
 *    (norm/NormalizationCache.scala:57-105): counter = rate conversion then
 *    weighted normalize with heartbeat 2*step; rate = weighted normalize
 *    with heartbeat = step; gauge = last-value per slot.
 *
 * The batch planner uses the columnar equivalent
 * (graft.sources.Normalize) — IngestNormSpec asserts the two forms produce
 * identical slots on randomized irregular input.
 */
object IngestNorm {

  /** Counter heartbeat (norm/NormalizationCache.scala:27-30): a fixed two
    * minute floor for sub-minute steps — reporting is irregular enough at
    * small steps that 2*step would expire series the reference keeps. */
  def counterHeartbeat(step: Long): Long =
    if (step < 60000L) 120000L else 2 * step

  /** ONE heartbeat rule per dstype, shared by the batch kernel
    * (sources.Normalize.counters) and streaming ingest
    * (StreamRunner.streamingIngestNormalize) so the two paths can never
    * diverge on expiry for the same series: counters get
    * [[counterHeartbeat]] (2*step, two-minute floor); client-computed
    * rates heartbeat at exactly one step — the over-counting guard
    * (norm/NormalizationCache.scala:57-85: updateRate normalizes with
    * heartbeat = step). */
  def heartbeatFor(isCounter: Boolean, step: Long): Long =
    if (isCounter) counterHeartbeat(step) else step

  /** A per-series ingest normalizer: consumes raw (timestamp, value)
    * samples, returns the slots each sample finalizes as (slotEnd, value)
    * pairs. Serializable so streaming can carry it in GroupState. */
  trait OnlineIngest extends Serializable {
    def next(t: Long, v: Double): List[(Long, Double)]
  }

  /** Counter -> per-second rate. Returns NaN for the first sample of a
    * series (nothing to difference against); callers drop NaN samples. A
    * non-positive delta or duration yields rate 0 (counter reset / clock
    * skew), matching the reference. */
  final class OnlineRate extends Serializable {

    // explicit has-previous flag (not a timestamp sentinel): keeps the
    // semantics well-defined for timestamps <= 0 and identical to the batch
    // columnar form's lag-IS-NULL test
    private var hasPrev = false
    private var lastT = 0L
    private var lastV = 0.0

    def next(t: Long, v: Double): Double = {
      val out =
        if (hasPrev) {
          val durationSec = (t - lastT) / 1000.0
          val delta = v - lastV
          if (durationSec <= 0.0 || delta <= 0.0) 0.0 else delta / durationSec
        } else Double.NaN
      hasPrev = true
      lastT = t
      lastV = v
      out
    }
  }

  /**
   * Weighted step alignment: a sample (t, v) covers the span since the
   * previous update (or one full step when there is none / the heartbeat
   * expired), and each step interval it overlaps receives v scaled by the
   * covered fraction. Finalized slots are returned as (slotEnd, value)
   * pairs — slotEnd is the boundary timestamp in the reference's
   * end-of-interval convention; graft's interval-start frames subtract one
   * step. The partial value of the still-open slot stays in state until a
   * later sample finalizes it (or dies with the heartbeat, like the
   * reference's expiry counter).
   */
  final class OnlineWeightedNorm(step: Long, heartbeat: Long) extends OnlineIngest {
    require(step >= 1 && heartbeat >= 1)

    // explicit has-previous flag instead of a timestamp sentinel, so the
    // recurrence is well-defined for timestamps <= 0 and matches the batch
    // columnar form (lag IS NULL) at every instant
    private var hasPrev = false
    private var lastUpdate = 0L
    private var partial = 0.0

    private def weighted(span: Long, v: Double): Double = v * (span.toDouble / step)

    def next(timestamp: Long, value: Double): List[(Long, Double)] = {
      if (hasPrev && timestamp <= lastUpdate) return Nil // stale/duplicate
      if (hasPrev && timestamp - lastUpdate > heartbeat) {
        // heartbeat expiry: forget the open slot's partial value
        hasPrev = false
        partial = 0.0
      }
      val out = List.newBuilder[(Long, Double)]
      val offset = math.floorMod(timestamp, step)
      val boundaryBelow = timestamp - offset
      if (!hasPrev || lastUpdate < boundaryBelow) {
        // crossed >= 1 boundary: finalize the slot the previous update left
        // open, full-value slots in between, then start the new partial
        if (hasPrev) {
          val lastOffset = math.floorMod(lastUpdate, step)
          var b = lastUpdate - lastOffset + step
          partial += weighted(step - lastOffset, value)
          out += ((b, partial))
          while (b < boundaryBelow) {
            b += step
            out += ((b, value))
          }
        } else if (offset == 0) {
          out += ((timestamp, value))
        } else {
          // first sample: assume it covered the preceding step
          out += ((boundaryBelow, weighted(step - offset, value)))
        }
        hasPrev = true
        lastUpdate = timestamp
        partial = weighted(offset, value)
      } else {
        // within the open slot: accumulate the covered fraction
        partial += weighted(timestamp - lastUpdate, value)
        lastUpdate = timestamp
      }
      out.result()
    }
  }

  /** Counter pipeline: rate conversion feeding weighted normalization
    * (NormalizationCache.updateCounter). */
  final class OnlineCounter(step: Long) extends OnlineIngest {
    private val rate = new OnlineRate
    private val norm = new OnlineWeightedNorm(step, counterHeartbeat(step))

    def next(t: Long, v: Double): List[(Long, Double)] = {
      val r = rate.next(t, v)
      if (r.isNaN) Nil else norm.next(t, r)
    }
  }
}
