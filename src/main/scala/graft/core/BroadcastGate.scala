package graft.core

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.SparkSession
import scala.reflect.ClassTag

/**
 * Fail-fast size gate for DRIVER-ASSEMBLED broadcast payloads — the
 * non-query sibling of `graft.similarity.queryMaxRows`: eval n-gram Bloom
 * sketches, eval embeddings + LSH signatures, BPE tokenizers, ANN
 * centroid/codebook models. Each of these ships to EVERY executor; at a
 * 1000-executor deployment an unnoticed payload regression (an eval set
 * that grew 100x, a codebook trained at the wrong size) turns into
 * cluster-wide memory pressure or the 8 GB TorrentBroadcast hard limit —
 * long after the job was accepted. The gate measures the payload with
 * Spark's own `SizeEstimator` BEFORE broadcasting, fails loudly past
 * `graft.broadcast.maxBytes` (default 512 MB), and records every
 * measurement in a session-wide audit map that specs and operators can
 * read back ([[sizes]]).
 *
 * The measurement is one driver-side object-graph walk (SizeEstimator
 * samples large arrays, so the cost is microseconds for the model-sized
 * payloads gated here), and the estimate is the SAME number Spark's
 * storage layer uses for memory accounting — the gate fails on exactly
 * the payloads the cluster would have struggled with.
 */
object BroadcastGate {

  /** Session conf key for the per-payload byte ceiling. */
  val ConfKey = "graft.broadcast.maxBytes"

  /** 512 MB — generous for model/eval payloads (a tuned BPE tokenizer is
    * kilobytes, an IVF-PQ codebook megabytes), far under the 8 GB
    * TorrentBroadcast limit and small next to executor heaps. */
  val DefaultMaxBytes: Long = 512L << 20

  // Keyed by (session identity, label): concurrent SparkSessions (parallel
  // test suites, multi-tenant drivers) must not overwrite each other's
  // audit entries. Entries live until [[clear]] or JVM exit — the label
  // set is small and fixed (~30 operator sites) and sessions per JVM are
  // few, so the map is bounded in practice; long-lived multi-session
  // drivers should clear() when a session retires.
  private val measured =
    scala.collection.concurrent.TrieMap.empty[(String, String), Long]

  private def sessionKey(spark: SparkSession): String =
    Integer.toHexString(System.identityHashCode(spark))

  /** (label -> last measured bytes) of every gated broadcast, merged
    * across sessions last-write-wins — the JVM-wide audit surface. For a
    * per-session view use `sizes(spark)`. */
  def sizes: Map[String, Long] =
    measured.toMap.map { case ((_, label), v) => label -> v }

  /** (label -> last measured bytes) of every broadcast gated under THIS
    * session — the audit surface concurrent sessions can read without
    * seeing each other's entries. */
  def sizes(spark: SparkSession): Map[String, Long] = {
    val k = sessionKey(spark)
    measured.toMap.collect { case ((s, label), v) if s == k => label -> v }
  }

  /** Drop a retiring session's audit entries. */
  def clear(spark: SparkSession): Unit = {
    val k = sessionKey(spark)
    measured.keys.filter(_._1 == k).foreach(measured.remove)
  }

  /** Measure, record, gate, broadcast. Throws `IllegalArgumentException`
    * with sizing guidance when the payload exceeds the ceiling. */
  def gated[T <: AnyRef: ClassTag](
      spark: SparkSession, value: T, what: String): Broadcast[T] = {
    val bytes = org.apache.spark.util.SizeEstimator.estimate(value)
    measured.put((sessionKey(spark), what), bytes)
    val max = spark.conf.getOption(ConfKey).map(_.toLong).getOrElse(DefaultMaxBytes)
    if (bytes > max)
      throw new IllegalArgumentException(
        s"$what broadcast payload is $bytes bytes, past $ConfKey=$max. " +
          "This payload ships to every executor; shrink it (smaller eval " +
          "side, coarser model, tighter sample) or raise the ceiling if " +
          "the cluster's executors can genuinely hold it.")
    spark.sparkContext.broadcast(value)
  }
}
