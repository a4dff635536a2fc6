package graft

import org.apache.spark.sql.SparkSession

/**
 * The one place owning the harness session policy, so every entry point
 * (Bench, BenchOne, StageProbe, Verify) runs the engine under the same
 * configuration instead of copy-pasted builder blocks that drift apart
 * (round-13 verdict: the AQE small-frame floor lived only in three mains
 * and a fourth deployment would silently not inherit it).
 *
 * Policy decisions, each with its reason:
 *
 *  - master/parallelism come from SPARK_GRAFT_CPUS (driver contract: the
 *    driver re-runs the bench at lower core counts to measure scaling;
 *    a hard-coded master ruins that measurement). Malformed values
 *    degrade to the caller's default instead of aborting the run.
 *  - `spark.sql.shuffle.partitions = cores`: parallelism follows the
 *    allotted cores instead of a constant tuned for one machine; AQE
 *    coalescing shrinks small shuffles per query below that.
 *  - AQE `coalescePartitions.minPartitionSize` (default 256k, env
 *    SPARK_GRAFT_MIN_PART_SIZE): the 1 MB default folds every small
 *    post-shuffle frame into ONE task, serializing window/aggregate work
 *    on small-but-CPU-heavy intermediates (group-cardinality frames that
 *    exist at any corpus scale); large shuffles are untouched
 *    (`parallelismFirst` sizes them at total/parallelism). Round-13 used
 *    64k, which over-split the small window frames of
 *    stateful_rolling_mean / query_starts_or_ends into dozens of tiny
 *    tasks (rerun-confirmed ~2x regressions at both core counts); the
 *    round-14 sweep (64k / 256k / 1m, 7 warm reps each) found 256k
 *    strictly best on all four probe rows: the two window rows recover
 *    fully (0.54 s / 0.40 s vs 2.0 / 1.8 at 64k) AND the sketch/quantile
 *    wins are retained (sketch_approx_distinct_cum 1.4 s vs 2.2 at 1m).
 *  - UTC session timezone: the oracle compares epoch-ms arithmetic.
 *  - Locale.US pin: f-interpolators feed machine-parsed JSON (a
 *    comma-decimal locale breaks the driver's parse) — and NOT
 *    Locale.ROOT, which embedded Derby rejects at database creation.
 *  - fresh warehouse per run: store/rollup queries write managed tables;
 *    a stale location from a previous run fails saveAsTable.
 *  - GRAFT_CONF="k=v;k2=v2" experiment hook, applied LAST so an A/B can
 *    override any policy value (e.g. the AQE floor sweep).
 */
object Sessions {

  /** Core count from the driver-contract env SPARK_GRAFT_CPUS; malformed
    * values fall back to `default` (a NumberFormatException here would
    * abort a whole bench run before its retry loop). */
  def cpus(default: Int = 32): Int =
    math.max(1, sys.env.get("SPARK_GRAFT_CPUS").flatMap(_.toIntOption).getOrElse(default))

  /** Builder with the shared policy applied; callers may stack further
    * entry-point-specific configs on top before getOrCreate(). */
  def builder(appName: String, cores: Int): SparkSession.Builder = {
    java.util.Locale.setDefault(java.util.Locale.US)
    val b = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PART_SIZE", "256k"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
    sys.env.get("GRAFT_CONF").foreach(_.split(';').filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); b.config(k, v) })
    b
  }
}
