package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/**
 * Parquet reads with a JVM-cached schema per path.
 *
 * A plain `spark.read.parquet(path)` runs a schema-inference step on every
 * call — a driver-side footer read that surfaces as a ~30-40 ms one-task
 * job before the real query starts. The catalog executes hundreds of
 * queries per session, each re-reading the same immutable input tables, so
 * the inference job alone costs seconds per catalog pass (r13 optimization
 * round measurement: "parquet at Datapoints.scala:40" 28-41 ms on every
 * warm data_* row). Supplying the schema skips inference entirely; the
 * scan itself (listing, pushdown, pruning) is unchanged.
 *
 * ONLY for immutable input paths (the driver's testdata tables): a path
 * whose schema can change between reads must keep the inferring read.
 * Cached schemas are metadata, never data — every query still computes
 * from the parquet bytes.
 */
object Pq {
  private val schemas = scala.collection.concurrent.TrieMap.empty[String, StructType]

  def read(spark: SparkSession, path: String): DataFrame = {
    val sc = schemas.getOrElseUpdate(path, spark.read.parquet(path).schema)
    spark.read.schema(sc).parquet(path)
  }

  /** Drop the cached schema for a rewritten path (and any cached child
    * paths under it). [[Dirs.swapInPlace]] calls this after every in-place
    * rewrite, so index artifacts read through [[read]] cannot see a stale
    * schema after a same-JVM rebuild that changes the layout. */
  def invalidate(path: String): Unit = {
    val norm = path.stripSuffix("/")
    schemas.keysIterator
      .filter(k => k == norm || k.startsWith(norm + "/"))
      .foreach(schemas.remove)
  }
}
