package graft.sources

import org.apache.spark.sql.SparkSession

/**
 * Atomic-enough directory replacement for on-disk index/table maintenance:
 * write the new layout ASIDE, then swap it into place with two metadata
 * renames (backup-first). Shared by the dedup-index, ANN-index and any
 * future compaction passes so they all carry the same crash story:
 *
 *   - a failure before the swap leaves the live directory untouched;
 *   - a failed swap restores the backup and throws;
 *   - a failed RESTORE throws with the backup path spelled out, so the
 *     operator can finish the rename by hand (the live path being absent
 *     is the one state a reader must never meet silently);
 *   - debris from an interrupted earlier run is cleared on the next one.
 *
 * The live path is absent only between the two renames — never across a
 * bulk file delete. Run between batches or against a paused stream;
 * readers list the directory per query/trigger and pick up the new layout
 * on their next one.
 */
object Dirs {

  /** Replace `livePath` with a layout produced by `write(tmpPath)`. */
  def swapInPlace(spark: SparkSession, livePath: String)(write: String => Unit): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val path = new org.apache.hadoop.fs.Path(livePath)
    val fs = path.getFileSystem(conf)
    val tmp = new org.apache.hadoop.fs.Path(livePath + "__compacting")
    val bak = new org.apache.hadoop.fs.Path(livePath + "__pre_compact")
    write(tmp.toString) // mode("overwrite") clears stale tmp debris
    if (fs.exists(bak)) fs.delete(bak, true) // debris from an interrupted run
    if (!fs.rename(path, bak))
      throw new java.io.IOException(s"compaction backup rename failed: $path -> $bak")
    if (!fs.rename(tmp, path)) {
      // restore the live directory before surfacing the failure — and if
      // the restore ITSELF fails, say so explicitly with the backup
      // location: a silently-failed restore leaves the path absent, and
      // the next reader would see no data and carry on without it
      if (fs.rename(bak, path))
        throw new java.io.IOException(s"compaction swap failed: $tmp -> $path (restored)")
      else
        throw new java.io.IOException(
          s"compaction swap failed: $tmp -> $path AND the restore rename failed — " +
            s"the live data is still available at the backup path $bak; " +
            s"rename it back to $path manually before the next read")
    }
    fs.delete(bak, true)
  }

  def exists(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Count data files under a directory tree (spec/diagnostic helper). */
  def dataFileCount(spark: SparkSession, dir: String): Int = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) 0
    else {
      val it = fs.listFiles(p, true)
      var n = 0
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet")) n += 1
      }
      n
    }
  }
}
