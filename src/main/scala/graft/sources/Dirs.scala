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

  /** Replace `livePath` with a layout produced by `write(tmpPath)`.
    *
    * A `__swapping` marker frames the two renames, so a PROCESS CRASH
    * inside the window is recoverable on the next run (see
    * [[recoverInterruptedSwap]]) — without it, a crashed swap left the
    * backup looking like debris: an appender would re-create the live
    * path with only new batches, and the next compaction would delete
    * the backup holding the only full copy. */
  def swapInPlace(spark: SparkSession, livePath: String)(write: String => Unit): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val path = new org.apache.hadoop.fs.Path(livePath)
    val fs = path.getFileSystem(conf)
    val tmp = new org.apache.hadoop.fs.Path(livePath + "__compacting")
    val bak = new org.apache.hadoop.fs.Path(livePath + "__pre_compact")
    val marker = new org.apache.hadoop.fs.Path(livePath + "__swapping")
    recoverInterruptedSwap(fs, path, bak, marker, tmp)
    write(tmp.toString) // mode("overwrite") clears stale tmp debris
    if (fs.exists(bak)) fs.delete(bak, true) // pre-marker-era debris
    fs.create(marker, true).close() // swap window opens
    if (!fs.rename(path, bak)) {
      fs.delete(marker, false)
      throw new java.io.IOException(s"compaction backup rename failed: $path -> $bak")
    }
    if (!fs.rename(tmp, path)) {
      // restore the live directory before surfacing the failure — and if
      // the restore ITSELF fails, say so explicitly with the backup
      // location: a silently-failed restore leaves the path absent, and
      // the next reader would see no data and carry on without it
      if (fs.rename(bak, path)) {
        fs.delete(marker, false)
        throw new java.io.IOException(s"compaction swap failed: $tmp -> $path (restored)")
      } else
        throw new java.io.IOException(
          s"compaction swap failed: $tmp -> $path AND the restore rename failed — " +
            s"the live data is still available at the backup path $bak; " +
            s"rename it back to $path manually before the next read")
    }
    fs.delete(bak, true)
    fs.delete(marker, false) // swap window closed
    // the path's contents (and possibly schema) just changed in place:
    // readers going through the Pq schema cache must re-infer
    Pq.invalidate(livePath)
  }

  /** Public entry-point form of the crash recovery below: call before
    * reading or compacting a swap-managed directory whose previous
    * maintenance run may have died inside the rename window. */
  def recover(spark: SparkSession, livePath: String): Unit = {
    val path = new org.apache.hadoop.fs.Path(livePath)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    recoverInterruptedSwap(fs, path,
      new org.apache.hadoop.fs.Path(livePath + "__pre_compact"),
      new org.apache.hadoop.fs.Path(livePath + "__swapping"),
      new org.apache.hadoop.fs.Path(livePath + "__compacting"))
  }

  /** Heal a swap the previous run crashed inside of (marker present).
    * The `__compacting` tmp directory is the phase discriminator: the
    * second rename CONSUMES it, so tmp-present means the crash landed
    * between the renames (the backup is authoritative — rename it back,
    * or merge its files in beside an appender's re-created live dir),
    * while tmp-absent means the swap completed and only the backup
    * delete was lost (the backup is STALE — merging it would duplicate
    * every row into the freshly compacted live; just delete it). A
    * backup without a marker is completed-swap debris either way. */
  private def recoverInterruptedSwap(
      fs: org.apache.hadoop.fs.FileSystem,
      live: org.apache.hadoop.fs.Path,
      bak: org.apache.hadoop.fs.Path,
      marker: org.apache.hadoop.fs.Path,
      tmp: org.apache.hadoop.fs.Path): Unit = {
    if (!fs.exists(marker)) return
    if (fs.exists(bak)) {
      if (!fs.exists(tmp)) {
        // post-swap crash: live holds the compacted layout already
        fs.delete(bak, true)
      } else if (!fs.exists(live)) {
        if (!fs.rename(bak, live))
          throw new java.io.IOException(
            s"recovery rename failed: $bak -> $live — restore it manually")
      } else {
        mergeInto(fs, bak, live)
        fs.delete(bak, true)
      }
    }
    fs.delete(marker, false)
  }

  /** Move every data file under `from` to the same relative path under
    * `to` (metadata renames only; directories created as needed). */
  private def mergeInto(
      fs: org.apache.hadoop.fs.FileSystem,
      from: org.apache.hadoop.fs.Path,
      to: org.apache.hadoop.fs.Path): Unit = {
    val it = fs.listFiles(from, true)
    val fromUri = from.toUri.getPath
    while (it.hasNext) {
      val f = it.next().getPath
      val rel = f.toUri.getPath.stripPrefix(fromUri).stripPrefix("/")
      if (!f.getName.startsWith("_") && !f.getName.startsWith(".")) { // skip _SUCCESS etc.
        val dest = new org.apache.hadoop.fs.Path(to, rel)
        fs.mkdirs(dest.getParent)
        if (!fs.rename(f, dest))
          throw new java.io.IOException(s"recovery merge rename failed: $f -> $dest")
      }
    }
  }

  /** Fold a flat parquet append log into max(1, n/rowsPerFile) files,
    * swapped in place — the one recipe behind the dedup-index and
    * flat-ANN-index compactors. `dedup` runs a full-row dropDuplicates
    * first (safe where replay can only create exact-duplicate rows).
    * No-op when the directory doesn't exist. */
  def compactFlat(
      spark: SparkSession, dir: String, rowsPerFile: Long, dedup: Boolean): Unit = {
    recover(spark, dir) // a crashed swap may have left the data at the backup
    if (!exists(spark, dir)) return
    val log = spark.read.parquet(dir)
    val df = if (dedup) log.dropDuplicates() else log
    val n = df.count()
    val files = math.max(1L, (n + rowsPerFile - 1) / rowsPerFile).toInt
    swapInPlace(spark, dir) { tmp =>
      df.coalesce(files).write.mode("overwrite").parquet(tmp)
    }
  }

  /** Any data file directly at the directory ROOT (not in a partition
    * subdirectory)? Layout-migration probe: appending `col=value`
    * subdirectories beside root-level files leaves a mix Spark's
    * partition discovery rejects. */
  def hasRootDataFiles(spark: SparkSession, dir: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(p) && fs.listStatus(p).exists(s =>
      s.isFile && s.getPath.getName.endsWith(".parquet"))
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
