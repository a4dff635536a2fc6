package graft

import org.apache.spark.sql.SparkSession

/**
 * Adversarially SKEWED stress corpus generator (round-10 verdict item 2):
 * a documents.parquet at ~24x the sf0.1 row volume whose distributions are
 * exactly the ones the de-skewed operator family claims to survive:
 *
 *  - **giant source**: 90% of rows carry `source = src0` (the web slice of
 *    a real mixture) — a source/stratum/domain-keyed window would funnel
 *    108k of 120k rows through ONE task; the grouped-rank family must
 *    range-slice it across partitions.
 *  - **hot md5 shard**: 25% of rows carry ids MINED so that
 *    `md5("42:" + id) % 16 == 3` (the [[graft.ops.Curate.shuffleShards]]
 *    assignment at the catalog's seed/shard count) — shard 3 holds ~29% of
 *    the corpus instead of 1/16.
 *  - **boilerplate grams/frames**: 1/8 of docs open with the same
 *    10-word sentence, so its 3-grams (and the shared 64-char stock frame
 *    of the mm fixture) have df ~ 15k — far above the containment row's
 *    0.4% ceiling (cap ~ 480 here) and the frame row's 100: the
 *    df-ceiling paths MUST trip, and the uncapped self-join volume
 *    (8 grams x 15k^2 ~ 1.8e9 candidate rows) is what the cap removes.
 *  - **near-dup clusters**: ids 0..2999 form 1000 clusters of 3 sharing a
 *    35-word body with unique 15-word tails — real containment pairs that
 *    must SURVIVE the cap (their gram df is ~3).
 *  - **null-group slice**: ~0.5% of rows carry a NULL source — the
 *    window->join rewrites must keep them (the round-9 null-safety
 *    lesson, asserted here at volume through the oracle gate).
 *
 * Round 11 adds a skewed EVENTS table (2x the document rows) for the
 * events/diag family — the clickstream version of the same adversarial
 * shapes:
 *
 *  - **hot user**: ~89.5% of events belong to user 7 (the null-user slice
 *    below is carved out of rows that would otherwise be hot, so the hot
 *    share is 90% minus that carve-out — the bot/monitor key of
 *    a real interaction log) — the shape every user-keyed
 *    sessionize/funnel/attribution group must survive, and exactly what
 *    the diag_* skew reports exist to flag.
 *  - **null-user slice**: ~0.5% NULL user_id — anonymous events; a
 *    user-keyed group/window must keep them as a regular group in BOTH
 *    engines or the gate hash-fails.
 *  - 500 cold users with ~95-minute base spacing plus a 0-6h
 *    deterministic jitter, so session-gap splits actually occur (the hot
 *    user's 12-second spacing keeps it one giant session — the bound the
 *    sessionize scaladoc documents, exercised at volume).
 *
 * Everything derives from the row index through md5/fixed mixing — no RNG
 * state, so any two runs (and the DuckDB oracle's replay of the engine's
 * md5 arithmetic) see byte-identical data.
 *
 * Usage: runMain graft.StressGen [outDir=/tmp/graft_stress] [nRows=120000]
 */
object StressGen {

  private val Vocab = 3000

  /** 64-bit mix (splitmix64 finalizer) — deterministic word choice. */
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private def word(seed: Long, pos: Int): String =
    "w" + java.lang.Long.remainderUnsigned(mix(seed * 1000003L + pos), Vocab)

  /** The engine's shard assignment: first 15 md5 hex digits of
    * "42:<id>" as a 60-bit value, mod 16 ([[graft.ops.Curate.shuffleShards]]
    * at the catalog's seed = "42", numShards = 16). */
  private def shardOf(md: java.security.MessageDigest, id: Long): Int = {
    md.reset()
    val d = md.digest(s"42:$id".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v = (v << 4) | ((d(7) & 0xffL) >>> 4)
    (v % 16L).toInt
  }

  private val Boilerplate =
    (0 until 10).map(i => "bp" + i).mkString(" ")

  /** Pure per-row document: id, source, lang, text. Each row owns the
    * disjoint id block [3000 + row*32, +32) (rows < 3000 are the cluster
    * ids themselves), so ids are unique; hot-shard rows pick the first
    * shard-3 id in their block (present with p ~ 0.87 — the deterministic
    * fallback dilutes the hot shard slightly, never breaks uniqueness). */
  private def makeRow(row: Long, md: java.security.MessageDigest): (Long, String, String, String) = {
    val id: Long =
      if (row < 3000L) row
      else {
        val base = 3000L + row * 32L
        if (row % 4 == 0) {
          var j = 0
          while (j < 31 && shardOf(md, base + j) != 3) j += 1
          base + j // falls back to base+31 when the block has no shard-3 id
        } else base + 16L
      }
    val source: String =
      if (row % 10 != 0) "src0"
      else {
        val k = (row / 10) % 21
        if (k == 20) null else "src" + (k + 1)
      }
    val lang = if (row % 5 == 0) "zh" else "en"
    val sb = new StringBuilder
    if (row % 8 == 5) { sb.append(Boilerplate); sb.append(' ') }
    if (row < 3000L) {
      val cluster = row / 3
      var p = 0
      while (p < 35) { sb.append(word(7777777L + cluster, p)); sb.append(' '); p += 1 }
      p = 0
      while (p < 15) { sb.append(word(row + 1, 100 + p)); sb.append(' '); p += 1 }
    } else {
      var p = 0
      while (p < 60) { sb.append(word(row + 1, p)); sb.append(' '); p += 1 }
    }
    sb.setLength(sb.length - 1)
    (id, source, lang, sb.toString)
  }

  /** Pure per-row event on the 2024-01 grid the oracles share:
    * (event_id, tms, user_id, event_type, value, props). */
  private def makeEvent(row: Long): (Long, Long, Option[Long], String, Double, String) = {
    val user: Option[Long] =
      if (row % 200 == 199) None                  // null-user slice
      else if (row % 10 != 0) Some(7L)            // the hot user
      else Some(1000L + java.lang.Long.remainderUnsigned(mix(row), 500L))
    val base = 1704067200000L // 2024-01-01T00:00:00Z
    // dense global spread (~10.7 s) + 0-6 h jitter: cold users (~95 min
    // base spacing) split into real sessions; the hot user stays one
    // island. Spread + jitter stay STRICTLY inside the 30-day 2024-01
    // eval window (the testdata contract the planner oracles assume —
    // the engine clips fetches to the eval window, the oracles replay
    // raw events, so a spilled event would diverge them by design)
    val tms = base + (row * 10709L) % 2570400000L +
      java.lang.Long.remainderUnsigned(mix(row * 31L + 5L), 21599999L)
    val types = Array("signup", "click", "purchase", "error", "view")
    val tpe = types(java.lang.Long.remainderUnsigned(mix(row * 7L + 1L), 5L).toInt)
    val value = java.lang.Long.remainderUnsigned(mix(row * 13L + 2L), 100000L) / 100.0
    (row, tms, user, tpe, value, s"""{"k": ${row % 100}}""")
  }

  /** Pure per-row embedding over the adversarial-geometry layout:
    * row 0 = the ZERO vector (no direction — the degenerate cosine),
    * row 1 = a NULL embedding (a failed encoder row),
    * rows 2..1001 = 500 planted near-dup pairs (one lane perturbed),
    * rows 1002..2201 = a 1200-strong BYTE-IDENTICAL hot cluster (the
    * mega-duplicate every dedup/index bucket must not funnel on),
    * rest = deterministic pseudo-random lanes in [-1, 1]. */
  private def makeEmb(row: Long, d: Int): (Long, Array[Float], Int) = {
    def lanes(seed: Long): Array[Float] =
      Array.tabulate(d) { j =>
        (java.lang.Long.remainderUnsigned(mix(seed * 64L + j), 2001L) - 1000L) / 1000.0f
      }
    val vec: Array[Float] =
      if (row == 0L) new Array[Float](d)
      else if (row == 1L) null
      else if (row < 1002L) {
        val base = lanes(5000000L + (row - 2L) / 2L)
        if (row % 2L == 1L) base(0) = base(0) + 0.001f
        base
      }
      else if (row < 2202L) lanes(4242424L)
      else lanes(row)
    (row, vec, (row % 5L).toInt)
  }

  /** Funnel the frame into ONE parquet file named `$outDir/$name.parquet`
    * (DuckDB's oracle view globs a file path) with 2 MB row groups so the
    * byte-range splits don't read as input skew in task profiles. */
  private def writeSingleFile(
      df: org.apache.spark.sql.DataFrame, outDir: String, name: String): Unit = {
    df.repartition(1)
      .write.mode("overwrite")
      .option("parquet.block.size", 2 * 1024 * 1024)
      .parquet(s"$outDir/_${name}_tmp")
    val fs = java.nio.file.Paths.get(outDir, s"_${name}_tmp")
    import scala.util.Using
    val part = Using.resource(java.nio.file.Files.list(fs))(
      _.filter(_.toString.endsWith(".parquet")).findFirst().get())
    java.nio.file.Files.move(part, java.nio.file.Paths.get(outDir, s"$name.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    Using.resource(java.nio.file.Files.list(fs))(
      _.forEach(p => java.nio.file.Files.delete(p)))
    java.nio.file.Files.delete(fs)
  }

  def main(args: Array[String]): Unit = {
    val outDir = if (args.length > 0) args(0) else "/tmp/graft_stress"
    val nRows = if (args.length > 1) args(1).toLong else 120000L
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, timestamp_millis}
    writeSingleFile(
      spark.range(0, nRows, 1, 32)
        .mapPartitions { it =>
          val md = java.security.MessageDigest.getInstance("MD5")
          it.map(row => makeRow(row, md))
        }
        .map { case (id, source, lang, text) =>
          (id, text, lang, source, text.length.toLong)
        }
        .toDF("doc_id", "text", "lang", "source", "n_chars"),
      outDir, "documents")
    writeSingleFile(
      spark.range(0, nRows * 2L, 1, 32)
        .map(row => makeEvent(row))
        .toDF("event_id", "tms", "user_id", "event_type", "value", "props")
        .select(col("event_id"), timestamp_millis(col("tms")).as("ts"),
          col("user_id"), col("event_type"), col("value"), col("props")),
      outDir, "events")
    writeSingleFile(
      spark.range(0, 4000L, 1, 8)
        .map(row => makeEmb(row, 64))
        .toDF("vec_id", "embedding", "label"),
      outDir, "embeddings")
    val n = spark.read.parquet(s"$outDir/documents.parquet").count()
    val ne = spark.read.parquet(s"$outDir/events.parquet").count()
    val nv = spark.read.parquet(s"$outDir/embeddings.parquet").count()
    println(s"STRESS generated $n doc rows + $ne event rows + $nv embedding rows at $outDir")
    spark.stop()
  }
}
