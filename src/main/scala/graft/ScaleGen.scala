package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * UNIFORM 10x scale corpus generator (round-11 scale probe): emits
 * `documents/embeddings/lineitem/events.parquet` at `factor`x the sf0.1
 * row volumes with the SAME distributions — no adversarial skew (that is
 * [[StressGen]]'s job); this corpus exists to falsify absolute wall-vs-rows
 * scaling of the most expensive catalog rows on data that simply has more
 * of everything:
 *
 *  - **documents** (5,000 -> 50,000): the REAL sf0.1 vocabulary (read from
 *    the base corpus at generation time — the driver's generator uses a
 *    shared ~31-token vocab, and gram-df statistics follow from it), the
 *    same uniform 20-source split, the same lang mix, the same 8..96-word
 *    length range, and planted near-dup pairs at the sf0.1 RATE (~0.5% of
 *    docs paired: 35 shared + 2x10 unique words => shingle Jaccard ~0.58,
 *    above the catalog's 0.5 threshold) so dedup output scales linearly by
 *    construction.
 *  - **events** (100,000 -> 1,000,000): 10x the USERS (1,500 -> 15,000) at
 *    the same ~66 events/user density, the same five event types, the same
 *    2024-01 30-day window (ts ascending with event_id, like the driver's
 *    file), the same value range — funnels/sessions scale in user count,
 *    per-user history length stays fixed (the uniform reading of "10x").
 *  - **lineitem** (600,000 -> 6,000,000): same three return flags, same
 *    2-decimal price GRID [900.68, 104999.91] — distinct-value growth is
 *    the honest consequence of more draws on a fixed grid.
 *  - **embeddings** (2,000 -> 20,000): 10 label clusters (center + noise),
 *    dim 64 — the clustered shape the ANN rows are tuned against.
 *
 * Everything derives from the row index via splitmix64 — byte-identical
 * across runs, no RNG state.
 *
 * Usage: runMain graft.ScaleGen [outDir=/tmp/graft_scale10]
 *          [baseDir=/root/testdata/sf0.1] [factor=10] [tables=all]
 * (`tables` is a comma list — `events` alone generates the 100x
 * events-family corpus without paying for 60M lineitem rows.)
 */
object ScaleGen {

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  private def pick(seed: Long, n: Int): Int =
    java.lang.Long.remainderUnsigned(mix(seed), n).toInt

  def main(args: Array[String]): Unit = {
    val outDir = if (args.length > 0) args(0) else "/tmp/graft_scale10"
    val baseDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val factor = if (args.length > 2) args(2).toInt else 10
    // optional 4th arg: comma-separated table subset (e.g. "events" for
    // the 100x events-family probe — generating 60M lineitem rows to test
    // the events decade would be pure waste)
    val tables: Set[String] =
      if (args.length > 3) args(3).split(",").toSet
      else Set("documents", "embeddings", "lineitem", "events")
    // optional 5th arg: vocabulary mode for documents — "fixed" (default,
    // the base corpus' ~31-word vocabulary at every scale) or "heaps"
    // (words drawn log-uniformly — Zipf s~1 — from a 2^21-word potential
    // vocabulary, so the OBSERVED vocabulary grows with the corpus the
    // way real text does, Heaps' law V(n) ~ K*n^b; the fixed-vocab decade
    // probes pure row growth, this one probes the realistic shape where
    // shingle/gram distinctness and LSH bucket spread grow with n)
    val vocabMode = if (args.length > 4) args(4) else "fixed"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // ---- documents: 10x the rows; vocabulary per vocabMode -------------
    if (tables("documents")) {
    val vocab: Array[String] =
      if (vocabMode == "heaps") Array.empty
      else {
        val v = spark.read.parquet(s"$baseDir/documents.parquet")
          .select(explode(split(lower(col("text")), " ")).as("w"))
          .distinct().orderBy("w").as[String].collect()
        require(v.nonEmpty, s"no vocabulary in $baseDir/documents.parquet")
        v
      }
    val nDocs = 5000L * factor
    val langs = Array("en", "en", "en", "en", "en", "en", "en", "en",
      "zh", "zh", "zh", "fr", "fr", "fr", "es", "es", "es", "de", "de", "de")
    val bcVocab = spark.sparkContext.broadcast(vocab)
    val heaps = vocabMode == "heaps"
    val pairDocs = nDocs / 100 // ~0.5% of docs paired = the sf0.1 rate
    spark.range(0, nDocs, 1, 32).map { row =>
      val v = bcVocab.value
      // heaps mode: rank log-uniform in [1, 2^21) — Zipf-shaped frequency
      // (P(rank r) ~ 1/r), so the observed vocabulary grows with token
      // count like real text instead of saturating at a fixed word list.
      // The 8 head ranks map to REAL function words (~14% of tokens —
      // the Zipf head IS the stopword class in natural text), so langid /
      // stop-ratio quality gates see an English-shaped corpus and the
      // front-door probe exercises its full chain, not an all-reject path
      val stops = Array("the", "a", "and", "of", "to", "in", "is", "on")
      def word(seed: Long): String =
        if (heaps) {
          val u = (java.lang.Long.remainderUnsigned(mix(seed), 1L << 40) + 0.5) / (1L << 40).toDouble
          val r = math.exp(u * math.log((1L << 21).toDouble)).toLong
          if (r <= 8) stops((r - 1).toInt) else "w" + r
        } else v(pick(seed, v.length))
      val sb = new StringBuilder
      if (row < pairDocs) {
        // planted near-dup pair (2i, 2i+1): 35 shared + 10 unique words
        val cluster = row / 2
        var p = 0
        while (p < 35) { sb.append(word(900001L * cluster + p)); sb.append(' '); p += 1 }
        p = 0
        while (p < 10) { sb.append(word(700003L * row + 777 + p)); sb.append(' '); p += 1 }
      } else {
        val len = 8 + pick(row * 31L + 5, 89) // 8..96 words, the sf0.1 span
        var p = 0
        while (p < len) { sb.append(word(row * 131L + p)); sb.append(' '); p += 1 }
      }
      sb.setLength(sb.length - 1)
      val text = sb.toString
      (row, text, langs(pick(row + 17, langs.length)),
        "src" + pick(row + 41, 20), text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
      .repartition(if (factor >= 100) 32 else 8)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    }

    // ---- embeddings: 10 clusters, dim 64, center + noise ---------------
    if (tables("embeddings")) {
    val nVec = 2000L * factor
    spark.range(0, nVec, 1, 32).map { row =>
      val label = pick(row + 3, 10)
      val e = Array.tabulate(64) { d =>
        val c = (java.lang.Long.remainderUnsigned(mix(label * 64L + d), 1000L) / 500.0f) - 1.0f
        val n = (java.lang.Long.remainderUnsigned(mix(row * 64L + d + 13), 1000L) / 500.0f) - 1.0f
        c + 0.15f * n
      }
      (row, e, label.toLong)
    }.toDF("vec_id", "embedding", "label")
      .repartition(4)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    }

    // ---- lineitem: same flags, same 2-decimal price grid ---------------
    if (tables("lineitem")) {
    val nLi = 600000L * factor
    val flags = Array("A", "N", "R")
    val statuses = Array("O", "F")
    spark.range(0, nLi, 1, 32).map { row =>
      val price = (90068L + java.lang.Long.remainderUnsigned(mix(row * 7L + 1), 10409924L)) / 100.0
      (row / 4 + 1, pick(row + 11, 20000).toLong + 1, pick(row + 23, 1000).toLong + 1,
        (row % 4 + 1).toInt, (pick(row + 29, 50) + 1).toDouble, price,
        pick(row + 37, 11) / 100.0, pick(row + 43, 9) / 100.0,
        flags(pick(row + 47, 3)), statuses(pick(row + 53, 2)),
        java.sql.Date.valueOf(java.time.LocalDate.of(1994, 1, 1)
          .plusDays(pick(row + 59, 2000))))
    }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
        "l_shipdate")
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
    }

    // ---- events: 10x users, same density, same 30-day window -----------
    if (tables("events")) {
    val nEv = 100000L * factor
    val nUsers = 1500 * factor
    val types = Array("view", "click", "signup", "purchase", "error")
    val startUs = 1704067200000000L // 2024-01-01T00:00Z in micros
    val spanUs = 30L * 86400000000L
    val stepUs = spanUs / nEv
    spark.range(0, nEv, 1, 32).map { row =>
      val tsUs = startUs + row * stepUs +
        java.lang.Long.remainderUnsigned(mix(row + 61), stepUs max 1L)
      (row, tsUs,
        pick(row * 3L + 67, nUsers).toLong, types(pick(row + 71, 5)),
        java.lang.Long.remainderUnsigned(mix(row + 73), 56021L) / 100.0,
        s"""{"k": ${pick(row + 79, 100)}}""")
    }.toDF("event_id", "ts_us", "user_id", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("ts_us")))
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .repartition(16)
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")
    }

    Seq("documents", "embeddings", "lineitem", "events").filter(tables).foreach { t =>
      val n = spark.read.parquet(s"$outDir/$t.parquet").count()
      println(s"SCALE $t: $n rows")
    }
    spark.stop()
  }
}
