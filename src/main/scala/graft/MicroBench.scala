package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Expression-level microbenchmarks (diagnostics):
  * sbt "runMain graft.MicroBench [rows]" */
object MicroBench {

  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 20000000L
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // realistic tag map: 4 entries, mixed cardinalities
    val df = spark.range(n).select(
      map(
        lit("name"), concat(lit("m"), (col("id") % 100).cast("string")),
        lit("node"), concat(lit("n"), (col("id") % 1000).cast("string")),
        lit("nf.cluster"), concat(lit("c"), (col("id") % 10).cast("string")),
        lit("region"), lit("us-east-1")
      ).as("tags"))

    def time(name: String, c: Column): Unit =
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        df.select(c.as("k")).write.mode("overwrite").format("noop").save()
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }

    val hof = array_join(
      transform(array_sort(map_entries(col("tags"))),
        e => concat(e.getField("key"), lit("="), e.getField("value"))), ",")
    time("series_id_hof", hof)
    time("series_id_native", graft.planner.Planner.seriesId(col("tags")))

    // text quality signals: HOF projection vs partition-local JVM kernel
    import spark.implicits._
    val nDocs = math.max(n / 40, 1L)
    val words = Array("the", "quick", "brown", "fox", "jumps", "over", "lazy",
      "dogs", "and", "runs", "away", "of", "to", "in", "is", "data")
    val docs = spark.range(nDocs).mapPartitions { it =>
      val sb = new StringBuilder
      it.map { i =>
        sb.clear()
        var k = 0
        while (k < 80) { sb.append(words(((i + k * 7) % 16).toInt)); sb.append(' '); k += 1 }
        (i, sb.toString.trim)
      }
    }.toDF("doc_id", "text").localCheckpoint()

    def timeDf(name: String, f: org.apache.spark.sql.DataFrame): Unit =
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        f.write.mode("overwrite").format("noop").save()
        println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }

    timeDf("text_quality", graft.ops.TextOps.quality(docs))
    timeDf("text_langid", graft.ops.TextOps.langId(docs))
    timeDf("text_fingerprint", graft.ops.TextOps.fingerprint(docs))
    timeDf("text_rolling_fp", graft.ops.TextOps.rollingFingerprint(docs))

    // BPE tokenizer throughput: trained merges, memoized-pretoken kernel.
    // Reported as corpus MB/s alongside the wall time (the number that
    // matters for a tokenize pass over a 100 TB corpus).
    val bpe = graft.ops.Bpe.trainFrom(docs, numMerges = 200, maxWords = 8000)
    // octet_length: actual UTF-8 bytes, not characters (chars understate
    // throughput on non-ASCII text; identical on this ASCII corpus)
    val corpusBytes = docs.select(sum(octet_length(col("text")))).head().getLong(0)
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      graft.ops.TextOps.bpeTokenCounts(docs, bpe)
        .write.mode("overwrite").format("noop").save()
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"bpe_token_counts run$i: $secs%.2f s  (${corpusBytes / secs / 1e6}%.0f MB/s)")
    }
    spark.stop()
  }
}
