package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * At-least-once REPLAY stress over the [[StressGen]] skewed corpus
 * (round-11 verdict item 7): drives the two streaming front doors'
 * per-trigger units through duplicated AND reordered micro-batch
 * deliveries at volume and proves the replay contracts hold — the failure
 * mode Structured Streaming's foreachBatch actually has (a crash between
 * the sink writes and the checkpoint commit re-delivers the whole batch,
 * possibly after later batches already ran on a recovered query).
 *
 * Leg 1 — curation front door ([[graft.streaming.StreamRunner.frontDoorBatch]]):
 * the 120k-doc skewed corpus (90% one source, hot md5 shard, df-15000
 * boilerplate grams, a null-source slice) splits into 3 skew-preserving
 * micro-batches; the REPLAYED world delivers b0, b1, b1 AGAIN
 * (crash-redelivery), b2, then b0 again (late reordered redelivery) and
 * finally a fresh b3; the CLEAN world delivers b0..b3 once each.
 * Asserted byte-identical across worlds: the audit (via the
 * first()-collapsing reader), the kept/packed/rejects DISTINCT row sets
 * (row-set sinks tolerate duplication, never diverge), and — the
 * telescoping claim — batch 3's packed layout, which reads the carried
 * offset state written under all that disorder.
 *
 * Leg 2 — SQL-store streaming loader ([[graft.sources.JdbcStore.writeBatch]],
 * the unit behind streamingJdbcIngest): 120k datapoints with 90% of rows
 * in ONE block table (time skew — the write-side hot spot), delivered as
 * two batches with batch 0 replayed after batch 1. Asserted: the full
 * store dump (every table, every row incl. batch_id) equals the
 * clean-world store byte-for-byte — the delete-then-insert exactly-once
 * contract at volume, against a hot table.
 *
 * Usage: runMain graft.StressReplay [stressDir=/tmp/graft_stress]
 * Prints REPLAY <leg>: PASS/FAIL lines; exits nonzero on any FAIL.
 */
object StressReplay {

  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/tmp/graft_stress"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    var failed = false
    def check(leg: String, ok: Boolean, detail: => String = ""): Unit = {
      println(s"REPLAY $leg: ${if (ok) "PASS" else s"FAIL $detail"}")
      if (!ok) failed = true
    }

    // ---------------- leg 1: curation front door -------------------------
    {
      import graft.streaming.StreamRunner
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("source"), col("text"))
        .localCheckpoint()
      // skew-preserving thirds + a small fresh final batch
      val b = (0 to 2).map(i => docs.filter(pmod(col("doc_id"), lit(3)) === i
        && col("doc_id") % 17 =!= 0).localCheckpoint())
      val b3 = docs.filter(col("doc_id") % 17 === 0).localCheckpoint()
      // majority predicted language so the quality gate passes real volume
      // (the stress vocabulary is synthetic; whatever the n-gram heuristic
      // says, BOTH worlds see the same value)
      val lang = docs.select(graft.ops.TextOps.langPredCol(col("text")).as("l"))
        .groupBy(col("l")).count().orderBy(desc("count")).head().getString(0)

      val base = java.nio.file.Files.createTempDirectory("graft_replay_fd").toString
      // per-batch LEARNED mixture weights: deterministic from the batch's
      // kept slice, so replayed and clean worlds agree by construction
      def run(world: String, deliveries: Seq[(DataFrame, Long)]): String => String = {
        val root = s"$base/$world"
        def p(s: String) = s"$root/$s"
        deliveries.foreach { case (df, id) =>
          StreamRunner.frontDoorBatch(df, id,
            p("index"), p("kept"), p("packed"), p("rejects"), p("audit"), p("state"),
            lang = lang, minTokens = 5.0, minTtr = 0.05, minStopRatio = 0.0,
            mixtureAlpha = 1.0, seqLen = 128L)
        }
        p
      }
      val replayed = run("replayed", Seq(
        b(0) -> 0L, b(1) -> 1L, b(1) -> 1L /* crash redelivery */,
        b(2) -> 2L, b(0) -> 0L /* late reordered redelivery */, b3 -> 3L))
      val clean = run("clean", Seq(b(0) -> 0L, b(1) -> 1L, b(2) -> 2L, b3 -> 3L))

      def auditSet(p: String => String) =
        graft.streaming.StreamRunner.readFrontDoorAudit(spark, p("audit"))
          .collect().map(_.toSeq).toSet
      check("front-door audit (collapse-on-read, telescoping pack counts)",
        auditSet(replayed) == auditSet(clean))

      def distinctSet(p: String => String, sink: String, cols: Seq[String]) =
        spark.read.parquet(p(sink)).select(cols.map(col): _*)
          .distinct().collect().map(_.toSeq).toSet
      for ((sink, cols) <- Seq(
          "kept" -> Seq("doc_id", "source"),
          "packed" -> Seq("rid", "source", "n_tokens", "seq_id", "seq_offset", "spans_boundary"),
          "rejects" -> Seq("batch_id", "doc_id", "reason"))) {
        val r = distinctSet(replayed, sink, cols)
        val c = distinctSet(clean, sink, cols)
        check(s"front-door $sink distinct row set",
          r == c, s"(replayed ${r.size} vs clean ${c.size}; diff ${(r diff c).take(3)} / ${(c diff r).take(3)})")
      }
      // the telescoping claim in isolation: batch 3 (after all disorder)
      // packed at identical offsets in both worlds
      def b3Packed(p: String => String) = {
        val b3Rids = b3.select((col("doc_id") * 1000L).as("rid"))
        spark.read.parquet(p("packed")).join(b3Rids, Seq("rid"), "left_semi")
          .distinct().collect().map(_.toSeq).toSet
      }
      check("front-door batch-3 layout after replays (carried offsets)",
        b3Packed(replayed) == b3Packed(clean))
    }

    // ---------------- leg 2: JDBC streaming loader -----------------------
    {
      import graft.sources.JdbcStore
      val H = 3600000L
      val Block = 24 * H // whole-minute blocks, 1 day
      // 90% of datapoints in block 0 (one HOT table), rest over 29 blocks
      val dps = spark.read.parquet(s"$dir/documents.parquet")
        .select(
          map(lit("name"), coalesce(col("source"), lit("none")),
            lit("usr"), col("lang")).as("tags"),
          when(col("doc_id") % 10 =!= 0,
              pmod(col("doc_id") * 37L, lit(Block)))
            .otherwise(lit(Block) + pmod(col("doc_id") * 37L, lit(29L * Block)))
            .cast("long").as("ts"),
          col("n_chars").cast("double").as("value"))
        .localCheckpoint()
      val parts = (0 to 1).map(i =>
        dps.filter(pmod(col("ts"), lit(2)) === i).localCheckpoint())

      def tmpUrl(tag: String): String = {
        val d = java.nio.file.Files.createTempDirectory(s"graft_replay_jdbc_$tag").toString
        s"jdbc:derby:$d/db;create=true"
      }
      val tdef = JdbcStore.TableDef("stress", Seq("name", "usr"))
      val urlR = tmpUrl("r"); val urlC = tmpUrl("c")
      // replayed world: b0, b1, then b0 AGAIN (late redelivery)
      JdbcStore.writeBatch(parts(0), urlR, tdef, Block, batchId = 0L)
      JdbcStore.writeBatch(parts(1), urlR, tdef, Block, batchId = 1L)
      JdbcStore.writeBatch(parts(0), urlR, tdef, Block, batchId = 0L)
      // clean world: each batch once
      JdbcStore.writeBatch(parts(0), urlC, tdef, Block, batchId = 0L)
      JdbcStore.writeBatch(parts(1), urlC, tdef, Block, batchId = 1L)

      // MULTISET dump (row -> count): a set would mask exactly the bug
      // under test — duplicated rows from a replay that failed to delete
      def dump(url: String): (Seq[(String, Long)], Map[String, Int], Long) = {
        val tables = JdbcStore.listTables(url, tdef)
        val rows = scala.collection.mutable.Map.empty[String, Int]
        var total = 0L
        val conn = java.sql.DriverManager.getConnection(url)
        try {
          val st = conn.createStatement()
          tables.foreach { case (t, _) =>
            val rs = st.executeQuery(
              s"""SELECT "name", "usr", "ts", "value", "batch_id" FROM $t""")
            while (rs.next()) {
              val k = Seq(rs.getString(1), rs.getString(2), rs.getLong(3).toString,
                Option(rs.getObject(4)).fold("null")(_.toString), rs.getLong(5).toString)
                .mkString("|")
              rows.update(k, rows.getOrElse(k, 0) + 1)
              total += 1
            }
            rs.close()
          }
        } finally conn.close()
        (tables, rows.toMap, total)
      }
      val (tR, rowsR, nR) = dump(urlR)
      val (tC, rowsC, nC) = dump(urlC)
      check("jdbc store tables after replay",
        tR.map { case (n, t) => (n.toLowerCase, t) } == tC.map { case (n, t) => (n.toLowerCase, t) })
      check("jdbc store full dump byte-identical after hot-block replay",
        rowsR == rowsC && nR == nC, s"(replayed $nR rows vs clean $nC)")
      check("jdbc store row volume (sanity: everything landed)",
        nC == dps.count())
    }

    spark.stop()
    if (failed) sys.exit(1)
    println("REPLAY all legs: PASS")
  }
}
