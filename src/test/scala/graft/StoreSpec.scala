package graft

import graft.asl.{Asl, Query}
import graft.core.EvalContext
import graft.planner.Planner
import graft.sources.{Datapoints, Maintenance, Store}
import org.apache.spark.sql.functions._

/**
 * Series-bucketed store: same results as the raw frame, minus the
 * normalization shuffle — the scan's bucket partitioning must satisfy the
 * per-(series, slot) aggregation's distribution.
 */
class StoreSpec extends SparkSpec {

  private val ctx = EvalContext.testdata

  private def exchanges(df: org.apache.spark.sql.DataFrame): Int = {
    df.collect() // finalize the adaptive plan
    "Exchange".r.findAllIn(df.queryExecution.executedPlan.toString).length
  }

  test("bucketed store evaluates identically with one less shuffle") {
    val raw = Datapoints.events(spark, "/root/testdata/sf0.001")
    Store.writeBucketed(raw, "events_bucketed", buckets = 8)
    try {
      val store = Store.read(spark, "events_bucketed")
      val expr = Asl.parse("name,click,:eq,:sum,(,usr,),:by")

      val fromRaw = Planner.output(Planner.eval(expr, raw, ctx), Seq("usr"))
      val fromStore = Planner.output(Planner.eval(expr, store, ctx), Seq("usr"))

      def toMap(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(toMap(fromStore) == toMap(fromRaw))

      val eRaw = exchanges(fromRaw)
      val eStore = exchanges(fromStore)
      assert(eStore < eRaw, s"expected fewer exchanges: store=$eStore raw=$eRaw")
    } finally spark.sql("DROP TABLE IF EXISTS events_bucketed")
  }

  test("catalog store_data_sum/store_data_by: raw-scan answers, zero datapoint shuffle") {
    val dir = "/root/testdata/sf0.001"
    // the driven plan: the exact catalog entries the driver hash-checks
    val sum = SparkEntry.queries("store_data_sum")(spark, dir)
    sum.collect()
    val sumPlan = sum.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning\\(key".r.findFirstIn(sumPlan).isEmpty,
      s"store-backed fetch still shuffles datapoints:\n$sumPlan")

    val by = SparkEntry.queries("store_data_by")(spark, dir)
    by.collect()
    val byPlan = by.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning\\(key".r.findFirstIn(byPlan).isEmpty,
      s"store-backed :by fetch still shuffles datapoints:\n$byPlan")

    // and the answers match the raw-scan catalog entries bit for bit
    def m2(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    def m3(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(m2(sum) == m2(SparkEntry.queries("data_sum")(spark, dir)))
    assert(m3(by) == m3(SparkEntry.queries("data_by_sum")(spark, dir)))
  }

  test("index-driven fetch: predicate resolves on the catalog, store never shuffles") {
    val dir = "/root/testdata/sf0.001"
    val raw = Datapoints.events(spark, dir)
    Store.writeBucketed(raw, "events_idx", buckets = 8, catalog = true)
    try {
      val q = Asl.parse("name,p.*,:re,:sum")
      val fromRaw = Planner.output(Planner.eval(q, raw, ctx), Nil)
      val indexed = Store.readIndexed(spark, "events_idx", Query.Regex("name", "p.*"))
      val frame = Planner.eval(Asl.parse(":true,:sum"), indexed, ctx)
      frame.df.collect()
      val plan = frame.df.queryExecution.executedPlan.toString
      // keys broadcast into the bucketed scan: no datapoint exchange
      assert("Exchange hashpartitioning\\(key".r.findFirstIn(plan).isEmpty, plan)
      assert(plan.contains("BroadcastHashJoin"), plan)

      def toMap(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(toMap(Planner.output(frame, Nil)) == toMap(fromRaw))
    } finally {
      spark.sql("DROP TABLE IF EXISTS events_idx")
      spark.sql("DROP TABLE IF EXISTS events_idx_catalog")
    }
  }

  test("index semi-join broadcast is size-gated: selective hints, non-selective does not") {
    val dir = "/root/testdata/sf0.001"
    val raw = Datapoints.events(spark, dir)
    Store.writeBucketed(raw, "events_gate", buckets = 8, catalog = true)
    try {
      // selective predicate, default gate: matching keys fit -> broadcast
      val sel = Store.readIndexed(spark, "events_gate", Query.Regex("name", "p.*"))
      sel.collect()
      assert(sel.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
        sel.queryExecution.executedPlan.toString)

      // non-selective predicate with the gate tripped (key count above the
      // limit): NO broadcast may be planned — the hard-coded hint would ship
      // the full series catalog to every executor at 10^8 series. AQE's own
      // broadcast demotion is disabled so the asserted plan is the at-scale
      // shape: the key side exchanges into the buckets, the store does not.
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      try {
        val wide = Store.readIndexed(spark, "events_gate", Query.HasKey("name"),
          maxBroadcastKeys = 0L)
        wide.collect()
        val plan = wide.queryExecution.executedPlan.toString
        assert(!plan.contains("BroadcastExchange") && !plan.contains("BroadcastHashJoin"), plan)
        // same rows either way: the gate is a plan choice, not a semantics one
        val hinted = Store.readIndexed(spark, "events_gate", Query.HasKey("name"))
        assert(wide.count() == hinted.count())
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", 10L * 1024 * 1024)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }

      // :true short-circuits the join entirely
      val everything = Store.readIndexed(spark, "events_gate", Query.True)
      assert(!everything.queryExecution.analyzed.toString.contains("Join"))
    } finally {
      spark.sql("DROP TABLE IF EXISTS events_gate")
      spark.sql("DROP TABLE IF EXISTS events_gate_catalog")
    }
  }

  test("StoreBackend is the default path: rollup + catalog semi-join with no wiring") {
    val dir = "/root/testdata/sf0.001"
    // the exact catalog entries the driver hash-checks: only the backend is
    // passed; routing must show up in the executed plan on its own
    val auto = SparkEntry.queries("store_graph_auto")(spark, dir)
    auto.collect()
    val autoPlan = auto.queryExecution.executedPlan.toString
    assert(autoPlan.contains("graft_rollup"), s"6h fetch not served from the 3h rollup:\n$autoPlan")
    assert(autoPlan.contains("BroadcastHashJoin"), s"no catalog semi-join:\n$autoPlan")
    assert("Exchange hashpartitioning\\(key".r.findFirstIn(autoPlan).isEmpty,
      s"rollup-served fetch still shuffles rows:\n$autoPlan")

    // unaligned step (1h vs 3h rollup): raw store fallback, still indexed
    val rawFb = SparkEntry.queries("store_graph_auto_raw")(spark, dir)
    rawFb.collect()
    val rawPlan = rawFb.queryExecution.executedPlan.toString
    assert(!rawPlan.contains("graft_rollup"), s"unaligned step must not read a rollup:\n$rawPlan")
    assert(rawPlan.contains("BroadcastHashJoin"), s"no catalog semi-join:\n$rawPlan")
  }

  test("store-backed graphRequest: the request step drives rollup selection") {
    val dir = "/root/testdata/sf0.001"
    val raw = Datapoints.events(spark, dir)
    graft.sources.Store.writeBucketed(raw, "gr_store", buckets = 8, catalog = true)
    graft.sources.Rollup.materialize(raw, "gr_rollup", 10800000L, buckets = 8)
    try {
      val backend = graft.sources.StoreBackend(
        spark, "gr_store", Map("gr_rollup" -> 10800000L))
      val now = () => 1706659200000L // the testdata window end
      // a step=6h dashboard request: the 3h rollup serves it — chosen by
      // the REQUEST step, with nothing wired by the caller
      val viaStore = graft.api.Api.graphRequest(
        "name,p.*,:re,:sum", backend, "e-30d", "now", 21600000L, 0, now, "UTC", Nil)
      val got = viaStore.collect().map(_.getString(0)).sorted.toSeq
      val plan = viaStore.queryExecution.executedPlan.toString
      assert(plan.contains("gr_rollup"), s"6h request not served from the 3h rollup:\n$plan")
      assert(plan.contains("BroadcastHashJoin"), s"no catalog semi-join:\n$plan")

      // same messages as the raw-frame evaluation of the same request;
      // values compared numerically — parallel sum order differs between
      // the rollup composition and the raw scan in the last ulp
      val viaRaw = graft.api.Api.graphRequest(
        "name,p.*,:re,:sum", raw, "e-30d", "now", 21600000L, 0, now)
        .collect().map(_.getString(0)).sorted.toSeq
      def vals(json: String): Seq[Double] = {
        import spark.implicits._
        val schema = "data STRUCT<`values`: ARRAY<STRING>>"
        Seq(json).toDF("json")
          .select(from_json(col("json"),
            org.apache.spark.sql.types.StructType.fromDDL(schema)).as("m"))
          .select(col("m.data.values")).collect()(0).getSeq[String](0).map(_.toDouble)
      }
      assert(got.size == viaRaw.size)
      got.zip(viaRaw).foreach { case (a, b) =>
        assert(a.replaceAll("\"values\":\\[[^\\]]*\\]", "") ==
          b.replaceAll("\"values\":\\[[^\\]]*\\]", ""), "message envelopes differ")
        val (va, vb) = (vals(a), vals(b))
        assert(va.size == vb.size)
        va.zip(vb).foreach { case (x, y) =>
          assert((x.isNaN && y.isNaN) || math.abs(x - y) <= 1e-9 * math.max(1.0, math.abs(x)),
            s"value divergence: $x vs $y")
        }
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS gr_store")
      spark.sql("DROP TABLE IF EXISTS gr_store_catalog")
      spark.sql("DROP TABLE IF EXISTS gr_rollup")
    }
  }

  test("single-aggregate fetch from the store needs no datapoint shuffle at all") {
    val raw = Datapoints.events(spark, "/root/testdata/sf0.001")
    Store.writeBucketed(raw, "events_bucketed2", buckets = 8)
    try {
      val store = Store.read(spark, "events_bucketed2")
      val frame = Planner.eval(Asl.parse("name,click,:eq,:sum"), store, ctx)
      frame.df.collect()
      val plan = frame.df.queryExecution.executedPlan.toString
      // the normalization agg must consume the bucketed scan in place: the
      // only exchange left is the tiny cross-series aggregate on t
      val perSeriesShuffle = "Exchange hashpartitioning\\(key".r.findFirstIn(plan)
      assert(perSeriesShuffle.isEmpty, s"normalization still shuffles:\n$plan")
    } finally spark.sql("DROP TABLE IF EXISTS events_bucketed2")
  }

  test("backfillDays rewrites only the targeted day, keeps bucketing and the index path") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val day = 86400000L
    val mk = (n: String, ts: Long, v: Double) => (Map("name" -> n), ts, v)
    val dp = Seq(
      mk("cpu", 0L, 1.0), mk("cpu", 3600000L, 2.0),      // day 0
      mk("cpu", day + 1000L, 3.0), mk("disk", day, 4.0)  // day 1
    ).toDF("tags", "ts", "value")
    Store.writeBucketed(dp, "bf_store", buckets = 4, catalog = true, partitioned = true)
    try {
      // re-derive day 0: different values, plus a NEW series
      val fix = Seq(mk("cpu", 0L, 10.0), mk("mem", 7200000L, 5.0))
        .toDF("tags", "ts", "value")
      Store.backfillDays(fix, "bf_store")

      val rows = Store.read(spark, "bf_store")
        .select(col("tags").getItem("name").as("n"), col("ts"), col("value"))
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getDouble(2)).toMap
      // day 0 fully replaced (the 3600000 cpu row is gone), day 1 intact
      assert(rows == Map(
        ("cpu", 0L) -> 10.0, ("mem", 7200000L) -> 5.0,
        ("cpu", day + 1000L) -> 3.0, ("disk", day) -> 4.0), rows.toString)

      // bucketing survives the insert: per-series agg still exchange-free
      val agg = spark.table("bf_store").groupBy("key").agg(sum("value"))
      agg.collect()
      assert(!agg.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning(key"), "backfill broke the bucket layout")

      // the appended catalog finds the new series; duplicates don't
      // multiply datapoints (indexKeys dedups)
      val mem = Store.readIndexed(spark, "bf_store", graft.asl.Query.Equal("name", "mem"))
      assert(mem.collect().map(_.getAs[Double]("value")).toList == List(5.0))
      val cpu = Store.readIndexed(spark, "bf_store", graft.asl.Query.Equal("name", "cpu"))
      assert(cpu.count() == 2) // one row per datapoint despite catalog re-append
    } finally {
      spark.sql("DROP TABLE IF EXISTS bf_store")
      spark.sql("DROP TABLE IF EXISTS bf_store_catalog")
    }
  }

  test("store lifecycle end-to-end: stream ingest -> compact -> query -> backfill -> expire") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_life").toString
    val day = 86400000L
    val step = 3600000L

    // 1. live ingest: three days of a counter-free gauge series
    val input = MemoryStream[(Map[String, String], Long, Double)]
    val q = graft.streaming.StreamRunner.ingest(
      input.toDF.toDF("tags", "ts", "value"),
      s"$base/store", s"$base/ckpt", step)
    try {
      val pts = for (d <- 0 until 3; h <- 0 until 4)
        yield (Map("name" -> "cpu"), d * day + h * step + 1000L, (d * 10 + h).toDouble)
      input.addData(pts.sortBy(_._2))
      q.processAllAvailable()
      input.addData(Seq((Map("name" -> "cpu"), 10L * day, 0.0))) // watermark flush
      q.processAllAvailable()
    } finally q.stop()

    // 2. compact the append log into the partitioned bucketed layout
    Store.compact(spark, s"$base/store", "life_store", buckets = 4,
      partitioned = true, catalog = true)
    try {
      val backend = graft.sources.StoreBackend(spark, "life_store")
      val sub = EvalContext(day, 2 * day, step) // day 1 only
      def values() = Planner.output(
        Planner.eval(Asl.parse("name,cpu,:eq,:sum"), backend, sub), Nil)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

      // 3. query through the default backend path: day-1 slots as ingested
      val v1 = values()
      assert(v1(day) == 10.0 && v1(day + step) == 11.0, v1.toString)

      // 4. backfill day 1 with corrected values; only that day changes
      val fix = (0 until 4).map(h =>
        (Map("name" -> "cpu"), day + h * step + 1000L, 100.0 + h))
        .toDF("tags", "ts", "value")
      Store.backfillDays(fix, "life_store")
      val v2 = values()
      assert(v2(day) == 100.0 && v2(day + step) == 101.0, v2.toString)
      val day0 = Planner.output(Planner.eval(
        Asl.parse("name,cpu,:eq,:sum"), backend, EvalContext(0L, day, step)), Nil)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(day0(0L) == 0.0 && day0(step) == 1.0, day0.toString)

      // 5. expire day 0; day 1 still answers, day 0 is gone
      val dropped = Store.expireDays(spark, "life_store", keepDays = 10,
        nowMs = 10L * day + 1)
      assert(dropped.contains("1970-01-01"), dropped.toString)
      assert(values()(day) == 100.0)
      assert(Store.read(spark, "life_store").filter(col("ts") < day).count() == 0)
    } finally {
      spark.sql("DROP TABLE IF EXISTS life_store")
      spark.sql("DROP TABLE IF EXISTS life_store_catalog")
    }
  }

  test("expireDays compacts the catalog: dead series drop, fetch plans scan the catalog once") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.functions._
    import spark.implicits._

    val day = 86400000L
    val mk = (n: String, ts: Long, v: Double) => (Map("name" -> n), ts, v)
    // series "old" lives only on day 0; "cpu" spans all three days
    val dp = Seq(
      mk("old", 1000L, 1.0),
      mk("cpu", 1000L, 1.0), mk("cpu", day + 1000L, 2.0),
      mk("cpu", 2 * day + 1000L, 3.0)
    ).toDF("tags", "ts", "value")
    Store.writeBucketed(dp, "cexp_store", buckets = 4, catalog = true, partitioned = true)
    try {
      // backfill-append day 2: duplicates cpu's catalog row, adds mem
      val fix = Seq(mk("cpu", 2 * day + 1000L, 30.0), mk("mem", 2 * day + 2000L, 5.0))
        .toDF("tags", "ts", "value")
      Store.backfillDays(fix, "cexp_store")
      assert(spark.table("cexp_store_catalog").count() == 4) // old, cpu x2, mem

      // expire day 0 WITH catalog compaction: "old" has no surviving
      // datapoints and leaves the catalog; duplicate cpu rows collapse
      val dropped = Store.expireDays(spark, "cexp_store", keepDays = 2,
        nowMs = 2 * day + 500L, compactCatalog = true)
      assert(dropped == Seq("1970-01-01"), dropped.toString)
      val cat = spark.table("cexp_store_catalog")
        .select(col("tags").getItem("name")).as[String].collect().sorted.toSeq
      assert(cat == Seq("cpu", "mem"), cat.toString)
      assert(Store.indexKeys(spark, "cexp_store",
        graft.asl.Query.Equal("name", "old")).count() == 0)

      // the fetch runs the catalog predicate ONCE (checkpointed key
      // blocks feed both the gate count and the semi-join): the fetch
      // plan itself contains NO catalog file scan
      val fetch = Store.readIndexed(spark, "cexp_store",
        graft.asl.Query.Equal("name", "cpu"))
      assert(fetch.collect().map(_.getAs[Double]("value")).sorted.toSeq == Seq(2.0, 30.0))
      val catalogScans = fileScans(fetch.queryExecution.executedPlan)
        .flatMap(_.tableIdentifier).count(_.table.contains("_catalog"))
      assert(catalogScans == 0,
        s"fetch plan re-scans the catalog:\n${fetch.queryExecution.executedPlan}")
    } finally {
      spark.sql("DROP TABLE IF EXISTS cexp_store")
      spark.sql("DROP TABLE IF EXISTS cexp_store_catalog")
    }
  }

  test("Maintenance.run: one cron pass compacts store + rollups, cascades, expires, returns the backend") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.functions._
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val base = java.nio.file.Files.createTempDirectory("graft_maint").toString
    val day = 86400000L
    val step = 3600000L
    // live ingest with BOTH sinks: store append log + 3h rollup fragments
    val input = MemoryStream[(Map[String, String], Long, Double)]
    val q = graft.streaming.StreamRunner.ingest(
      input.toDF.toDF("tags", "ts", "value"),
      s"$base/store", s"$base/ckpt", step,
      rollup = Some((s"$base/rollup", 3 * step)))
    try {
      val pts = for (d <- 0 until 3; h <- 0 until 6)
        yield (Map("name" -> "cpu"), d * day + h * step + 1000L, (d * 10 + h).toDouble)
      input.addData(pts.sortBy(_._2))
      q.processAllAvailable()
      input.addData(Seq((Map("name" -> "cpu"), 10L * day, 0.0))) // watermark flush
      q.processAllAvailable()
    } finally q.stop()

    try {
      val (backend, report) = Maintenance.run(
        spark, "mx_store",
        storePath = Some(s"$base/store"),
        rollupPath = Some(s"$base/rollup"),
        rollupStepMs = 3 * step,
        cascadeSteps = Seq(6 * step),
        keepDays = 10, nowMs = 10 * day + 1, buckets = 4)
      // every maintained table is wired into the returned backend
      assert(report.rollups == Map(
        s"mx_store_rollup_${3 * step}" -> 3 * step,
        s"mx_store_rollup_${6 * step}" -> 6 * step), report.toString)
      assert(report.expiredDays == Seq("1970-01-01"), report.toString)
      assert(Store.read(spark, "mx_store").filter(col("ts") < day).count() == 0)

      // a 6h query through the backend serves from the CASCADED rollup
      // (never raw) and answers exactly like the raw store evaluation
      val sub = EvalContext(day, 2 * day, 6 * step)
      val expr = Asl.parse("name,cpu,:eq,:sum")
      val fromBackend = Planner.output(Planner.eval(expr, backend, sub), Nil)
      val m1 = fromBackend.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val tables = fileScans(fromBackend.queryExecution.executedPlan)
        .flatMap(_.tableIdentifier).map(_.table)
      assert(tables.contains(s"mx_store_rollup_${6 * step}"),
        s"6h fetch did not read the cascaded rollup: $tables")
      assert(!tables.contains("mx_store"), s"6h fetch still scans raw: $tables")
      val m2 = Planner.output(Planner.eval(
        expr, Store.read(spark, "mx_store").drop("d"), sub), Nil)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(m1.nonEmpty && m1 == m2, s"$m1 vs $m2")
    } finally {
      spark.sql("DROP TABLE IF EXISTS mx_store")
      spark.sql("DROP TABLE IF EXISTS mx_store_catalog")
      spark.sql(s"DROP TABLE IF EXISTS mx_store_rollup_${3 * step}")
      spark.sql(s"DROP TABLE IF EXISTS mx_store_rollup_${6 * step}")
    }
  }

  test("expireDays retires whole day partitions past the retention horizon") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val day = 86400000L
    val dp = (0 until 5).map(i => (Map("name" -> "cpu"), i * day + 1000L, i.toDouble))
      .toDF("tags", "ts", "value")
    Store.writeBucketed(dp, "exp_store", buckets = 4, partitioned = true)
    try {
      // now = day 4; keep 2 days -> days 0,1,2 expire
      val dropped = Store.expireDays(spark, "exp_store", keepDays = 2, nowMs = 4 * day + 500L)
      assert(dropped == Seq("1970-01-01", "1970-01-02", "1970-01-03"), dropped.toString)
      val left = Store.read(spark, "exp_store").select("ts")
        .collect().map(_.getLong(0)).toSet
      assert(left == Set(3 * day + 1000L, 4 * day + 1000L))
      // idempotent: nothing more to drop
      assert(Store.expireDays(spark, "exp_store", 2, 4 * day + 500L).isEmpty)
    } finally spark.sql("DROP TABLE IF EXISTS exp_store")
  }

  test("date-partitioned store: time range prunes partitions at plan time, answers unchanged") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

    val dir = "/root/testdata/sf0.001"
    val raw = Datapoints.events(spark, dir)
    Store.writeBucketed(raw, "events_part", buckets = 8, catalog = true, partitioned = true)
    try {
      // 5-day window (2024-01-11 .. 2024-01-16) of the 30-day table
      val sub = EvalContext(1704931200000L, 1705363200000L, 3600000L)
      val backend = graft.sources.StoreBackend(spark, "events_part")
      val expr = Asl.parse("name,click,:eq,:sum")

      val pruned = Planner.output(Planner.eval(expr, backend, sub), Nil)
      pruned.collect()
      val plan = pruned.queryExecution.executedPlan
      // the partition filter must reach the scan: 5 of 30 day directories
      val scan = fileScans(plan).find(_.relation.partitionSchema.nonEmpty)
        .getOrElse(fail(s"no partitioned scan in plan:\n$plan"))
      assert(scan.partitionFilters.nonEmpty, s"no partition filters pushed:\n$plan")
      val selected = scan.selectedPartitions.partitionCount
      assert(selected == 5, s"expected 5 day partitions selected, got $selected")
      // bucket partitioning survives the partition dirs: no datapoint shuffle
      assert("Exchange hashpartitioning\\(key".r.findFirstIn(plan.toString).isEmpty,
        s"partitioned store still shuffles datapoints:\n$plan")

      // answers identical to the raw scan over the same window
      val fromRaw = Planner.output(Planner.eval(expr, raw, sub), Nil)
      def m2(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(m2(pruned) == m2(fromRaw))
    } finally {
      spark.sql("DROP TABLE IF EXISTS events_part")
      spark.sql("DROP TABLE IF EXISTS events_part_catalog")
    }
  }

  test("Dirs swap crash recovery: a kill inside the rename window loses nothing") {
    import spark.implicits._
    import graft.sources.Dirs
    val base = java.nio.file.Files.createTempDirectory("graft-dirs").toString
    val live = s"$base/idx"
    val fs = new org.apache.hadoop.fs.Path(live)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def rows: Set[Long] =
      spark.read.parquet(live).select("v").collect().map(_.getLong(0)).toSet
    def mk(p: String, vs: Seq[Long]): Unit =
      vs.toDF("v").write.mode("append").parquet(p)

    // scenario 1: crash BETWEEN the two renames (tmp still present — the
    // second rename is what consumes it), then an appender re-creates the
    // live path with a new batch before the next maintenance pass.
    // Pre-fix, that pass deleted the backup (the only full copy) as
    // debris; now it merges the backup's files back in.
    mk(live, Seq(1L, 2L, 3L))
    assert(fs.rename(new org.apache.hadoop.fs.Path(live),
      new org.apache.hadoop.fs.Path(live + "__pre_compact")))
    mk(live + "__compacting", Seq(1L, 2L, 3L)) // the crashed run's aside copy
    fs.create(new org.apache.hadoop.fs.Path(live + "__swapping"), true).close()
    mk(live, Seq(4L, 5L)) // the post-crash append
    Dirs.compactFlat(spark, live, rowsPerFile = 1000000L, dedup = false)
    assert(rows === Set(1L, 2L, 3L, 4L, 5L), "recovery lost rows")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(live + "__pre_compact")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(live + "__swapping")))
    assert(Dirs.dataFileCount(spark, live) === 1)

    // scenario 2: crash in the window with NO appender in between (live
    // absent) — the backup renames straight back and compaction proceeds
    assert(fs.rename(new org.apache.hadoop.fs.Path(live),
      new org.apache.hadoop.fs.Path(live + "__pre_compact")))
    mk(live + "__compacting", Seq(1L, 2L, 3L, 4L, 5L))
    fs.create(new org.apache.hadoop.fs.Path(live + "__swapping"), true).close()
    Dirs.compactFlat(spark, live, rowsPerFile = 1000000L, dedup = false)
    assert(rows === Set(1L, 2L, 3L, 4L, 5L), "live-absent recovery lost rows")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(live + "__swapping")))

    // scenario 3: crash AFTER the swap completed but before the backup
    // delete (tmp consumed by the rename, marker + stale backup left).
    // Merging the stale backup would duplicate every row into the
    // compacted live — recovery must DELETE it instead.
    mk(live + "__pre_compact", Seq(1L, 2L, 3L, 4L, 5L)) // stale full copy
    fs.create(new org.apache.hadoop.fs.Path(live + "__swapping"), true).close()
    Dirs.compactFlat(spark, live, rowsPerFile = 1000000L, dedup = false)
    assert(rows === Set(1L, 2L, 3L, 4L, 5L), "stale backup must not merge back")
    assert(spark.read.parquet(live).count() === 5L, "post-swap recovery duplicated rows")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(live + "__pre_compact")))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(live + "__swapping")))

    // a backup WITHOUT a marker is completed-swap debris and is cleared
    mk(live + "__pre_compact", Seq(99L))
    Dirs.compactFlat(spark, live, rowsPerFile = 1000000L, dedup = false)
    assert(rows === Set(1L, 2L, 3L, 4L, 5L))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(live + "__pre_compact")))
  }

  test("Pq schema cache: a swapInPlace rewrite with a changed schema is seen on the next read") {
    // Pq.read caches the inferred schema per path; an in-place rebuild
    // that changes the layout (column added/renamed) must invalidate it —
    // a stale cached schema would silently read the new file wrong
    import graft.sources.{Dirs, Pq}
    import spark.implicits._
    val live = java.nio.file.Files.createTempDirectory("pq_swap").toString + "/t"
    Seq((1L, "a")).toDF("id", "s").write.parquet(live)
    assert(Pq.read(spark, live).schema.fieldNames.toSeq === Seq("id", "s"))
    // warm-cache read returns the same schema (the cache is in effect)
    assert(Pq.read(spark, live).schema.fieldNames.toSeq === Seq("id", "s"))
    Dirs.swapInPlace(spark, live) { tmp =>
      Seq((2L, "b", 9.0)).toDF("id", "s", "extra").write.mode("overwrite").parquet(tmp)
    }
    assert(Pq.read(spark, live).schema.fieldNames.toSeq === Seq("id", "s", "extra"),
      "post-swap read used a stale cached schema")
  }
}
