package graft

import graft.asl.Asl
import graft.core.EvalContext
import graft.planner.Planner
import graft.sources.{Datapoints, Rollup}
import org.apache.spark.sql.DataFrame

/**
 * Pre-aggregated rollup reads (reference RollupBlock /
 * MemoryDatabase.blockAggr): a fetch at a step that is a multiple of the
 * rollup step must reconstruct the raw-scan answer exactly from the
 * (sum, count, min, max) columns, with no datapoint-cardinality shuffle.
 */
class RollupSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  // 6h query grid over a 3h rollup: two rollup rows re-compose per slot
  private val ctx6 = EvalContext(1704067200000L, 1706659200000L, 21600000L)

  private def evalBoth(program: String): (DataFrame, DataFrame) = {
    val raw = Datapoints.events(spark, dir)
    Rollup.materialize(raw, "rollup_spec_t", 10800000L, buckets = 8)
    val ru = Rollup.read(spark, "rollup_spec_t", 10800000L, ctx6.step)
    val expr = Asl.parse(program)
    (Planner.output(Planner.eval(expr, raw, ctx6), Nil),
      Planner.output(Planner.eval(expr, ru, ctx6), Nil))
  }

  private def toMap(df: DataFrame) =
    df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("every consolidation function reconstructs the raw answer from the rollup") {
    try {
      for (cf <- Seq(":cf-sum", ":cf-avg", ":cf-min", ":cf-max")) {
        val (fromRaw, fromRollup) = evalBoth(s"name,click,:eq,:sum,$cf")
        assert(toMap(fromRollup) == toMap(fromRaw), s"mismatch for $cf")
      }
    } finally spark.sql("DROP TABLE IF EXISTS rollup_spec_t")
  }

  test("rollup fetch plan touches no raw datapoints and never shuffles rollup rows") {
    try {
      val (_, fromRollup) = evalBoth(":true,:sum")
      fromRollup.collect()
      val plan = fromRollup.queryExecution.executedPlan.toString
      // bucketed rollup scan satisfies the per-(series, slot) aggregation
      assert("Exchange hashpartitioning\\(key".r.findFirstIn(plan).isEmpty,
        s"rollup normalization still shuffles:\n$plan")
      // and the scan reads the rollup table, not the events parquet
      assert(plan.contains("rollup_spec_t"), plan)
      assert(!plan.contains("events.parquet"), plan)
    } finally spark.sql("DROP TABLE IF EXISTS rollup_spec_t")
  }

  test("rollup build from the bucketed store shuffles nothing") {
    val raw = Datapoints.events(spark, dir)
    graft.sources.Store.writeBucketed(raw, "rollup_src_store", buckets = 8)
    try {
      val store = graft.sources.Store.read(spark, "rollup_src_store")
      val fr = Rollup.frame(store, 10800000L)
      fr.collect()
      val plan = fr.queryExecution.executedPlan.toString
      // the scan's bucket partitioning satisfies the per-(series, slot)
      // aggregate AND the tags re-attach join: the maintenance job is a
      // single pass over each bucket, no exchange anywhere
      assert("Exchange hashpartitioning".r.findFirstIn(plan).isEmpty,
        s"rollup build from the store still shuffles:\n$plan")
    } finally spark.sql("DROP TABLE IF EXISTS rollup_src_store")
  }

  test("misaligned query step is refused (fall back to the raw store)") {
    intercept[IllegalArgumentException] {
      Rollup.read(spark, "whatever", 10800000L, 3600000L)
    }
  }

  test("readBest picks the coarsest aligned rollup, the raw store otherwise") {
    val raw = Datapoints.events(spark, dir)
    graft.sources.Store.writeBucketed(raw, "rb_store", buckets = 8)
    Rollup.materialize(raw, "rb_r3h", 10800000L, buckets = 8)
    Rollup.materialize(raw, "rb_r6h", 21600000L, buckets = 8)
    val rollups = Map("rb_r3h" -> 10800000L, "rb_r6h" -> 21600000L)
    try {
      def pick(stepMs: Long) = Rollup.readBest(spark, "rb_store", rollups, stepMs)
      // 12h: both align, the coarsest (6h) wins; 6h: only itself + 3h, 6h wins
      assert(pick(43200000L).inputFiles.exists(_.contains("rb_r6h")))
      assert(pick(21600000L).inputFiles.exists(_.contains("rb_r6h")))
      // 9h: only the 3h rollup divides it
      assert(pick(32400000L).inputFiles.exists(_.contains("rb_r3h")))
      // 1h (finer than any rollup) and 4h (aligned with none): raw store
      assert(pick(3600000L).columns.contains("value"))
      assert(pick(14400000L).inputFiles.exists(_.contains("rb_store")))

      // and the selected source answers identically through the planner
      val ctx12 = EvalContext(1704067200000L, 1706659200000L, 43200000L)
      val expr = Asl.parse("name,click,:eq,:sum")
      def toMap(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(
        toMap(Planner.output(Planner.eval(expr, pick(ctx12.step), ctx12), Nil)) ==
          toMap(Planner.output(Planner.eval(expr, raw, ctx12), Nil)))
    } finally Seq("rb_store", "rb_r3h", "rb_r6h").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("cascade rollup (coarse from fine) is bit-identical to rolling up raw, never scans raw") {
    val raw = Datapoints.events(spark, dir)
    Rollup.materialize(raw, "cas_r3h", 10800000L, buckets = 8)
    try {
      Rollup.materializeFrom(spark, "cas_r3h", 10800000L, "cas_r6h", 21600000L, buckets = 8)
      // the 6h table built from the 3h table answers like one built from raw
      Rollup.materialize(raw, "cas_r6h_direct", 21600000L, buckets = 8)
      def rows(t: String) = spark.table(t)
        .select("key", "ts", "v_sum", "v_count", "v_min", "v_max")
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
      assert(rows("cas_r6h") == rows("cas_r6h_direct"))
      // and the cascade build read the 3h rollup, not the raw events
      val df = spark.table("cas_r6h")
      assert(df.count() > 0)
      // misaligned cascade is refused
      intercept[IllegalArgumentException] {
        Rollup.materializeFrom(spark, "cas_r3h", 10800000L, "cas_bad", 16200000L)
      }
    } finally Seq("cas_r3h", "cas_r6h", "cas_r6h_direct", "cas_bad").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))
  }

  test("date-partitioned rollup prunes to the query window through the backend") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: org.apache.spark.sql.execution.SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec        => scans(q.plan)
      case f: FileSourceScanExec    => Seq(f) ++ f.children.flatMap(scans)
      case other                    => other.children.flatMap(scans)
    }
    val raw = Datapoints.events(spark, dir)
    graft.sources.Store.writeBucketed(raw, "rp_store", buckets = 8,
      catalog = true, partitioned = true)
    Rollup.materialize(raw, "rp_r3h", 10800000L, buckets = 8, partitioned = true)
    try {
      val backend = graft.sources.StoreBackend(
        spark, "rp_store", Map("rp_r3h" -> 10800000L))
      // 5-day window at 6h step: served from the partitioned 3h rollup
      val sub = EvalContext(1704931200000L, 1705363200000L, 21600000L)
      val expr = Asl.parse("name,click,:eq,:sum")
      val out = Planner.output(Planner.eval(expr, backend, sub), Nil)
      out.collect()
      val scan = scans(out.queryExecution.executedPlan)
        .find(f => f.relation.partitionSchema.nonEmpty &&
          f.relation.location.rootPaths.exists(_.toString.contains("rp_r3h")))
        .getOrElse(fail("rollup scan not partitioned/pruned"))
      assert(scan.partitionFilters.nonEmpty)
      assert(scan.selectedPartitions.partitionCount == 5,
        s"expected 5 day partitions, got ${scan.selectedPartitions.partitionCount}")
      assert(toMap(out) == toMap(Planner.output(Planner.eval(expr, raw, sub), Nil)))
    } finally Seq("rp_store", "rp_store_catalog", "rp_r3h").foreach(t =>
      spark.sql(s"DROP TABLE IF EXISTS $t"))
  }
}
