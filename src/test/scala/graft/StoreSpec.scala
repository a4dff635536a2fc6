package graft

import graft.asl.{Asl, Query}
import graft.core.EvalContext
import graft.planner.Planner
import graft.sources.{Datapoints, Store}
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
}
