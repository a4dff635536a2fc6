package graft

import graft.asl.Query
import graft.ops.EventOps
import graft.sources.Publish
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class PublishSpec extends SparkSpec {

  test("publish payloads decode to canonical datapoints with tag merge") {
    import spark.implicits._
    val payloads = Seq(
      // common tags + override: metric tag wins on "app"
      """{"tags":{"app":"www","nf.cluster":"www-main"},
        |"metrics":[
        |  {"tags":{"name":"requests","app":"api"},"timestamp":1704067200000,"value":42.0},
        |  {"tags":{"name":"latency"},"timestamp":1704067260000,"value":0.25}]}""".stripMargin,
      // invalid: bad characters in tag value -> dropped by validation
      """{"tags":{},"metrics":[{"tags":{"name":"bad tag!"},"timestamp":1,"value":1.0}]}""",
      // malformed json -> dropped
      """{"tags": not-json""",
      // missing value -> dropped
      """{"metrics":[{"tags":{"name":"requests"},"timestamp":5}]}"""
    ).toDF("payload")

    val dp = Publish.parse(payloads).collect()
    assert(dp.length == 2)
    val byName = dp.map(r => r.getAs[Map[String, String]]("tags")("name") -> r).toMap
    val req = byName("requests")
    assert(req.getAs[Map[String, String]]("tags") ==
      Map("name" -> "requests", "app" -> "api", "nf.cluster" -> "www-main"))
    assert(req.getAs[Long]("ts") == 1704067200000L)
    assert(req.getAs[Double]("value") == 42.0)
    val lat = byName("latency")
    assert(lat.getAs[Map[String, String]]("tags") ==
      Map("name" -> "latency", "app" -> "www", "nf.cluster" -> "www-main"))
  }

  test("publish parse works unchanged on a stream") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[String]
    val out = Publish.parse(input.toDF.toDF("payload"))
    val query = out.writeStream.format("memory").queryName("pub_stream")
      .outputMode("append").start()
    try {
      input.addData(
        """{"metrics":[{"tags":{"name":"requests"},"timestamp":1000,"value":2.0}]}""")
      query.processAllAvailable()
      val rows = spark.table("pub_stream").collect()
      assert(rows.length == 1)
      assert(rows(0).getAs[Double]("value") == 2.0)
    } finally query.stop()
  }

  test("streaming exact dedup passes first arrival per content hash") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String, Long)]
    val out = graft.ops.Dedup.streamingExact(
      input.toDF.toDF("doc_id", "text", "ts"), watermark = "1 minute")
    val query = out.writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      input.addData(Seq(
        (1L, "alpha beta", 1000L), (2L, "alpha beta", 2000L), // dup of 1
        (3L, "gamma", 3000L)))
      query.processAllAvailable()
      input.addData(Seq((4L, "gamma", 5000L))) // dup of 3, still in horizon
      query.processAllAvailable()
      val kept = spark.table("dedup_stream").collect().map(_.getAs[Long]("doc_id")).toSet
      assert(kept == Set(1L, 3L))
    } finally query.stop()
  }

  test("streaming :sample matches the batch sample per finalized window") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val step = 60000L
    // (event_type, tms, user_id): two types across two windows
    val rows = Seq(
      ("click", 1000L, 7L), ("click", 2000L, 3L), ("view", 5000L, 9L),
      ("click", 61000L, 5L))
    val input = MemoryStream[(String, Long, Long)]
    val ev = input.toDF.toDF("event_type", "tms", "user_id")
      .withColumn("tags", map(lit("name"), col("event_type")))
    val out = EventOps.streamingSample(
      ev, Query.True, Seq("event_type"), Seq("user_id"), step, "1 minute")
    val query = out.writeStream.format("memory").queryName("ev_sample")
      .outputMode("append").start()
    try {
      input.addData(rows)
      query.processAllAvailable()
      input.addData(Seq(("flush", 10L * 60000L, 1L)))
      query.processAllAvailable()
      input.addData(Seq(("flush", 11L * 60000L, 1L)))
      query.processAllAvailable()

      val streamed = spark.table("ev_sample")
        .filter(col("t") < 5 * 60000L)
        .collect()
        .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("t")) ->
          (r.getAs[Double]("n_events"), r.getAs[Long]("sample_user_id")))
        .toMap
      val batch = EventOps.sample(
        rows.toDF("event_type", "tms", "user_id")
          .withColumn("tags", map(lit("name"), col("event_type"))),
        Query.True, Seq("event_type"), Seq("user_id"), step)
        .collect()
        .map(r => (r.getAs[String]("event_type"), r.getAs[Long]("t")) ->
          (r.getAs[Double]("n_events"), r.getAs[Long]("sample_user_id")))
        .toMap
      assert(streamed == batch)
    } finally query.stop()
  }
}
