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

  test("smile publish payloads decode identically to the JSON path") {
    import spark.implicits._
    import scala.collection.mutable.ArrayBuffer

    // Wire helpers derived from the public Smile spec (v1.0): zigzag VInt
    // (7-bit groups big-endian, LAST byte carries 6 bits + 0x80 marker)
    // and 7-bit-packed big-endian float64 (10 bytes, right-aligned).
    def vlong(v: Long): Seq[Byte] = {
      val z = (v << 1) ^ (v >> 63)
      val out = ArrayBuffer(((z & 0x3F) | 0x80L).toByte)
      var r = z >>> 6
      while (r != 0) { out.prepend((r & 0x7F).toByte); r >>>= 7 }
      out.toSeq
    }
    def packedDouble(d: Double): Seq[Byte] = {
      val bits = java.lang.Double.doubleToLongBits(d)
      (0 until 10).map(i => ((bits >>> (7 * (9 - i))) & 0x7F).toByte)
    }

    // the fixture is hand-assembled token by token from the spec — not
    // produced by the decoder's own encoder — covering short ASCII names,
    // shared-name back-references, tiny strings, small ints, VInt longs
    // and packed doubles
    val b = ArrayBuffer[Byte]()
    def raw(xs: Int*): Unit = xs.foreach(x => b += x.toByte)
    def ascii(s: String): Unit = b ++= s.getBytes("UTF-8")
    raw(0x3A, 0x29, 0x0A, 0x01) //            header, shared names enabled
    raw(0xFA) //                              { -- start object
    raw(0x83); ascii("tags") //                 name len4 -> shared #0
    raw(0xFA) //                                {
    raw(0x82); ascii("app") //                    name len3 -> #1
    raw(0x42); ascii("www") //                    tiny ASCII value len3
    raw(0x83); ascii("node") //                   name -> #2
    raw(0x42); ascii("i-1")
    raw(0xFB) //                                }
    raw(0x86); ascii("metrics") //              name len7 -> #3
    raw(0xF8) //                                [ -- start array
    raw(0xFA) //                                  {
    raw(0x40) //                                    shared name ref #0 "tags"
    raw(0xFA)
    raw(0x83); ascii("name") //                       name -> #4
    raw(0x42); ascii("cpu")
    raw(0xFB)
    raw(0x88); ascii("timestamp") //                name len9 -> #5
    raw(0x25); b ++= vlong(1704067200000L) //       64-bit VInt
    raw(0x84); ascii("value") //                    name len5 -> #6
    raw(0x29); b ++= packedDouble(42.5) //          7-bit float64
    raw(0xFB) //                                  }
    raw(0xFA) //                                  {
    raw(0x40) //                                    ref "tags"
    raw(0xFA)
    raw(0x44) //                                      ref #4 "name"
    raw(0x42); ascii("gpu")
    raw(0x42) //                                      ref #2 "node"
    raw(0x42); ascii("i-2")
    raw(0xFB)
    raw(0x45) //                                    ref #5 "timestamp"
    raw(0x25); b ++= vlong(1704067260000L)
    raw(0x46) //                                    ref #6 "value"
    raw(0xC5) //                                    small int -3 (zigzag 5)
    raw(0xFB) //                                  }
    raw(0xF9) //                                ]
    raw(0xFB) //                              }
    val fixture = b.toArray

    val jsonTwin =
      """{"tags":{"app":"www","node":"i-1"},"metrics":[
        |{"tags":{"name":"cpu"},"timestamp":1704067200000,"value":42.5},
        |{"tags":{"name":"gpu","node":"i-2"},"timestamp":1704067260000,"value":-3}]}""".stripMargin

    val truncated = fixture.take(20)
    val unsupported = Array[Byte](0x3A, 0x29, 0x0A, 0x00, 0x26) // BigInteger token
    val smileRows = Publish
      .parseSmile(Seq(fixture, truncated, unsupported).toDF("payload"))
      .collect()
    val jsonRows = Publish.parse(Seq(jsonTwin).toDF("payload")).collect()

    def canon(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getAs[Map[String, String]]("tags"),
        r.getAs[Long]("ts"), r.getAs[Double]("value"))).toSet
    assert(smileRows.length == 2) // truncated + unsupported payloads dropped
    assert(canon(smileRows) == canon(jsonRows),
      s"smile/json divergence: ${canon(smileRows)} vs ${canon(jsonRows)}")
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
