package graft

import graft.api.Api
import graft.asl.Query
import graft.core.EvalContext
import org.apache.spark.sql.functions._

class ApiSpec extends SparkSpec {

  val ctx = EvalContext(0L, 240000L, 60000L)
  def slot(i: Int): Long = i * 60000L

  lazy val dp = {
    import spark.implicits._
    Seq(
      (Map("name" -> "a", "node" -> "n1"), slot(0) + 1L, 1.0),
      (Map("name" -> "a", "node" -> "n1"), slot(1) + 1L, 2.0),
      (Map("name" -> "a", "node" -> "n2"), slot(0) + 1L, 10.0),
      (Map("name" -> "b", "node" -> "n1"), slot(2) + 1L, 5.0)
    ).toDF("tags", "ts", "value")
  }

  test("graph renders TimeSeriesMessage JSON with a dense values array") {
    val out = Api.graph("name,a,:eq,:sum,(,node,),:by", dp, ctx)
      .collect().map(_.getString(0)).sorted
    assert(out.length == 2)
    val n1 = out.find(_.contains("\"node\":\"n1\"")).get
    assert(n1.contains("\"type\":\"timeseries\""))
    assert(n1.contains("\"groupByKeys\":[\"node\"]"))
    assert(n1.contains("\"step\":60000"))
    // slots: 1.0, 2.0, gap, gap -> NaN serialized by to_json as "NaN"
    assert(n1.contains("\"values\":[1.0,2.0,\"NaN\",\"NaN\"]") ||
      n1.contains("\"values\":[1.0,2.0,null,null]"), n1)
  }

  test(":time calendar fields stay UTC even when the request carries a tz") {
    // reference parity: MathExpr.Time.usingCalendar hardcodes ZoneOffset.UTC;
    // 2024-01-01 00:00 UTC stays hour 0 regardless of tz=America/New_York
    val ny = EvalContext(1704067200000L, 1704067200000L + 120000L, 60000L, "America/New_York")
    val out = Api.graph("hourOfDay,:time", dp, ny).collect().map(_.getString(0))
    assert(out.length == 1)
    assert(out.head.contains("\"values\":[0.0,0.0]"), out.head)
  }

  test("tz threads into zone-less :time-span date parsing") {
    // window around 2024-01-15 00:00 New York (05:00 UTC)
    val ny = EvalContext(1705291200000L, 1705291200000L + 4 * 3600000L, 3600000L, "America/New_York")
    val out = Api.graph("2024-01-15,2024-01-16,:time-span", dp, ny).collect().map(_.getString(0))
    // 04:00/05:00/06:00/07:00 UTC -> span starts at 05:00 UTC (midnight NY)
    assert(out.head.contains("\"values\":[0.0,1.0,1.0,1.0]"), out.head)
  }

  test("legend formatting substitutes $tags") {
    val out = Api.graph("name,a,:eq,:sum,(,node,),:by,node $node,:legend", dp, ctx)
      .collect().map(_.getString(0))
    assert(out.exists(_.contains("\"label\":\"node n1\"")), out.mkString("\n"))
  }

  test("legend formatting substitutes parenthesized $(tags)") {
    val out = Api.graph("name,a,:eq,:sum,(,node,),:by,on $(node) now,:legend", dp, ctx)
      .collect().map(_.getString(0))
    assert(out.exists(_.contains("\"label\":\"on n1 now\"")), out.mkString("\n"))
  }

  test(":s rewrites the legend with regex search-replace") {
    val out = Api.graph("name,a,:eq,:sum,(,node,),:by,$node,:legend,^n,host-,:s", dp, ctx)
      .collect().map(_.getString(0))
    assert(out.exists(_.contains("\"label\":\"host-1\"")), out.mkString("\n"))
  }

  test("fetch partitions the window into chunks") {
    val chunks = Api.fetch("name,a,:eq,:sum", dp, ctx, chunkSlots = 2)
    assert(chunks.length == 2)
    val first = chunks.head.collect().map(_.getString(0)).head
    assert(first.contains("\"end\":120000"))
  }

  test("maxDatapoints auto-coarsens the step (GraphConfig.stepSize port)") {
    import graft.core.Step
    assert(Step.compute(60000L, 2, 0L, 240000L) == 120000L)
    assert(Step.compute(60000L, 1000, 0L, 240000L) == 60000L)
    // 4 slots capped at 2 points -> 2-minute consolidated slots (avg cf)
    val out = Api.graph("name,a,:eq,:sum", dp, ctx, maxDatapoints = 2)
      .collect().map(_.getString(0))
    assert(out.length == 1)
    assert(out.head.contains("\"step\":120000"), out.head)
  }

  test("list-form :offset expands to one message per offset") {
    val out = Api.graph("name,a,:eq,:sum,(,0m,1m,),:offset", dp, ctx)
      .collect().map(_.getString(0))
    assert(out.length == 2, out.mkString("\n"))
    // 1m-shifted expr sees slot0 data at slot1
    assert(out.exists(_.contains("\"query\":\"name,a,:eq,:sum\"")), out.mkString("\n"))
    assert(out.exists(_.contains("\"query\":\"name,a,:eq,:sum,1m,:offset\"")), out.mkString("\n"))
  }

  test("time-range parsing resolves relative and epoch forms") {
    import graft.asl.Strings
    val now = () => 1704844800000L // 2024-01-10T00:00Z
    assert(Strings.timeRange("e-1h", "now", now) == (1704841200000L, 1704844800000L))
    assert(Strings.timeRange("2024-01-01T00:00:00Z", "s+1d", now) ==
      (1704067200000L, 1704153600000L))
    // epoch seconds vs millis auto-detected by magnitude
    assert(Strings.parseDate("1704067200", Map.empty, now) == 1704067200000L)
    assert(Strings.parseDate("1704067200000", Map.empty, now) == 1704067200000L)
    intercept[IllegalArgumentException](Strings.timeRange("e-1h", "s+1h", now))
  }

  test("graphRequest evaluates a relative window") {
    val out = Api.graphRequest("name,a,:eq,:sum", dp,
      s = "e-3m", e = "1970-01-01T00:04:00Z", stepMs = 60000L)
      .collect().map(_.getString(0))
    assert(out.length == 1)
    assert(out.head.contains("\"start\":60000"), out.head)
    assert(out.head.contains("\"values\":[2.0,\"NaN\",\"NaN\",\"NaN\"]") ||
      out.head.contains("\"values\":[2.0,null,null,null]"), out.head)
  }

  test("multi-zone request: head of the tz list is the data-affecting zone") {
    // reference GraphConfig keeps the zone LIST for axis rendering but
    // resolves the time range in timezoneIds.head; an absolute zone-less
    // end date must therefore parse in the FIRST listed zone
    val utc = Api.graphRequest("42,:const", dp,
      s = "e-2m", e = "1970-01-01T00:04:00", stepMs = 60000L,
      timezones = List("UTC", "US/Pacific")).collect().map(_.getString(0))
    assert(utc.head.contains("\"end\":300000"), utc.head) // 00:04 + one step
    // 1970-01-01T00:04 US/Pacific = 08:04 UTC (PST = UTC-8)
    val pst = Api.graphRequest("42,:const", dp,
      s = "e-2m", e = "1970-01-01T00:04:00", stepMs = 60000L,
      timezones = List("US/Pacific", "UTC")).collect().map(_.getString(0))
    assert(pst.head.contains(s""""end":${8 * 3600000L + 300000}"""), pst.head)
  }

  test("tags API lists keys, values and pairs with paging") {
    val keys = Api.tagKeys(dp, Query.True).collect().map(_.getString(0)).toList
    assert(keys == List("name", "node"))
    val vals = Api.tagValues(dp, "name", Query.True).collect().map(_.getString(0)).toList
    assert(vals == List("a", "b"))
    val paged = Api.tagValues(dp, "node", Query.True, limit = 10, offset = "n1")
      .collect().map(_.getString(0)).toList
    assert(paged == List("n2"))
    val pairs = Api.tags(dp, Query.Equal("name", "b")).collect()
      .map(r => (r.getString(0), r.getString(1))).toList
    assert(pairs == List(("name", "b"), ("node", "n1")))
  }

  test("graphCsv renders the reference CSV shape: header, ISO timestamps, %f values, NaN gaps") {
    import spark.implicits._
    val ctx = graft.core.EvalContext(0L, 3 * 3600000L, 3600000L)
    val dp = Seq(
      (Map("name" -> "a"), 0L, 1.0),
      (Map("name" -> "a"), 3600000L, 2.5),
      // a's slot 2 missing -> NaN cell
      (Map("name" -> "b"), 0L, 5.0),
      (Map("name" -> "b"), 3600000L, 6.0),
      (Map("name" -> "b"), 7200000L, 7.0)
    ).toDF("tags", "ts", "value")
    val csv = Api.graphCsv("name,a,:eq,:sum,name,b,:eq,:sum", dp, ctx)
    val lines = csv.trim.split("\n")
    assert(lines.length == 4, csv)
    assert(lines(0) == "\"timestamp\",\"name,a,:eq,:sum\",\"name,b,:eq,:sum\"")
    assert(lines(1) == "1970-01-01T00:00:00Z,1.000000,5.000000")
    assert(lines(2) == "1970-01-01T01:00:00Z,2.500000,6.000000")
    assert(lines(3) == "1970-01-01T03:00:00Z,NaN,7.000000" ||
      lines(3) == "1970-01-01T02:00:00Z,NaN,7.000000", lines(3))
    // tab separator variant (the reference's txt engine)
    val tsv = Api.graphCsv("name,b,:eq,:sum", dp, ctx, sep = "\t")
    assert(tsv.trim.split("\n")(1) == "1970-01-01T00:00:00Z\t5.000000")
  }

  test("graphJson renders the classic format: legend, sorted-tag metrics, values matrix") {
    import spark.implicits._
    val ctx = graft.core.EvalContext(0L, 2 * 3600000L, 3600000L)
    val dp = Seq(
      (Map("name" -> "a", "usr" -> "u1"), 0L, 1.0),
      (Map("name" -> "a", "usr" -> "u2"), 0L, 2.0),
      (Map("name" -> "a", "usr" -> "u1"), 3600000L, 3.0)
    ).toDF("tags", "ts", "value")
    val json = Api.graphJson("name,a,:eq,:sum,(,usr,),:by", dp, ctx)
    assert(json.startsWith("""{"start":0,"step":3600000,"legend":["""), json)
    assert(json.contains(""""legend":["usr=u1","usr=u2"]"""), json)
    assert(json.contains(""""metrics":[{"name":"a","usr":"u1"},{"name":"a","usr":"u2"}]"""), json)
    // slot 0: both lines; slot 1: u2 absent -> unquoted NaN like the reference
    assert(json.contains(""""values":[[1.0,2.0],[3.0,NaN]]"""), json)
    assert(json.endsWith(""""notices":[]}"""), json)
    // std.json: strictly-parseable variant quotes non-finite values
    val strict = Api.graphJson("name,a,:eq,:sum,(,usr,),:by", dp, ctx, strict = true)
    assert(strict.contains(""""values":[[1.0,2.0],[3.0,"NaN"]]"""), strict)
  }

  test("graphData dispatches every data format the graph endpoint serves") {
    import spark.implicits._
    val ctx = graft.core.EvalContext(0L, 3600000L, 3600000L)
    val dp = Seq((Map("name" -> "a"), 0L, 1.0)).toDF("tags", "ts", "value")
    val p = "name,a,:eq,:sum"
    assert(Api.graphData(p, dp, ctx, "csv").startsWith("\"timestamp\","))
    assert(Api.graphData(p, dp, ctx, "txt").contains("\t"))
    assert(Api.graphData(p, dp, ctx, "json").startsWith("""{"start":0"""))
    assert(Api.graphData(p, dp, ctx, "std.json").startsWith("""{"start":0"""))
    val v2 = Api.graphData(p, dp, ctx, "v2.json")
    assert(v2.contains(""""type":"timeseries"""") && !v2.contains("\n\n"))
    intercept[IllegalArgumentException] { Api.graphData(p, dp, ctx, "png") }
  }

  test("hover against the live series catalog reports key and value cardinalities") {
    import spark.implicits._
    val dp = Seq(
      (Map("name" -> "cpu", "node" -> "n1"), 0L, 1.0),
      (Map("name" -> "cpu", "node" -> "n2"), 0L, 1.0),
      (Map("name" -> "disk"), 0L, 1.0)
    ).toDF("tags", "ts", "value")
    val cat = graft.sources.TagIndex.seriesCatalog(dp)
    val prog = "node,n1,:eq"
    val hk = graft.api.ExprApi.hover(prog, 0, catalog = Some(cat)).get
    assert(hk.contains("Seen in 2 series, 2 distinct values"), hk)
    val hv = graft.api.ExprApi.hover(prog, prog.indexOf("n1"), catalog = Some(cat)).get
    assert(hv.contains("Matches 1 series"), hv)
  }
}
