package graft.api

import graft.asl._
import graft.core.EvalContext
import graft.planner.{Planner, QueryCompiler, SeriesFrame}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * The JSON API surface (reference atlas-webapi GraphApi / FetchRequestSource
 * / TagsApi; message shape from atlas-eval model/TimeSeriesMessage.scala:
 * 64-110): evaluation results rendered as one `timeseries` JSON document per
 * line, fully distributed — the JSON is built with to_json inside the plan,
 * nothing is collected to the driver.
 */
object Api {

  /**
   * Evaluate an ASL program and render each result line as a
   * TimeSeriesMessage-shaped JSON string:
   * {"type":"timeseries","id",...,"query","label","tags","start","end",
   * "step","data":{"type":"array","values":[...]}}.
   *
   * The dense per-line values array is assembled by sorting the collected
   * (slot, value) structs per line — one shuffle at line cardinality.
   */
  def graph(
      program: String,
      dp: DataFrame,
      ctx: EvalContext,
      maxDatapoints: Int = 0
  ): DataFrame =
    graphImpl(program, Planner.evalAll(_, dp, ctx), ctx, maxDatapoints)

  /**
   * Store-backed graph evaluation — the deployment default: every fetch in
   * the request resolves its predicate on the series catalog and is served
   * from the coarsest rollup aligned to the request step, with no
   * hand-wired index calls (reference MemoryDatabase.executeImpl /
   * blockAggr, db/MemoryDatabase.scala:207-229).
   */
  def graph(
      program: String,
      backend: graft.sources.StoreBackend,
      ctx: EvalContext,
      maxDatapoints: Int
  ): DataFrame =
    graphImpl(program, Planner.evalAll(_, backend, ctx), ctx, maxDatapoints)

  private def graphImpl(
      program: String,
      evalAll: Seq[TimeSeriesExpr] => Seq[graft.planner.SeriesFrame],
      ctx: EvalContext,
      maxDatapoints: Int
  ): DataFrame = {
    // the context zone reaches both date parsing (:time-span) and :time
    val styled = Asl.parseAll(program, ctx.tz)
    // Step auto-coarsening (GraphConfig.stepSize, graph/GraphConfig.scala:
    // 78-82): cap datapoints per line by consolidating to a coarser step.
    val step =
      if (maxDatapoints > 0) graft.core.Step.compute(ctx.step, maxDatapoints, ctx.start, ctx.end)
      else ctx.step
    val multiple = (step / ctx.step).toInt
    // legacy list-form :offset expands to one expression per offset
    // (StyleExpr.perOffset, StyleExpr.scala:195-200)
    val expanded = styled.flatMap { s =>
      s.settings.get("offsets") match {
        case Some(offsets) =>
          offsets.split(",").toList.filter(_.nonEmpty) match {
            // empty offset list -> the line itself (StyleExpr.perOffset)
            case Nil => List(s.copy(settings = s.settings - "offsets"))
            case os =>
              os.map { o =>
                val ms = Strings.parseDuration(o)
                val shifted = Rewrite.mapData(s.expr, _.withOffset(ms))
                s.copy(expr = shifted, settings = s.settings - "offsets")
              }
          }
        case None => List(s)
      }
    }
    val exprs = expanded.map { s =>
      val expr0: TimeSeriesExpr = if (s.settings.isEmpty) s.expr else s
      if (multiple > 1) FilterExpr.Consolidate(expr0, multiple, "avg") else expr0
    }
    // one shared CSE cache across the whole request: expressions sharing a
    // fetch (or any subtree) share one Spark plan subtree and its exchanges
    evalAll(exprs)
      .zip(expanded)
      .map { case (frame, s) => message(frame, s.expr, ctx, s.settings) }
      .reduce(_ unionByName _)
  }

  /**
   * Full graph request: resolve the time range (relative forms like
   * `s=e-3h&e=now`), round to step boundaries, auto-coarsen, evaluate
   * (reference Grapher.toGraphConfig, atlas-eval graph/GraphConfig.scala).
   */
  def graphRequest(
      program: String,
      dp: DataFrame,
      s: String = "e-3h",
      e: String = "now",
      stepMs: Long = 60000L,
      maxDatapoints: Int = 0,
      nowMs: () => Long = () => System.currentTimeMillis(),
      tz: String = "UTC",
      timezones: Seq[String] = Nil
  ): DataFrame = {
    // Multi-zone requests (repeated `tz` params): the reference keeps the
    // LIST for rendering one time axis per zone, but only the HEAD is
    // data-affecting — time-range parsing resolves in it
    // (GraphConfig.scala:59-65: `tz = timezoneIds.head`). With no list the
    // single `tz` param applies, like GraphConfig's settings default.
    val primary = timezones.headOption.getOrElse(tz)
    graph(program, dp, requestContext(s, e, stepMs, nowMs, primary), maxDatapoints)
  }

  /** Store-backed [[graphRequest]]: the request step drives rollup
    * selection — a `step=1d` dashboard over a 6h rollup scans 1/6th of the
    * rows with zero extra wiring from the caller. */
  def graphRequest(
      program: String,
      backend: graft.sources.StoreBackend,
      s: String,
      e: String,
      stepMs: Long,
      maxDatapoints: Int,
      nowMs: () => Long,
      tz: String,
      timezones: Seq[String]
  ): DataFrame = {
    val primary = timezones.headOption.getOrElse(tz)
    graph(program, backend, requestContext(s, e, stepMs, nowMs, primary), maxDatapoints)
  }

  private def requestContext(
      s: String, e: String, stepMs: Long, nowMs: () => Long, primary: String): EvalContext = {
    val (start0, end0) = Strings.timeRange(s, e, nowMs, java.time.ZoneId.of(primary))
    val step = graft.core.Step.round(stepMs, stepMs)
    val rs = math.floorDiv(start0, step) * step
    val re = math.floorDiv(end0, step) * step
    val fstart = if (rs == re) rs - step else rs
    EvalContext(fstart, re + step, step, primary)
  }

  /** One fetch chunk per context partition (EvalContext.partition analog,
    * reference model/EvalContext.scala:41-57): the same messages, windowed
    * to chunked time ranges for streaming delivery. */
  def fetch(program: String, dp: DataFrame, ctx: EvalContext, chunkSlots: Int): Seq[DataFrame] =
    ctx.partition(chunkSlots).map(chunk => graph(program, dp, chunk))

  private[graft] def message(
      frame: SeriesFrame,
      expr: TimeSeriesExpr,
      ctx: EvalContext,
      settings: Map[String, String]
  ): DataFrame = {
    val grid = (ctx.start until ctx.end by frame.step)

    // collect (t, v) per line, then fill the dense grid in slot order
    val collected = frame.df
      .groupBy(col("key"))
      .agg(
        first(col("tags")).as("tags"),
        map_from_entries(collect_list(struct(col("t"), col("value")))).as("tv"))

    // ONE transform over a generated slot sequence, not `array(<one
    // element_at per slot>)`: the literal form inlines bufferSize (720 on
    // the testdata grid) expressions into the projection, whose generated
    // processNext() then overflows janino's 64 KB method limit and drops
    // the whole final stage to interpreted execution. The HOF is
    // CodegenFallback, but this projection runs once per LINE (graph
    // cardinality), never per datapoint, so interpreted is the right trade
    // against losing codegen for the stage.
    val values = transform(
      sequence(lit(ctx.start), lit(ctx.start + (grid.size - 1) * frame.step), lit(frame.step)),
      t => coalesce(element_at(col("tv"), t), lit(Double.NaN)))

    // legend: $k and $(k) substitution from tags (StyleExpr.legend,
    // StyleExpr.scala:47-62; Strings.substitute supports both forms)
    val base = settings.get("legend") match {
      case Some(fmt) =>
        val pat = "\\$\\(([^)]+)\\)|\\$([a-zA-Z0-9_.]+)".r
        val parts = pat.split(fmt)
        val keys = pat.findAllMatchIn(fmt)
          .map(m => Option(m.group(1)).getOrElse(m.group(2))).toList
        val cols = parts.toList.map(lit(_): Column)
          .zipAll(keys.map(k => coalesce(col("tags").getItem(k), lit(s"$$$k"))), lit(""), lit(""))
          .flatMap { case (a, b) => Seq(a, b) }
        concat(cols: _*)
      case None =>
        when(col("key") === "", lit(expr.asl)).otherwise(col("key"))
    }
    // :s search-replace chain applied to the legend text (StyleExpr.scala:223-259)
    val label = settings.get("sed").map(_.split(" ").toList).getOrElse(Nil)
      .grouped(2).foldLeft(base) {
        case (c, List(search, repl)) => regexp_replace(c, search, repl)
        case (c, _)                  => c
      }

    collected.select(
      to_json(struct(
        lit("timeseries").as("type"),
        sha1(col("key")).as("id"),
        lit(expr.asl).as("query"),
        (if (frame.grouping.nonEmpty) lit(frame.grouping.toArray) else lit(Array.empty[String]))
          .as("groupByKeys"),
        label.as("label"),
        col("tags"),
        lit(ctx.start).as("start"),
        lit(ctx.end).as("end"),
        lit(frame.step).as("step"),
        struct(lit("array").as("type"), values.as("values")).as("data")
      )).as("json"))
  }

  /**
   * CSV/TSV graph data (reference atlas-chart CsvGraphEngine /
   * CommaSepGraphEngine / TabSepGraphEngine — the data-serialization half
   * of `format=csv` / `format=txt`; PNG rendering stays out of scope):
   * one line per timestamp rendered in the request zone
   * (ISO_OFFSET_DATE_TIME like the reference), one column per plotted
   * series labeled like the JSON output, values through the reference's
   * default `%f` number format (NaN prints as `NaN`). Output size is the
   * rendered graph (slots x lines), so building the string driver-side
   * mirrors the reference streaming the same bytes.
   *
   * Columns sort by label for a deterministic layout — the union of
   * per-expression frames does not guarantee a collection order.
   */
  def graphCsv(
      program: String,
      dp: DataFrame,
      ctx: EvalContext,
      maxDatapoints: Int = 0,
      sep: String = ","
  ): String = {
    val series = collectSeries(graph(program, dp, ctx, maxDatapoints))
      .map(s => (s._1, s._3, s._4, s._5))
    val step = series.head._3
    val start = series.head._2
    val zone = java.time.ZoneId.of(ctx.tz)
    val fmt = java.time.format.DateTimeFormatter.ISO_OFFSET_DATE_TIME
    val sb = new StringBuilder
    sb.append("\"timestamp\"")
    series.foreach { case (label, _, _, _) =>
      // CSV quoting: embedded quotes double (RFC 4180)
      sb.append(sep).append('"').append(label.replace("\"", "\"\"")).append('"')
    }
    sb.append('\n')
    val slots = series.head._4.length
    var i = 0
    while (i < slots) {
      val t = java.time.Instant.ofEpochMilli(start + i.toLong * step).atZone(zone)
      sb.append(t.format(fmt))
      series.foreach { case (_, _, _, vs) =>
        val v = vs(i)
        // Locale.ROOT: a comma decimal separator from the JVM default
        // locale would corrupt the comma-separated output
        sb.append(sep).append(String.format(java.util.Locale.ROOT, "%f",
          Double.box(if (v == null) Double.NaN else v.doubleValue())))
      }
      sb.append('\n')
      i += 1
    }
    sb.toString
  }

  /** Collect a graph result's lines, sorted by label for a deterministic
    * layout: (label, tags, start, step, values). Rendered-graph-sized
    * (lines x slots), never datapoint-sized. */
  private def collectSeries(
      msgs: DataFrame
  ): Seq[(String, Map[String, String], Long, Long, Seq[java.lang.Double])] = {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("label", StringType),
      StructField("tags", MapType(StringType, StringType)),
      StructField("start", LongType),
      StructField("step", LongType),
      StructField("data", StructType(Seq(
        StructField("values", ArrayType(DoubleType)))))))
    val series = msgs
      .select(from_json(col("json"), schema,
        Map("allowNonNumericNumbers" -> "true")).as("m"))
      .select(col("m.label"), col("m.tags"), col("m.start"), col("m.step"),
        col("m.data.values"))
      .collect()
      .map(r => (r.getString(0),
        Option(r.getMap[String, String](1)).map(_.toMap).getOrElse(Map.empty),
        r.getLong(2), r.getLong(3), r.getSeq[java.lang.Double](4)))
      .sortBy(_._1)
      .toSeq
    require(series.nonEmpty, "no series to render")
    series
  }

  /**
   * Classic graph JSON (reference atlas-chart JsonGraphEngine, the
   * `format=json` engine): `{start, step, legend, metrics, values,
   * notices}` with the values matrix row-per-timestamp — NaN is emitted
   * unquoted exactly like the reference (its own docs note the format
   * needs a parser with non-standard-number support; `std.json`-style
   * strict output is what [[graph]]'s TimeSeriesMessage rows are for).
   * Columns sort by label like [[graphCsv]].
   */
  def graphJson(
      program: String,
      dp: DataFrame,
      ctx: EvalContext,
      maxDatapoints: Int = 0,
      strict: Boolean = false
  ): String = {
    val series = collectSeries(graph(program, dp, ctx, maxDatapoints))
    val start = series.head._3
    val step = series.head._4
    def esc(s: String): String = "\"" + s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case '\n'         => "\\n"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    } + "\""
    // strict = the reference's std.json engine: non-finite values quoted
    // so any standard JSON parser accepts the payload
    def num(v: java.lang.Double): String = {
      val d = if (v == null) Double.NaN else v.doubleValue()
      val raw =
        if (d.isNaN) "NaN"
        else if (d.isPosInfinity) "Infinity"
        else if (d.isNegInfinity) "-Infinity"
        else return d.toString
      if (strict) "\"" + raw + "\"" else raw
    }
    val legend = series.map(s => esc(s._1)).mkString("[", ",", "]")
    val metrics = series.map { s =>
      s._2.toList.sortBy(_._1)
        .map { case (k, v) => s"${esc(k)}:${esc(v)}" }.mkString("{", ",", "}")
    }.mkString("[", ",", "]")
    val slots = series.head._5.length
    val values = (0 until slots).map { i =>
      series.map(s => num(s._5(i))).mkString("[", ",", "]")
    }.mkString("[", ",", "]")
    s"""{"start":$start,"step":$step,"legend":$legend,"metrics":$metrics,"values":$values,"notices":[]}"""
  }

  /** One entry point for every DATA format the reference's graph endpoint
    * serves (PNG rendering excluded): `csv` / `txt` (tab) /
    * `json` (classic, NaN unquoted) / `std.json` (strict) / `v2.json`
    * (newline-delimited TimeSeriesMessage rows — the SSE/fetch-consistent
    * encoding the reference's v2 engine targets). */
  def graphData(
      program: String,
      dp: DataFrame,
      ctx: EvalContext,
      format: String = "json",
      maxDatapoints: Int = 0
  ): String = format match {
    case "csv"      => graphCsv(program, dp, ctx, maxDatapoints, sep = ",")
    case "txt"      => graphCsv(program, dp, ctx, maxDatapoints, sep = "\t")
    case "json"     => graphJson(program, dp, ctx, maxDatapoints)
    case "std.json" => graphJson(program, dp, ctx, maxDatapoints, strict = true)
    case "v2.json" =>
      graph(program, dp, ctx, maxDatapoints)
        .collect().map(_.getString(0)).sorted.mkString("\n")
    case other => throw new IllegalArgumentException(
      s"unknown graph format '$other' (one of csv, txt, json, std.json, v2.json)")
  }

  // --- tags API (reference TagsApi.scala:44-100, TagIndex.findKeys/findValues) ---

  /** Distinct tag keys of series matching `q`, paged by `offset` cursor. */
  def tagKeys(dp: DataFrame, q: Query, limit: Int = 1000, offset: String = ""): DataFrame =
    dp.filter(QueryCompiler.compile(q, col("tags")))
      .select(explode(map_entries(col("tags"))).as("kv"))
      .filter(col("kv.value").isNotNull) // null-valued entries mean "tag absent"
      .select(col("kv.key").as("key"))
      .filter(col("key") > offset)
      .distinct()
      .orderBy(col("key"))
      .limit(limit)

  /** Distinct values of tag `k` on series matching `q`, paged. */
  def tagValues(dp: DataFrame, k: String, q: Query, limit: Int = 1000, offset: String = ""): DataFrame =
    dp.filter(QueryCompiler.compile(q, col("tags")))
      .select(col("tags").getItem(k).as("value"))
      .filter(col("value").isNotNull && col("value") > offset)
      .distinct()
      .orderBy(col("value"))
      .limit(limit)

  /** Distinct (key, value) pairs of matching series, paged by key,value cursor. */
  def tags(dp: DataFrame, q: Query, limit: Int = 1000, offsetKey: String = "", offsetValue: String = ""): DataFrame =
    dp.filter(QueryCompiler.compile(q, col("tags")))
      .select(explode(map_entries(col("tags"))).as("kv"))
      .select(col("kv.key").as("key"), col("kv.value").as("value"))
      .filter(col("value").isNotNull) // null-valued entries mean "tag absent"
      .filter(col("key") > offsetKey || (col("key") === offsetKey && col("value") > offsetValue))
      .distinct()
      .orderBy(col("key"), col("value"))
      .limit(limit)
}
