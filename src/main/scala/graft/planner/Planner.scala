package graft.planner

import graft.asl._
import graft.core._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Evaluated series lines in long format. One row per (line, grid slot with
 * data). Columns:
 *   - key:   string  — group key, "" for a single aggregate line, the full
 *                      series id for `:all` lines
 *   - tags:  map<string,string> — result tags of the line
 *   - t:     long    — interval start, epoch ms, aligned to `step`
 *   - value: double  — NaN only in dense frames (dense = every slot present)
 */
final case class SeriesFrame(
    df: DataFrame,
    grouping: List[String],
    step: Long,
    dense: Boolean
)

/** Compile a [[graft.asl.Query]] to a predicate on a `tags` map column. */
object QueryCompiler {

  def compile(q: Query, tags: Column): Column = q match {
    case Query.True                 => lit(true)
    case Query.False                => lit(false)
    case Query.HasKey(k)            => tags.getItem(k).isNotNull
    case Query.Equal(k, v)          => tags.getItem(k) === v
    case Query.LessThan(k, v)       => tags.getItem(k) < v
    case Query.LessThanEqual(k, v)  => tags.getItem(k) <= v
    case Query.GreaterThan(k, v)    => tags.getItem(k) > v
    case Query.GreaterThanEqual(k, v) => tags.getItem(k) >= v
    case Query.Regex(k, v)          => tags.getItem(k).rlike("^" + v)
    case Query.RegexIgnoreCase(k, v) => tags.getItem(k).rlike("(?i)^" + v)
    case Query.In(k, vs)            => tags.getItem(k).isin(vs: _*)
    case Query.And(a, b)            => compile(a, tags) && compile(b, tags)
    case Query.Or(a, b)             => compile(a, tags) || compile(b, tags)
    case Query.Not(sub)             =>
      // tags[k] missing -> predicate null -> NOT null stays null -> filtered
      // out, which matches the reference: a series without the key matches
      // :not of a key query (Query.scala Not.matches) only if the inner
      // predicate is false, so coalesce the inner to false first.
      !coalesce(compile(sub, tags), lit(false))
  }
}

/**
 * Compiles [[graft.asl.TimeSeriesExpr]] trees to Spark DataFrame plans over a
 * canonical datapoint frame with columns `tags: map<string,string>`,
 * `ts: long (epoch ms)`, `value: double`.
 *
 * Scale notes: the heavy lifting (filter + first-level aggregate) is a single
 * groupBy over the raw scan — predicate and column pruning reach the parquet
 * scan because `tags` is constructed per source in graft.sources from plain
 * columns, so Catalyst sees the underlying column filters. Everything after
 * the first aggregate operates on series lines (cardinality = number of
 * series, not datapoints), so the joins/windows downstream are cheap and the
 * evaluated frames per DataExpr are reused across the expression tree (CSE
 * like the reference's GraphApi.DataRequest).
 */
object Planner {

  import NanMath._

  private val KEY = "key"
  private val TAGS = "tags"
  private val T = "t"
  private val V = "value"

  /**
   * Deterministic hash-of-timestamp noise in [0, 1) (reference
   * MathExpr.scala Random/SeededRandom: a pure function of slot time and
   * seed, NOT `rand()`). Two rounds of universal hashing with every
   * intermediate bounded well inside int64, so the DuckDB oracle reproduces
   * it exactly with plain modular arithmetic (no xxhash64 there) and ANSI
   * overflow checks can never trip.
   */
  def noiseCol(t: Column, seed: Long): Column = {
    val h1 = (t % lit(1000003L)) * lit(2654435761L) + lit((seed * 40503L) % 2147483647L)
    val h2 = (h1 % lit(2147483647L)) * lit(48271L)
    (h2 % lit(1000000007L)).cast("double") / lit(1000000007.0)
  }

  /** Canonical series id: sorted `k=v` pairs joined by commas (null-valued
    * entries = absent tags, skipped). A native codegen expression — the HOF
    * formulation (array_join/transform/array_sort) is CodegenFallback and
    * this runs per raw datapoint in every fetch (graft.functions.SeriesIdExpr). */
  def seriesId(tags: Column): Column = {
    import org.apache.spark.sql.graftbridge.GraftBridge
    GraftBridge.column(graft.functions.SeriesIdExpr(GraftBridge.expression(tags)))
  }

  /** Reference to an extracted group-key column; quoted because tag keys
    * routinely contain dots (nf.cluster) that a bare col() would parse as
    * a nested-field path. */
  private def gkCol(k: String): Column = col("`gk_" + k + "`")

  /** Group key from tag values for `keys`, canonicalized by sorting keys. */
  private def mkKey(keys: Seq[String], tags: Column): Column =
    concat_ws(",", keys.sorted.map(k => concat(lit(k + "="), tags.getItem(k))): _*)

  private def tagsLit(m: Map[String, String]): Column =
    if (m.isEmpty) map()
    else map(m.toSeq.sortBy(_._1).flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)

  def eval(expr: TimeSeriesExpr, dp: DataFrame, ctx: EvalContext): SeriesFrame = {
    val spark = dp.sparkSession
    new Evaluator(spark, dp, ctx, None).eval(expr)
  }

  /**
   * Store-backed evaluation — the default query path over a physical
   * deployment: every DataExpr fetch resolves its predicate on the series
   * catalog and is served from the coarsest aligned rollup automatically
   * (reference MemoryDatabase.executeImpl + blockAggr,
   * db/MemoryDatabase.scala:207-229). Callers pass only the backend; no
   * hand-wired readIndexed/readBest calls.
   */
  def eval(expr: TimeSeriesExpr, backend: graft.sources.StoreBackend,
      ctx: EvalContext): SeriesFrame =
    new Evaluator(backend.spark, backend.raw, ctx, Some(backend)).eval(expr)

  /**
   * Evaluate several expressions against one datapoint frame with a SHARED
   * common-subexpression cache (the reference dedups DataExprs across a
   * whole graph request — GraphApi DataRequest — so two plotted expressions
   * over the same fetch share one scan+aggregate; a per-expression cache
   * would replan the fetch for every line on the graph).
   */
  def evalAll(exprs: Seq[TimeSeriesExpr], dp: DataFrame, ctx: EvalContext): Seq[SeriesFrame] = {
    val spark = dp.sparkSession
    val shared = new Evaluator(spark, dp, ctx, None)
    exprs.map(shared.eval)
  }

  /** Store-backed variant of [[evalAll]]: one shared CSE cache, every fetch
    * index-resolved and rollup-routed through the backend. */
  def evalAll(exprs: Seq[TimeSeriesExpr], backend: graft.sources.StoreBackend,
      ctx: EvalContext): Seq[SeriesFrame] = {
    val shared = new Evaluator(backend.spark, backend.raw, ctx, Some(backend))
    exprs.map(shared.eval)
  }

  /** Sparse output table for the driver/oracle: tag columns + t + value.
    * The RoundEps shift keeps round-half ties deterministic across engines. */
  def output(f: SeriesFrame, tagCols: Seq[String], roundTo: Int = 4): DataFrame = {
    val cols = tagCols.map(k => col(TAGS).getItem(k).as(k)) ++
      Seq(col(T), round(col(V) + NanMath.RoundEps, roundTo).as(V))
    f.df.filter(!isnan(col(V)) && col(V).isNotNull).select(cols: _*)
  }

  // -------------------------------------------------------------------------

  private final class Evaluator(spark: SparkSession, dp: DataFrame, ctx: EvalContext,
      backend: Option[graft.sources.StoreBackend]) {

    // Pre-keyed frames (graft.sources.Store bucketed tables) carry the
    // series id as a materialized `key` column; grouping on the ATTRIBUTE
    // lets the scan's bucket partitioning satisfy the normalization
    // aggregate's distribution (no shuffle over raw datapoints) — a
    // recomputed seriesId(tags) expression would not match the bucketing.
    private val seriesKey: Column =
      if (dp.columns.contains(KEY)) col(KEY) else seriesId(col(TAGS))

    // Pre-aggregated rollup frames (graft.sources.Rollup) carry per-slot
    // (sum, count, min, max) columns instead of raw values; each slot
    // consolidation function reads its matching column (reference
    // MemoryDatabase.blockAggr serving read modes from RollupBlock).
    // Whether the SHARED frame is a pre-aggregated rollup (per-fetch
    // routing recomputes this on the resolved frame inside evalData; this
    // one guards paths that need the raw per-datapoint `value` column).
    private val isRollup: Boolean = dp.columns.contains("v_sum")

    // Common-subexpression elimination over the WHOLE tree: structural
    // equality of expression nodes -> the same SeriesFrame (and Spark plan
    // subtree, so exchanges are reused). Macros like :stddev reference their
    // input four times; without this each reference replans the fetch.
    private val evalCache = scala.collection.mutable.Map.empty[TimeSeriesExpr, SeriesFrame]

    // Environment for resolving :stat-* placeholders inside :filter.
    private var statEnv: Option[SeriesFrame] = None

    // :stat-* resolution depends on the enclosing :filter's environment, so
    // subtrees containing a StatExpr must not be memoized across filters.
    private def containsStat(e: Any): Boolean = e match {
      case _: FilterExpr.StatExpr => true
      case p: Product             => p.productIterator.exists(containsStat)
      case _                      => false
    }

    def eval(expr: TimeSeriesExpr): SeriesFrame =
      if (containsStat(expr)) evalImpl(expr)
      else evalCache.getOrElseUpdate(expr, evalImpl(expr))

    private def evalImpl(expr: TimeSeriesExpr): SeriesFrame = expr match {
      case d: DataExpr          => evalData(d)
      case m: MathExpr.Constant => constant(lit(m.v), Map("name" -> m.v.toString))
      case m: MathExpr.SeededRandom =>
        constant(noiseCol(col(T), m.seed), Map("name" -> "random"))
      case m: MathExpr.Time     => evalTime(m)
      case m: MathExpr.TimeSpan =>
        constant(
          when(col(T) >= m.s && col(T) <= m.e, 1.0).otherwise(0.0),
          Map("name" -> "time-span")
        )
      case MathExpr.ClampMin(e, v) =>
        mapValue(eval(e), c => when(isnan(c), c).otherwise(greatest(c, lit(v))))
      case MathExpr.ClampMax(e, v) =>
        mapValue(eval(e), c => when(isnan(c), c).otherwise(least(c, lit(v))))
      case MathExpr.Unary(op, e) =>
        val f: Column => Column = op match {
          case MathExpr.UnaryOp.Abs    => abs(_)
          case MathExpr.UnaryOp.Negate => c => -c
          case MathExpr.UnaryOp.Sine   => sin(_)
          case MathExpr.UnaryOp.Sqrt   => sqrt(_)
        }
        mapValue(eval(e), f)
      case MathExpr.PerStep(e) =>
        mapValue(eval(e), c => c * lit(ctx.step / 1000.0))
      case b: MathExpr.Binary   => tryFuseArith(b).getOrElse(evalBinary(b))
      case a: MathExpr.Aggr     => evalAggr(a)
      case g: MathExpr.GroupBy  => evalMathGroupBy(g)
      case MathExpr.NamedRewrite(_, inner) => eval(inner)
      case MathExpr.As(e, orig, repl) =>
        val f = eval(e)
        val grouping = f.grouping.map(k => if (k == orig) repl else k)
        val renamed = f.df
          .withColumn(TAGS,
            map_from_entries(transform(map_entries(col(TAGS)),
              kv => struct(
                when(kv.getField("key") === orig, repl)
                  .otherwise(kv.getField("key")).as("key"),
                kv.getField("value").as("value")))))
          .withColumn(KEY, mkKey(grouping, col(TAGS)))
        SeriesFrame(renamed, grouping, f.step, f.dense)
      case p: MathExpr.Percentiles    => evalPercentiles(p)
      case a: MathExpr.ApproxDistinct => evalApproxDistinct(a)
      case s: StatefulExpr      => evalStateful(s)
      case f: FilterExpr.Stat   => evalStat(f)
      case FilterExpr.StatExpr(stat) =>
        statEnv match {
          case Some(env) => statLines(env, stat)
          case None =>
            // a bare :stat-* outside :filter evaluates to no lines
            // (reference FilterExpr.scala:85-87: empty ResultSet)
            val empty = constant(lit(0.0), Map.empty)
            SeriesFrame(empty.df.limit(0), Nil, ctx.step, dense = false)
        }
      case f: FilterExpr.Filter => evalFilter(f)
      case p: FilterExpr.PriorityFilter => evalPriority(p)
      case c: FilterExpr.Consolidate   => evalConsolidate(c)
      case s: StyleExpr         => evalStyle(s)
    }

    // ---- grid / dense helpers ----

    private def gridDF: DataFrame =
      spark.range(ctx.bufferSize)
        .select((lit(ctx.start) + col("id") * lit(ctx.step)).as(T))

    private def constant(valueCol: Column, tags: Map[String, String]): SeriesFrame = {
      val df = gridDF.select(
        lit("").as(KEY),
        tagsLit(tags).as(TAGS),
        col(T),
        valueCol.cast("double").as(V)
      )
      SeriesFrame(df, Nil, ctx.step, dense = true)
    }

    private def densify(f: SeriesFrame): SeriesFrame =
      if (f.dense) f
      else {
        // One pass over the line frame, no self-join: fold each line to a
        // slot->value map (bounded by the request's grid size), project the
        // dense values array, and explode it with its slot index. The
        // previous formulation LEFT-joined a key-grid (dropDuplicates of
        // the frame) against the frame itself; column pruning made the two
        // subtrees differ, exchange reuse never fired, and the WHOLE fetch
        // — parquet scan plus the datapoint-cardinality normalize exchange
        // — executed twice for every densified expression. The transform
        // lambda runs interpreted, but over line-cardinality rows (once
        // per output slot), not datapoints.
        val slots = sequence(lit(ctx.start), lit(ctx.end - f.step), lit(f.step))
        val dense = f.df
          .groupBy(col(KEY))
          .agg(
            first(col(TAGS)).as(TAGS),
            map_from_arrays(collect_list(col(T)), collect_list(col(V))).as("_m"))
          .select(col(KEY), col(TAGS),
            transform(slots, t => element_at(col("_m"), t)).as("_vs"))
          .select(col(KEY), col(TAGS), posexplode(col("_vs")).as(Seq("_i", "_v")))
          .select(col(KEY), col(TAGS),
            (lit(ctx.start) + col("_i") * lit(f.step)).as(T),
            nullToNan(col("_v")).as(V))
        SeriesFrame(dense, f.grouping, f.step, dense = true)
      }

    private def mapValue(f: SeriesFrame, fn: Column => Column): SeriesFrame =
      f.copy(df = f.df.withColumn(V, fn(col(V)).cast("double")))

    // ---- data layer ----

    // Slot consolidation function of a data expr: sum by default
    // (norm/SumValueFunction), or an explicit :cf-* (DataExpr.Consolidation).
    private def cfOf(a: DataExpr): String = a match {
      case DataExpr.Consolidation(_, cf) => cf
      case DataExpr.GroupBy(af, _)       => cfOf(af)
      case _                             => "sum"
    }

    private def evalData(d: DataExpr): SeriesFrame = {
      val off = ctx.alignedOffset(d.offset)
      val fetch = ctx.withOffset(off)
      // With a store backend the fetch is resolved per data expr — index
      // semi-join on the series catalog plus coarsest-aligned-rollup
      // selection — and the frame arrives complete for the predicate (tag
      // predicates are per-series), so it is NOT re-applied per datapoint.
      val (src, preFiltered) = backend match {
        case Some(b) => (b.fetch(d.query, ctx.step, fetch.start, fetch.end), true)
        case None    => (dp, false)
      }
      val srcKey =
        if (src.columns.contains(KEY)) col(KEY) else seriesId(col(TAGS))
      val srcRollup = src.columns.contains("v_sum")
      val ranged = src.filter(col("ts") >= fetch.start && col("ts") < fetch.end)
      val base =
        (if (preFiltered) ranged
         else ranged.filter(QueryCompiler.compile(d.query, col(TAGS))))
          .withColumn(T, col("ts") - pmod(col("ts"), lit(ctx.step)) + lit(off))

      // Ingest normalization: one value per (series, slot); datapoints within
      // a slot merge with the consolidation function. On a rollup frame the
      // same statistics re-compose from the pre-aggregated columns — sum of
      // sums, min of mins, avg as sum/count — exactly (each CF is
      // self-decomposable), so the answer is bit-identical to the raw scan.
      val normAgg = cfOf(d) match {
        case "avg" if srcRollup => sum(col("v_sum")) / sum(col("v_count"))
        case "min" if srcRollup => min(col("v_min"))
        case "max" if srcRollup => max(col("v_max"))
        case _ if srcRollup     => sum(col("v_sum"))
        case "avg"              => avg(col(V))
        case "min"              => min(col(V))
        case "max"              => max(col(V))
        case _                  => sum(col(V))
      }
      d match {
        case DataExpr.All(_, _) =>
          val norm = base
            .groupBy(srcKey.as(KEY), col(T))
            .agg(normAgg.as(V), first(col(TAGS)).as(TAGS))
          SeriesFrame(norm.select(col(KEY), col(TAGS), col(T), col(V)), Nil, ctx.step, dense = false)

        case af: DataExpr.AggregateFunction =>
          val norm = base
            .groupBy(srcKey.as(KEY), col(T))
            .agg(normAgg.as(V))
          val agg = aggColFor(af)
          val out = norm
            .groupBy(col(T))
            .agg(agg.as(V))
            .filter(col(V).isNotNull)
            .select(lit("").as(KEY), tagsLit(d.query.exactTags).as(TAGS), col(T), col(V))
          SeriesFrame(out, Nil, ctx.step, dense = false)

        case DataExpr.GroupBy(af, keys) =>
          // Series missing any group key are dropped (DataExpr.scala:108-122).
          // Group-key columns are extracted BEFORE the normalization
          // aggregate and ride along as grouping keys (they are constant
          // within a series, so the groups are unchanged): carrying the tags
          // map itself through `first(map)` would force the whole
          // normalization into SortAggregate + two sorts — map-typed
          // aggregation buffers are not hash-aggregatable.
          val present = keys.map(k => col(TAGS).getItem(k).isNotNull).reduce(_ && _)
          val kcols = keys.map(k => col(TAGS).getItem(k).as(s"gk_$k"))
          val norm = base
            .filter(present)
            .groupBy(srcKey.as(KEY) +: kcols :+ col(T): _*)
            .agg(normAgg.as(V))
          val agg = aggColFor(af)
          val grouped = norm
            .groupBy(keys.map(k => gkCol(k)) :+ col(T): _*)
            .agg(agg.as(V))
            .filter(col(V).isNotNull)
          val tagEntries = d.query.exactTags -- keys
          val tagsCol = map_concat(
            tagsLit(tagEntries),
            map(keys.flatMap(k => Seq(lit(k), gkCol(k))): _*)
          )
          val keyCol = concat_ws(",",
            keys.sorted.map(k => concat(lit(k + "="), gkCol(k))): _*)
          val out = grouped.select(keyCol.as(KEY), tagsCol.as(TAGS), col(T), col(V))
          SeriesFrame(out, keys, ctx.step, dense = false)
      }
    }

    private def aggColFor(af: DataExpr.AggregateFunction): Column = af match {
      case _: DataExpr.Sum                => sumNaN(col(V))
      case _: DataExpr.Count              => countNaN(col(V))
      case _: DataExpr.Min                => minNaNAgg(col(V))
      case _: DataExpr.Max                => maxNaNAgg(col(V))
      case DataExpr.Consolidation(af2, _) => aggColFor(af2)
    }

    // ---- math layer ----

    private def evalTime(m: MathExpr.Time): SeriesFrame =
      constant(timeValue(m.mode, col(T)), Map("name" -> m.mode))

    /** Calendar field of a slot timestamp column, always in UTC: the
      * reference evaluates :time with a fixed-UTC calendar regardless of the
      * request zone (MathExpr.Time.usingCalendar, MathExpr.scala:214-216 —
      * ZoneOffset.UTC hardcoded); only :time-span and date PARSING are
      * zone-aware (the tz interpreter variable). Full reference mode grammar
      * (MathExpr.scala:179-213). Unit modes are FRACTIONAL divisions of
      * epoch millis, like the reference's sinceEpoch — zone-independent. */
    private def timeValue(mode0: String, t: Column): Column = {
      val ts = timestamp_seconds(t / 1000L)
      val v: Column = MathExpr.Time.normalize(mode0) match {
        case "secondOfMinute"    => second(ts)
        case "secondOfDay"       => hour(ts) * 3600 + minute(ts) * 60 + second(ts)
        case "minuteOfHour"      => minute(ts)
        case "minuteOfDay"       => hour(ts) * 60 + minute(ts)
        case "hourOfDay"         => hour(ts)
        // ISO day-of-week 1=Mon..7=Sun; Spark dayofweek is 1=Sun..7=Sat.
        case "dayOfWeek"         => pmod(dayofweek(ts) + lit(5), lit(7)) + lit(1)
        case "dayOfMonth"        => dayofmonth(ts)
        case "dayOfYear"         => dayofyear(ts)
        case "monthOfYear"       => month(ts)
        case "yearOfCentury"     => year(ts)
        case "yearOfEra"         => year(ts)
        case "seconds"           => t.cast("double") / lit(1000.0)
        case "minutes"           => t.cast("double") / lit(60000.0)
        case "hours"             => t.cast("double") / lit(3600000.0)
        case "days"              => t.cast("double") / lit(86400000.0)
        case "weeks"             => t.cast("double") / lit(604800000.0)
        case "secondsSinceEpoch" => t / 1000L
      }
      v.cast("double")
    }

    private def binOpCol(op: MathExpr.BinOp): (Column, Column) => Column = op match {
      case MathExpr.BinOp.Add  => addCol
      case MathExpr.BinOp.Sub  => subCol
      case MathExpr.BinOp.Mul  => mulCol
      case MathExpr.BinOp.Div  => divCol
      case MathExpr.BinOp.Pow  => powCol
      case MathExpr.BinOp.FAdd => faddCol
      case MathExpr.BinOp.FSub => fsubCol
      case MathExpr.BinOp.FMul => fmulCol
      case MathExpr.BinOp.FDiv => fdivCol
      case MathExpr.BinOp.Gt   => gtCol
      case MathExpr.BinOp.Ge   => geCol
      case MathExpr.BinOp.Lt   => ltCol
      case MathExpr.BinOp.Le   => leCol
      case MathExpr.BinOp.And  => andCol
      case MathExpr.BinOp.Or   => orCol
    }

    /**
     * Grid-defined expressions (value is a pure function of the slot time):
     * applied as column expressions instead of joining a generated grid
     * frame — a `:gt 200` signal or `:pow 0.5` costs a projection, not a
     * join. Returns (value-of-t function, display tags).
     */
    private def gridFn(e: TimeSeriesExpr): Option[(Column => Column, Map[String, String])] =
      e match {
        case MathExpr.Constant(v) => Some((_ => lit(v), Map("name" -> v.toString)))
        case MathExpr.SeededRandom(seed) =>
          Some((t => noiseCol(t, seed), Map("name" -> "random")))
        case MathExpr.Time(mode) => Some((t => timeValue(mode, t), Map("name" -> mode)))
        case MathExpr.TimeSpan(s, en) =>
          Some((t => when(t >= s && t <= en, 1.0).otherwise(0.0), Map("name" -> "time-span")))
        case MathExpr.NamedRewrite(_, inner) => gridFn(inner)
        case _ => None
      }

    /**
     * Multi-aggregate fusion for arithmetic trees whose leaves are all
     * single-line aggregates (the :avg/:stddev/:dist-* macro shapes, and
     * plain binary math over ungrouped fetches): instead of evaluating each
     * aggregate leaf as its own groupBy and joining the resulting lines, run
     * ONE aggregation producing one column per leaf and apply the arithmetic
     * as a projection. Two homogeneous forms:
     *
     *  - DataExpr leaves (e.g. `:avg` = Sum(q)/Count(q), `:dist-stddev` over
     *    statistic=... filters): one scan over the OR of the leaf queries,
     *    one series-normalization, one groupBy(t) with per-leaf
     *    conditionally-filtered aggregates — N fetch+aggregate pipelines and
     *    their joins collapse into a single pass over the data. At 100 TB
     *    this is the difference between N scans and 1.
     *  - math Aggr leaves over one shared grouped frame (`:stddev` =
     *    sqrt((N·Σx² − (Σx)²)/N²)): the shared frame evaluates once (CSE)
     *    and all leaf aggregates (including the Σx² self-product) come out
     *    of one groupBy(t).
     *
     * NaN-strict/forgiving ARITHMETIC ops fuse sparse: a slot with no data
     * on some leaf produces exactly what the dense-grid join path produces
     * (the NaN-aware column ops treat null-as-NaN leaves identically), and
     * slots absent on every leaf stay absent (downstream densify restores
     * them as NaN, which is what the op chain would yield from all-NaN
     * inputs). Comparison/boolean ops (and :pow, via pow(NaN,0)=1) can turn
     * all-NaN slots into 0/1 signals, so a tree containing one LEFT-joins
     * the time grid after the fused aggregate — line-cardinality work — and
     * renders the op chain over null-as-NaN inputs, reproducing the dense
     * path bit-for-bit without its per-side scan+normalize pipelines.
     */
    private def tryFuseArith(root: MathExpr.Binary): Option[SeriesFrame] = {
      import MathExpr._
      val sparseOps: Set[BinOp] = Set(
        BinOp.Add, BinOp.Sub, BinOp.Mul, BinOp.Div,
        BinOp.FAdd, BinOp.FSub, BinOp.FMul, BinOp.FDiv)
      val gridOps: Set[BinOp] = Set(
        BinOp.Gt, BinOp.Ge, BinOp.Lt, BinOp.Le,
        BinOp.And, BinOp.Or, BinOp.Pow)
      var needsGrid = false

      sealed trait N
      final case class Leaf(idx: Int) extends N
      final case class Const(v: Double) extends N
      final case class Node(op: BinOp, l: N, r: N) extends N

      val dataLeaves = scala.collection.mutable.ArrayBuffer.empty[DataExpr.AggregateFunction]
      val aggrLeaves = scala.collection.mutable.ArrayBuffer.empty[(AggrOp, Boolean)]
      var aggrBase: Option[TimeSeriesExpr] = None
      var mode = 0 // 0 unknown, 1 data leaves, 2 aggr leaves
      var firstTags: Option[Map[String, String]] = None

      def walk(e: TimeSeriesExpr): Option[N] = e match {
        case Constant(v)            => Some(Const(v))
        case NamedRewrite(_, inner) => walk(inner)
        case Binary(op, l, r) if sparseOps(op) || gridOps(op) =>
          if (gridOps(op)) needsGrid = true
          for { ln <- walk(l); rn <- walk(r) } yield Node(op, ln, rn)
        case d @ (_: DataExpr.Sum | _: DataExpr.Count | _: DataExpr.Min | _: DataExpr.Max)
            if mode != 2 =>
          val af = d.asInstanceOf[DataExpr.AggregateFunction]
          mode = 1
          if (firstTags.isEmpty) firstTags = Some(af.query.exactTags)
          val i = dataLeaves.indexOf(af)
          if (i >= 0) Some(Leaf(i))
          else { dataLeaves += af; Some(Leaf(dataLeaves.size - 1)) }
        case a: Aggr if mode != 1 =>
          val (base, squared) = a.expr match {
            case Binary(BinOp.Mul, x, y) if x == y => (x, true)
            case x                                 => (x, false)
          }
          if (aggrBase.exists(_ != base)) None
          else {
            mode = 2
            aggrBase = Some(base)
            if (firstTags.isEmpty) firstTags = Some(a.expr.exactTags)
            val leaf = (a.op, squared)
            val i = aggrLeaves.indexOf(leaf)
            if (i >= 0) Some(Leaf(i))
            else { aggrLeaves += leaf; Some(Leaf(aggrLeaves.size - 1)) }
          }
        case _ => None
      }

      def render(n: N): Column = n match {
        case Leaf(i)        => nullToNan(col(s"_f$i"))
        case Const(v)       => lit(v)
        case Node(op, l, r) => binOpCol(op)(render(l), render(r))
      }

      walk(root).flatMap { tree =>
        // Sparse emit for pure-arithmetic trees; grid-complete emit (cheap —
        // the grid and the fused line are both slot-cardinality) when a
        // comparison/boolean/:pow node needs all-NaN slots materialized.
        def emit(grouped: DataFrame): SeriesFrame = {
          val withGrid =
            if (needsGrid) gridDF.join(grouped, Seq(T), "left") else grouped
          val out = withGrid.select(
            lit("").as(KEY),
            tagsLit(firstTags.getOrElse(Map.empty)).as(TAGS),
            col(T),
            render(tree).cast("double").as(V))
          SeriesFrame(out, Nil, ctx.step, dense = needsGrid)
        }
        if (mode == 1 && dataLeaves.size >= 2 && !isRollup) {
          val ds = dataLeaves.toList
          val offset = ctx.alignedOffset(ds.head.offset)
          if (!ds.forall(d => ctx.alignedOffset(d.offset) == offset && cfOf(d) == "sum")) None
          else {
            val fetch = ctx.withOffset(offset)
            val combined = ds.map(_.query).distinct.reduce((a, b) => Query.Or(a, b): Query)
            // Per-leaf conditional values are projected at the SCAN, before
            // normalization: the leaf predicates are per-series, so
            // when(pred, v) commutes with the per-series slot sum, and no
            // tags map has to survive an aggregate (first(map) would force
            // SortAggregate for the whole normalization). With a store
            // backend the OR of the leaf predicates resolves on the series
            // catalog (raw store — leaf projection needs per-datapoint
            // values); the per-leaf when() still runs on the matching
            // datapoints to split them between leaves.
            val src = backend match {
              case Some(b) => b.fetchRaw(combined)
              case None =>
                dp.filter(QueryCompiler.compile(combined, col(TAGS)))
            }
            val base = src
              .filter(col("ts") >= fetch.start && col("ts") < fetch.end)
              .withColumn(T, col("ts") - pmod(col("ts"), lit(ctx.step)) + lit(offset))
            val leafVals = ds.zipWithIndex.map { case (d, i) =>
              when(QueryCompiler.compile(d.query, col(TAGS)), col(V)).as(s"_v$i")
            }
            val norm = base
              .select(seriesKey.as(KEY) +: col(T) +: leafVals: _*)
              .groupBy(col(KEY), col(T))
              .agg(
                sum(col("_v0")).as("_v0"),
                ds.indices.tail.map(i => sum(col(s"_v$i")).as(s"_v$i")): _*)
            val aggCols = ds.zipWithIndex.map { case (d, i) =>
              val v = col(s"_v$i")
              val agg = d match {
                case _: DataExpr.Sum   => sumNaN(v)
                case _: DataExpr.Count => countNaN(v)
                case _: DataExpr.Min   => minNaNAgg(v)
                case _: DataExpr.Max   => maxNaNAgg(v)
                case other             => throw new IllegalStateException(other.toString)
              }
              agg.as(s"_f$i")
            }
            val grouped = norm.groupBy(col(T)).agg(aggCols.head, aggCols.tail: _*)
            Some(emit(grouped))
          }
        } else if (mode == 2 && aggrLeaves.size >= 2) {
          val f = eval(aggrBase.get)
          val aggCols = aggrLeaves.toList.zipWithIndex.map { case ((op, squared), i) =>
            val v = if (squared) col(V) * col(V) else col(V) // NaN propagates
            val agg = op match {
              case AggrOp.Sum   => sumNaN(v)
              case AggrOp.Count => countNaN(v)
              case AggrOp.Min   => minNaNAgg(v)
              case AggrOp.Max   => maxNaNAgg(v)
            }
            agg.as(s"_f$i")
          }
          val grouped = f.df.groupBy(col(T)).agg(aggCols.head, aggCols.tail: _*)
          Some(emit(grouped))
        } else None
      }
    }

    /**
     * Binary op: dense-align both sides on the grid, then match lines — by
     * subset group key when both sides are grouped (hash-join semantics of
     * MathExpr.scala:456-576), by slot only when one side is a single line.
     * Grid-defined and identical sides shortcut to projections (no join).
     *
     * Fast path for NaN-strict ops (:mul/:div — a slot missing on either
     * side yields NaN): skip densification entirely and inner-join the
     * sparse frames; the slots a dense plan would turn into NaN are exactly
     * the slots the sparse join omits, and densify() downstream restores
     * them as NaN on demand. This is the hot path — :avg/:pct/:stddev all
     * expand to :div chains — and saves two grid joins (4 shuffles) per op.
     * :pow stays dense (pow(NaN, 0) = 1), as do forgiving/compare/boolean
     * ops (missing slots produce non-NaN values).
     */
    private def evalBinary(b: MathExpr.Binary): SeriesFrame = {
      val strictNaN =
        b.op == MathExpr.BinOp.Mul || b.op == MathExpr.BinOp.Div
      def aligned(e: TimeSeriesExpr): SeriesFrame =
        if (strictNaN) eval(e) else densify(eval(e))
      val opC = binOpCol(b.op)
      (gridFn(b.expr1), gridFn(b.expr2)) match {
        case (Some((g1f, tags1)), Some((g2f, _))) =>
          return constant(opC(g1f(col(T)), g2f(col(T))), tags1)
        case (None, Some((g2f, _))) =>
          val f = aligned(b.expr1)
          return f.copy(df = f.df.withColumn(V, opC(col(V), g2f(col(T))).cast("double")))
        case (Some((g1f, _)), None) =>
          val f = aligned(b.expr2)
          return f.copy(df = f.df.withColumn(V, opC(g1f(col(T)), col(V)).cast("double")))
        case _ if b.expr1 == b.expr2 =>
          // self-op (e.g. the x*x inside :stddev): pointwise, no join
          val f = aligned(b.expr1)
          return f.copy(df = f.df.withColumn(V, opC(col(V), col(V)).cast("double")))
        case _ => ()
      }
      val f1 = aligned(b.expr1)
      val f2 = aligned(b.expr2)
      val g1 = f1.grouping
      val g2 = f2.grouping
      val op = binOpCol(b.op)

      // An ungrouped side that is not a raw :all fetch is ONE line — at most
      // bufferSize (slot-count) rows regardless of data volume — so it is
      // always the broadcast side of the slot join; the grouped side then
      // never shuffles. :all is the one ungrouped multi-line shape.
      def oneLine(e: TimeSeriesExpr, g: List[String]): Boolean = {
        def hasAll(x: Any): Boolean = x match {
          case _: DataExpr.All => true
          case p: Product      => p.productIterator.exists(hasAll)
          case _               => false
        }
        g.isEmpty && !hasAll(e)
      }

      val lhs0 = f1.df.select(
        col(KEY).as("k1"), col(TAGS).as("tags1"), col(T), col(V).as("v1"))
      val rhs0 = f2.df.select(
        col(KEY).as("k2"), col(TAGS).as("tags2"), col(T).as("t2"), col(V).as("v2"))
      val lhs = if (oneLine(b.expr1, g1) && !oneLine(b.expr2, g2)) broadcast(lhs0) else lhs0
      val rhs = if (oneLine(b.expr2, g2)) broadcast(rhs0) else rhs0

      def finish(df: DataFrame, keyC: Column, tagsC: Column, grouping: List[String]) =
        SeriesFrame(
          df.select(keyC.as(KEY), tagsC.as(TAGS), col(T),
            op(nullToNan(col("v1")), nullToNan(col("v2"))).cast("double").as(V)),
          grouping, ctx.step, dense = !strictNaN)

      if (g1.nonEmpty && g2.nonEmpty) {
        if (g2.forall(g1.contains) && g1.size >= g2.size) {
          // rhs keys subset of lhs: probe rhs lines by subset key from lhs tags
          val j = lhs.join(rhs,
            mkKey(g2, col("tags1")) === col("k2") && col(T) === col("t2"))
          finish(j, col("k1"), col("tags1"), g1)
        } else {
          // lhs subset of rhs: keep tags from the grouped rhs (MathExpr.scala:556-560)
          val j = lhs.join(rhs,
            col("k1") === mkKey(g1, col("tags2")) && col(T) === col("t2"))
          finish(j, col("k2"), col("tags2"), g2)
        }
      } else if (g1.nonEmpty) {
        val j = lhs.join(rhs, col(T) === col("t2"))
        finish(j, col("k1"), col("tags1"), g1)
      } else if (g2.nonEmpty) {
        val j = lhs.join(rhs, col(T) === col("t2"))
        finish(j, col("k2"), col("tags2"), g2)
      } else {
        val j = lhs.join(rhs, col(T) === col("t2"))
        finish(j, col("k1"), col("tags1"), Nil)
      }
    }

    private def evalAggr(a: MathExpr.Aggr): SeriesFrame = {
      val f = eval(a.expr)
      val agg = a.op match {
        case MathExpr.AggrOp.Sum   => sumNaN(col(V))
        case MathExpr.AggrOp.Count => countNaN(col(V))
        case MathExpr.AggrOp.Min   => minNaNAgg(col(V))
        case MathExpr.AggrOp.Max   => maxNaNAgg(col(V))
      }
      val out = f.df
        .groupBy(col(T))
        .agg(agg.as(V))
        .filter(col(V).isNotNull)
        .select(lit("").as(KEY), tagsLit(a.expr.exactTags).as(TAGS), col(T), col(V))
      SeriesFrame(out, Nil, ctx.step, dense = false)
    }

    private def evalMathGroupBy(g: MathExpr.GroupBy): SeriesFrame = {
      val f = eval(g.aggr.expr)
      val keys = g.keys
      val agg = g.aggr.op match {
        case MathExpr.AggrOp.Sum   => sumNaN(col(V))
        case MathExpr.AggrOp.Count => countNaN(col(V))
        case MathExpr.AggrOp.Min   => minNaNAgg(col(V))
        case MathExpr.AggrOp.Max   => maxNaNAgg(col(V))
      }
      val kcols = keys.map(k => col(TAGS).getItem(k).as(s"gk_$k"))
      val grouped = f.df
        .groupBy(kcols :+ col(T): _*)
        .agg(agg.as(V))
        .filter(col(V).isNotNull)
      val tagsCol = map(keys.flatMap(k => Seq(lit(k), gkCol(k))): _*)
      val keyCol = concat_ws(",",
        keys.sorted.map(k => concat(lit(k + "="), gkCol(k))): _*)
      val out = grouped.select(keyCol.as(KEY), tagsCol.as(TAGS), col(T), col(V))
      SeriesFrame(out, keys, ctx.step, dense = false)
    }

    // ---- sketch layer (:percentiles / :approx-distinct) ----

    /**
     * Percentile estimation from bucket-counter series (reference
     * MathExpr.scala:933-1026): per (group, slot), walk the cumulative
     * bucket counts and linearly interpolate within the bucket where the
     * requested percentile falls. All column arithmetic over the evaluated
     * series frame (cardinality = buckets x slots, not datapoints), with
     * one window over (group, slot) and no extra shuffle beyond it.
     */
    private def evalPercentiles(p: MathExpr.Percentiles): SeriesFrame = {
      import graft.functions.PercentileBuckets
      val inner = eval(p.expr)
      val groupKeys = p.expr.keys.filterNot(_ == "percentile")
      val gkCols = groupKeys.map(k => gkCol(k))

      val bucketTag = col(TAGS).getItem("percentile")
      val idx = conv(substring(bucketTag, 2, 4), 16, 10).cast("long")
      val isTimer = substring(bucketTag, 1, 1) === "T"
      // non-finite counts are treated as 0 (MathExpr.scala:998)
      val cnt = when(isnan(col(V)) || col(V).isNull, 0.0).otherwise(col(V))

      val base = inner.df.select(
        groupKeys.map(k => col(TAGS).getItem(k).as(s"gk_$k")) ++
          Seq(col(T), idx.as("_idx"), isTimer.as("_timer"), cnt.as("_c")): _*)

      val wOrd = Window.partitionBy(gkCols :+ col(T): _*).orderBy(col("_idx"))
      val wAll = Window.partitionBy(gkCols :+ col(T): _*)
      val cum = base
        .withColumn("_cum", sum(col("_c")).over(wOrd))
        .withColumn("_tot", sum(col("_c")).over(wAll))
      // one row per (bucket, pct); the first bucket whose cumulative share
      // reaches the pct wins — min_by over the bucket index, which stays a
      // hash aggregate (a row_number window here would add a third
      // shuffle+sort over the bucket rows)
      val withPct = cum
        .withColumn("_p", explode(lit(p.sortedPcts.toArray)))
        .withColumn("_np", lit(100.0) * col("_cum") / col("_tot"))
        .withColumn("_pp", lit(100.0) * (col("_cum") - col("_c")) / col("_tot"))
        .filter(col("_np") >= col("_p"))
        .groupBy(gkCols :+ col(T) :+ col("_p"): _*)
        .agg(min_by(
          struct(col("_idx"), col("_np"), col("_pp"), col("_timer")), col("_idx")).as("_s"))
        .select(gkCols ++ Seq(col(T), col("_p"),
          col("_s._idx").as("_idx"), col("_s._np").as("_np"),
          col("_s._pp").as("_pp"), col("_s._timer").as("_timer")): _*)

      val b = PercentileBuckets.boundaryCol(col("_idx"))
      val prevB = when(col("_idx") === 0, 0.0)
        .otherwise(PercentileBuckets.boundaryCol(col("_idx") - 1))
      val f = when(col("_np") > col("_pp"),
        (col("_p") - col("_pp")) / (col("_np") - col("_pp"))).otherwise(0.0)
      val est = (prevB + f * (b - prevB)) *
        when(col("_timer"), 1e-9).otherwise(1.0)

      // percentile label padded like the reference (" 50.0" / "  9.0")
      val pStr = col("_p").cast("string")
      val label = when(col("_p") < 10.0, concat(lit("  "), pStr))
        .when(col("_p") < 100.0, concat(lit(" "), pStr))
        .otherwise(pStr)

      // tags rebuilt from group keys + the query's exact tags (carrying the
      // map through the aggregate would fall out of hash aggregation)
      val staticTags = (p.expr.query.exactTags -- groupKeys) - "percentile"
      val outTags = map_concat(
        (if (groupKeys.isEmpty) tagsLit(staticTags)
         else map_concat(tagsLit(staticTags),
           map(groupKeys.flatMap(k => Seq(lit(k), gkCol(k))): _*))),
        map(lit("percentile"), label))
      val outKeys = groupKeys :+ "percentile"
      val out = withPct.select(
        col(T),
        est.cast("double").as(V),
        outTags.as(TAGS))
      val keyed = out
        .withColumn(KEY, mkKey(outKeys, col(TAGS)))
        .select(col(KEY), col(TAGS), col(T), col(V))
      SeriesFrame(keyed, outKeys, ctx.step, dense = false)
    }

    /**
     * HLL estimate from register series (reference MathExpr.scala:1093-1181):
     * registers merged by max via the reshaped fetch, then the cardinality
     * formula collapses the register dimension with a plain aggregate — no
     * UDAF, everything stays in codegen.
     */
    private def evalApproxDistinct(a: MathExpr.ApproxDistinct): SeriesFrame = {
      import graft.functions.Hll
      // cumulative variant maxes each register across time BEFORE the
      // estimate (reference approx-distinct-cumulative macro,
      // StatefulVocabulary.scala:64-76) — maxing per-interval estimates
      // would be wrong
      val inner =
        if (a.cumulative) eval(StatefulExpr.CumulativeMax(a.registerExpr))
        else eval(a.registerExpr)
      val groupKeys = a.finalGrouping
      val gk = groupKeys.map(k => col(TAGS).getItem(k).as(s"gk_$k"))

      val rho = when(isnan(col(V)) || col(V) <= 0.0, lit(null)).otherwise(col(V))
      val pow2 = pow(lit(2.0), -rho)

      // tags rebuilt from the group keys + the query's exact tags rather than
      // carried through the aggregate — first(map) would force SortAggregate
      val grouped = inner.df
        .withColumn("_pow", pow2)
        .groupBy(gk :+ col(T): _*)
        .agg(
          sum(col("_pow")).as("_sumPow"),
          count(col("_pow")).as("_nSet"))
        .withColumn(V, Hll.estimateCol(col("_sumPow"), col("_nSet")).cast("double"))
        .filter(col(V).isNotNull && !isnan(col(V)))
      val staticTags = (a.exactTags - "distinct") -- groupKeys
      val tagsCol =
        if (groupKeys.isEmpty) tagsLit(staticTags)
        else map_concat(tagsLit(staticTags),
          map(groupKeys.flatMap(k => Seq(lit(k), gkCol(k))): _*))
      val keyCol =
        if (groupKeys.isEmpty) lit("")
        else concat_ws(",", groupKeys.sorted.map(k => concat(lit(k + "="), gkCol(k))): _*)
      val out = grouped.select(keyCol.as(KEY), tagsCol.as(TAGS), col(T), col(V))
      SeriesFrame(out, groupKeys, ctx.step, dense = false)
    }

    // ---- stateful layer ----

    private def evalStateful(s: StatefulExpr): SeriesFrame = {
      val f = densify(eval(s.expr))
      val w = Window.partitionBy(col(KEY)).orderBy(col(T))
      def rows(n: Int) = w.rowsBetween(-(n - 1), 0)
      val unbounded = w.rowsBetween(Window.unboundedPreceding, 0)

      def withV(c: Column): SeriesFrame =
        f.copy(df = f.df.withColumn(V, c.cast("double")))

      s match {
        case StatefulExpr.Delay(_, n) =>
          withV(nullToNan(lag(col(V), n).over(w)))
        case StatefulExpr.RollingCount(_, n) =>
          withV(sum(when(boolCol(col(V)), 1.0).otherwise(0.0)).over(rows(n)))
        case StatefulExpr.RollingMin(_, n) =>
          withV(nullToNan(min(nanToNull(col(V))).over(rows(n))))
        case StatefulExpr.RollingMax(_, n) =>
          withV(nullToNan(max(nanToNull(col(V))).over(rows(n))))
        case StatefulExpr.RollingMean(_, n, minNum) =>
          val cnt = count(nanToNull(col(V))).over(rows(n))
          val sm = sum(nanToNull(col(V))).over(rows(n))
          withV(when(cnt >= minNum, sm / cnt).otherwise(nan))
        case StatefulExpr.RollingSum(_, n) =>
          withV(nullToNan(sum(nanToNull(col(V))).over(rows(n))))
        case StatefulExpr.Trend(_, window) =>
          val n = math.max(1L, window / f.step).toInt
          val rn = row_number().over(w)
          val cnt = count(nanToNull(col(V))).over(rows(n))
          val sm = sum(nanToNull(col(V))).over(rows(n))
          withV(when(rn >= n && cnt > 0, coalesce(sm, lit(0.0)) / n).otherwise(nan))
        case StatefulExpr.Integral(_) =>
          withV(nullToNan(sum(nanToNull(col(V))).over(unbounded)))
        case StatefulExpr.CumulativeMax(_) =>
          withV(nullToNan(max(nanToNull(col(V))).over(unbounded)))
        case StatefulExpr.Derivative(_) =>
          withV(col(V) - nullToNan(lag(col(V), 1).over(w)))
        case StatefulExpr.Des(_, training, alpha, beta) =>
          sequentialScan(f, () => new OnlineDes(training, alpha, beta))
        case StatefulExpr.SlidingDes(_, training, alpha, beta) =>
          // Align the training window to absolute time (StatefulExpr.scala:242-258)
          val trainingStep = ctx.step * training
          val alignedStart =
            if (ctx.start % trainingStep == 0) ctx.start
            else ctx.start / trainingStep * trainingStep + trainingStep
          val skip = ((alignedStart - ctx.start) / ctx.step).toInt
          sequentialScan(f, () =>
            if (skip > 0)
              new OnlinePipeline(new OnlineIgnoreN(skip), new OnlineSlidingDes(training, alpha, beta))
            else new OnlineSlidingDes(training, alpha, beta))
      }
    }

    /** Per-series sequential evaluation for algorithms that aren't window frames. */
    private def sequentialScan(f: SeriesFrame, mkAlgo: () => OnlineAlgorithm): SeriesFrame = {
      import spark.implicits._
      val rowsDs = f.df
        .select(col(KEY), col(TAGS), col(T), col(V))
        .as[(String, Map[String, String], Long, Double)]
      val out = rowsDs
        .groupByKey(_._1)
        .flatMapGroups { (_, it) =>
          val arr = it.toArray.sortBy(_._3)
          val algo = mkAlgo()
          arr.iterator.map(p => (p._1, p._2, p._3, algo.next(p._4)))
        }
        .toDF(KEY, TAGS, T, V)
      SeriesFrame(out, f.grouping, f.step, dense = true)
    }

    // ---- filter layer ----

    /** Per-line summary stats over the window (model/SummaryStats.scala). */
    private def perKeyStats(f: SeriesFrame): DataFrame =
      f.df.groupBy(col(KEY)).agg(
        first(col(TAGS)).as(TAGS),
        count(nanToNull(col(V))).cast("double").as("stat_count"),
        nullToNan(min(nanToNull(col(V)))).as("stat_min"),
        nullToNan(max(nanToNull(col(V)))).as("stat_max"),
        nullToNan(sum(nanToNull(col(V)))).as("stat_total"),
        nullToNan(avg(nanToNull(col(V)))).as("stat_avg"),
        nullToNan(max_by(nanToNull(col(V)), when(isnan(col(V)), lit(null)).otherwise(col(T)))).as("stat_last")
      )

    private def statLines(f: SeriesFrame, stat: String): SeriesFrame = {
      val stats = perKeyStats(f).select(col(KEY), col(TAGS), col(s"stat_$stat").as(V))
      // The grid is slot-cardinality (bounded by the request window), so it
      // is always the broadcast side of the line-replication cross join.
      val out = stats.crossJoin(broadcast(gridDF)).select(col(KEY), col(TAGS), col(T), col(V))
      SeriesFrame(out, f.grouping, f.step, dense = true)
    }

    private def evalStat(fe: FilterExpr.Stat): SeriesFrame =
      statLines(eval(fe.expr), fe.stat)

    private def evalFilter(fe: FilterExpr.Filter): SeriesFrame = {
      val f = eval(fe.expr)
      val saved = statEnv
      statEnv = Some(f)
      val signal = try eval(fe.pred) finally { statEnv = saved }
      // Keep lines whose predicate signal is true anywhere in the window
      // (FilterExpr.scala:144-166); grouped signals match by group key.
      val anyTrue = signal.df
        .groupBy(col(KEY))
        .agg(max(when(boolCol(col(V)), 1).otherwise(0)).as("any"))
        .filter(col("any") === 1)
        .select(col(KEY).as("keep_key"))
      if (signal.grouping.nonEmpty) {
        SeriesFrame(
          f.df.join(anyTrue, col(KEY) === col("keep_key"), "left_semi"),
          f.grouping, f.step, f.dense)
      } else {
        // Unkeyed signal: keep all lines iff the single signal fires.
        // The gating frame is at most one row — always broadcast.
        SeriesFrame(
          f.df.join(broadcast(anyTrue.limit(1))).drop("keep_key"),
          f.grouping, f.step, f.dense)
      }
    }

    private def evalPriority(p: FilterExpr.PriorityFilter): SeriesFrame = {
      val f = eval(p.expr)
      val stats = perKeyStats(f).select(col(KEY), col(s"stat_${p.stat}").as("s"))
      val order =
        if (p.bottom) Seq(col("s").asc_nulls_last, col(KEY).asc)
        else Seq(col("s").desc_nulls_last, col(KEY).asc)
      // top-k of the line stats via global sort+limit: Spark plans this as
      // TakeOrderedAndProject (per-partition bounded heaps + driver merge of
      // k rows), where a row_number window with no partition key would pull
      // EVERY line's stat row into one task (the reference's
      // BoundedPriorityBuffer is exactly the per-partition heap here)
      val topKeysRaw = stats.orderBy(order: _*).limit(p.k).select(col(KEY).as("keep_key"))
      // k is a user literal (lines on a graph) — the kept-key set is at most
      // k rows regardless of data volume, so broadcasting it is the right
      // plan at any scale and saves shuffling the full line frame into a
      // sort-merge join. Guarded only against a pathological k.
      val topKeys =
        if (p.k <= 100000) broadcast(topKeysRaw) else topKeysRaw
      val kept = f.df.join(topKeys, col(KEY) === col("keep_key"), "left_semi")
      p.others match {
        case None =>
          SeriesFrame(kept, f.grouping, f.step, f.dense)
        case Some(aggOp) =>
          val rest = f.df.join(topKeys, col(KEY) === col("keep_key"), "left_anti")
          val agg = aggOp match {
            case "sum" => sumNaN(col(V))
            case "min" => minNaNAgg(col(V))
            case "max" => maxNaNAgg(col(V))
            case "avg" => avgNaN(col(V))
          }
          // Remainder collapses to one "--others--" line (FilterExpr.scala:219-227)
          val fill = "--others--"
          val othersTags = map(
            f.grouping.flatMap(k => Seq(lit(k), lit(fill))): _*)
          val othersLine = rest
            .groupBy(col(T))
            .agg(agg.as(V))
            .filter(col(V).isNotNull)
            .select(lit(fill).as(KEY), othersTags.as(TAGS), col(T), col(V))
          SeriesFrame(kept.unionByName(othersLine), f.grouping, f.step, dense = false)
      }
    }

    private def evalConsolidate(c: FilterExpr.Consolidate): SeriesFrame = {
      val f = eval(c.expr)
      val newStep = f.step * c.multiple
      val tc = (col(T) - lit(ctx.start)) - pmod(col(T) - lit(ctx.start), lit(newStep)) + lit(ctx.start)
      val out = c.cf match {
        case "avg" =>
          // ConsolidationFunction.Avg denominator depends on DsType
          // (model/TimeSeq.scala:189-214): a RATE averages over the FULL
          // consolidated interval — a per-second rate's average must count
          // empty slots — while a GAUGE averages only slots with data (a
          // temperature that starts reporting mid-interval must not read
          // half). DsType comes from the line's `atlas.dstype` tag and
          // defaults to rate (model/DsType.scala:17-36).
          val isGauge =
            coalesce(col(TAGS).getItem("atlas.dstype"), lit("rate")) === "gauge"
          f.df
            .groupBy(col(KEY), tc.as(T))
            .agg(sumNaN(col(V)).as("_s"), avgNaN(col(V)).as("_a"), first(col(TAGS)).as(TAGS))
            .withColumn(V,
              when(isGauge, col("_a")).otherwise(col("_s") / lit(c.multiple.toDouble)))
            .filter(col(V).isNotNull)
            .select(col(KEY), col(TAGS), col(T), col(V))
        case cf =>
          val agg = cf match {
            case "sum" => sumNaN(col(V))
            case "min" => minNaNAgg(col(V))
            case _     => maxNaNAgg(col(V))
          }
          f.df
            .groupBy(col(KEY), tc.as(T))
            .agg(agg.as(V), first(col(TAGS)).as(TAGS))
            .filter(col(V).isNotNull)
            .select(col(KEY), col(TAGS), col(T), col(V))
      }
      SeriesFrame(out, f.grouping, newStep, dense = false)
    }

    // ---- style layer (data-affecting parts: :sort/:order/:limit) ----

    private def evalStyle(s: StyleExpr): SeriesFrame = {
      val f = eval(s.expr)
      s.settings.get("limit") match {
        case Some(k) =>
          val stat = s.settings.getOrElse("sort", "legend") match {
            case st if FilterExpr.stats.contains(st) => st
            case _                                   => "max"
          }
          val bottom = s.settings.get("order").contains("asc")
          evalPriority(FilterExpr.PriorityFilter(s.expr, stat, k.toInt, bottom))
        case None => f
      }
    }
  }
}
