package graft.asl

import graft.core.NanMath

/**
 * Time-series expression AST. Node inventory and semantics mirror the
 * reference model (atlas-core model/{DataExpr,MathExpr,StatefulExpr,
 * FilterExpr,StyleExpr}.scala — see SURVEY.md §2); the tree is engine-
 * agnostic and is compiled to Spark DataFrame plans by graft.planner.
 */
sealed trait TimeSeriesExpr extends Product with Serializable {

  /** Leaf fetches needed to evaluate this expression (CSE unit). */
  def dataExprs: List[DataExpr]

  /** Group-by keys of the evaluated result; Nil = single line. */
  def finalGrouping: List[String]

  def isGrouped: Boolean = finalGrouping.nonEmpty

  /** Tags for the result line(s) that don't come from grouping. */
  def exactTags: Map[String, String] =
    dataExprs.headOption.map(_.query.exactTags).getOrElse(Map.empty)

  /** ASL display form (round-trips through the interpreter). */
  def asl: String
}

// ---------------------------------------------------------------------------
// Data layer: fetch + first-level aggregation (model/DataExpr.scala)
// ---------------------------------------------------------------------------

sealed trait DataExpr extends TimeSeriesExpr {
  def query: Query
  def offset: Long
  def withOffset(o: Long): DataExpr
  def dataExprs: List[DataExpr] = List(this)
}

object DataExpr {

  private def offsetSuffix(offset: Long): String =
    if (offset == 0L) "" else s",${Strings.durationAsl(offset)},:offset"

  /** No aggregation: one line per matching series (DataExpr.All). */
  final case class All(query: Query, offset: Long = 0L) extends DataExpr {
    def finalGrouping: List[String] = Nil
    def withOffset(o: Long): DataExpr = copy(offset = o)
    def asl = s"${query.asl},:all${offsetSuffix(offset)}"
  }

  /** Pointwise aggregate across matching series. */
  sealed trait AggregateFunction extends DataExpr {
    def name: String
    def finalGrouping: List[String] = Nil
    def asl = s"${query.asl},:$name${offsetSuffix(offset)}"
  }

  final case class Sum(query: Query, offset: Long = 0L) extends AggregateFunction {
    def name = "sum"; def withOffset(o: Long): DataExpr = copy(offset = o)
  }
  final case class Count(query: Query, offset: Long = 0L) extends AggregateFunction {
    def name = "count"; def withOffset(o: Long): DataExpr = copy(offset = o)
  }
  final case class Min(query: Query, offset: Long = 0L) extends AggregateFunction {
    def name = "min"; def withOffset(o: Long): DataExpr = copy(offset = o)
  }
  final case class Max(query: Query, offset: Long = 0L) extends AggregateFunction {
    def name = "max"; def withOffset(o: Long): DataExpr = copy(offset = o)
  }

  /**
   * Explicit consolidation function (`:cf-sum/avg/min/max`,
   * DataExpr.Consolidation, DataExpr.scala:257): how a series' datapoints
   * merge into a step slot when the evaluation step is coarser than the
   * publish cadence. Wraps an aggregate; the planner applies `cf` at ingest
   * normalization instead of the default sum.
   */
  final case class Consolidation(af: AggregateFunction, cf: String)
      extends AggregateFunction {
    require(Set("sum", "avg", "min", "max").contains(cf), s"unknown cf $cf")
    def name: String = af.name
    def query: Query = af.query
    def offset: Long = af.offset
    def withOffset(o: Long): DataExpr =
      copy(af = af.withOffset(o).asInstanceOf[AggregateFunction])
    override def asl = s"${af.asl},:cf-$cf"
  }

  /**
   * Group matching series by tag keys and aggregate within each group.
   * Series missing any of the keys are dropped (DataExpr.scala:108-122).
   */
  final case class GroupBy(af: AggregateFunction, keys: List[String]) extends DataExpr {
    require(keys.nonEmpty, ":by requires at least one key")
    def query: Query = af.query
    def offset: Long = af.offset
    def withOffset(o: Long): DataExpr = copy(af = af.withOffset(o).asInstanceOf[AggregateFunction])
    def finalGrouping: List[String] = keys
    // af.asl carries the query and any :offset suffix; keys-last round-trips
    // through the data :by word.
    def asl = s"${af.asl},(,${keys.mkString(",")},),:by"
  }
}

// ---------------------------------------------------------------------------
// Math layer (model/MathExpr.scala)
// ---------------------------------------------------------------------------

object MathExpr {

  /** Constant line over the whole grid (`:const`). */
  final case class Constant(v: Double) extends TimeSeriesExpr {
    def dataExprs: List[DataExpr] = Nil
    def finalGrouping: List[String] = Nil
    def asl = s"$v,:const"
  }

  /** Deterministic hash-of-timestamp noise in [0,1) (`:random`/`:srandom`). */
  final case class SeededRandom(seed: Int) extends TimeSeriesExpr {
    def dataExprs: List[DataExpr] = Nil
    def finalGrouping: List[String] = Nil
    def asl = if (seed == 0) ":random" else s"$seed,:srandom"
  }

  /**
   * Value = calendar field of the interval timestamp (`:time`), UTC.
   * The full reference mode grammar (MathExpr.scala:179-213): camelCase
   * calendar aliases, fractional since-epoch units (seconds..weeks), and
   * raw ChronoField enum names (e.g. HOUR_OF_DAY). Modes canonicalize at
   * construction so display forms still round-trip verbatim.
   */
  final case class Time(mode: String) extends TimeSeriesExpr {
    require(Time.canonical.contains(Time.normalize(mode)), s"unsupported :time mode $mode")
    def dataExprs: List[DataExpr] = Nil
    def finalGrouping: List[String] = Nil
    def asl = s"$mode,:time"
  }

  object Time {
    /** Canonical camelCase/unit modes the planner evaluates. */
    val canonical: Set[String] = Set(
      "secondOfMinute", "secondOfDay", "minuteOfHour", "minuteOfDay",
      "hourOfDay", "dayOfWeek", "dayOfMonth", "dayOfYear", "monthOfYear",
      "yearOfCentury", "yearOfEra",
      "seconds", "minutes", "hours", "days", "weeks",
      "secondsSinceEpoch"
    )

    /** Raw ChronoField enum name -> canonical alias (reference `:time`
      * falls back to ChronoField.valueOf for unrecognized modes). */
    def normalize(mode: String): String = mode match {
      case "SECOND_OF_MINUTE" => "secondOfMinute"
      case "SECOND_OF_DAY"    => "secondOfDay"
      case "MINUTE_OF_HOUR"   => "minuteOfHour"
      case "MINUTE_OF_DAY"    => "minuteOfDay"
      case "HOUR_OF_DAY"      => "hourOfDay"
      case "DAY_OF_WEEK"      => "dayOfWeek"
      case "DAY_OF_MONTH"     => "dayOfMonth"
      case "DAY_OF_YEAR"      => "dayOfYear"
      case "MONTH_OF_YEAR"    => "monthOfYear"
      case "YEAR"             => "yearOfCentury"
      case "YEAR_OF_ERA"      => "yearOfEra"
      case m                  => m
    }
  }

  /** 1.0 inside [s, e], else 0.0 (`:time-span`), bounds in epoch ms. */
  final case class TimeSpan(s: Long, e: Long) extends TimeSeriesExpr {
    def dataExprs: List[DataExpr] = Nil
    def finalGrouping: List[String] = Nil
    def asl = s"$s,$e,:time-span"
  }

  final case class ClampMin(expr: TimeSeriesExpr, v: Double) extends TimeSeriesExpr {
    def dataExprs: List[DataExpr] = expr.dataExprs
    def finalGrouping: List[String] = expr.finalGrouping
    def asl = s"${expr.asl},$v,:clamp-min"
  }

  final case class ClampMax(expr: TimeSeriesExpr, v: Double) extends TimeSeriesExpr {
    def dataExprs: List[DataExpr] = expr.dataExprs
    def finalGrouping: List[String] = expr.finalGrouping
    def asl = s"${expr.asl},$v,:clamp-max"
  }

  /** Unary pointwise operators (UnaryMathExpr). */
  sealed abstract class UnaryOp(val name: String, val f: Double => Double)
  object UnaryOp {
    case object Abs extends UnaryOp("abs", math.abs)
    case object Negate extends UnaryOp("neg", v => -v)
    case object Sine extends UnaryOp("sin", math.sin)
    case object Sqrt extends UnaryOp("sqrt", math.sqrt)
    val all: List[UnaryOp] = List(Abs, Negate, Sine, Sqrt)
  }

  final case class Unary(op: UnaryOp, expr: TimeSeriesExpr) extends TimeSeriesExpr {
    def dataExprs: List[DataExpr] = expr.dataExprs
    def finalGrouping: List[String] = expr.finalGrouping
    def asl = s"${expr.asl},:${op.name}"
  }

  /** Rate per second -> amount per step (`:per-step`). */
  final case class PerStep(expr: TimeSeriesExpr) extends TimeSeriesExpr {
    def dataExprs: List[DataExpr] = expr.dataExprs
    def finalGrouping: List[String] = expr.finalGrouping
    def asl = s"${expr.asl},:per-step"
  }

  /**
   * Binary pointwise operators with the reference's NaN contracts
   * (MathExpr.scala:578-712): `:add`/`:sub` forgive NaN, `:fadd`/... are
   * strict IEEE, `:div` maps 0/0 to 0, comparisons yield 0/1 signals.
   */
  sealed abstract class BinOp(val name: String, val f: (Double, Double) => Double)
  object BinOp {
    case object Add extends BinOp("add", NanMath.addNaN)
    case object Sub extends BinOp("sub", NanMath.subtractNaN)
    case object Mul extends BinOp("mul", _ * _)
    case object Div extends BinOp("div", (a, b) =>
      if (b == 0.0) { if (a == 0.0) 0.0 else Double.NaN } else a / b)
    case object Pow extends BinOp("pow", math.pow)
    case object FAdd extends BinOp("fadd", _ + _)
    case object FSub extends BinOp("fsub", _ - _)
    case object FMul extends BinOp("fmul", _ * _)
    case object FDiv extends BinOp("fdiv", _ / _)
    case object Gt extends BinOp("gt", (a, b) => if (a > b) 1.0 else 0.0)
    case object Ge extends BinOp("ge", (a, b) => if (a >= b) 1.0 else 0.0)
    case object Lt extends BinOp("lt", (a, b) => if (a < b) 1.0 else 0.0)
    case object Le extends BinOp("le", (a, b) => if (a <= b) 1.0 else 0.0)
    case object And extends BinOp("and", (a, b) =>
      if (NanMath.toBoolean(a) && NanMath.toBoolean(b)) 1.0 else 0.0)
    case object Or extends BinOp("or", (a, b) =>
      if (NanMath.toBoolean(a) || NanMath.toBoolean(b)) 1.0 else 0.0)
    val all: List[BinOp] =
      List(Add, Sub, Mul, Div, Pow, FAdd, FSub, FMul, FDiv, Gt, Ge, Lt, Le, And, Or)
  }

  /**
   * Binary op over two expressions. If both sides are grouped, one side's
   * keys must be a subset of the other's; lines are matched by the subset
   * group key (hash-join semantics, MathExpr.scala:456-576).
   */
  final case class Binary(op: BinOp, expr1: TimeSeriesExpr, expr2: TimeSeriesExpr)
      extends TimeSeriesExpr {
    private val g1 = expr1.finalGrouping
    private val g2 = expr2.finalGrouping
    require(
      g1.isEmpty || g2.isEmpty || g1.forall(g2.contains) || g2.forall(g1.contains),
      s"both sides of :${op.name} are grouped but neither grouping is a subset of the other"
    )
    def dataExprs: List[DataExpr] = expr1.dataExprs ::: expr2.dataExprs
    def finalGrouping: List[String] = if (g1.size >= g2.size) g1 else g2
    def asl = s"${expr1.asl},${expr2.asl},:${op.name}"
  }

  /** Second-level aggregation: collapse grouped lines to one (AggrMathExpr). */
  sealed abstract class AggrOp(val name: String)
  object AggrOp {
    case object Sum extends AggrOp("sum")
    case object Count extends AggrOp("count")
    case object Min extends AggrOp("min")
    case object Max extends AggrOp("max")
  }

  final case class Aggr(op: AggrOp, expr: TimeSeriesExpr) extends TimeSeriesExpr {
    def dataExprs: List[DataExpr] = expr.dataExprs
    def finalGrouping: List[String] = Nil
    def asl = s"${expr.asl},:${op.name}"
  }

  /** Rename a group-by result key (`:as`, MathExpr.As). */
  final case class As(expr: TimeSeriesExpr, orig: String, repl: String) extends TimeSeriesExpr {
    def dataExprs: List[DataExpr] = expr.dataExprs
    def finalGrouping: List[String] =
      expr.finalGrouping.map(k => if (k == orig) repl else k)
    def asl = s"${expr.asl},$orig,$repl,:as"
  }

  /**
   * Macro result keeping the display form distinct from the evaluated form
   * (`:avg`, `:pct`, trig macros — reference NamedRewrite,
   * MathExpr.scala:1202). `displayAsl` is what round-trips; `evalExpr` is
   * what executes.
   */
  final case class NamedRewrite(displayAsl: String, evalExpr: TimeSeriesExpr)
      extends TimeSeriesExpr {
    def dataExprs: List[DataExpr] = evalExpr.dataExprs
    def finalGrouping: List[String] = evalExpr.finalGrouping
    def asl: String = displayAsl
  }

  /**
   * Estimate percentiles from bucket-counter series (`:percentiles`,
   * MathExpr.scala:859-1027). The inner group-by must include the
   * `percentile` key whose values are D%04X / T%04X bucket ids; output is
   * one line per group per requested percentile, tagged with the padded
   * percentile label. Timers (T prefix) are scaled 1e-9 to seconds.
   */
  final case class Percentiles(expr: DataExpr.GroupBy, pcts: List[Double])
      extends TimeSeriesExpr {
    require(expr.keys.contains("percentile"), ":percentiles requires grouping by 'percentile'")
    require(pcts.nonEmpty && pcts.forall(p => p >= 0.0 && p <= 100.0),
      "percentiles must be in [0, 100]")
    def dataExprs: List[DataExpr] = List(expr)
    /** Output carries the percentile tag in place of the bucket id. */
    def finalGrouping: List[String] = expr.keys.filterNot(_ == "percentile") :+ "percentile"
    def sortedPcts: List[Double] = pcts.distinct.sorted
    def asl: String = {
      val keys = expr.keys.filterNot(_ == "percentile")
      val base = if (keys.isEmpty) expr.af.asl else s"${expr.af.asl},(,${keys.mkString(",")},),:by"
      s"$base,(,${sortedPcts.mkString(",")},),:percentiles"
    }
  }

  /**
   * HyperLogLog cardinality estimate from per-register max-rho series
   * (`:approx-distinct`, MathExpr.scala:1029-1182). The expression is
   * reshaped so registers (the `distinct` tag, R%02X) merge with max; the
   * estimate collapses the register dimension.
   */
  final case class ApproxDistinct(expr: DataExpr, cumulative: Boolean = false)
      extends TimeSeriesExpr {
    /** Reshaped fetch: max per register (and any user grouping). */
    val registerExpr: DataExpr.GroupBy = expr match {
      case DataExpr.GroupBy(af, keys) =>
        DataExpr.GroupBy(DataExpr.Max(af.query, af.offset), "distinct" :: keys.filterNot(_ == "distinct"))
      case d => DataExpr.GroupBy(DataExpr.Max(d.query, d.offset), List("distinct"))
    }
    def dataExprs: List[DataExpr] = List(registerExpr)
    def finalGrouping: List[String] = registerExpr.keys.filterNot(_ == "distinct")
    def asl =
      if (cumulative) s"${expr.asl},:approx-distinct-cumulative"
      else s"${expr.asl},:approx-distinct"
  }

  /** Regroup grouped results by a subset of the inner keys (MathExpr.GroupBy). */
  final case class GroupBy(aggr: Aggr, keys: List[String]) extends TimeSeriesExpr {
    require(keys.nonEmpty, ":by requires at least one key")
    require(
      keys.forall(aggr.expr.finalGrouping.contains),
      s"math :by keys $keys must be a subset of the inner grouping ${aggr.expr.finalGrouping}"
    )
    def dataExprs: List[DataExpr] = aggr.dataExprs
    def finalGrouping: List[String] = keys
    def asl = s"${aggr.expr.asl},:${aggr.op.name},(,${keys.mkString(",")},),:by"
  }
}

// ---------------------------------------------------------------------------
// Stateful / windowed layer (model/StatefulExpr.scala + core/algorithm)
// ---------------------------------------------------------------------------

sealed trait StatefulExpr extends TimeSeriesExpr {
  def expr: TimeSeriesExpr
  def dataExprs: List[DataExpr] = expr.dataExprs
  def finalGrouping: List[String] = expr.finalGrouping
}

object StatefulExpr {

  /** Shift values n steps forward in time (`:delay`, OnlineDelay). */
  final case class Delay(expr: TimeSeriesExpr, n: Int) extends StatefulExpr {
    def asl = s"${expr.asl},$n,:delay"
  }

  /** Count of truthy values in the last n steps (`:rolling-count`). */
  final case class RollingCount(expr: TimeSeriesExpr, n: Int) extends StatefulExpr {
    def asl = s"${expr.asl},$n,:rolling-count"
  }

  final case class RollingMin(expr: TimeSeriesExpr, n: Int) extends StatefulExpr {
    def asl = s"${expr.asl},$n,:rolling-min"
  }

  final case class RollingMax(expr: TimeSeriesExpr, n: Int) extends StatefulExpr {
    def asl = s"${expr.asl},$n,:rolling-max"
  }

  /** Mean of non-NaN values in last n steps; NaN unless >= minNumValues present. */
  final case class RollingMean(expr: TimeSeriesExpr, n: Int, minNumValues: Int)
      extends StatefulExpr {
    require(minNumValues >= 1 && minNumValues <= n)
    def asl = s"${expr.asl},$n,$minNumValues,:rolling-mean"
  }

  final case class RollingSum(expr: TimeSeriesExpr, n: Int) extends StatefulExpr {
    def asl = s"${expr.asl},$n,:rolling-sum"
  }

  /** Double exponential smoothing (`:des`, OnlineDes). */
  final case class Des(expr: TimeSeriesExpr, training: Int, alpha: Double, beta: Double)
      extends StatefulExpr {
    def asl = s"${expr.asl},$training,$alpha,$beta,:des"
  }

  /** DES deterministically retrained per aligned window (`:sdes`). */
  final case class SlidingDes(expr: TimeSeriesExpr, training: Int, alpha: Double, beta: Double)
      extends StatefulExpr {
    def asl = s"${expr.asl},$training,$alpha,$beta,:sdes"
  }

  /** Moving average over a duration window (`:trend`, OnlineTrend):
    * sum of non-NaN over the window divided by the full window size,
    * NaN until the window has been filled once. */
  final case class Trend(expr: TimeSeriesExpr, window: Long) extends StatefulExpr {
    def asl = s"${expr.asl},${Strings.durationAsl(window)},:trend"
  }

  /** Running NaN-skipping sum within the graph window (`:integral`). */
  final case class Integral(expr: TimeSeriesExpr) extends StatefulExpr {
    def asl = s"${expr.asl},:integral"
  }

  final case class CumulativeMax(expr: TimeSeriesExpr) extends StatefulExpr {
    def asl = s"${expr.asl},:cumulative-max"
  }

  /** v(t) - v(t-1), NaN at the first slot (`:derivative`). */
  final case class Derivative(expr: TimeSeriesExpr) extends StatefulExpr {
    def asl = s"${expr.asl},:derivative"
  }
}

// ---------------------------------------------------------------------------
// Filter / top-k layer (model/FilterExpr.scala)
// ---------------------------------------------------------------------------

object FilterExpr {

  val stats: Set[String] = Set("avg", "max", "min", "last", "count", "total")

  /** Reduce each line to a summary stat broadcast over the grid (`:stat`). */
  final case class Stat(expr: TimeSeriesExpr, stat: String) extends TimeSeriesExpr {
    require(stats.contains(stat), s"unknown stat $stat")
    def dataExprs: List[DataExpr] = expr.dataExprs
    def finalGrouping: List[String] = expr.finalGrouping
    def asl = s"${expr.asl},$stat,:stat"
  }

  /** Placeholder for the stat of the filtered expr inside `:filter` predicates. */
  final case class StatExpr(stat: String) extends TimeSeriesExpr {
    require(stats.contains(stat), s"unknown stat $stat")
    def dataExprs: List[DataExpr] = Nil
    def finalGrouping: List[String] = Nil
    def asl = s":stat-$stat"
  }

  /**
   * Keep lines whose predicate signal is true at any point in the window;
   * grouped predicates match lines by group key (FilterExpr.scala:120-166).
   */
  final case class Filter(expr: TimeSeriesExpr, pred: TimeSeriesExpr) extends TimeSeriesExpr {
    def dataExprs: List[DataExpr] = expr.dataExprs ::: pred.dataExprs
    def finalGrouping: List[String] = expr.finalGrouping
    def asl = s"${expr.asl},${pred.asl},:filter"
  }

  /**
   * Keep the K best lines ranked by a summary stat (`:topk`/`:bottomk` and
   * the `-others-*` variants that add one aggregated remainder line).
   */
  final case class PriorityFilter(
      expr: TimeSeriesExpr,
      stat: String,
      k: Int,
      bottom: Boolean = false,
      others: Option[String] = None
  ) extends TimeSeriesExpr {
    require(stats.contains(stat), s"unknown stat $stat")
    require(k >= 1, "k must be >= 1")
    require(others.forall(Set("sum", "min", "max", "avg").contains),
      s"unknown others aggregate $others")
    def dataExprs: List[DataExpr] = expr.dataExprs
    def finalGrouping: List[String] = expr.finalGrouping
    def word: String = (if (bottom) "bottomk" else "topk") +
      others.map(o => s"-others-$o").getOrElse("")
    def asl = s"${expr.asl},$stat,$k,:$word"
  }

  /** Re-step to a coarser grid with an explicit consolidation function. */
  final case class Consolidate(expr: TimeSeriesExpr, multiple: Int, cf: String)
      extends TimeSeriesExpr {
    require(multiple >= 1)
    require(Set("sum", "avg", "min", "max").contains(cf), s"unknown cf $cf")
    def dataExprs: List[DataExpr] = expr.dataExprs
    def finalGrouping: List[String] = expr.finalGrouping
    def asl = s"${expr.asl},$multiple,cf-$cf,:consolidate"
  }
}

// ---------------------------------------------------------------------------
// Event layer (model/EventExpr.scala / EventVocabulary, §2.9): raw rows
// matched by tag queries, evaluated by graft.ops.EventOps (not part of the
// TimeSeriesExpr tree — events are rows, not series).
// ---------------------------------------------------------------------------

sealed trait EventExpr extends Product with Serializable {
  def query: Query
  def asl: String
}

object EventExpr {

  /** Pass through matching events unchanged (EventExpr.Raw). */
  final case class Raw(query: Query) extends EventExpr {
    def asl: String = query.asl
  }

  /** Project named columns from matching events (`:table`). */
  final case class Table(query: Query, columns: List[String]) extends EventExpr {
    require(columns.nonEmpty, ":table requires at least one column")
    def asl = s"${query.asl},(,${columns.mkString(",")},),:table"
  }

  /** Count per sampleBy group per step plus sampled projections (`:sample`). */
  final case class Sample(
      query: Query,
      sampleBy: List[String],
      projections: List[String]
  ) extends EventExpr {
    require(sampleBy.nonEmpty, ":sample requires group keys")
    def asl =
      s"${query.asl},(,${sampleBy.mkString(",")},),(,${projections.mkString(",")},),:sample"
  }
}

// ---------------------------------------------------------------------------
// Presentation layer (model/StyleExpr.scala) — metadata plus the
// data-affecting :sort/:order/:limit.
// ---------------------------------------------------------------------------

final case class StyleExpr(expr: TimeSeriesExpr, settings: Map[String, String])
    extends TimeSeriesExpr {
  def dataExprs: List[DataExpr] = expr.dataExprs
  def finalGrouping: List[String] = expr.finalGrouping
  def asl: String = expr.asl + settings.toList.sorted.map {
    // sed stores chained :s search/replace pairs space-separated
    case ("sed", v) =>
      v.split(" ").grouped(2).map { case Array(s, r) => s",$s,$r,:s" }.mkString
    // offsets stores the legacy list-form :offset durations
    case ("offsets", v) => s",(,$v,),:offset"
    case (k, v)         => s",$v,:$k"
  }.mkString
}

/** Small parsing/formatting helpers shared by the AST and interpreter. */
object Strings {

  /** Parse ASL duration forms: 300, PT5M/P1D (ISO), or 5s/5m/3h/2d/1w. */
  def parseDuration(s: String): Long = {
    val simple = "^([0-9]+)(s|m|h|d|w)$".r
    s match {
      case simple(n, unit) =>
        val mult = unit match {
          case "s" => 1000L
          case "m" => 60000L
          case "h" => 3600000L
          case "d" => 86400000L
          case "w" => 604800000L
        }
        n.toLong * mult
      case _ if s.forall(_.isDigit) => s.toLong * 1000L // seconds
      case _ => java.time.Duration.parse(s).toMillis
    }
  }

  /** Render a millisecond duration in the shortest ASL unit form. */
  def durationAsl(ms: Long): String = {
    val units = List(604800000L -> "w", 86400000L -> "d", 3600000L -> "h", 60000L -> "m", 1000L -> "s")
    units.find { case (u, _) => ms % u == 0 && ms != 0 } match {
      case Some((u, suffix)) => s"${ms / u}$suffix"
      case None              => s"${ms / 1000L}s"
    }
  }

  private val RelativeDate = "^(now|epoch|s|e)([-+])(.+)$".r
  private val NamedDate = "^(now|epoch|s|e)$".r
  private val UnixDate = "^([0-9]+)$".r

  /**
   * Parse a graph-API date: epoch (unit auto-detected by magnitude like the
   * reference Strings.ofEpoch), ISO-8601, or a named reference (now, epoch,
   * s, e) with an optional +/- duration (Strings.parseDate,
   * atlas-core util/Strings.scala:488-548). ISO dates without an explicit
   * offset are interpreted in `tz` (the reference threads the request's
   * `tz` param into IsoDateTimeParser). Returns epoch ms.
   */
  def parseDate(
      str: String,
      refs: Map[String, Long] = Map.empty,
      nowMs: () => Long,
      tz: java.time.ZoneId = java.time.ZoneOffset.UTC
  ): Long = {
    def ref(r: String): Long = refs.getOrElse(r, if (r == "epoch") 0L else nowMs())
    str match {
      case RelativeDate(r, op, p) =>
        val d = parseDuration(p)
        if (op == "-") ref(r) - d else ref(r) + d
      case NamedDate(r) => ref(r)
      case UnixDate(d) =>
        val v = d.toLong
        // unit by magnitude: seconds < 2^31ish, then millis, micros, nanos
        if (v <= Int.MaxValue.toLong) v * 1000L
        else if (v <= (1L << 44)) v
        else if (v <= (1L << 54)) v / 1000L
        else v / 1000000L
      case s => parseIso(s, tz)
    }
  }

  /** ISO-8601 instant: an explicit offset/Z wins; otherwise local date or
    * date-time interpreted in `tz`. */
  private def parseIso(s: String, tz: java.time.ZoneId): Long = {
    val zoned =
      if (s.length == 10) java.time.LocalDate.parse(s).atStartOfDay(tz)
      else
        try java.time.OffsetDateTime.parse(s).toZonedDateTime
        catch {
          case _: java.time.format.DateTimeParseException =>
            java.time.LocalDateTime.parse(s).atZone(tz)
        }
    zoned.toInstant.toEpochMilli
  }

  /**
   * Resolve a (start, end) pair where either side may reference the other
   * (Strings.timeRange, util/Strings.scala:605-624): a relative start
   * resolves against the end, otherwise the end may reference the start.
   */
  def timeRange(
      s: String,
      e: String,
      nowMs: () => Long = () => System.currentTimeMillis(),
      tz: java.time.ZoneId = java.time.ZoneOffset.UTC
  ): (Long, Long) = {
    // relative to a CUSTOM reference (s/e), not to now/epoch
    // (Strings.isRelativeDate(str, customRef = true), util/Strings.scala:468-471)
    def isRelative(v: String): Boolean = v match {
      case RelativeDate(r, _, _) => r != "now" && r != "epoch"
      case _                     => false
    }
    val range =
      if (isRelative(s) || s == "e") {
        require(!(isRelative(e) || e == "s"), "start and end are both relative")
        val end = parseDate(e, Map.empty, nowMs, tz)
        (parseDate(s, Map("e" -> end), nowMs, tz), end)
      } else {
        val start = parseDate(s, Map.empty, nowMs, tz)
        (start, parseDate(e, Map("s" -> start), nowMs, tz))
      }
    require(range._1 <= range._2, "end time is before start time")
    range
  }
}
