package graft

import graft.asl._
import graft.core.EvalContext
import graft.planner.{Planner, SeriesFrame}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-operator semantics on a tiny hand-computed dataset: the NaN paths and
  * edge cases the DuckDB oracle can't express. */
class PlannerSpec extends SparkSpec {

  import DataExpr._
  import MathExpr.{GroupBy => _, _}

  // Grid: 6 slots of 1 minute starting at epoch 0.
  val ctx = EvalContext(0L, 360000L, 60000L)
  def slot(i: Int): Long = i * 60000L

  // Series A (name=a, node=1): data in slots 0,1,2,4,5 (gap at 3)
  // Series B (name=a, node=2): data in slots 0,1 only
  // Series C (name=b):         data in all slots, no node tag
  lazy val dpData: DataFrame = {
    import spark.implicits._
    val rows = Seq(
      (Map("name" -> "a", "node" -> "1"), slot(0) + 1000L, 1.0),
      (Map("name" -> "a", "node" -> "1"), slot(1) + 1000L, 2.0),
      (Map("name" -> "a", "node" -> "1"), slot(2) + 1000L, 3.0),
      (Map("name" -> "a", "node" -> "1"), slot(4) + 1000L, 5.0),
      (Map("name" -> "a", "node" -> "1"), slot(5) + 1000L, 6.0),
      (Map("name" -> "a", "node" -> "2"), slot(0) + 2000L, 10.0),
      (Map("name" -> "a", "node" -> "2"), slot(1) + 2000L, 20.0),
      // two raw points in one slot normalize by summing
      (Map("name" -> "a", "node" -> "2"), slot(1) + 30000L, 5.0),
      (Map("name" -> "b"), slot(0) + 500L, 100.0),
      (Map("name" -> "b"), slot(1) + 500L, 100.0),
      (Map("name" -> "b"), slot(2) + 500L, 100.0),
      (Map("name" -> "b"), slot(3) + 500L, 100.0),
      (Map("name" -> "b"), slot(4) + 500L, 100.0),
      (Map("name" -> "b"), slot(5) + 500L, 100.0)
    )
    rows.toDF("tags", "ts", "value")
  }

  def eval(expr: TimeSeriesExpr): SeriesFrame = Planner.eval(expr, dpData, ctx)

  /** (key, t) -> value for all non-NaN rows. */
  def values(expr: TimeSeriesExpr): Map[(String, Long), Double] =
    Planner.output(eval(expr), eval(expr).grouping, roundTo = 6)
      .collect()
      .map { r =>
        val key = eval(expr).grouping.map(k => r.getAs[String](k)).mkString(",")
        (key, r.getAs[Long]("t")) -> r.getAs[Double]("value")
      }
      .toMap

  def series(expr: TimeSeriesExpr): Map[Long, Double] =
    values(expr).map { case ((_, t), v) => t -> v }

  val a = Query.Equal("name", "a")
  val b = Query.Equal("name", "b")

  test("native series-id expression matches the HOF formulation and stays in codegen") {
    import spark.implicits._
    val tricky = Seq(
      Map("b" -> "2", "a" -> "1", "z" -> "último"),          // unsorted keys, unicode
      Map("name" -> "x", "hi" -> null.asInstanceOf[String]), // null value = absent tag
      Map.empty[String, String]
    ).toDF("tags")
    val hof = array_join(
      transform(array_sort(map_entries(col("tags"))),
        e => concat(e.getField("key"), lit("="), e.getField("value"))), ",")
    val rows = tricky.select(Planner.seriesId(col("tags")).as("native"), hof.as("ref"))
      .collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1), r.toString))
    assert(rows.map(_.getString(0)).toSet == Set("a=1,b=2,z=último", "name=x", ""))
    // the whole projection must compile — no CodegenFallback island (a
    // local relation constant-folds away, so assert over a real scan)
    val scan = graft.sources.Datapoints.events(spark, "/root/testdata/sf0.001")
      .select(Planner.seriesId(col("tags")))
    scan.collect() // generated code must actually compile and run
    val plan = scan.queryExecution.executedPlan.toString
    // "*(n)" marks operators inside a whole-stage-codegen stage
    assert(plan.contains("*(1) Project [seriesidexpr"), plan)
  }

  test(":sum aggregates across series, absent slots yield no row") {
    assert(series(Sum(a)) == Map(
      slot(0) -> 11.0, slot(1) -> 27.0, slot(2) -> 3.0, slot(4) -> 5.0, slot(5) -> 6.0))
  }

  test(":count counts series with data per slot") {
    assert(series(Count(a)) == Map(
      slot(0) -> 2.0, slot(1) -> 2.0, slot(2) -> 1.0, slot(4) -> 1.0, slot(5) -> 1.0))
  }

  test(":max/:min over normalized per-series values") {
    assert(series(Max(a)) == Map(
      slot(0) -> 10.0, slot(1) -> 25.0, slot(2) -> 3.0, slot(4) -> 5.0, slot(5) -> 6.0))
    assert(series(Min(a))(slot(1)) == 2.0)
  }

  test("empty match evaluates to no rows (NO_DATA), not an error") {
    assert(series(Sum(Query.Equal("name", "nope"))).isEmpty)
  }

  test(":by drops series missing the group key") {
    val got = values(GroupBy(Sum(Query.True), List("node")))
    // name=b has no node tag: dropped entirely
    assert(got.keys.map(_._1).toSet == Set("1", "2"))
    assert(got(("1", slot(0))) == 1.0)
    assert(got(("2", slot(1))) == 25.0)
  }

  test(":add forgives NaN on one side (addNaN)") {
    // A+B where B=name-a-node-2 sum: slots 2,4,5 exist only on lhs
    val got = series(Binary(BinOp.Add, Sum(a), Sum(b)))
    assert(got(slot(0)) == 111.0)
    assert(got(slot(3)) == 100.0) // lhs gap -> rhs value alone
  }

  test(":mul propagates NaN strictly") {
    val got = series(Binary(BinOp.Mul, Sum(a), Sum(b)))
    assert(got(slot(0)) == 1100.0)
    assert(!got.contains(slot(3))) // lhs gap -> no row
  }

  test(":div 0/0 = 0") {
    val zero = Binary(BinOp.Sub, Sum(b), Sum(b)) // constant 0 line
    val got = series(Binary(BinOp.Div, zero, zero))
    assert(got(slot(0)) == 0.0)
  }

  test(":div x/0 is a GAP (no row), matching the sparse-NaN convention") {
    // b / (b - b): denominator 0, numerator nonzero everywhere b exists —
    // every slot is x/0 -> NaN -> dropped (the sf0.1 scale probe caught
    // the subset-key oracle keeping such a row the engine drops)
    val zero = Binary(BinOp.Sub, Sum(b), Sum(b))
    val got = series(Binary(BinOp.Div, Sum(b), zero))
    assert(got.isEmpty, got.toString)
  }

  test("grouped binary op joins lines by subset key") {
    val byNode = GroupBy(Sum(a), List("node"))
    val got = values(Binary(BinOp.Div, byNode, Sum(a)))
    assert(math.abs(got(("1", slot(0))) - 1.0 / 11.0) < 1e-6)
    assert(math.abs(got(("2", slot(1))) - 25.0 / 27.0) < 1e-6)
    assert(!got.contains(("2", slot(2)))) // node 2 has no data in slot 2
  }

  test("math :sum collapses grouped lines") {
    val got = series(Aggr(AggrOp.Sum, GroupBy(Sum(a), List("node"))))
    assert(got == series(Sum(a)))
  }

  test(":delay shifts by n slots") {
    val got = series(StatefulExpr.Delay(Sum(b), 2))
    assert(got == Map(slot(2) -> 100.0, slot(3) -> 100.0, slot(4) -> 100.0, slot(5) -> 100.0))
  }

  test(":integral skips NaN and accumulates") {
    val got = series(StatefulExpr.Integral(Sum(a)))
    assert(got(slot(2)) == 41.0)
    assert(got(slot(3)) == 41.0) // gap emits running sum
    assert(got(slot(5)) == 52.0)
  }

  test(":derivative is NaN at the first slot and across gaps") {
    val got = series(StatefulExpr.Derivative(Sum(a)))
    assert(!got.contains(slot(0)))
    assert(got(slot(1)) == 16.0)
    assert(!got.contains(slot(3)) && !got.contains(slot(4))) // NaN on either side
    assert(got(slot(5)) == 1.0)
  }

  test(":rolling-count counts truthy signals") {
    val sig = Binary(BinOp.Gt, Sum(a), Constant(4.0)) // 1 at slots 0,1,4,5
    val got = series(StatefulExpr.RollingCount(sig, 3))
    assert(got(slot(2)) == 2.0)
    assert(got(slot(5)) == 2.0)
  }

  test(":trend divides by the full window and warms up") {
    val got = series(StatefulExpr.Trend(Sum(a), 120000L)) // n=2
    assert(!got.contains(slot(0))) // warmup
    assert(got(slot(1)) == (11.0 + 27.0) / 2)
    assert(got(slot(3)) == 3.0 / 2) // NaN counts as 0 in the sum
  }

  test(":rolling-mean needs minNumValues non-NaN") {
    val got = series(StatefulExpr.RollingMean(Sum(a), 2, 2))
    assert(got(slot(1)) == 19.0)
    assert(!got.contains(slot(3))) // window = {3.0, NaN}: only 1 value
  }

  test(":cumulative-max tracks the running max") {
    val got = series(StatefulExpr.CumulativeMax(Sum(a)))
    assert(got(slot(5)) == 27.0)
  }

  test(":topk keeps k lines by stat, others aggregate") {
    val byNode = GroupBy(Sum(a), List("node"))
    val top = values(FilterExpr.PriorityFilter(byNode, "total", 1))
    assert(top.keys.map(_._1).toSet == Set("2")) // totals: node1=17, node2=35
    val others = values(FilterExpr.PriorityFilter(byNode, "total", 1, others = Some("sum")))
    assert(others.keys.map(_._1).toSet == Set("2", "--others--"))
    assert(others(("--others--", slot(4))) == 5.0)
  }

  test(":filter with :stat-avg keeps matching lines") {
    val byNode = GroupBy(Sum(a), List("node"))
    // avg: node1 = 17/5 = 3.4, node2 = 35/2 = 17.5
    val got = values(FilterExpr.Filter(
      byNode, Binary(BinOp.Gt, FilterExpr.StatExpr("avg"), Constant(10.0))))
    assert(got.keys.map(_._1).toSet == Set("2"))
  }

  test(":stat broadcasts the summary over the grid") {
    val got = series(FilterExpr.Stat(Sum(b), "total"))
    assert(got(slot(0)) == 600.0 && got(slot(5)) == 600.0)
  }

  test(":consolidate avg: rate lines average over the FULL interval (default dstype)") {
    val got = series(FilterExpr.Consolidate(Sum(a), 2, "avg"))
    assert(got(0L) == 19.0)      // (11+27)/2
    assert(got(slot(2)) == 1.5)  // slot 3 missing: rate avg = 3/2, NOT 3
    assert(got(slot(4)) == 5.5)
  }

  test(":consolidate avg: gauge lines average over slots WITH data only") {
    import spark.implicits._
    // same shape as series A slot 2/3 (gap), but tagged as a gauge
    val gdp = Seq(
      (Map("name" -> "t", "atlas.dstype" -> "gauge"), slot(2) + 1000L, 90.0)
    ).toDF("tags", "ts", "value")
    val expr = FilterExpr.Consolidate(
      Sum(Query.And(Query.Equal("name", "t"), Query.Equal("atlas.dstype", "gauge"))), 2, "avg")
    val got = Planner.output(Planner.eval(expr, gdp, ctx), Nil, 6)
      .collect().map(r => r.getAs[Long]("t") -> r.getAs[Double]("value")).toMap
    // reference TimeSeq.scala:189-214 comment: a gauge reporting 90 in one
    // of two consolidated slots reads 90, not 45
    assert(got == Map(slot(2) -> 90.0))
  }

  test(":offset shifts the fetch window") {
    val got = series(Sum(a, offset = 60000L))
    assert(got(slot(1)) == 11.0) // slot 0 data surfaces at slot 1
    assert(got(slot(3)) == 3.0)
  }

  test(":const and :time generate dense lines") {
    assert(series(Constant(7.0)).size == 6)
    assert(series(Constant(7.0))(slot(3)) == 7.0)
    val tod = series(Time("minuteOfHour"))
    assert(tod(slot(2)) == 2.0)
  }

  test(":clamp-min/:clamp-max bound values but keep NaN") {
    val got = series(ClampMax(ClampMin(Sum(a), 4.0), 20.0))
    assert(got(slot(0)) == 11.0)
    assert(got(slot(2)) == 4.0)
    assert(got(slot(1)) == 20.0)
    assert(!got.contains(slot(3)))
  }

  test("fused comparison tree materializes the FULL grid, not just slots with data") {
    // two fused Sum leaves: node=1 covers 0,1,2,4,5; node=2 covers 0,1.
    // Slot 3 has no data on ANY leaf — the fused groupBy(t) alone would
    // drop it, but comparison/boolean semantics demand a 0 there.
    val n1 = Query.And(a, Query.Equal("node", "1"))
    val n2 = Query.And(a, Query.Equal("node", "2"))
    val expr = Binary(BinOp.And,
      Binary(BinOp.Gt, Sum(n1), Constant(0.0)),
      Binary(BinOp.Gt, Sum(n2), Constant(0.0)))
    val s = series(expr)
    assert(s.keySet == (0 to 5).map(slot).toSet)
    assert(s(slot(0)) == 1.0 && s(slot(1)) == 1.0) // both sides present + positive
    assert(s(slot(3)) == 0.0)                      // no data on any leaf
    assert(s(slot(2)) == 0.0 && s(slot(4)) == 0.0 && s(slot(5)) == 0.0) // one side missing
  }

  test("property: QueryCompiler.compile agrees with Query.matches on every row, null-valued entries absent") {
    // THE bridge every fetch path leans on (parquet residuals, JdbcStore
    // residuals, the store index): the compiled Column predicate over a
    // tags MAP must agree with the model's matches() on arbitrary trees.
    // Rows include NULL-VALUED map entries — the Datapoints.events
    // convention for an absent optional tag, which compile() must treat
    // exactly as a missing key (getItem -> null) and the model sees as
    // absent after the null-strip.
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import Query._
    import spark.implicits._
    val keys = Seq("a", "b", "c")
    val vals = Seq("x", "y", "1", "x.*", "o'm")
    val rnd = new scala.util.Random(20260815)
    val rawRows: Seq[(Long, Map[String, String])] = (0L until 200L).map { i =>
      val m = keys.flatMap { k =>
        rnd.nextInt(4) match {
          case 0 => None                                   // key absent
          case 1 => Some(k -> (null: String))              // null-valued entry
          case _ => Some(k -> vals(rnd.nextInt(vals.length)))
        }
      }.toMap
      (i, m)
    }
    val df = rawRows.toDF("id", "tags").cache()
    df.count()
    // the model's view: null-valued entries are ABSENT
    val modelRows = rawRows.map { case (i, m) => (i, m.filter(_._2 != null)) }

    val genLeaf: Gen[Query] = Gen.oneOf(
      Gen.const(True: Query),
      Gen.const(False: Query),
      for (k <- Gen.oneOf(keys)) yield HasKey(k): Query,
      for (k <- Gen.oneOf(keys); v <- Gen.oneOf(vals)) yield Equal(k, v): Query,
      for (k <- Gen.oneOf(keys); v <- Gen.oneOf(vals)) yield LessThan(k, v): Query,
      for (k <- Gen.oneOf(keys); v <- Gen.oneOf(vals)) yield LessThanEqual(k, v): Query,
      for (k <- Gen.oneOf(keys); v <- Gen.oneOf(vals)) yield GreaterThan(k, v): Query,
      for (k <- Gen.oneOf(keys); v <- Gen.oneOf(vals)) yield GreaterThanEqual(k, v): Query,
      for (k <- Gen.oneOf(keys); v <- Gen.oneOf(vals)) yield Regex(k, v): Query,
      for (k <- Gen.oneOf(keys); v <- Gen.oneOf(vals)) yield RegexIgnoreCase(k, v): Query,
      for (k <- Gen.oneOf(keys); vs <- Gen.nonEmptyListOf(Gen.oneOf(vals)))
        yield In(k, vs.distinct): Query)
    def genQ(depth: Int): Gen[Query] =
      if (depth == 0) genLeaf
      else Gen.frequency(
        3 -> genLeaf,
        2 -> (for (a <- genQ(depth - 1); b <- genQ(depth - 1)) yield And(a, b): Query),
        2 -> (for (a <- genQ(depth - 1); b <- genQ(depth - 1)) yield Or(a, b): Query),
        1 -> genQ(depth - 1).map(q => Not(q): Query))

    val prop = Prop.forAll(genQ(4)) { q =>
      // filter semantics: a row passes iff the compiled predicate is TRUE
      // (null filters out) — one pass over all 200 rows per sample
      val pass = df.select(col("id"),
          graft.planner.QueryCompiler.compile(q, col("tags")).as("p"))
        .collect().map(r => r.getLong(0) -> (!r.isNullAt(1) && r.getBoolean(1))).toMap
      modelRows.forall { case (i, m) => q.matches(m) == pass(i) }
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(300), prop)
    assert(res.passed, s"compile/matches divergence: ${res.status}")
    df.unpersist()
  }
}
