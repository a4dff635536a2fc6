package graft

import graft.api.Api
import graft.core.EvalContext
import org.apache.spark.sql.functions._

/**
 * Golden-output harness in the spirit of the reference GrapherSuite
 * (atlas-eval graph/GrapherSuite.scala): full ASL programs evaluated over a
 * deterministic wave dataset, compared against checked-in JSON fragments.
 * The waves use prime-based periods like the reference's StaticDatabase
 * demo data so every slot value is reproducible by inspection.
 */
class GoldenSpec extends SparkSpec {

  val ctx = EvalContext(0L, 480000L, 60000L) // 8 slots
  def slot(i: Int): Long = i * 60000L

  // three deterministic "wave" series: value = base + (slot * prime) % mod
  lazy val dp = {
    import spark.implicits._
    val series = Seq(("a", 2, 7), ("b", 3, 11), ("c", 5, 13))
    val rows = for {
      (node, prime, mod) <- series
      i <- 0 until 8
    } yield (Map("name" -> "wave", "node" -> node), slot(i) + 1L, ((i * prime) % mod + 1).toDouble)
    rows.toDF("tags", "ts", "value")
  }

  private def render(program: String): List[String] =
    Api.graph(program, dp, ctx).collect().map(_.getString(0)).toList.sorted

  test("golden: grouped sum") {
    val out = render("name,wave,:eq,:sum,(,node,),:by")
    assert(out.size == 3)
    val a = out.find(_.contains("\"node\":\"a\"")).get
    // node a: (i*2)%7+1 for i=0..7 -> 1,3,5,7,2,4,6,1
    assert(a.contains("\"values\":[1.0,3.0,5.0,7.0,2.0,4.0,6.0,1.0]"), a)
    val c = out.find(_.contains("\"node\":\"c\"")).get
    // node c: (i*5)%13+1 -> 1,6,11,3,8,13,5,10
    assert(c.contains("\"values\":[1.0,6.0,11.0,3.0,8.0,13.0,5.0,10.0]"), c)
  }

  test("golden: total with binary math") {
    val out = render("name,wave,:eq,:sum,2,:mul")
    assert(out.size == 1)
    // totals: 3,13,23,20,12,22,19,22 -> doubled
    assert(out.head.contains("\"values\":[6.0,26.0,46.0,40.0,24.0,44.0,38.0,44.0]"), out.head)
  }

  test("golden: topk with others") {
    val out = render("name,wave,:eq,:sum,(,node,),:by,max,1,:topk-others-sum")
    assert(out.size == 2)
    // node c has max 13 -> kept; others = a+b summed
    assert(out.exists(_.contains("\"node\":\"c\"")), out.mkString("\n"))
    val others = out.find(_.contains("--others--")).get
    // a: 1,3,5,7,2,4,6,1 ; b: (i*3)%11+1 -> 1,4,7,10,2,5,8,11 ; sum
    assert(others.contains("\"values\":[2.0,7.0,12.0,17.0,4.0,9.0,14.0,12.0]"), others)
  }

  test("golden: rolling sum and derivative") {
    val out = render("name,wave,:eq,:sum,3,:rolling-sum")
    // totals 3,13,23,20,12,22,19,22; rolling(3): 3,16,39,56,55,54,53,63
    assert(out.head.contains("\"values\":[3.0,16.0,39.0,56.0,55.0,54.0,53.0,63.0]"), out.head)
    val d = render("name,wave,:eq,:sum,:derivative")
    // diffs: NaN,10,10,-3,-8,10,-3,3
    assert(d.head.contains("\"values\":[\"NaN\",10.0,10.0,-3.0,-8.0,10.0,-3.0,3.0]"), d.head)
  }

  test("golden: des-epic-signal fires on deviation") {
    // signal should be 0/1 over the window and parse through the macro
    val out = render("name,wave,:eq,:sum,2,0.1,0.5,0.2,0.2,4,:des-epic-signal")
    assert(out.size == 1)
    assert(out.head.contains("\"values\":["), out.head)
  }
}
