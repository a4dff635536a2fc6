package graft

import graft.asl.Asl
import org.scalatest.funsuite.AnyFunSuite

/**
 * Drop-in compatibility check: every ASL program in the reference's own
 * test corpus (atlas-core/src/test/resources/queries.txt — 372 real graph
 * request URIs) must parse through our front-end. This is the strongest
 * "a user of the reference could switch" statement the parser can make.
 */
class ReferenceQueriesSpec extends AnyFunSuite {

  test("expr tooling handles the whole reference corpus cleanly") {
    assume(new java.io.File(ReferenceQueries.path).exists())
    val programs = ReferenceQueries.programs
    val failures = programs.flatMap { p =>
      try {
        // normalize output must itself re-parse to the same normal form
        // (normalization is idempotent), queries must extract, and the
        // recovering parse must find nothing to complain about in a
        // corpus of valid programs
        val norm = graft.api.ExprApi.normalize(p)
        val again = graft.api.ExprApi.normalize(norm.mkString(","))
        val stable = again == norm
        val qs = graft.api.ExprApi.queries(p)
        val diags = Asl.interpreter.syntaxTree(p).diagnostics.filter(_.error)
        if (stable && qs != null && diags.isEmpty) None
        else Some(s"'$p' -> stable=$stable diags=${diags.take(2)}")
      } catch { case e: Exception => Some(s"'$p' -> ${e.getMessage}") }
    }
    assert(
      failures.isEmpty,
      s"${failures.size}/${programs.size} failed:\n" + failures.take(15).mkString("\n"))
  }

  test("formatting round-trips the whole corpus") {
    assume(new java.io.File(ReferenceQueries.path).exists())
    val programs = ReferenceQueries.programs
    val failures = programs.flatMap { p =>
      try {
        val formatted = graft.api.ExprApi.format(p)
        val same =
          graft.api.ExprApi.normalize(formatted) == graft.api.ExprApi.normalize(p)
        if (same) None else Some(s"'$p' -> reformatted to '$formatted'")
      } catch { case e: Exception => Some(s"'$p' -> ${e.getMessage}") }
    }
    assert(
      failures.isEmpty,
      s"${failures.size}/${programs.size} failed:\n" + failures.take(10).mkString("\n"))
  }

  test("every ASL program in the reference corpus parses") {
    assume(new java.io.File(ReferenceQueries.path).exists())
    val programs = ReferenceQueries.programs
    assert(programs.size > 250) // 372 corpus lines, ~276 distinct programs
    val failures = programs.flatMap { p =>
      try { Asl.parseAll(p); None }
      catch { case e: Exception => Some(s"'$p' -> ${e.getMessage}") }
    }
    assert(
      failures.isEmpty,
      s"${failures.size}/${programs.size} failed:\n" + failures.take(25).mkString("\n"))
  }
}

object ReferenceQueries {
  val path = "/root/reference/atlas-core/src/test/resources/queries.txt"

  private def decode(v: String): String = java.net.URLDecoder.decode(v, "UTF-8")

  /** (ASL program, request tz) pairs — 61 corpus URIs carry a tz param
    * (US/Eastern, US/Pacific, UTC), evaluated in their own zone. */
  def requests: List[(String, String)] =
    scala.io.Source.fromFile(path).getLines().toList.flatMap { line =>
      val parts = line.split("[?&]").toList
      val tz = parts.find(_.startsWith("tz="))
        .map(v => decode(v.drop(3))).getOrElse("UTC")
      parts.find(_.startsWith("q=")).map(v => (decode(v.drop(2)), tz))
    }.distinct

  def programs: List[String] = requests.map(_._1).distinct
}

/** Every 7th corpus program evaluated end-to-end through Api.graph against
  * the sf0.001 events datapoints: exercises the planner over the operator
  * combinations real dashboards use (multi-expr stacks, :each loops, list
  * offsets, axes/palettes, legends). Queries reference tags our testdata
  * lacks — empty results are fine; what must not happen is a planning or
  * execution failure. */
class ReferenceQueriesEvalSpec extends SparkSpec {

  test("sampled corpus programs evaluate through the graph API") {
    assume(new java.io.File(ReferenceQueries.path).exists())
    val sample = ReferenceQueries.requests.zipWithIndex.collect {
      case (r, i) if i % 7 == 0 => r
    }
    val dp = graft.sources.Datapoints.events(spark, "/root/testdata/sf0.001")
    val ctx = graft.core.EvalContext.testdata
    // codegen fallback OFF: a janino failure (e.g. `Code grows beyond
    // 64 KB` — which the per-slot element_at form of Api.message's values
    // array used to trigger on every 720-slot graph) must FAIL the test,
    // not silently execute the hottest stage interpreted.
    spark.conf.set("spark.sql.codegen.fallback", "false")
    val failures =
      try sample.flatMap { case (p, tz) =>
        try {
          graft.api.Api.graph(p, dp, ctx.copy(tz = tz)).collect()
          None
        } catch { case e: Exception => Some(s"'$p' (tz=$tz) -> ${e.getMessage}") }
      } finally spark.conf.set("spark.sql.codegen.fallback", "true")
    assert(
      failures.isEmpty,
      s"${failures.size}/${sample.size} failed:\n" + failures.take(15).mkString("\n"))
  }
}
