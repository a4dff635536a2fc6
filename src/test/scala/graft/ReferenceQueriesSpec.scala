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

  private val path = "/root/reference/atlas-core/src/test/resources/queries.txt"

  test("every ASL program in the reference corpus parses") {
    assume(new java.io.File(path).exists())
    val programs = scala.io.Source.fromFile(path).getLines().toList.flatMap { line =>
      line.split("[?&]").toList
        .find(_.startsWith("q="))
        .map(v => java.net.URLDecoder.decode(v.drop(2), "UTF-8"))
    }
    assert(programs.size > 300)
    val failures = programs.flatMap { p =>
      try { Asl.parseAll(p); None }
      catch { case e: Exception => Some(s"'$p' -> ${e.getMessage}") }
    }
    assert(
      failures.isEmpty,
      s"${failures.size}/${programs.size} failed:\n" + failures.take(25).mkString("\n"))
  }
}
