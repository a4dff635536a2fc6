package graft

import graft.api.ExprApi
import org.scalatest.funsuite.AnyFunSuite

/** Expression tooling surface (reference /api/v1/expr endpoints):
  * debug / normalize / complete / queries / rewrite / strip. */
class ExprApiSpec extends AnyFunSuite {

  test("debug traces every token with the remaining program and stack") {
    val steps = ExprApi.debug("name,cpu,:eq,:sum")
    // initial state + one step per token (the list-less program is 1:1)
    assert(steps.length == 5)
    assert(steps.head.program == List("name", "cpu", ":eq", ":sum"))
    assert(steps.head.stack == Nil)
    assert(steps(2).stack == List("cpu", "name")) // top first
    assert(steps(3).stack == List("name,cpu,:eq"))
    assert(steps.last.program == Nil)
    assert(steps.last.stack == List("name,cpu,:eq,:sum"))
  }

  test("debug collects a list literal as one step and records variables") {
    val steps = ExprApi.debug("name,cpu,:eq,:sum,(,app,),:by")
    val afterList = steps(steps.length - 2)
    assert(afterList.stack.head == "List(app)")
    assert(steps.last.stack == List("name,cpu,:eq,:sum,(,app,),:by"))
    val withVar = ExprApi.debug("v,name,cpu,:eq,:sum,:set,v,:get")
    assert(withVar.last.variables("v") == "name,cpu,:eq,:sum")
  }

  test("debug verifies the final stack against the vocabulary") {
    // query vocab: exactly one query
    assert(ExprApi.debug("name,cpu,:eq", vocab = "query").nonEmpty)
    intercept[IllegalArgumentException] {
      ExprApi.debug("name,cpu,:eq,app,www,:eq", vocab = "query")
    }
    // main vocab: every value must be presentation-coercible
    intercept[IllegalArgumentException] { ExprApi.debug("(,a,)") }
  }

  test("normalize produces the canonical display form") {
    // clause order canonalizes (name first), nested :cq distributes
    val n = ExprApi.normalize("app,www,:eq,name,cpu,:eq,:and,:sum")
    assert(n == List("name,cpu,:eq,app,www,:eq,:and,:sum"))
  }

  test("complete suggests only words that execute on the current stack") {
    val forQuery = ExprApi.complete("name,cpu,:eq")
    val names = forQuery.map(_.name).toSet
    assert(names.contains("sum") && names.contains("abs"))
    // :by needs the key list on the stack before it can match
    assert(!names.contains("by"))
    assert(ExprApi.complete("name,cpu,:eq,:sum,(,app,)").map(_.name).contains("by"))
    // excluded stack-manipulation words never appear
    assert(!names.contains("dup") && !names.contains("drop"))
    // empty stack: aggregate words that need an operand don't match
    val empty = ExprApi.complete("")
    assert(!empty.map(_.name).contains("by"))
    // deterministic: sorted by name
    assert(forQuery.map(_.name) == forQuery.map(_.name).sorted)
  }

  test("queries extracts the distinct data predicates, sorted") {
    val qs = ExprApi.queries(
      "name,cpu,:eq,:sum,name,disk,:eq,:max,:add,name,cpu,:eq,:count")
    assert(qs == List("name,cpu,:eq", "name,disk,:eq"))
  }

  test("rewrite migrates legacy list-form offsets to :offset operations") {
    // single non-zero offset -> plain :offset operator
    assert(ExprApi.rewrite("name,cpu,:eq,:sum,(,1h,),:offset")
      == List("name,cpu,:eq,:sum,1h,:offset"))
    // single zero offset -> dropped entirely
    assert(ExprApi.rewrite("name,cpu,:eq,:sum,(,0h,),:offset")
      == List("name,cpu,:eq,:sum"))
    // multiple offsets -> variable extraction, one :offset per duration
    assert(ExprApi.rewrite("name,cpu,:eq,:sum,(,0h,1w,),:offset")
      == List("Query0,name,cpu,:eq,:sum,:set,Query0,:get,Query0,:get,1w,:offset"))
    // no offsets -> unchanged
    assert(ExprApi.rewrite("name,cpu,:eq,:sum") == List("name,cpu,:eq,:sum"))
  }

  test("strip removes query clauses by key with ignore-mode simplification") {
    // AND clause on a stripped key vanishes
    assert(ExprApi.strip("name,cpu,:eq,node,i-1,:eq,:and,:sum", Set("node"))
      == List("name,cpu,:eq,:sum"))
    // :not of a stripped clause stays neutral (does not become :false)
    assert(ExprApi.strip("name,cpu,:eq,node,i-1,:eq,:not,:and,:sum", Set("node"))
      == List("name,cpu,:eq,:sum"))
    // unrelated keys untouched
    assert(ExprApi.strip("name,cpu,:eq,:sum", Set("node"))
      == List("name,cpu,:eq,:sum"))
  }

  test("syntaxTree recovers from errors with positioned diagnostics") {
    import graft.asl.{Asl, Interpreter}
    val t = Asl.interpreter.syntaxTree("name,cpu,:eq,:bogus,:sum")
    // :bogus is flagged with its exact span; :sum still executes after it
    assert(t.diagnostics.map(_.message) == List("unknown word ':bogus'"))
    assert(t.diagnostics.head.span == Interpreter.Span(13, 19))
    assert(t.stack == List("name,cpu,:eq,:sum"))
    // word nodes carry the stack before execution, top first
    val w = t.nodes.collect { case n: Interpreter.WordNode => n }
    assert(w.head.matched.contains("eq") && w.head.stackBefore == List("cpu", "name"))
    // a word that matches no overload leaves the stack unchanged
    val t2 = Asl.interpreter.syntaxTree("name,cpu,:eq,:by,:sum")
    assert(t2.diagnostics.exists(_.message.startsWith("no matches for word ':by'")))
    assert(t2.stack == List("name,cpu,:eq,:sum"))
  }

  test("syntaxTree flags unmatched parens and semicolon typos") {
    import graft.asl.{Asl, Interpreter}
    val t1 = Asl.interpreter.syntaxTree("(,app")
    assert(t1.diagnostics.exists(d => d.error && d.message == "unmatched opening parenthesis"))
    assert(t1.nodes.collect { case n: Interpreter.ListNode => n }.head.closed == false)
    val t2 = Asl.interpreter.syntaxTree("name,cpu,;eq")
    assert(t2.diagnostics.exists(d => !d.error && d.message.contains("did you mean ':eq'")))
    val t3 = Asl.interpreter.syntaxTree("a,)")
    assert(t3.diagnostics.exists(d => d.error && d.message == "unmatched closing parenthesis"))
  }

  test("strip removes filter and style wrappers anywhere in the tree") {
    assert(ExprApi.strip("name,cpu,:eq,:sum,max,2,:topk", Set.empty, Set("filter"))
      == List("name,cpu,:eq,:sum"))
    assert(ExprApi.strip("name,cpu,:eq,:sum,max,:stat,:abs", Set.empty, Set("filter"))
      == List("name,cpu,:eq,:sum,:abs"))
    assert(ExprApi.strip("name,cpu,:eq,:sum,2,:lw", Set.empty, Set("style"))
      == List("name,cpu,:eq,:sum"))
    intercept[IllegalArgumentException] {
      ExprApi.strip("name,cpu,:eq,:sum", Set.empty, Set("bogus"))
    }
  }

  test("format: simple stays inline, complex args break, round-trips") {
    // inline under the width budget
    assert(ExprApi.format("name,cpu,:eq,:sum") == "name,cpu,:eq,:sum")
    // two independent expressions separate with a blank line
    val two = ExprApi.format("name,a,:eq,:sum,name,b,:eq,:sum")
    assert(two.split("\n\n").length == 2)
    // a binary op over two fetches breaks each side onto its own line
    val add = ExprApi.format("name,cpu,:eq,:sum,name,disk,:eq,:sum,:add", maxWidth = 30)
    assert(add ==
      """name,cpu,:eq,:sum,
        |name,disk,:eq,:sum,
        |:add""".stripMargin)
    // whatever the shape, the tokens re-parse to the same normal form
    val p = "name,cpu,:eq,(,app,),:by,:sum,$app,:legend"
    assert(ExprApi.normalize(ExprApi.format(p, maxWidth = 20)) == ExprApi.normalize(p))
    intercept[IllegalArgumentException] { ExprApi.format("name,:bogus") }
  }

  test("codeActions: typo suggestions, semicolon fix, legacy offset migration") {
    // unknown word within distance 2 of a real one
    val p1 = "name,cpu,:eq,:sumx"
    val a1 = ExprApi.codeActions(p1)
    assert(a1.exists(a => a.replacement == ":sum" && a.start == p1.indexOf(":sumx")), a1.toString)
    // semicolon-for-colon typo
    val p2 = "name,cpu,:eq,;sum"
    val a2 = ExprApi.codeActions(p2)
    assert(a2.exists(a => a.replacement == ":sum" &&
      p2.substring(a.start, a.end) == ";sum"), a2.toString)
    // legacy list-form offsets migrate to :offset operations
    val p3 = "name,cpu,:eq,:sum,(,0h,1w,),:offset"
    val a3 = ExprApi.codeActions(p3)
    assert(a3.exists(a => a.title.contains("offset") && a.replacement.contains(":offset")),
      a3.toString)
    // a clean program yields no actions
    assert(ExprApi.codeActions("name,cpu,:eq,:sum").isEmpty)
  }

  test("documentSymbols: words nest their consumed arguments with covering spans") {
    val p = "name,cpu,:eq,:sum,4,:add"
    val syms = ExprApi.documentSymbols(p)
    assert(syms.length == 1)
    val add = syms.head
    assert(add.name == ":add" && add.kind == "function")
    assert(add.start == 0 && add.end == p.length)
    val Seq(sum, four) = add.children.toSeq
    assert(four.name == "4" && four.kind == "number")
    assert(sum.name == ":sum" && sum.children.map(_.name) == List(":eq"))
    val eq = sum.children.head
    assert(eq.children.map(_.name) == List("name", "cpu"))
    assert(eq.start == 0 && eq.end == p.indexOf(",:sum"))
  }

  test("semanticTokens classifies words, literals, numbers, parens, unknowns") {
    val prog = "name,cpu,:eq,:sum,(,app,),:by,2,:mul,:bogus"
    val toks = ExprApi.semanticTokens(prog)
    def typeAt(tok: String) = {
      val s = prog.indexOf(tok)
      toks.find(t => t.start == s).map(_.tokenType).getOrElse(fail(s"no token at '$tok'"))
    }
    assert(typeAt("name") == "string")
    assert(typeAt(":eq") == "word")
    assert(typeAt(":sum") == "word")
    assert(typeAt("(") == "paren")
    assert(typeAt("2,") == "number")
    assert(typeAt(":bogus") == "unknown-word")
    // spans reconstruct the original tokens
    toks.foreach(t => assert(t.start >= 0 && t.end <= prog.length && t.start < t.end))
  }

  test("hover: word shows signature, stack and examples; literal shows key/value position") {
    val prog = "name,cpu,:eq,:sum"
    val h = ExprApi.hover(prog, prog.indexOf(":sum") + 1).getOrElse(fail("no hover"))
    assert(h.contains("**:sum**"))
    assert(h.contains("--")) // the signature arrow
    val hk = ExprApi.hover(prog, 1).getOrElse(fail("no key hover"))
    assert(hk.contains("**name** (tag key)"))
    val hv = ExprApi.hover(prog, prog.indexOf("cpu") + 1).getOrElse(fail("no value hover"))
    assert(hv.contains("**cpu** (value of `name`)"))
    assert(ExprApi.hover(prog, prog.length + 5).isEmpty)
  }
}
