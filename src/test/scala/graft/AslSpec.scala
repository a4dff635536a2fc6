package graft

import graft.asl._
import org.scalatest.funsuite.AnyFunSuite

/** ASL front-end: tokenizer, stack words, parse results, and the reference's
  * example-driven round-trip idea (BaseExamplesSuite): every word example
  * executes without error, and every produced expression's display form
  * re-parses to a structurally equal expression. */
class AslSpec extends AnyFunSuite {

  test("tokenize splits on commas, trims, drops empties") {
    assert(Interpreter.tokenize("a, b ,,c") == List("a", "b", "c"))
    assert(Interpreter.tokenize("name,sps,:eq") == List("name", "sps", ":eq"))
  }

  test("parse a simple aggregate") {
    assert(Asl.parse("name,sps,:eq,:sum") == DataExpr.Sum(Query.Equal("name", "sps")))
  }

  test("implicit coercion: bare query becomes :sum, number becomes :const") {
    assert(Asl.parseAll("name,sps,:eq").head.expr ==
      DataExpr.Sum(Query.Equal("name", "sps")))
    assert(Asl.parse("42,:const,4,:add") ==
      MathExpr.Binary(MathExpr.BinOp.Add, MathExpr.Constant(42.0), MathExpr.Constant(4.0)))
  }

  test("group by with inner aggregate and regroup") {
    val e = Asl.parse("name,sps,:eq,(,cluster,zone,),:by,:sum,(,cluster,),:by")
    assert(e == MathExpr.GroupBy(
      MathExpr.Aggr(MathExpr.AggrOp.Sum,
        DataExpr.GroupBy(DataExpr.Sum(Query.Equal("name", "sps")), List("cluster", "zone"))),
      List("cluster")))
  }

  test("matchesAny: reference QuerySuite truth table (any candidate value passes)") {
    import Query._
    val tags = Map("foo" -> List("bar"), "bar" -> List("foo"))
    val multi = Map("foo" -> List("foo", "bar"), "bar" -> List("foo"))
    val multi2 = Map("foo" -> List("bar", "baz"), "bar" -> List("foo"))
    assert(True.matchesAny(tags) && !False.matchesAny(tags))
    // eq: any candidate equal
    assert(Equal("foo", "bar").matchesAny(tags))
    assert(Equal("foo", "bar").matchesAny(multi) && Equal("foo", "bar").matchesAny(multi2))
    assert(!Equal("foo", "baz").matchesAny(tags) && !Equal("foo", "baz").matchesAny(multi))
    assert(!Equal("foo2", "bar").matchesAny(tags)) // missing key never matches
    // ordering words over candidates
    assert(!GreaterThan("foo", "bar").matchesAny(tags))
    assert(GreaterThan("foo", "bar").matchesAny(multi) && GreaterThan("foo", "bar").matchesAny(multi2))
    assert(!GreaterThan("foo2", "bar").matchesAny(tags))
    assert(GreaterThanEqual("foo", "bar").matchesAny(tags))
    assert(!LessThan("foo", "bar").matchesAny(tags))
    assert(LessThan("foo", "bar").matchesAny(Map("foo" -> List("bah", "bar"))))
    assert(!LessThan("foo", "bar").matchesAny(multi2))
    assert(LessThanEqual("foo", "bar").matchesAny(tags))
    // regex / has / not
    assert(Regex("foo", "b").matchesAny(tags) && Regex("foo", "b").matchesAny(multi))
    assert(!Regex("foo", "z").matchesAny(tags) && !Regex("foo2", "bar").matchesAny(tags))
    assert(HasKey("foo").matchesAny(tags))
    assert(!Not(True).matchesAny(tags) && Not(False).matchesAny(tags))
    // composite: and needs both sides, or needs either
    assert(And(Equal("foo", "bar"), HasKey("bar")).matchesAny(tags))
    assert(!And(Equal("foo", "baz"), HasKey("bar")).matchesAny(tags))
    assert(Or(Equal("foo", "baz"), HasKey("bar")).matchesAny(tags))
  }

  test("couldMatch: reference QuerySuite truth table (missing key is indeterminate)") {
    import Query._
    val tags = Map("foo" -> "bar", "bar" -> "foo")
    assert(True.couldMatch(tags) && !False.couldMatch(tags))
    // present key must pass its check; a MISSING key could still match
    assert(Equal("foo", "bar").couldMatch(tags))
    assert(!Equal("foo", "baz").couldMatch(tags))
    assert(Equal("foo2", "bar").couldMatch(tags))
    assert(GreaterThan("foo", "bar").couldMatch(Map("foo" -> "baz")))
    assert(!GreaterThan("foo", "bar").couldMatch(tags))
    assert(GreaterThan("foo2", "bar").couldMatch(tags))
    assert(LessThan("foo", "bar").couldMatch(Map("foo" -> "bah")))
    assert(!LessThan("foo", "bar").couldMatch(tags))
    assert(LessThan("foo2", "bar").couldMatch(tags))
    assert(Regex("foo", "b").couldMatch(tags))
    assert(!Regex("foo", "z").couldMatch(tags))
    assert(Regex("foo2", "bar").couldMatch(tags))
    // :has could always match (the key may arrive with the full tag set)
    assert(HasKey("foo").couldMatch(tags) && HasKey("zzz").couldMatch(tags))
    // :not flips full matches, NOT couldMatch: a definite sub-match
    // refutes it, a missing key keeps it possible
    assert(!Not(True).couldMatch(tags) && Not(False).couldMatch(tags))
    assert(!Not(Equal("foo", "bar")).couldMatch(tags))
    assert(Not(Equal("a", "b")).couldMatch(tags))
    // composite
    assert(And(Equal("foo", "bar"), Equal("later", "x")).couldMatch(tags))
    assert(!And(Equal("foo", "baz"), Equal("later", "x")).couldMatch(tags))
    assert(Or(Equal("foo", "baz"), Equal("later", "x")).couldMatch(tags))
  }

  test("property: couldMatch is a SOUND pre-filter — a match on any extension implies couldMatch on the partial tags") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import Query._
    val keys = Seq("a", "b", "c", "name")
    val vals = Seq("x", "y", "z", "1", "2")
    val genLeaf: Gen[Query] = Gen.oneOf(
      Gen.const(True: Query),
      Gen.const(False: Query),
      for (k <- Gen.oneOf(keys)) yield HasKey(k): Query,
      for (k <- Gen.oneOf(keys); v <- Gen.oneOf(vals)) yield Equal(k, v): Query,
      for (k <- Gen.oneOf(keys); v <- Gen.oneOf(vals)) yield LessThan(k, v): Query,
      for (k <- Gen.oneOf(keys); v <- Gen.oneOf(vals)) yield GreaterThanEqual(k, v): Query,
      for (k <- Gen.oneOf(keys); v <- Gen.oneOf(vals)) yield Regex(k, v): Query,
      for (k <- Gen.oneOf(keys); vs <- Gen.nonEmptyListOf(Gen.oneOf(vals)))
        yield In(k, vs.distinct): Query)
    def genQ(depth: Int): Gen[Query] =
      if (depth == 0) genLeaf
      else Gen.frequency(
        3 -> genLeaf,
        2 -> (for (a <- genQ(depth - 1); b <- genQ(depth - 1)) yield And(a, b): Query),
        2 -> (for (a <- genQ(depth - 1); b <- genQ(depth - 1)) yield Or(a, b): Query),
        1 -> genQ(depth - 1).map(q => Not(q): Query))
    val genTags: Gen[Map[String, String]] =
      Gen.mapOf(for (k <- Gen.oneOf(keys); v <- Gen.oneOf(vals)) yield k -> v)
    // m' = the partial (common) tags; m = m' extended with more tags,
    // never overriding a common key (the evaluator pre-filter's exact
    // situation: every admitted series CARRIES the scope's exact tags).
    // Soundness: if the full map matches, the pre-filter must keep the
    // query — violating this silently drops live subscriptions.
    //
    // (1) raw couldMatch is sound on its documented fragment: every
    // :not body :not-free (matches of a :not-free query is monotone
    // under added tags). This generator nests Not only over leaves.
    def safeQ(depth: Int): Gen[Query] =
      if (depth == 0) Gen.oneOf(genLeaf, genLeaf.map(q => Not(q): Query))
      else Gen.frequency(
        3 -> Gen.oneOf(genLeaf, genLeaf.map(q => Not(q): Query)),
        2 -> (for (a <- safeQ(depth - 1); b <- safeQ(depth - 1)) yield And(a, b): Query),
        2 -> (for (a <- safeQ(depth - 1); b <- safeQ(depth - 1)) yield Or(a, b): Query))
    val propSafe = Prop.forAll(safeQ(3), genTags, genTags) { (q, partial, extraRaw) =>
      val full = partial ++ (extraRaw -- partial.keySet)
      !q.matches(full) || q.couldMatch(partial)
    }
    val r1 = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(2000), propSafe)
    assert(r1.passed, s"couldMatch unsound on its safe fragment: ${r1.status}")
    // (2) the EVALUATOR's guarded pre-filter is sound on ARBITRARY trees
    // (outside the fragment it never prunes): this is the form wired into
    // the subscription fan-out. The raw couldMatch is NOT sound there —
    // e.g. Not(Not(GreaterThanEqual(b,1))) on empty partial tags refutes
    // a query that {b -> 2} satisfies (the reference's documented
    // approximation) — which is exactly why the guard exists.
    val propGuarded = Prop.forAll(genQ(3), genTags, genTags) { (q, partial, extraRaw) =>
      val full = partial ++ (extraRaw -- partial.keySet)
      !q.matches(full) || graft.streaming.Evaluator.soundPreFilter(q, partial)
    }
    val r2 = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(2000), propGuarded)
    assert(r2.passed, s"guarded pre-filter unsound: ${r2.status}")
    // the reference counterexample stays pinned explicitly
    val dblNeg = Not(Not(GreaterThanEqual("b", "1")))
    assert(!dblNeg.couldMatch(Map.empty)) // the approximation refutes it...
    assert(dblNeg.matches(Map("b" -> "2"))) // ...though an extension matches
    assert(graft.streaming.Evaluator.soundPreFilter(dblNeg, Map.empty)) // guard keeps it
  }

  test("property: matchesAny agrees with matches on singleton candidate lists") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    import Query._
    val keys = Seq("a", "b", "c")
    val vals = Seq("x", "y", "z")
    val genLeaf: Gen[Query] = Gen.oneOf(
      for (k <- Gen.oneOf(keys)) yield HasKey(k): Query,
      for (k <- Gen.oneOf(keys); v <- Gen.oneOf(vals)) yield Equal(k, v): Query,
      for (k <- Gen.oneOf(keys); v <- Gen.oneOf(vals)) yield LessThanEqual(k, v): Query,
      for (k <- Gen.oneOf(keys); v <- Gen.oneOf(vals)) yield RegexIgnoreCase(k, v): Query)
    def genQ(depth: Int): Gen[Query] =
      if (depth == 0) genLeaf
      else Gen.frequency(
        3 -> genLeaf,
        2 -> (for (a <- genQ(depth - 1); b <- genQ(depth - 1)) yield And(a, b): Query),
        2 -> (for (a <- genQ(depth - 1); b <- genQ(depth - 1)) yield Or(a, b): Query),
        1 -> genQ(depth - 1).map(q => Not(q): Query))
    val genTags: Gen[Map[String, String]] =
      Gen.mapOf(for (k <- Gen.oneOf(keys); v <- Gen.oneOf(vals)) yield k -> v)
    // singleton lists degenerate matchesAny to matches EXACTLY (incl.
    // through :not) — the reference's contract, pinned over random trees
    val prop = Prop.forAll(genQ(3), genTags) { (q, m) =>
      q.matchesAny(m.view.mapValues(List(_)).toMap) == q.matches(m)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(2000), prop)
    assert(res.passed, res.status.toString)
  }

  test("word stability gating: unstable word refused unless features enabled") {
    // reference semantics (stacklang Interpreter.scala:45-47): a word with
    // isStable = false throws unless the context opts into unstable
    // features; stable words are unaffected either way
    val vocab = CustomVocabulary(List(
      CustomVocabulary.Macro("exp-clamp", List("0", ":clamp-min"), stable = false),
      CustomVocabulary.Macro("ok-clamp", List("0", ":clamp-min"))
    ))
    val in = vocab.interpreter
    val base = "name,sps,:eq,:sum"
    val e = intercept[IllegalStateException] {
      in.execute(Interpreter.tokenize(s"$base,:exp-clamp"), Context(Nil))
    }
    assert(e.getMessage == "to use :exp-clamp enable unstable features")
    // same program succeeds with the flag; the stable macro needs nothing
    val ok = in.execute(Interpreter.tokenize(s"$base,:exp-clamp"),
      Context(Nil, unstableFeatures = true))
    assert(ok.stack.size == 1)
    assert(in.execute(Interpreter.tokenize(s"$base,:ok-clamp"), Context(Nil)).stack.size == 1)
  }

  test("query vs math word dispatch for shared names") {
    // two plain strings -> query :gt
    assert(Asl.parse("name,sps,:gt") == DataExpr.Sum(Query.GreaterThan("name", "sps")))
    // expr + number -> math :gt
    assert(Asl.parse("name,sps,:eq,:sum,100,:gt") ==
      MathExpr.Binary(MathExpr.BinOp.Gt,
        DataExpr.Sum(Query.Equal("name", "sps")), MathExpr.Constant(100.0)))
  }

  test(":cq ANDs the common query into every fetch") {
    val e = Asl.parse("name,a,:eq,:sum,name,b,:eq,:max,:add,env,prod,:eq,:cq")
    val expected = MathExpr.Binary(
      MathExpr.BinOp.Add,
      DataExpr.Sum(Query.And(Query.Equal("name", "a"), Query.Equal("env", "prod"))),
      DataExpr.Max(Query.And(Query.Equal("name", "b"), Query.Equal("env", "prod"))))
    assert(e == expected)
  }

  test(":cg appends to groupings") {
    val e = Asl.parse("name,a,:eq,:sum,(,cluster,),:cg")
    assert(e == DataExpr.GroupBy(DataExpr.Sum(Query.Equal("name", "a")), List("cluster")))
  }

  test(":offset rewrites all data exprs") {
    val e = Asl.parse("name,a,:eq,:sum,1w,:offset")
    assert(e == DataExpr.Sum(Query.Equal("name", "a"), offset = 604800000L))
  }

  test("style settings accumulate") {
    val e = Asl.parse("name,a,:eq,:sum,f00,:color,2,:lw")
    assert(e == StyleExpr(DataExpr.Sum(Query.Equal("name", "a")),
      Map("color" -> "f00", "lw" -> "2")))
  }

  test("standard words: dup/swap/over/rot manipulate the stack") {
    val in = Asl.interpreter
    assert(in.execute("a,:dup").stack == List("a", "a"))
    assert(in.execute("a,b,:swap").stack == List("a", "b"))
    assert(in.execute("a,b,:over").stack == List("a", "b", "a"))
    assert(in.execute("a,b,c,:rot").stack == List("a", "c", "b"))
    assert(in.execute("a,b,c,:-rot").stack == List("b", "a", "c"))
    assert(in.execute("a,b,:nip").stack == List("b"))
    assert(in.execute("a,b,:tuck").stack == List("b", "a", "b"))
    assert(in.execute("a,b,2,:nlist").stack == List(List("a", "b")))
    assert(in.execute("(,a,b,),(,:dup,),:map").stack ==
      List(List(List("a", "a"), List("b", "b"))))
  }

  test(":call executes a quoted program with depth guard") {
    val in = Asl.interpreter
    assert(in.execute("(,name,sps,:eq,),:call").stack == List(Query.Equal("name", "sps")))
    val bomb = "(,:dup,:call,),:dup,:call"
    assertThrows[IllegalStateException](in.execute(bomb))
  }

  test("interpreter guards: unknown word, unmatched parens, no match") {
    val in = Asl.interpreter
    assertThrows[IllegalStateException](in.execute("a,:nope"))
    assertThrows[IllegalStateException](in.execute("(,a"))
    assertThrows[IllegalStateException](in.execute("a,),b"))
    assertThrows[IllegalStateException](in.execute(":eq")) // stack underflow -> no match
  }

  test("every word example executes and round-trips its display form") {
    val failures = Vocabulary.allWords.flatMap { w =>
      w.examples.flatMap { ex =>
        try {
          val ctx = Asl.interpreter.execute(ex)
          // round-trip any expressions produced
          (ctx.stack ::: ctx.frozen).flatMap(Coerce.style).flatMap { se =>
            val display = se.asl
            val reparsed = Asl.parseAll(display)
            if (reparsed.map(s => s: Any) == List(se) ||
                reparsed.map(_.expr) == List(se.expr) && se.settings == reparsed.head.settings)
              None
            else Some(s":${w.name} example '$ex': '$display' reparsed to '${reparsed.map(_.asl)}'")
          }
        } catch {
          case e: Exception => Some(s":${w.name} example '$ex' failed: ${e.getMessage}")
        }
      }
    }
    assert(failures.isEmpty, "\n" + failures.mkString("\n"))
  }

  test("interpreter guard: stack size limit") {
    val in = Interpreter(Vocabulary.allWords, maxStackSize = 4)
    assertThrows[IllegalStateException](in.execute("a,b,c,d,e"))
  }
}
