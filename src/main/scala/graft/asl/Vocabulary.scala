package graft.asl

/**
 * The ASL vocabularies: word definitions re-implementing the reference's
 * StandardVocabulary / QueryVocabulary / DataVocabulary / MathVocabulary /
 * StatefulVocabulary / FilterVocabulary / StyleVocabulary word semantics
 * (SURVEY.md §2). Dispatch is first-match in list order, so query words
 * (which match plain strings) precede math words (which coerce) for shared
 * names like :and/:gt/:sum.
 */
object Vocabulary {

  // --- helpers --------------------------------------------------------------

  private def word(n: String, sig: String, ex: List[String] = Nil)(
      m: List[Any] => Boolean)(
      run: (Context, Interpreter) => Context): Word =
    new Word {
      def name = n
      def signature = sig
      def matches(stack: List[Any]): Boolean = m(stack)
      def execute(ctx: Context, in: Interpreter): Context = run(ctx, in)
      override def examples: List[String] = ex
    }

  private def isStr(v: Any): Boolean = v.isInstanceOf[String]
  private def isNum(v: Any): Boolean = v match {
    case s: String => Coerce.isNumber(s)
    case _         => false
  }
  private def isIntStr(v: Any): Boolean = v match {
    case s: String => s.forall(_.isDigit) && s.nonEmpty
    case _         => false
  }
  private def isQ(v: Any): Boolean = v.isInstanceOf[Query]
  private def isTS(v: Any): Boolean = Coerce.isTimeSeries(v)
  private def isList(v: Any): Boolean = v.isInstanceOf[List[_]]

  private def ts(v: Any): TimeSeriesExpr = Coerce.timeSeries(v).get

  private def pop2[A](ctx: Context)(f: (Any, Any, List[Any]) => A): A = ctx.stack match {
    case a :: b :: rest => f(a, b, rest)
    case _              => throw new IllegalStateException("stack underflow")
  }

  // --- standard stack words (StandardVocabulary.scala) ----------------------

  private val standard: List[Word] = List(
    word("dup", "a -- a a", List("a,:dup")) { s => s.nonEmpty } { (c, _) =>
      c.copy(stack = c.stack.head :: c.stack)
    },
    word("drop", "a --", List("a,b,:drop")) { s => s.nonEmpty } { (c, _) =>
      c.copy(stack = c.stack.tail)
    },
    word("swap", "a b -- b a", List("a,b,:swap")) { s => s.size >= 2 } { (c, _) =>
      pop2(c)((a, b, rest) => c.copy(stack = b :: a :: rest))
    },
    word("over", "a b -- a b a", List("a,b,:over")) { s => s.size >= 2 } { (c, _) =>
      c.copy(stack = c.stack(1) :: c.stack)
    },
    word("rot", "a b c -- b c a", List("a,b,c,:rot")) { s => s.size >= 3 } { (c, _) =>
      val a :: b :: x :: rest = c.stack: @unchecked
      c.copy(stack = x :: a :: b :: rest)
    },
    word("-rot", "a b c -- c a b", List("a,b,c,:-rot")) { s => s.size >= 3 } { (c, _) =>
      val a :: b :: x :: rest = c.stack: @unchecked
      c.copy(stack = b :: x :: a :: rest)
    },
    word("clear", "* --", List("a,b,:clear")) { _ => true } { (c, _) =>
      c.copy(stack = Nil)
    },
    word("depth", "* -- * n", List("a,b,:depth")) { _ => true } { (c, _) =>
      c.copy(stack = c.stack.size.toString :: c.stack)
    },
    word("pick", "aN..a0 n -- aN..a0 aN", List("a,b,1,:pick")) { s =>
      s.headOption.exists(isIntStr)
    } { (c, _) =>
      val n = c.stack.head.asInstanceOf[String].toInt
      c.copy(stack = c.stack.tail(n) :: c.stack.tail)
    },
    word("roll", "aN..a0 n -- aN-1..a0 aN", List("a,b,c,2,:roll")) { s =>
      s.headOption.exists(isIntStr)
    } { (c, _) =>
      val n = c.stack.head.asInstanceOf[String].toInt
      val rest = c.stack.tail
      c.copy(stack = rest(n) :: (rest.take(n) ++ rest.drop(n + 1)))
    },
    word("nip", "a b -- b", List("a,b,:nip")) { s => s.size >= 2 } { (c, _) =>
      c.copy(stack = c.stack.head :: c.stack.drop(2))
    },
    word("tuck", "a b -- b a b", List("a,b,:tuck")) { s => s.size >= 2 } { (c, _) =>
      pop2(c)((a, b, rest) => c.copy(stack = a :: b :: a :: rest))
    },
    word("2over", "a b -- a b a b", List("a,b,:2over")) { s => s.size >= 2 } { (c, _) =>
      c.copy(stack = c.stack(1) :: c.stack(0) :: c.stack)
    },
    word("ndrop", "aN..a0 n -- aN", List("a,b,c,2,:ndrop")) { s =>
      s.headOption.exists(isIntStr)
    } { (c, _) =>
      val n = c.stack.head.asInstanceOf[String].toInt
      c.copy(stack = c.stack.tail.drop(n))
    },
    word("nlist", "aN..a0 n -- aN (aN-1..a0)", List("a,b,2,:nlist")) { s =>
      s.headOption.exists(isIntStr)
    } { (c, _) =>
      val n = c.stack.head.asInstanceOf[String].toInt
      val rest = c.stack.tail
      c.copy(stack = rest.take(n).reverse :: rest.drop(n))
    },
    word("list", "* -- (*)", List("a,b,:list")) { _ => true } { (c, _) =>
      c.copy(stack = List(c.stack.reverse))
    },
    word("call", "(program) -- *", List("(,a,),:call")) { s =>
      s.headOption.exists(isList)
    } { (c, in) =>
      in.call(c.stack.head.asInstanceOf[List[Any]], c.copy(stack = c.stack.tail))
    },
    word("each", "(items) (program) -- *", List("(,a,b,),(,:dup,),:each")) { s =>
      s.size >= 2 && isList(s.head) && isList(s(1))
    } { (c, in) =>
      val program = c.stack.head.asInstanceOf[List[Any]]
      val items = c.stack(1).asInstanceOf[List[Any]]
      items.foldLeft(c.copy(stack = c.stack.drop(2))) { (acc, item) =>
        in.call(program, acc.copy(stack = item :: acc.stack))
      }
    },
    word("map", "(items) (program) -- (results)", List("(,a,b,),(,:dup,),:map")) { s =>
      s.size >= 2 && isList(s.head) && isList(s(1))
    } { (c, in) =>
      val program = c.stack.head.asInstanceOf[List[Any]]
      val items = c.stack(1).asInstanceOf[List[Any]]
      val base = c.copy(stack = c.stack.drop(2))
      val results = items.map { item =>
        in.call(program, base.copy(stack = item :: Nil)).stack match {
          case r :: Nil => r
          case other => other.reverse
        }
      }
      base.copy(stack = results :: base.stack)
    },
    word("format", "(args) pattern -- str", List("(,42,),%s,:format")) { s =>
      s.size >= 2 && isStr(s.head) && isList(s(1))
    } { (c, _) =>
      val pattern = c.stack.head.asInstanceOf[String]
      val args = c.stack(1).asInstanceOf[List[Any]].map(_.asInstanceOf[AnyRef])
      c.copy(stack = pattern.format(args: _*) :: c.stack.drop(2))
    },
    word("get", "k -- v", Nil) { s => s.headOption.exists(isStr) } { (c, _) =>
      val k = c.stack.head.asInstanceOf[String]
      c.copy(stack = c.variables(k) :: c.stack.tail)
    },
    word("set", "k v --", Nil) { s => s.size >= 2 && isStr(s(1)) } { (c, _) =>
      pop2(c)((v, k, rest) =>
        c.copy(stack = rest, variables = c.variables + (k.asInstanceOf[String] -> v)))
    },
    word("freeze", "* --", Nil) { _ => true } { (c, _) =>
      c.copy(stack = Nil, frozen = c.stack ::: c.frozen)
    },
    macroWord("sset", List(":swap", ":set"), Nil),
    macroWord("fcall", List(":get", ":call"), Nil)
  )

  /** A word defined as a token program (StandardVocabulary.Macro). */
  private def macroWord(n: String, program: List[String], ex: List[String]): Word =
    word(n, "macro", ex) { _ => true } { (c, in) => in.execute(program, c) }

  // --- query words (QueryVocabulary.scala) ----------------------------------

  private def kvWord(n: String, mk: (String, String) => Query, ex: String): Word =
    word(n, "k v -- Query", List(ex)) { s => s.size >= 2 && isStr(s.head) && isStr(s(1)) } {
      (c, _) =>
        pop2(c)((v, k, rest) =>
          c.copy(stack = mk(k.asInstanceOf[String], v.asInstanceOf[String]) :: rest))
    }

  private val query: List[Word] = List(
    word("true", "-- Query", List(":true")) { _ => true } { (c, _) =>
      c.copy(stack = Query.True :: c.stack)
    },
    word("false", "-- Query", List(":false")) { _ => true } { (c, _) =>
      c.copy(stack = Query.False :: c.stack)
    },
    word("has", "k -- Query", List("name,:has")) { s => s.headOption.exists(isStr) } { (c, _) =>
      c.copy(stack = Query.HasKey(c.stack.head.asInstanceOf[String]) :: c.stack.tail)
    },
    kvWord("eq", Query.Equal.apply, "name,sps,:eq"),
    kvWord("lt", Query.LessThan.apply, "name,sps,:lt"),
    kvWord("le", Query.LessThanEqual.apply, "name,sps,:le"),
    kvWord("gt", Query.GreaterThan.apply, "name,sps,:gt"),
    kvWord("ge", Query.GreaterThanEqual.apply, "name,sps,:ge"),
    kvWord("re", Query.Regex.apply, "name,sps.*,:re"),
    kvWord("reic", Query.RegexIgnoreCase.apply, "name,SPS.*,:reic"),
    kvWord("contains", Query.contains, "name,ps,:contains"),
    kvWord("starts", Query.starts, "name,sp,:starts"),
    kvWord("ends", Query.ends, "name,ps,:ends"),
    word("in", "k (vs) -- Query", List("name,(,a,b,),:in")) { s =>
      s.size >= 2 && isList(s.head) && isStr(s(1))
    } { (c, _) =>
      pop2(c)((vs, k, rest) =>
        c.copy(stack =
          Query.In(k.asInstanceOf[String], Coerce.stringList(vs).get) :: rest))
    },
    word("and", "Query Query -- Query", List("name,a,:eq,name,b,:eq,:and")) { s =>
      s.size >= 2 && isQ(s.head) && isQ(s(1))
    } { (c, _) =>
      pop2(c)((b, a, rest) =>
        c.copy(stack = Query.And(a.asInstanceOf[Query], b.asInstanceOf[Query]) :: rest))
    },
    word("or", "Query Query -- Query", List("name,a,:eq,name,b,:eq,:or")) { s =>
      s.size >= 2 && isQ(s.head) && isQ(s(1))
    } { (c, _) =>
      pop2(c)((b, a, rest) =>
        c.copy(stack = Query.Or(a.asInstanceOf[Query], b.asInstanceOf[Query]) :: rest))
    },
    word("not", "Query -- Query", List("name,a,:eq,:not")) { s =>
      s.headOption.exists(isQ)
    } { (c, _) =>
      c.copy(stack = Query.Not(c.stack.head.asInstanceOf[Query]) :: c.stack.tail)
    },
    word("cq", "TimeSeriesExpr Query -- TimeSeriesExpr", List("name,a,:eq,:sum,env,prod,:eq,:cq")) { s =>
      s.size >= 2 && isQ(s.head) && (isTS(s(1)) || s(1).isInstanceOf[StyleExpr])
    } { (c, _) =>
      pop2(c) { (q, e, rest) =>
        val common = q.asInstanceOf[Query]
        val rewritten = Rewrite.mapData(
          Coerce.style(e).get, d => Rewrite.withCommonQuery(d, common)) match {
          case StyleExpr(inner, s) if s.isEmpty => inner
          case other                            => other
        }
        c.copy(stack = rewritten :: rest)
      }
    }
  )

  // --- data words (DataVocabulary.scala) ------------------------------------

  private def dataAgg(n: String, mk: Query => DataExpr, ex: String): Word =
    word(n, "Query -- DataExpr", List(ex)) { s => s.headOption.exists(isQ) } { (c, _) =>
      c.copy(stack = mk(c.stack.head.asInstanceOf[Query]) :: c.stack.tail)
    }

  private val data: List[Word] = List(
    dataAgg("all", q => DataExpr.All(q), "name,sps,:eq,:all"),
    dataAgg("sum", q => DataExpr.Sum(q), "name,sps,:eq,:sum"),
    dataAgg("count", q => DataExpr.Count(q), "name,sps,:eq,:count"),
    dataAgg("min", q => DataExpr.Min(q), "name,sps,:eq,:min"),
    dataAgg("max", q => DataExpr.Max(q), "name,sps,:eq,:max"),
    word("by", "AggregateFunction (keys) -- DataExpr.GroupBy",
      List("name,sps,:eq,:sum,(,cluster,),:by", "name,sps,:eq,(,cluster,),:by")) { s =>
      s.size >= 2 && isList(s.head) &&
        (s(1).isInstanceOf[DataExpr.AggregateFunction] || isQ(s(1)))
    } { (c, _) =>
      pop2(c) { (keys, e, rest) =>
        val af = e match {
          case a: DataExpr.AggregateFunction => a
          case q: Query                      => DataExpr.Sum(q)
          case _                             => throw new IllegalStateException
        }
        c.copy(stack = DataExpr.GroupBy(af, Coerce.stringList(keys).get) :: rest)
      }
    },
    word("cf-sum", "AggregateFunction -- DataExpr", List("name,sps,:eq,:sum,:cf-sum")) { s =>
      s.headOption.exists(_.isInstanceOf[DataExpr.AggregateFunction])
    } { (c, _) =>
      c.copy(stack = DataExpr.Consolidation(
        c.stack.head.asInstanceOf[DataExpr.AggregateFunction], "sum") :: c.stack.tail)
    },
    word("cf-avg", "AggregateFunction -- DataExpr", List("name,sps,:eq,:sum,:cf-avg")) { s =>
      s.headOption.exists(_.isInstanceOf[DataExpr.AggregateFunction])
    } { (c, _) =>
      c.copy(stack = DataExpr.Consolidation(
        c.stack.head.asInstanceOf[DataExpr.AggregateFunction], "avg") :: c.stack.tail)
    },
    word("cf-min", "AggregateFunction -- DataExpr", List("name,sps,:eq,:min,:cf-min")) { s =>
      s.headOption.exists(_.isInstanceOf[DataExpr.AggregateFunction])
    } { (c, _) =>
      c.copy(stack = DataExpr.Consolidation(
        c.stack.head.asInstanceOf[DataExpr.AggregateFunction], "min") :: c.stack.tail)
    },
    word("cf-max", "AggregateFunction -- DataExpr", List("name,sps,:eq,:max,:cf-max")) { s =>
      s.headOption.exists(_.isInstanceOf[DataExpr.AggregateFunction])
    } { (c, _) =>
      c.copy(stack = DataExpr.Consolidation(
        c.stack.head.asInstanceOf[DataExpr.AggregateFunction], "max") :: c.stack.tail)
    },
    word("offset", "TimeSeriesExpr duration -- TimeSeriesExpr",
      List("name,sps,:eq,:sum,1w,:offset")) { s =>
      s.size >= 2 && isStr(s.head) && (isTS(s(1)) || s(1).isInstanceOf[StyleExpr])
    } { (c, _) =>
      pop2(c) { (dur, e, rest) =>
        val offset = Strings.parseDuration(dur.asInstanceOf[String])
        val rewritten = Rewrite.mapData(Coerce.style(e).get, _.withOffset(offset)) match {
          case StyleExpr(inner, s) if s.isEmpty => inner
          case other                            => other
        }
        c.copy(stack = rewritten :: rest)
      }
    }
  )

  // --- math words (MathVocabulary.scala) ------------------------------------

  private def unary(n: String, op: MathExpr.UnaryOp, ex: String): Word =
    word(n, "TimeSeriesExpr -- TimeSeriesExpr", List(ex)) { s =>
      s.headOption.exists(isTS)
    } { (c, _) =>
      c.copy(stack = MathExpr.Unary(op, ts(c.stack.head)) :: c.stack.tail)
    }

  private def binary(op: MathExpr.BinOp, ex: String): Word =
    word(op.name, "TimeSeriesExpr TimeSeriesExpr -- TimeSeriesExpr", List(ex)) { s =>
      s.size >= 2 && isTS(s.head) && isTS(s(1))
    } { (c, _) =>
      pop2(c)((b, a, rest) =>
        c.copy(stack = MathExpr.Binary(op, ts(a), ts(b)) :: rest))
    }

  private def mathAggr(n: String, op: MathExpr.AggrOp, ex: String): Word =
    word(n, "TimeSeriesExpr -- TimeSeriesExpr", List(ex)) { s =>
      s.headOption.exists(v => isTS(v) && !isQ(v))
    } { (c, _) =>
      // On a base aggregate the result is already a single line, so the math
      // aggregate is a no-op unless it is a count (MathVocabulary.scala:1185-1196).
      val result = c.stack.head match {
        case a: DataExpr.AggregateFunction if op != MathExpr.AggrOp.Count => a
        case v                                                            => MathExpr.Aggr(op, ts(v))
      }
      c.copy(stack = result :: c.stack.tail)
    }

  private val mathWords: List[Word] = List(
    word("const", "num -- TimeSeriesExpr", List("42,:const")) { s =>
      s.headOption.exists(isNum)
    } { (c, _) =>
      c.copy(stack =
        MathExpr.Constant(c.stack.head.asInstanceOf[String].toDouble) :: c.stack.tail)
    },
    word("pi", "-- TimeSeriesExpr", List(":pi")) { _ => true } { (c, _) =>
      c.copy(stack = MathExpr.Constant(math.Pi) :: c.stack)
    },
    word("random", "-- TimeSeriesExpr", List(":random")) { _ => true } { (c, _) =>
      c.copy(stack = MathExpr.SeededRandom(0) :: c.stack)
    },
    word("srandom", "seed -- TimeSeriesExpr", List("42,:srandom")) { s =>
      s.headOption.exists(isIntStr)
    } { (c, _) =>
      c.copy(stack =
        MathExpr.SeededRandom(c.stack.head.asInstanceOf[String].toInt) :: c.stack.tail)
    },
    word("time", "mode -- TimeSeriesExpr", List("hourOfDay,:time")) { s =>
      s.headOption.exists(v => isStr(v) &&
        MathExpr.Time.canonical.contains(MathExpr.Time.normalize(v.asInstanceOf[String])))
    } { (c, _) =>
      c.copy(stack = MathExpr.Time(c.stack.head.asInstanceOf[String]) :: c.stack.tail)
    },
    word("time-span", "s e -- TimeSeriesExpr", List("1704844800000,1705276800000,:time-span")) { s =>
      s.size >= 2 && isStr(s.head) && isStr(s(1))
    } { (c, _) =>
      // full graph-API date grammar: epoch (magnitude-detected), ISO, or
      // now/epoch-relative forms, resolved at parse time like the reference;
      // zone-less ISO dates resolve in the interpreter's `tz` variable (the
      // reference seeds it from the request, Grapher.scala:169-171)
      val (s0, e0) = (c.stack(1).asInstanceOf[String], c.stack.head.asInstanceOf[String])
      val tz = c.variables.get("tz")
        .map(v => java.time.ZoneId.of(v.toString))
        .getOrElse(java.time.ZoneOffset.UTC)
      val range = Strings.timeRange(s0, e0, tz = tz)
      c.copy(stack = MathExpr.TimeSpan(range._1, range._2) :: c.stack.drop(2))
    },
    unary("abs", MathExpr.UnaryOp.Abs, "name,sps,:eq,:sum,:abs"),
    unary("neg", MathExpr.UnaryOp.Negate, "name,sps,:eq,:sum,:neg"),
    unary("sin", MathExpr.UnaryOp.Sine, "hourOfDay,:time,:sin"),
    unary("sqrt", MathExpr.UnaryOp.Sqrt, "name,sps,:eq,:sum,:sqrt"),
    word("per-step", "TimeSeriesExpr -- TimeSeriesExpr", List("name,sps,:eq,:sum,:per-step")) { s =>
      s.headOption.exists(isTS)
    } { (c, _) =>
      c.copy(stack = MathExpr.PerStep(ts(c.stack.head)) :: c.stack.tail)
    },
    word("clamp-min", "TimeSeriesExpr num -- TimeSeriesExpr",
      List("name,sps,:eq,:sum,100,:clamp-min")) { s =>
      s.size >= 2 && isNum(s.head) && isTS(s(1))
    } { (c, _) =>
      pop2(c)((v, e, rest) =>
        c.copy(stack =
          MathExpr.ClampMin(ts(e), v.asInstanceOf[String].toDouble) :: rest))
    },
    word("clamp-max", "TimeSeriesExpr num -- TimeSeriesExpr",
      List("name,sps,:eq,:sum,100,:clamp-max")) { s =>
      s.size >= 2 && isNum(s.head) && isTS(s(1))
    } { (c, _) =>
      pop2(c)((v, e, rest) =>
        c.copy(stack =
          MathExpr.ClampMax(ts(e), v.asInstanceOf[String].toDouble) :: rest))
    },
    binary(MathExpr.BinOp.Add, "name,a,:eq,:sum,name,b,:eq,:sum,:add"),
    binary(MathExpr.BinOp.Sub, "name,a,:eq,:sum,name,b,:eq,:sum,:sub"),
    binary(MathExpr.BinOp.Mul, "name,a,:eq,:sum,name,b,:eq,:sum,:mul"),
    binary(MathExpr.BinOp.Div, "name,a,:eq,:sum,name,b,:eq,:sum,:div"),
    binary(MathExpr.BinOp.Pow, "name,a,:eq,:sum,2,:pow"),
    binary(MathExpr.BinOp.FAdd, "name,a,:eq,:sum,name,b,:eq,:sum,:fadd"),
    binary(MathExpr.BinOp.FSub, "name,a,:eq,:sum,name,b,:eq,:sum,:fsub"),
    binary(MathExpr.BinOp.FMul, "name,a,:eq,:sum,name,b,:eq,:sum,:fmul"),
    binary(MathExpr.BinOp.FDiv, "name,a,:eq,:sum,name,b,:eq,:sum,:fdiv"),
    binary(MathExpr.BinOp.Gt, "name,a,:eq,:sum,100,:gt"),
    binary(MathExpr.BinOp.Ge, "name,a,:eq,:sum,100,:ge"),
    binary(MathExpr.BinOp.Lt, "name,a,:eq,:sum,100,:lt"),
    binary(MathExpr.BinOp.Le, "name,a,:eq,:sum,100,:le"),
    binary(MathExpr.BinOp.And, "name,a,:eq,:sum,name,b,:eq,:sum,:and"),
    binary(MathExpr.BinOp.Or, "name,a,:eq,:sum,name,b,:eq,:sum,:or"),
    mathAggr("sum", MathExpr.AggrOp.Sum, "name,sps,:eq,(,cluster,),:by,:sum"),
    mathAggr("count", MathExpr.AggrOp.Count, "name,sps,:eq,(,cluster,),:by,:count"),
    mathAggr("min", MathExpr.AggrOp.Min, "name,sps,:eq,(,cluster,),:by,:min"),
    mathAggr("max", MathExpr.AggrOp.Max, "name,sps,:eq,(,cluster,),:by,:max"),
    word("by", "AggrMathExpr (keys) -- TimeSeriesExpr",
      List("name,sps,:eq,(,cluster,zone,),:by,:sum,(,cluster,),:by")) { s =>
      s.size >= 2 && isList(s.head) && s(1).isInstanceOf[MathExpr.Aggr]
    } { (c, _) =>
      pop2(c)((keys, e, rest) =>
        c.copy(stack = MathExpr.GroupBy(
          e.asInstanceOf[MathExpr.Aggr], Coerce.stringList(keys).get) :: rest))
    },
    word("cg", "TimeSeriesExpr (keys) -- TimeSeriesExpr",
      List("name,sps,:eq,:sum,(,cluster,),:cg")) { s =>
      s.size >= 2 && isList(s.head) && (isTS(s(1)) || s(1).isInstanceOf[StyleExpr])
    } { (c, _) =>
      pop2(c) { (keys, e, rest) =>
        val ks = Coerce.stringList(keys).get
        val rewritten = Rewrite.mapData(Coerce.style(e).get, d => Rewrite.withCommonGroup(d, ks)) match {
          case StyleExpr(inner, s) if s.isEmpty => inner
          case other                            => other
        }
        c.copy(stack = rewritten :: rest)
      }
    },
    word("as", "TimeSeriesExpr orig repl -- TimeSeriesExpr",
      List("name,sps,:eq,(,cluster,),:by,cluster,c,:as")) { s =>
      s.size >= 3 && isStr(s.head) && isStr(s(1)) && isTS(s(2))
    } { (c, _) =>
      val repl :: orig :: e :: rest = c.stack: @unchecked
      c.copy(stack = MathExpr.As(
        ts(e), orig.asInstanceOf[String], repl.asInstanceOf[String]) :: rest)
    },
    // user-facing form of the macro mechanism (MathVocabulary.scala:630-682):
    // evaluate `rewritten`, display as `original,:name`; presentation
    // settings of a styled original carry forward
    word("named-rewrite", "original rewritten name -- TimeSeriesExpr",
      List("name,sps,:eq,name,sps,:eq,:sum,name,sps,:eq,:count,:div,avg,:named-rewrite")) { s =>
      s.size >= 3 && isStr(s.head) && isTS(s(1)) &&
        (isTS(s(2)) || isQ(s(2)) || s(2).isInstanceOf[StyleExpr])
    } { (c, _) =>
      val (n: String) :: rwAny :: origAny :: rest = c.stack: @unchecked
      val display = origAny match {
        case q: Query      => q.asl
        case se: StyleExpr => se.expr.asl
        case e             => ts(e).asl
      }
      val nrw = MathExpr.NamedRewrite(s"$display,:$n", ts(rwAny))
      val out: Any = origAny match {
        case se: StyleExpr => se.copy(expr = nrw)
        case _             => nrw
      }
      c.copy(stack = out :: rest)
    },
    // macros kept as NamedRewrite so the display form round-trips
    word("avg", "Query -- TimeSeriesExpr", List("name,sps,:eq,:avg")) { s =>
      s.headOption.exists(isQ)
    } { (c, _) =>
      val q = c.stack.head.asInstanceOf[Query]
      val e = MathExpr.Binary(MathExpr.BinOp.Div, DataExpr.Sum(q), DataExpr.Count(q))
      c.copy(stack = MathExpr.NamedRewrite(s"${q.asl},:avg", e) :: c.stack.tail)
    },
    word("pct", "TimeSeriesExpr -- TimeSeriesExpr",
      List("name,sps,:eq,(,cluster,),:by,:pct")) { s =>
      s.headOption.exists(isTS)
    } { (c, _) =>
      val e = ts(c.stack.head)
      val pct = MathExpr.Binary(
        MathExpr.BinOp.Mul,
        MathExpr.Binary(MathExpr.BinOp.Div, e, MathExpr.Aggr(MathExpr.AggrOp.Sum, e)),
        MathExpr.Constant(100.0))
      c.copy(stack = MathExpr.NamedRewrite(s"${e.asl},:pct", pct) :: c.stack.tail)
    },
    word("cos", "TimeSeriesExpr -- TimeSeriesExpr", List("hourOfDay,:time,:cos")) { s =>
      s.headOption.exists(isTS)
    } { (c, _) =>
      val e = ts(c.stack.head)
      c.copy(stack = MathExpr.NamedRewrite(s"${e.asl},:cos", cosOf(e)) :: c.stack.tail)
    },
    trigMacro("tan", e => div(sinOf(e), cosOf(e))),
    trigMacro("cot", e => div(cosOf(e), sinOf(e))),
    trigMacro("sec", e => div(MathExpr.Constant(1.0), cosOf(e))),
    trigMacro("csc", e => div(MathExpr.Constant(1.0), sinOf(e))),
    // stddev = sqrt((N*sum(x^2) - sum(x)^2) / N^2) across group members
    // (MathVocabulary.scala:109-154)
    word("stddev", "TimeSeriesExpr -- TimeSeriesExpr",
      List("name,sps,:eq,(,cluster,),:by,:stddev")) { s =>
      s.headOption.exists(isTS)
    } { (c, _) =>
      val e = ts(c.stack.head)
      val n = MathExpr.Aggr(MathExpr.AggrOp.Count, e)
      val sumSq = MathExpr.Aggr(MathExpr.AggrOp.Sum, mul(e, e))
      val sumX = MathExpr.Aggr(MathExpr.AggrOp.Sum, e)
      val v = div(
        MathExpr.Binary(MathExpr.BinOp.Sub, mul(n, sumSq), mul(sumX, sumX)),
        mul(n, n))
      val sd = MathExpr.Unary(MathExpr.UnaryOp.Sqrt, v)
      c.copy(stack = MathExpr.NamedRewrite(s"${e.asl},:stddev", sd) :: c.stack.tail)
    },
    // dist-avg / dist-max / dist-stddev: statistics published by distribution
    // summaries/timers (MathVocabulary.scala:175-275)
    word("dist-avg", "Query -- TimeSeriesExpr", List("name,latency,:eq,:dist-avg")) { s =>
      s.headOption.exists(isQ)
    } { (c, _) =>
      val q = c.stack.head.asInstanceOf[Query]
      val total = DataExpr.Sum(Query.And(q, Query.In("statistic", List("totalTime", "totalAmount"))))
      val count = DataExpr.Sum(Query.And(q, Query.Equal("statistic", "count")))
      val e = div(total, count)
      c.copy(stack = MathExpr.NamedRewrite(s"${q.asl},:dist-avg", e) :: c.stack.tail)
    },
    word("dist-max", "Query -- TimeSeriesExpr", List("name,latency,:eq,:dist-max")) { s =>
      s.headOption.exists(isQ)
    } { (c, _) =>
      val q = c.stack.head.asInstanceOf[Query]
      val e = DataExpr.Max(Query.And(q, Query.Equal("statistic", "max")))
      c.copy(stack = MathExpr.NamedRewrite(s"${q.asl},:dist-max", e) :: c.stack.tail)
    },
    word("dist-stddev", "Query -- TimeSeriesExpr", List("name,latency,:eq,:dist-stddev")) { s =>
      s.headOption.exists(isQ)
    } { (c, _) =>
      val q = c.stack.head.asInstanceOf[Query]
      val n = DataExpr.Sum(Query.And(q, Query.Equal("statistic", "count")))
      val sumSq = DataExpr.Sum(Query.And(q, Query.Equal("statistic", "totalOfSquares")))
      val sumX = DataExpr.Sum(Query.And(q, Query.In("statistic", List("totalAmount", "totalTime"))))
      val v = div(
        MathExpr.Binary(MathExpr.BinOp.Sub, mul(n, sumSq), mul(sumX, sumX)),
        mul(n, n))
      val sd = MathExpr.Unary(MathExpr.UnaryOp.Sqrt, v)
      c.copy(stack = MathExpr.NamedRewrite(s"${q.asl},:dist-stddev", sd) :: c.stack.tail)
    },
    // :percentiles — reshape the input to sum grouped by the percentile
    // bucket key, then estimate (MathVocabulary.scala:1267-1357)
    word("percentiles", "TimeSeriesExpr (pcts) -- TimeSeriesExpr",
      List("name,latency,:eq,(,25,50,90,),:percentiles")) { s =>
      s.size >= 2 && isList(s.head) && (isQ(s(1)) || isTS(s(1)))
    } { (c, _) =>
      pop2(c) { (lst, e, rest) =>
        val pcts = Coerce.stringList(lst).get.map(_.toDouble)
        c.copy(stack = MathExpr.Percentiles(toPercentileGroupBy(e), pcts) :: rest)
      }
    },
    word("median", "TimeSeriesExpr -- TimeSeriesExpr", List("name,latency,:eq,:median")) { s =>
      s.headOption.exists(v => isQ(v) || isTS(v))
    } { (c, _) =>
      val inner = MathExpr.Percentiles(toPercentileGroupBy(c.stack.head), List(50.0))
      val display = c.stack.head match {
        case q: Query            => s"${q.asl},:median"
        case t: TimeSeriesExpr   => s"${t.asl},:median"
        case other               => throw new IllegalStateException(other.toString)
      }
      c.copy(stack = MathExpr.NamedRewrite(display, inner) :: c.stack.tail)
    },
    // :sample-count — rewrite to a sum over the bucket range covering
    // [min, max] for both distribution and timer encodings
    // (MathVocabulary.scala:1359-1412)
    word("sample-count", "Query min max -- TimeSeriesExpr",
      List("name,latency,:eq,0,100,:sample-count")) { s =>
      s.size >= 3 && isNum(s.head) && isNum(s(1)) && isQ(s(2))
    } { (c, _) =>
      val maxS :: minS :: qv :: rest = c.stack: @unchecked
      val (min, max) = (minS.asInstanceOf[String].toDouble, maxS.asInstanceOf[String].toDouble)
      require(min < max && min >= 0.0, s"invalid range [$min, $max]")
      val q = qv.asInstanceOf[Query]
      def rangeQ(prefix: String, lo: Double, hi: Double): Query =
        Query.And(
          Query.GreaterThanEqual("percentile", graft.functions.PercentileBuckets.label(prefix, lo.toLong)),
          Query.LessThanEqual("percentile", graft.functions.PercentileBuckets.label(prefix, hi.toLong)))
      val range = Query.Or(rangeQ("D", min, max), rangeQ("T", min * 1e9, max * 1e9))
      val e = DataExpr.Sum(Query.And(q, range))
      c.copy(stack =
        MathExpr.NamedRewrite(s"${q.asl},$min,$max,:sample-count", e) :: rest)
    },
    word("approx-distinct", "TimeSeriesExpr -- TimeSeriesExpr",
      List("name,requests,:eq,:sum,:approx-distinct")) { s =>
      s.headOption.exists(v => isQ(v) || v.isInstanceOf[DataExpr])
    } { (c, _) =>
      c.copy(stack = MathExpr.ApproxDistinct(toDataExpr(c.stack.head)) :: c.stack.tail)
    },
    word("approx-distinct-cumulative", "TimeSeriesExpr -- TimeSeriesExpr",
      List("name,requests,:eq,:sum,:approx-distinct-cumulative")) { s =>
      s.headOption.exists(v => isQ(v) || v.isInstanceOf[DataExpr])
    } { (c, _) =>
      c.copy(stack =
        MathExpr.ApproxDistinct(toDataExpr(c.stack.head), cumulative = true) :: c.stack.tail)
    }
  )

  private def toDataExpr(v: Any): DataExpr = v match {
    case q: Query    => DataExpr.Sum(q)
    case d: DataExpr => d
    case other       => throw new IllegalStateException(other.toString)
  }

  private def div(a: TimeSeriesExpr, b: TimeSeriesExpr) = MathExpr.Binary(MathExpr.BinOp.Div, a, b)
  private def mul(a: TimeSeriesExpr, b: TimeSeriesExpr) = MathExpr.Binary(MathExpr.BinOp.Mul, a, b)

  private def sinOf(e: TimeSeriesExpr) = MathExpr.Unary(MathExpr.UnaryOp.Sine, e)

  private def cosOf(e: TimeSeriesExpr) = MathExpr.Unary(MathExpr.UnaryOp.Sine,
    MathExpr.Binary(MathExpr.BinOp.Add, e, MathExpr.Constant(math.Pi / 2)))

  private def trigMacro(n: String, mk: TimeSeriesExpr => TimeSeriesExpr): Word =
    word(n, "TimeSeriesExpr -- TimeSeriesExpr", List(s"hourOfDay,:time,:$n")) { s =>
      s.headOption.exists(isTS)
    } { (c, _) =>
      val e = ts(c.stack.head)
      c.copy(stack = MathExpr.NamedRewrite(s"${e.asl},:$n", mk(e)) :: c.stack.tail)
    }

  /** Reshape for :percentiles/:median: sum grouped by the percentile key. */
  private def toPercentileGroupBy(v: Any): DataExpr.GroupBy = v match {
    case q: Query => DataExpr.GroupBy(DataExpr.Sum(q), List("percentile"))
    case DataExpr.GroupBy(af, keys) =>
      DataExpr.GroupBy(DataExpr.Sum(af.query, af.offset),
        if (keys.contains("percentile")) keys else "percentile" :: keys)
    case af: DataExpr.AggregateFunction =>
      DataExpr.GroupBy(DataExpr.Sum(af.query, af.offset), List("percentile"))
    case other => throw new IllegalStateException(s"cannot apply :percentiles to $other")
  }

  // --- stateful words (StatefulVocabulary.scala) -----------------------------

  private def statefulN(n: String, mk: (TimeSeriesExpr, Int) => TimeSeriesExpr, ex: String): Word =
    word(n, "TimeSeriesExpr n -- TimeSeriesExpr", List(ex)) { s =>
      s.size >= 2 && isIntStr(s.head) && isTS(s(1))
    } { (c, _) =>
      pop2(c)((num, e, rest) =>
        c.copy(stack = mk(ts(e), num.asInstanceOf[String].toInt) :: rest))
    }

  private def desPreset(n: String, sliding: Boolean, alpha: Double, beta: Double): Word =
    word(n, "TimeSeriesExpr -- TimeSeriesExpr", List(s"name,sps,:eq,:sum,:$n")) { s =>
      s.headOption.exists(isTS)
    } { (c, _) =>
      val e = ts(c.stack.head)
      val inner: TimeSeriesExpr =
        if (sliding) StatefulExpr.SlidingDes(e, 10, alpha, beta)
        else StatefulExpr.Des(e, 10, alpha, beta)
      c.copy(stack = MathExpr.NamedRewrite(s"${e.asl},:$n", inner) :: c.stack.tail)
    }

  private val stateful: List[Word] = List(
    statefulN("delay", StatefulExpr.Delay.apply, "name,sps,:eq,:sum,3,:delay"),
    statefulN("rolling-count", StatefulExpr.RollingCount.apply, "name,sps,:eq,:sum,100,:gt,5,:rolling-count"),
    statefulN("rolling-min", StatefulExpr.RollingMin.apply, "name,sps,:eq,:sum,5,:rolling-min"),
    statefulN("rolling-max", StatefulExpr.RollingMax.apply, "name,sps,:eq,:sum,5,:rolling-max"),
    statefulN("rolling-sum", StatefulExpr.RollingSum.apply, "name,sps,:eq,:sum,5,:rolling-sum"),
    word("rolling-mean", "TimeSeriesExpr n minNum -- TimeSeriesExpr",
      List("name,sps,:eq,:sum,5,2,:rolling-mean")) { s =>
      s.size >= 3 && isIntStr(s.head) && isIntStr(s(1)) && isTS(s(2))
    } { (c, _) =>
      val minNum :: n :: e :: rest = c.stack: @unchecked
      c.copy(stack = StatefulExpr.RollingMean(
        ts(e), n.asInstanceOf[String].toInt, minNum.asInstanceOf[String].toInt) :: rest)
    },
    word("des", "TimeSeriesExpr training alpha beta -- TimeSeriesExpr",
      List("name,sps,:eq,:sum,10,0.1,0.02,:des")) { s =>
      s.size >= 4 && isNum(s.head) && isNum(s(1)) && isIntStr(s(2)) && isTS(s(3))
    } { (c, _) =>
      val beta :: alpha :: training :: e :: rest = c.stack: @unchecked
      c.copy(stack = StatefulExpr.Des(ts(e), training.asInstanceOf[String].toInt,
        alpha.asInstanceOf[String].toDouble, beta.asInstanceOf[String].toDouble) :: rest)
    },
    word("sdes", "TimeSeriesExpr training alpha beta -- TimeSeriesExpr",
      List("name,sps,:eq,:sum,10,0.1,0.02,:sdes")) { s =>
      s.size >= 4 && isNum(s.head) && isNum(s(1)) && isIntStr(s(2)) && isTS(s(3))
    } { (c, _) =>
      val beta :: alpha :: training :: e :: rest = c.stack: @unchecked
      c.copy(stack = StatefulExpr.SlidingDes(ts(e), training.asInstanceOf[String].toInt,
        alpha.asInstanceOf[String].toDouble, beta.asInstanceOf[String].toDouble) :: rest)
    },
    // DES-based alerting signal (StatefulVocabulary desEpicSignal macro):
    // 1 when the line deviates from both noise and percent bounds around a
    // DES prediction, else 0. Same token program as the reference macro.
    macroWord("des-epic-signal", List(
      "noise", ":sset", "minPercent", ":sset", "maxPercent", ":sset",
      "beta", ":sset", "alpha", ":sset", "trainingSize", ":sset", "line", ":sset",
      "pred",
      "line", ":get", "trainingSize", ":get", "alpha", ":get", "beta", ":get", ":des",
      ":set",
      "minPredNoiseBound", "pred", ":get", "noise", ":get", ":sub", ":set",
      "minPredPercentBound",
      "pred", ":get", "1.0", ":const", "minPercent", ":get", ":const", ":fsub", ":fmul",
      ":set",
      "maxPredNoiseBound", "pred", ":get", "noise", ":get", ":add", ":set",
      "maxPredPercentBound",
      "pred", ":get", "2.0", ":const", "1.0", ":const", "maxPercent", ":get", ":const",
      ":fsub", ":fsub", ":fmul",
      ":set",
      "line", ":get", "minPredNoiseBound", ":get", ":lt",
      "line", ":get", "minPredPercentBound", ":get", ":lt", ":and",
      "line", ":get", "maxPredNoiseBound", ":get", ":gt",
      "line", ":get", "maxPredPercentBound", ":get", ":gt", ":and",
      ":or"
    ), List("name,sps,:eq,:sum,10,0.1,0.5,0.2,0.2,4,:des-epic-signal")),
    // DES preset macros (StatefulVocabulary.scala:53-60)
    desPreset("des-simple", sliding = false, 0.1, 0.5),
    desPreset("des-fast", sliding = false, 0.1, 0.02),
    desPreset("des-slower", sliding = false, 0.05, 0.03),
    desPreset("des-slow", sliding = false, 0.03, 0.04),
    desPreset("sdes-simple", sliding = true, 0.1, 0.5),
    desPreset("sdes-fast", sliding = true, 0.1, 0.02),
    desPreset("sdes-slower", sliding = true, 0.05, 0.03),
    desPreset("sdes-slow", sliding = true, 0.03, 0.04),
    word("trend", "TimeSeriesExpr duration -- TimeSeriesExpr",
      List("name,sps,:eq,:sum,5m,:trend")) { s =>
      s.size >= 2 && isStr(s.head) && isTS(s(1))
    } { (c, _) =>
      pop2(c)((dur, e, rest) =>
        c.copy(stack = StatefulExpr.Trend(
          ts(e), Strings.parseDuration(dur.asInstanceOf[String])) :: rest))
    },
    word("integral", "TimeSeriesExpr -- TimeSeriesExpr",
      List("name,sps,:eq,:sum,:integral")) { s => s.headOption.exists(isTS) } { (c, _) =>
      c.copy(stack = StatefulExpr.Integral(ts(c.stack.head)) :: c.stack.tail)
    },
    word("cumulative-max", "TimeSeriesExpr -- TimeSeriesExpr",
      List("name,sps,:eq,:sum,:cumulative-max")) { s => s.headOption.exists(isTS) } { (c, _) =>
      c.copy(stack = StatefulExpr.CumulativeMax(ts(c.stack.head)) :: c.stack.tail)
    },
    word("derivative", "TimeSeriesExpr -- TimeSeriesExpr",
      List("name,sps,:eq,:sum,:derivative")) { s => s.headOption.exists(isTS) } { (c, _) =>
      c.copy(stack = StatefulExpr.Derivative(ts(c.stack.head)) :: c.stack.tail)
    }
  )

  // --- filter words (FilterVocabulary.scala) ---------------------------------

  private def priorityWord(w: String, bottom: Boolean, others: Option[String]): Word =
    word(w, "TimeSeriesExpr stat k -- TimeSeriesExpr",
      List(s"name,sps,:eq,(,cluster,),:by,avg,3,:$w")) { s =>
      s.size >= 3 && isIntStr(s.head) &&
        s(1).isInstanceOf[String] && FilterExpr.stats.contains(s(1).asInstanceOf[String]) &&
        isTS(s(2))
    } { (c, _) =>
      val k :: stat :: e :: rest = c.stack: @unchecked
      c.copy(stack = FilterExpr.PriorityFilter(ts(e), stat.asInstanceOf[String],
        k.asInstanceOf[String].toInt, bottom, others) :: rest)
    }

  private val filter: List[Word] = List(
    word("stat", "TimeSeriesExpr stat -- TimeSeriesExpr",
      List("name,sps,:eq,:sum,avg,:stat")) { s =>
      s.size >= 2 && s.head.isInstanceOf[String] &&
        FilterExpr.stats.contains(s.head.asInstanceOf[String]) && isTS(s(1))
    } { (c, _) =>
      pop2(c)((stat, e, rest) =>
        c.copy(stack = FilterExpr.Stat(ts(e), stat.asInstanceOf[String]) :: rest))
    },
    word("filter", "TimeSeriesExpr TimeSeriesExpr -- TimeSeriesExpr",
      List("name,sps,:eq,(,cluster,),:by,:stat-avg,100,:gt,:filter")) { s =>
      s.size >= 2 && isTS(s.head) && isTS(s(1))
    } { (c, _) =>
      pop2(c)((p, e, rest) =>
        c.copy(stack = FilterExpr.Filter(ts(e), ts(p)) :: rest))
    },
    priorityWord("topk", bottom = false, None),
    priorityWord("bottomk", bottom = true, None),
    priorityWord("topk-others-sum", bottom = false, Some("sum")),
    priorityWord("topk-others-min", bottom = false, Some("min")),
    priorityWord("topk-others-max", bottom = false, Some("max")),
    priorityWord("topk-others-avg", bottom = false, Some("avg")),
    priorityWord("bottomk-others-sum", bottom = true, Some("sum")),
    priorityWord("bottomk-others-min", bottom = true, Some("min")),
    priorityWord("bottomk-others-max", bottom = true, Some("max")),
    priorityWord("bottomk-others-avg", bottom = true, Some("avg")),
    // stat shorthand macros (FilterVocabulary.scala:49-72)
    word("stat-min-mf", "TimeSeriesExpr -- TimeSeriesExpr", Nil) { s =>
      s.headOption.exists(isTS)
    } { (c, _) =>
      c.copy(stack = FilterExpr.Stat(ts(c.stack.head), "min") :: c.stack.tail)
    },
    word("stat-max-mf", "TimeSeriesExpr -- TimeSeriesExpr", Nil) { s =>
      s.headOption.exists(isTS)
    } { (c, _) =>
      c.copy(stack = FilterExpr.Stat(ts(c.stack.head), "max") :: c.stack.tail)
    },
    word("stat-avg-mf", "TimeSeriesExpr -- TimeSeriesExpr", Nil) { s =>
      s.headOption.exists(isTS)
    } { (c, _) =>
      c.copy(stack = FilterExpr.Stat(ts(c.stack.head), "avg") :: c.stack.tail)
    },
    word("consolidate", "TimeSeriesExpr multiple cf -- TimeSeriesExpr",
      List("name,sps,:eq,:sum,6,cf-max,:consolidate")) { s =>
      s.size >= 3 && s.head.isInstanceOf[String] &&
        s.head.asInstanceOf[String].startsWith("cf-") && isIntStr(s(1)) && isTS(s(2))
    } { (c, _) =>
      val cf :: m :: e :: rest = c.stack: @unchecked
      c.copy(stack = FilterExpr.Consolidate(ts(e),
        m.asInstanceOf[String].toInt, cf.asInstanceOf[String].stripPrefix("cf-")) :: rest)
    }
  ) ::: FilterExpr.stats.toList.sorted.map { st =>
    word(s"stat-$st", "-- StatExpr", Nil) { _ => true } { (c, _) =>
      c.copy(stack = FilterExpr.StatExpr(st) :: c.stack)
    }
  }

  // --- style words (StyleVocabulary.scala) -----------------------------------

  private def styleWord(n: String, ex: String): Word =
    word(n, "TimeSeriesExpr v -- StyleExpr", List(ex)) { s =>
      s.size >= 2 && isStr(s.head) && (isTS(s(1)) || s(1).isInstanceOf[StyleExpr])
    } { (c, _) =>
      pop2(c) { (v, e, rest) =>
        val se = Coerce.style(e).get
        c.copy(stack = se.copy(settings = se.settings + (n -> v.asInstanceOf[String])) :: rest)
      }
    }

  private def lsMacro(n: String): Word =
    word(n, "TimeSeriesExpr -- StyleExpr", List(s"name,sps,:eq,:sum,:$n")) { s =>
      s.headOption.exists(v => isTS(v) || v.isInstanceOf[StyleExpr])
    } { (c, _) =>
      val se = Coerce.style(c.stack.head).get
      c.copy(stack = se.copy(settings = se.settings + ("ls" -> n)) :: c.stack.tail)
    }

  private val style: List[Word] = List(
    styleWord("alpha", "name,sps,:eq,:sum,40,:alpha"),
    styleWord("color", "name,sps,:eq,:sum,f00,:color"),
    styleWord("palette", "name,sps,:eq,(,cluster,),:by,armytage,:palette"),
    styleWord("ls", "name,sps,:eq,:sum,area,:ls"),
    styleWord("lw", "name,sps,:eq,:sum,2,:lw"),
    styleWord("axis", "name,sps,:eq,:sum,1,:axis"),
    styleWord("legend", "name,sps,:eq,:sum,$name,:legend"),
    styleWord("sort", "name,sps,:eq,(,cluster,),:by,max,:sort"),
    styleWord("order", "name,sps,:eq,(,cluster,),:by,asc,:order"),
    styleWord("limit", "name,sps,:eq,(,cluster,),:by,3,:limit"),
    // legacy multi-offset list form (StyleVocabulary.scala:330): stores the
    // offsets; the graph API expands to one expression per offset
    // (StyleExpr.perOffset, StyleExpr.scala:195-200)
    word("offset", "TimeSeriesExpr (durations) -- StyleExpr",
      List("name,sps,:eq,:sum,(,0h,1d,1w,),:offset")) { s =>
      s.size >= 2 && isList(s.head) && (isTS(s(1)) || s(1).isInstanceOf[StyleExpr])
    } { (c, _) =>
      pop2(c) { (lst, e, rest) =>
        val se = Coerce.style(e).get
        val offsets = Coerce.stringList(lst).get.mkString(",")
        c.copy(stack = se.copy(settings = se.settings + ("offsets" -> offsets)) :: rest)
      }
    },
    // :head is the legacy alias for :limit (StyleVocabulary.scala:58)
    word("head", "TimeSeriesExpr n -- StyleExpr", List("name,sps,:eq,(,cluster,),:by,3,:head")) { s =>
      s.size >= 2 && isIntStr(s.head) && (isTS(s(1)) || s(1).isInstanceOf[StyleExpr])
    } { (c, _) =>
      pop2(c) { (v, e, rest) =>
        val se = Coerce.style(e).get
        c.copy(stack = se.copy(settings = se.settings + ("limit" -> v.asInstanceOf[String])) :: rest)
      }
    },
    lsMacro("line"),
    lsMacro("area"),
    lsMacro("stack"),
    lsMacro("vspan"),
    lsMacro("heatmap"),
    // macro -> (,percentile,),:cg,heatmap,:ls (StyleVocabulary.scala:107-114)
    word("percentiles-heatmap", "TimeSeriesExpr -- StyleExpr",
      List("name,latency,:eq,:sum,:percentiles-heatmap")) { s =>
      s.headOption.exists(v => isTS(v) || v.isInstanceOf[StyleExpr])
    } { (c, _) =>
      val se = Coerce.style(c.stack.head).get
      val regrouped = Coerce.style(
        Rewrite.mapData(se, d => Rewrite.withCommonGroup(d, List("percentile")))).get
      c.copy(stack =
        regrouped.copy(settings = regrouped.settings + ("ls" -> "heatmap")) :: c.stack.tail)
    },
    word("strip-style", "StyleExpr -- TimeSeriesExpr", Nil) { s =>
      s.headOption.exists(_.isInstanceOf[StyleExpr])
    } { (c, _) =>
      c.copy(stack = c.stack.head.asInstanceOf[StyleExpr].expr :: c.stack.tail)
    },
    // Legacy macro for visualizing epic DES expressions (StyleVocabulary.
    // scala:124, desEpicViz :605-636): the alert signal as a vspan plus the
    // prediction-bound lines the signal macro stored with :set
    macroWord("des-epic-viz", List(
      ":des-epic-signal", ":vspan", "40", ":alpha", "triggered", ":legend",
      "line", ":get", "line", ":legend",
      "minPredNoiseBound", ":get", "minPredNoiseBound", ":legend",
      "minPredPercentBound", ":get", "minPredPercentBound", ":legend",
      "maxPredNoiseBound", ":get", "maxPredNoiseBound", ":legend",
      "maxPredPercentBound", ":get", "maxPredPercentBound", ":legend"
    ), List("name,sps,:eq,:sum,10,0.1,0.5,0.2,0.2,4,:des-epic-viz")),
    // legend hex-decode mode (StyleVocabulary.scala:424)
    styleWord("decode", "name,sps,:eq,:sum,hex,:decode"),
    // legend regex search-replace; applications chain (StyleVocabulary.scala:470)
    word("s", "TimeSeriesExpr search replace -- StyleExpr",
      List("name,sps,:eq,(,nf.cluster,),:by,^nf-,_,:s")) { s =>
      s.size >= 3 && isStr(s.head) && isStr(s(1)) &&
        (isTS(s(2)) || s(2).isInstanceOf[StyleExpr])
    } { (c, _) =>
      val repl :: search :: e :: rest = c.stack: @unchecked
      val se = Coerce.style(e).get
      val existing = se.settings.get("sed").map(_ + " ").getOrElse("")
      val sed = existing + search.asInstanceOf[String] + " " + repl.asInstanceOf[String]
      c.copy(stack = se.copy(settings = se.settings + ("sed" -> sed)) :: rest)
    }
  )

  // --- event words (EventVocabulary.scala, §2.9) -----------------------------

  private val events: List[Word] = List(
    word("table", "Query (columns) -- EventExpr",
      List("name,error,:eq,(,event_id,value,),:table")) { s =>
      s.size >= 2 && isList(s.head) && isQ(s(1))
    } { (c, _) =>
      pop2(c)((cols, q, rest) =>
        c.copy(stack = EventExpr.Table(
          q.asInstanceOf[Query], Coerce.stringList(cols).get) :: rest))
    },
    word("sample", "Query (by) (projections) -- EventExpr",
      List("name,error,:eq,(,event_type,),(,props,),:sample")) { s =>
      s.size >= 3 && isList(s.head) && isList(s(1)) && isQ(s(2))
    } { (c, _) =>
      val proj :: by :: q :: rest = c.stack: @unchecked
      c.copy(stack = EventExpr.Sample(
        q.asInstanceOf[Query],
        Coerce.stringList(by).get,
        Coerce.stringList(proj).get) :: rest)
    }
  )

  /** Full vocabulary, dispatch order: query words before math for shared names. */
  val allWords: List[Word] =
    standard ::: query ::: data ::: mathWords ::: stateful ::: filter ::: style ::: events

  /** Named sub-vocabularies for the expr tooling API, each including its
    * dependencies the way the reference's vocabulary chain does
    * (std < query < data < ... < main). */
  val vocabularies: Map[String, List[Word]] = Map(
    "std" -> standard,
    "query" -> (standard ::: query),
    "data" -> (standard ::: query ::: data),
    "main" -> allWords
  )
}
