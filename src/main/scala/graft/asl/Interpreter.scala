package graft.asl

/**
 * Stack-language interpreter (the reference's ASL front-end, re-implemented
 * from the semantics of atlas-core stacklang/Interpreter.scala): programs are
 * comma-separated tokens; `(`...`)` builds a literal list without executing;
 * `:word` dispatches to the first vocabulary word whose matcher accepts the
 * current stack; anything else is pushed as a string.
 *
 * Guards mirror the reference: stack size <= 1024 and :call/:each/:map depth
 * <= 10 (Interpreter.scala:28-33,120-127).
 */
final case class Context(
    stack: List[Any],
    variables: Map[String, Any] = Map.empty,
    frozen: List[Any] = Nil,
    callDepth: Int = 0
)

trait Word {
  def name: String
  def signature: String
  def matches(stack: List[Any]): Boolean
  def execute(ctx: Context, interpreter: Interpreter): Context

  /** Example programs, executed and round-tripped by the example suite. */
  def examples: List[String] = Nil
}

final case class Interpreter(vocabulary: List[Word], maxStackSize: Int = 1024) {

  val maxCallDepth = 10

  private val words: Map[String, List[Word]] = vocabulary.groupBy(_.name)

  def execute(program: String): Context =
    execute(Interpreter.tokenize(program), Context(Nil))

  def execute(tokens: List[String], ctx: Context): Context = {
    var context = ctx
    var rest = tokens
    while (rest.nonEmpty) {
      val token = rest.head
      rest = rest.tail
      token match {
        case "(" =>
          val (list, remaining) = collectList(rest)
          context = push(context, list)
          rest = remaining
        case ")" =>
          throw new IllegalStateException("unmatched closing parenthesis")
        case t if t.startsWith(":") =>
          context = executeWord(t.substring(1), context)
        case t =>
          context = push(context, t)
      }
    }
    context
  }

  /** Run a nested program (for :call/:each/:map) with the depth guard. */
  def call(tokens: List[Any], ctx: Context): Context = {
    if (ctx.callDepth + 1 > maxCallDepth)
      throw new IllegalStateException(s"exceeded max call depth of $maxCallDepth")
    val entered = execute(
      tokens.map(_.toString),
      ctx.copy(callDepth = ctx.callDepth + 1)
    )
    entered.copy(callDepth = ctx.callDepth)
  }

  private def push(ctx: Context, v: Any): Context = {
    if (ctx.stack.size + 1 > maxStackSize)
      throw new IllegalStateException(s"stack overflow: exceeds limit of $maxStackSize")
    ctx.copy(stack = v :: ctx.stack)
  }

  private def collectList(tokens: List[String]): (List[Any], List[String]) = {
    val acc = List.newBuilder[Any]
    var depth = 0
    var rest = tokens
    var size = 0
    while (rest.nonEmpty) {
      val t = rest.head
      rest = rest.tail
      size += 1
      if (size > maxStackSize)
        throw new IllegalStateException(s"list size exceeds limit of $maxStackSize")
      t match {
        case "(" => depth += 1; acc += t
        case ")" if depth == 0 => return (acc.result(), rest)
        case ")" => depth -= 1; acc += t
        case _ => acc += t
      }
    }
    throw new IllegalStateException("unmatched opening parenthesis")
  }

  /**
   * Token-at-a-time trace of a program run, for the expr debug endpoint:
   * the initial state plus the state after every token. A `(` list
   * literal is collected as ONE step, exactly as execution consumes it
   * (reference stacklang Interpreter.debug:159-178 — each Step carries
   * the REMAINING program and the context so far).
   */
  def debug(tokens: List[String], ctx: Context): List[Interpreter.Step] = {
    val steps = List.newBuilder[Interpreter.Step]
    var context = ctx
    var rest = tokens
    steps += Interpreter.Step(rest, context)
    while (rest.nonEmpty) {
      val token = rest.head
      rest = rest.tail
      token match {
        case "(" =>
          val (list, remaining) = collectList(rest)
          context = push(context, list)
          rest = remaining
        case ")" =>
          throw new IllegalStateException("unmatched closing parenthesis")
        case t if t.startsWith(":") =>
          context = executeWord(t.substring(1), context)
        case t =>
          context = push(context, t)
      }
      steps += Interpreter.Step(rest, context)
    }
    steps.result()
  }

  def debug(program: String): List[Interpreter.Step] =
    debug(Interpreter.tokenize(program), Context(Nil))

  private def executeWord(name: String, ctx: Context): Context =
    words.get(name) match {
      case Some(ws) =>
        ws.find(_.matches(ctx.stack)) match {
          case Some(w) => w.execute(ctx, this)
          case None =>
            val summary = ctx.stack.take(3).map(Interpreter.typeName).mkString(",")
            val sigs = ws.map(_.signature).mkString("[", "], [", "]")
            throw new IllegalStateException(
              s"no matches for word ':$name' with stack [$summary], candidates: $sigs")
        }
      case None => throw new IllegalStateException(s"unknown word ':$name'")
    }
}

object Interpreter {

  /** One [[Interpreter.debug]] step: the remaining program and the context
    * after the last consumed token. */
  final case class Step(program: List[String], context: Context)

  /** Split on commas, trim, drop empty tokens (Interpreter.splitAndTrim). */
  def tokenize(program: String): List[String] =
    program.split(",").iterator.map(_.trim).filter(_.nonEmpty).toList

  def typeName(v: Any): String = v match {
    case _: String         => "String"
    case _: List[_]        => "List"
    case _: Query          => "Query"
    case _: StyleExpr      => "StyleExpr"
    case _: TimeSeriesExpr => "TimeSeriesExpr"
    case other             => other.getClass.getSimpleName
  }
}

/**
 * Type coercions of the reference's ModelDataTypes (ModelDataTypes.scala:
 * 23-133): a Query used as a time series becomes `:sum` of it, a numeric
 * string becomes a constant line, a TimeSeriesExpr used as a style
 * expression gets empty settings.
 */
object Coerce {

  def isNumber(s: String): Boolean =
    try { s.toDouble; true } catch { case _: NumberFormatException => false }

  def timeSeries(v: Any): Option[TimeSeriesExpr] = v match {
    case t: TimeSeriesExpr      => Some(t)
    case q: Query               => Some(DataExpr.Sum(q))
    case s: String if isNumber(s) => Some(MathExpr.Constant(s.toDouble))
    case _                      => None
  }

  def isTimeSeries(v: Any): Boolean = timeSeries(v).isDefined

  def style(v: Any): Option[StyleExpr] = v match {
    case s: StyleExpr => Some(s)
    case other        => timeSeries(other).map(t => StyleExpr(t, Map.empty))
  }

  def stringList(v: Any): Option[List[String]] = v match {
    case l: List[_] if l.forall(_.isInstanceOf[String]) =>
      Some(l.map(_.asInstanceOf[String]))
    case _ => None
  }
}

/** Parse entry point: programs to expressions. */
object Asl {

  lazy val interpreter: Interpreter = Interpreter(Vocabulary.allWords)

  /** Execute a program and return all expressions on the final stack
    * (bottom first), coercing queries/constants to styled expressions.
    * `tz` seeds the interpreter's zone variable for zone-less date parsing
    * (the reference seeds vars("tz") from the request,
    * eval/graph/Grapher.scala:169-171). */
  def parseAll(program: String, tz: String = "UTC"): List[StyleExpr] = {
    val vars: Map[String, Any] = if (tz == "UTC") Map.empty else Map("tz" -> tz)
    val ctx = interpreter.execute(
      Interpreter.tokenize(program), Context(Nil, variables = vars))
    (ctx.stack.reverse ::: ctx.frozen.reverse).flatMap(Coerce.style)
  }

  /** Execute a program expected to yield exactly one expression. */
  def parse(program: String, tz: String = "UTC"): TimeSeriesExpr = {
    val all = parseAll(program, tz)
    require(all.size == 1, s"expected one expression, got ${all.size}: $program")
    val s = all.head
    if (s.settings.isEmpty) s.expr else s
  }

  /** Execute a program expected to yield one event expression (§2.9). */
  def parseEvent(program: String): EventExpr = {
    val ctx = interpreter.execute(program)
    ctx.stack match {
      case (e: EventExpr) :: Nil => e
      case (q: Query) :: Nil     => EventExpr.Raw(q)
      case other => throw new IllegalArgumentException(
        s"expected one event expression, got $other: $program")
    }
  }
}
