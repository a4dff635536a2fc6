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
    callDepth: Int = 0,
    // API-governance gate (reference stacklang Word.isStable +
    // Features.UNSTABLE check, Interpreter.scala:45-47): words marked
    // unstable execute only when the caller opts in — the boolean is
    // graft's form of the reference's STABLE/UNSTABLE Features enum
    unstableFeatures: Boolean = false
)

trait Word {
  def name: String
  def signature: String
  def matches(stack: List[Any]): Boolean
  def execute(ctx: Context, interpreter: Interpreter): Context

  /** Example programs, executed and round-tripped by the example suite. */
  def examples: List[String] = Nil

  /** False marks a word still subject to change (reference
    * stacklang/Word.scala:41): the interpreter refuses it unless the
    * context enables unstable features. */
  def isStable: Boolean = true
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

  /**
   * Error-recovering parse for editor/UI tooling (reference stacklang
   * Interpreter.syntaxTree:186-320): unlike [[execute]], problems are
   * collected as positioned diagnostics and processing continues, so one
   * typo does not hide every later one. Every node carries its character
   * span in the input and word nodes carry the stack BEFORE execution —
   * what a hover/completion UI needs. Recovery is conservative: a failed
   * or unknown word leaves the stack unchanged (graft words carry no
   * declared stack effect to approximate with).
   */
  def syntaxTree(str: String, vars: Map[String, Any] = Map.empty): Interpreter.SyntaxTree = {
    import Interpreter._
    val diags = List.newBuilder[Diagnostic]
    val nodes = List.newBuilder[SyntaxNode]
    var stack: List[Any] = Nil
    var variables = vars
    var rest = tokenizeSpanned(str)

    def display(l: List[Any]): List[String] = l.map(displayString)

    while (rest.nonEmpty) {
      val t = rest.head
      rest = rest.tail
      t.value match {
        case "(" =>
          // children are raw literal nodes (list bodies are not executed);
          // nesting depth tracks the matching close paren
          val children = List.newBuilder[SyntaxNode]
          val items = List.newBuilder[Any]
          var depth = 0
          var closed = false
          while (!closed && rest.nonEmpty) {
            val c = rest.head
            rest = rest.tail
            c.value match {
              case "(" =>
                depth += 1; children += LiteralNode(c.value, c.span); items += c.value
              case ")" if depth == 0 => closed = true
              case ")" =>
                depth -= 1; children += LiteralNode(c.value, c.span); items += c.value
              case v =>
                children += LiteralNode(v, c.span); items += v
            }
          }
          val diag =
            if (closed) None
            else {
              val d = Diagnostic(t.span, "unmatched opening parenthesis", error = true)
              diags += d
              Some(d)
            }
          stack = items.result() :: stack
          nodes += ListNode(t.value, t.span, children.result(), closed, diag)
        case ")" =>
          val d = Diagnostic(t.span, "unmatched closing parenthesis", error = true)
          diags += d
          nodes += LiteralNode(t.value, t.span)
        case v if v.startsWith(":") =>
          val name = v.substring(1)
          val before = display(stack)
          words.get(name) match {
            case None =>
              val d = Diagnostic(t.span, s"unknown word ':$name'", error = true)
              diags += d
              nodes += WordNode(t.value, t.span, matched = None, before, Some(d))
            case Some(_) =>
              try {
                val out = executeWord(name, Context(stack, variables))
                stack = out.stack
                variables = out.variables
                nodes += WordNode(t.value, t.span, matched = Some(name), before, None)
              } catch {
                case e: Exception =>
                  val d = Diagnostic(t.span, e.getMessage, error = true)
                  diags += d
                  nodes += WordNode(t.value, t.span, matched = None, before, Some(d))
              }
          }
        case v =>
          if (v.startsWith(";") && words.contains(v.substring(1))) {
            diags += Diagnostic(t.span,
              s"did you mean ':${v.substring(1)}'? (semicolon instead of colon)", error = false)
          }
          stack = v :: stack
          nodes += LiteralNode(v, t.span)
      }
    }
    Interpreter.SyntaxTree(nodes.result(), diags.result(), display(stack))
  }

  private def executeWord(name: String, ctx: Context): Context =
    words.get(name) match {
      case Some(ws) =>
        ws.find(_.matches(ctx.stack)) match {
          case Some(w) =>
            if (!w.isStable && !ctx.unstableFeatures)
              throw new IllegalStateException(
                s"to use :${w.name} enable unstable features")
            w.execute(ctx, this)
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

  /** Character span [start, end) of a token in the source program. */
  final case class Span(start: Int, end: Int)

  /** A positioned problem found by [[Interpreter.syntaxTree]];
    * `error = false` marks a warning (e.g. the semicolon hint). */
  final case class Diagnostic(span: Span, message: String, error: Boolean)

  sealed trait SyntaxNode { def token: String; def span: Span }

  /** A pushed value (or an unmatched `)` kept in place for recovery). */
  final case class LiteralNode(token: String, span: Span) extends SyntaxNode

  /** A `:word` occurrence: the resolved word name when it executed, the
    * display-form stack BEFORE execution, and the failure diagnostic. */
  final case class WordNode(
      token: String,
      span: Span,
      matched: Option[String],
      stackBefore: List[String],
      diagnostic: Option[Diagnostic]) extends SyntaxNode

  /** A `(`...`)` list literal; `closed` is false when the close paren is
    * missing (everything to end-of-input became the body). */
  final case class ListNode(
      token: String,
      span: Span,
      children: List[SyntaxNode],
      closed: Boolean,
      diagnostic: Option[Diagnostic]) extends SyntaxNode

  /** Result of [[Interpreter.syntaxTree]]: the node list, every collected
    * diagnostic, and the final stack in display form. */
  final case class SyntaxTree(
      nodes: List[SyntaxNode],
      diagnostics: List[Diagnostic],
      stack: List[String])

  /** Display form of a stack value (expression ASL where available). */
  def displayString(v: Any): String = v match {
    case e: TimeSeriesExpr => e.asl
    case q: Query          => q.asl
    case other             => other.toString
  }

  private final case class SpannedToken(value: String, span: Span)

  /** [[tokenize]] with character spans: split on commas, trim, drop
    * empties, keeping each token's [start, end) offsets in the input. */
  private def tokenizeSpanned(program: String): List[SpannedToken] = {
    val out = List.newBuilder[SpannedToken]
    var segStart = 0
    var i = 0
    def emit(endExclusive: Int): Unit = {
      var s = segStart
      var e = endExclusive
      while (s < e && program.charAt(s).isWhitespace) s += 1
      while (e > s && program.charAt(e - 1).isWhitespace) e -= 1
      if (e > s) out += SpannedToken(program.substring(s, e), Span(s, e))
    }
    while (i < program.length) {
      if (program.charAt(i) == ',') { emit(i); segStart = i + 1 }
      i += 1
    }
    emit(program.length)
    out.result()
  }

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
