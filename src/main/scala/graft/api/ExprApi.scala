package graft.api

import graft.asl._
import scala.util.Try

/**
 * Expression tooling surface — the reference's `/api/v1/expr` endpoints
 * (atlas-webapi ExprApi.scala:55-87), re-expressed as library functions:
 * graft has no HTTP layer, so where the reference serializes JSON these
 * return plain values for a serving layer to encode. All of them are pure
 * functions of the program string — no data is touched.
 *
 *   - [[debug]]      token-at-a-time trace of program execution
 *   - [[normalize]]  canonical string form of each expression on the stack
 *   - [[complete]]   vocabulary words that could legally extend the program
 *   - [[queries]]    distinct data predicates used by the program
 *   - [[rewrite]]    migrate legacy list-form offsets to `:offset` operations
 *   - [[strip]]      drop query clauses by key and/or filter|style wrappers
 */
object ExprApi {

  /** One [[debug]] step: the remaining program, the stack rendered as
    * display strings (top first), and the interpreter variables. */
  final case class DebugStep(
      program: List[String],
      stack: List[String],
      variables: Map[String, String])

  /** One [[complete]] candidate. */
  final case class WordInfo(name: String, signature: String)

  /** Words never suggested by [[complete]]: stack manipulation, trivially-
    * matching predicates, and deprecated operators (reference
    * atlas-webapi reference.conf `expr.complete.excluded-words`). */
  val excludedWords: Set[String] = Set(
    "-rot", "2over", "call", "clear", "depth", "drop", "dup", "each",
    "fcall", "format", "freeze", "get", "list", "map", "ndrop", "nip",
    "nlist", "over", "pick", "roll", "rot", "set", "sset", "swap", "tuck",
    "true", "false", "reic", "not",
    "all", "cf-avg", "cf-sum", "cf-min", "cf-max", "head",
    "des", "des-simple", "des-fast", "des-slow", "des-slower",
    "des-epic-signal", "des-epic-viz", "random",
    "stat-avg", "stat-max", "stat-min", "stat-last", "stat-count",
    "stat-total", "stat-min-mf", "stat-max-mf", "stat-avg-mf")

  private def interpreter(vocab: String): Interpreter =
    Vocabulary.vocabularies.get(vocab) match {
      case Some(words) => Interpreter(words)
      case None => throw new IllegalArgumentException(
        s"unknown vocabulary '$vocab' (one of ${Vocabulary.vocabularies.keys.toList.sorted.mkString(", ")})")
    }

  /** Display form of a stack value (reference ExprApi.valueString:132-135:
    * expression string for expressions, toString otherwise). */
  private def valueString(v: Any): String = Interpreter.displayString(v)

  /** Execute a program and coerce the final stack to styled expressions,
    * bottom (user order) first. */
  private def styleExprs(program: String, vocab: String = "main"): List[StyleExpr] = {
    val ctx = interpreter(vocab).execute(Interpreter.tokenize(program), Context(Nil))
    (ctx.stack.reverse ::: ctx.frozen.reverse).flatMap(Coerce.style)
  }

  /** The final stack must make sense for the vocabulary: a single query
    * for `query`, presentation-coercible values for the full vocabularies,
    * anything for `std` (reference ExprApi.verifyStackContents:94-130). */
  private def verifyStackContents(vocab: String, stack: List[Any]): Unit = {
    def summary = stack.map(Interpreter.typeName).mkString(",")
    vocab match {
      case "std" => // any stack is valid
      case "query" =>
        stack match {
          case (_: Query) :: Nil =>
          case _ => throw new IllegalArgumentException(
            s"expected a single query on the stack, got [$summary]")
        }
      case _ =>
        if (stack.exists(v => Coerce.style(v).isEmpty))
          throw new IllegalArgumentException(
            s"expected expressions on the stack, got [$summary]")
    }
  }

  /**
   * Step-by-step execution trace: the initial state plus the stack and
   * variables after every token, with expressions rendered in their ASL
   * display form. Fails when the final stack is not valid for the
   * vocabulary, exactly like a graph request would.
   */
  def debug(program: String, vocab: String = "main"): List[DebugStep] = {
    val steps = interpreter(vocab).debug(program)
    verifyStackContents(vocab, steps.last.context.stack)
    steps.map { s =>
      DebugStep(
        s.program,
        s.context.stack.map(valueString),
        s.context.variables.map { case (k, v) => k -> valueString(v) })
    }
  }

  private val normalizer = new Normalizer()

  /** Canonical string form of each expression produced by the program
    * (reference ExprApi.normalize:305-322 over the ExprNormalizer). */
  def normalize(program: String): List[String] =
    styleExprs(program).map(normalizer.normalizeToString)

  /**
   * Auto-completion: the words that match the CURRENT stack and whose
   * execution would actually succeed on it (a matcher can be loose for
   * macros, so each candidate is executed against the stack — reference
   * ExprApi.processCompleteRequest:162-191). Sorted by name.
   */
  def complete(program: String, vocab: String = "main"): List[WordInfo] = {
    val in = interpreter(vocab)
    val ctx = in.execute(Interpreter.tokenize(program), Context(Nil))
    in.vocabulary
      .filter { w =>
        !excludedWords.contains(w.name) && w.matches(ctx.stack) &&
          Try(in.execute(List(s":${w.name}"), ctx)).isSuccess
      }
      .map(w => WordInfo(w.name, w.signature))
      .distinct
      .sortBy(_.name)
  }

  /** Distinct data predicates used by the program's expressions, sorted —
    * what a UI needs to explore the tag space behind a graph
    * (reference ExprApi.processQueriesRequest:192-208). */
  def queries(program: String): List[String] =
    styleExprs(program).flatMap(_.dataExprs.map(_.query.asl)).sorted.distinct

  /**
   * Migrate deprecated usage to canonical form — currently the legacy
   * list-form offset (`expr,(,1h,2h,),:offset` stored in the `offsets`
   * setting): a single zero offset is dropped, a single non-zero offset
   * becomes the `:offset` operator, and multiple offsets extract the base
   * expression into a variable applied per offset (reference
   * ExprApi.rewrite:350-384).
   */
  def rewrite(program: String): List[String] =
    styleExprs(program).zipWithIndex.map { case (s, i) => rewriteOffset(s, i) }

  private def rewriteOffset(s: StyleExpr, i: Int): String = {
    val ds = s.settings.get("offsets")
      .map(_.split(",").toList.filter(_.nonEmpty)).getOrElse(Nil)
    def base = {
      val b = StyleExpr(s.expr, s.settings - "offsets")
      if (b.settings.isEmpty) b.expr.asl else b.asl
    }
    ds match {
      case Nil                                        => s.asl
      case d :: Nil if Strings.parseDuration(d) == 0L => base
      case d :: Nil                                   => s"$base,$d,:offset"
      case _ =>
        val varName = s"Query$i"
        val offsets = ds.map { d =>
          if (Strings.parseDuration(d) == 0L) s"$varName,:get"
          else s"$varName,:get,$d,:offset"
        }.mkString(",")
        s"$varName,$base,:set,$offsets"
    }
  }

  /**
   * Strip parts of an expression: query clauses mentioning a key in
   * `keys` collapse to `:true` (then simplify, with stripped clauses
   * treated as neutral), and vocabularies in `remove` (`filter`, `style`)
   * have their wrappers removed anywhere in the tree (reference
   * ExprApi.processStripRequest:210-265).
   */
  def strip(
      program: String,
      keys: Set[String],
      remove: Set[String] = Set.empty): List[String] =
    styleExprs(program).map { s =>
      val dropped: TimeSeriesExpr =
        if (keys.isEmpty) s
        else Rewrite.mapData(s, d => Rewrite.mapQuery(d, q => simplifyIgnore(stripKeys(q, keys))))
      remove.toList.sorted.foldLeft(dropped) { (e, v) =>
        v match {
          case "filter" => stripFilter(e)
          case "style"  => stripStyle(e)
          case other =>
            throw new IllegalArgumentException(s"vocabulary '$other' not supported")
        }
      }.asl
    }

  private def stripKeys(q: Query, ks: Set[String]): Query = q match {
    case Query.And(a, b)                      => Query.And(stripKeys(a, ks), stripKeys(b, ks))
    case Query.Or(a, b)                       => Query.Or(stripKeys(a, ks), stripKeys(b, ks))
    case Query.Not(x)                         => Query.Not(stripKeys(x, ks))
    case kq: Query.KeyQuery if ks.contains(kq.k) => Query.True
    case other                                => other
  }

  /** Reference Query.simplify with ignore=true (model/Query.scala:218-240):
    * identical to the default except `:not` of a STRIPPED (true) clause
    * stays true instead of flipping to false — a removed restriction must
    * not turn into "match nothing". */
  private def simplifyIgnore(query: Query): Query = {
    val next = query match {
      case Query.And(Query.True, q)  => simplifyIgnore(q)
      case Query.And(q, Query.True)  => simplifyIgnore(q)
      case Query.And(Query.False, _) => Query.False
      case Query.And(_, Query.False) => Query.False
      case Query.And(a, b)           => Query.And(simplifyIgnore(a), simplifyIgnore(b))
      case Query.Or(Query.True, _)   => Query.True
      case Query.Or(_, Query.True)   => Query.True
      case Query.Or(Query.False, q)  => simplifyIgnore(q)
      case Query.Or(q, Query.False)  => simplifyIgnore(q)
      case Query.Or(a, b)            => Query.Or(simplifyIgnore(a), simplifyIgnore(b))
      case Query.Not(Query.True)     => Query.True
      case Query.Not(Query.False)    => Query.True
      case Query.Not(q)              => Query.Not(simplifyIgnore(q))
      case q                         => q
    }
    if (next != query) simplifyIgnore(next) else next
  }

  private def stripFilter(e: TimeSeriesExpr): TimeSeriesExpr =
    Rewrite.transform(e) {
      case FilterExpr.Stat(x, _)        => x
      case FilterExpr.Filter(x, _)      => x
      case p: FilterExpr.PriorityFilter => p.expr
    }

  private def stripStyle(e: TimeSeriesExpr): TimeSeriesExpr = e match {
    case s: StyleExpr => s.expr
    case other        => other
  }
}
