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

  /** Full word reference for a vocabulary — name, signature and examples
    * for every word, the static glossary an editor or docs generator
    * consumes (complete() is the stack-aware subset of this). */
  final case class WordDoc(name: String, signature: String, examples: List[String])

  def words(vocab: String = "main"): List[WordDoc] =
    interpreter(vocab).vocabulary
      .map(w => WordDoc(w.name, w.signature, w.examples))
      .distinctBy(_.name)
      .sortBy(_.name)

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

  // --- editor-analysis surface (reference atlas-lsp AslDocumentAnalyzer /
  // AslTokenTypes): semantic token classification and hover docs over the
  // error-recovering syntaxTree. The JSON-RPC/websocket transport is
  // infrastructure out of scope; this is the analysis the server serves. ---

  /** One classified token: character span + one of `word`,
    * `unknown-word`, `string`, `number`, `paren` (reference
    * AslTokenTypes.{Word,UnknownWord,String,Number,Parenthesis}). */
  final case class SemanticToken(start: Int, end: Int, tokenType: String)

  /** Classify every token of a program for editor highlighting. Works on
    * broken input — the unknown word that fails execution classifies as
    * `unknown-word` (the reference's error-highlight type) and everything
    * else keeps its type. */
  def semanticTokens(program: String, vocab: String = "main"): List[SemanticToken] = {
    import Interpreter._
    def classify(n: SyntaxNode): List[SemanticToken] = n match {
      case w: WordNode =>
        List(SemanticToken(w.span.start, w.span.end,
          if (w.matched.isDefined) "word" else "unknown-word"))
      case l: ListNode =>
        SemanticToken(l.span.start, l.span.end, "paren") :: l.children.flatMap(classify)
      case l: LiteralNode if l.token == "(" || l.token == ")" =>
        List(SemanticToken(l.span.start, l.span.end, "paren"))
      case l: LiteralNode =>
        val t = if (Coerce.isNumber(l.token)) "number" else "string"
        List(SemanticToken(l.span.start, l.span.end, t))
    }
    interpreter(vocab).syntaxTree(program).nodes.flatMap(classify)
  }

  /**
   * Hover documentation for the token at `offset` (reference
   * AslDocumentAnalyzer.computeHover). For a word: its signature, the
   * stack it saw, and the vocabulary examples. For a literal: its
   * key/value position in the tag-pair stream (the reference's
   * literalContext parity — an odd run of consecutive literals ends on a
   * key, an even one on a value), described against the LIVE series
   * catalog when one is supplied — the data-driven analog of the
   * reference's static glossary files: a key hover reports how many
   * series carry it and its distinct-value count, a value hover how many
   * series match the pair.
   */
  def hover(
      program: String,
      offset: Int,
      vocab: String = "main",
      catalog: Option[org.apache.spark.sql.DataFrame] = None
  ): Option[String] = {
    import Interpreter._
    val tree = interpreter(vocab).syntaxTree(program)
    // top-level nodes only: the literal key/value rhythm is defined on the
    // main token stream, not inside list bodies
    val flat = tree.nodes
    val at = flat.indexWhere(n => n.span.start <= offset && offset < n.span.end)
    if (at < 0) return None
    flat(at) match {
      case w: WordNode =>
        val word = w.matched.flatMap(m =>
          interpreter(vocab).vocabulary.find(_.name == m))
        word.map { wd =>
          val sb = new StringBuilder
          sb.append(s"**:${wd.name}**\n\n`${wd.signature}`")
          if (w.stackBefore.nonEmpty)
            sb.append(s"\n\nStack: ${w.stackBefore.mkString(", ")}")
          if (wd.examples.nonEmpty)
            sb.append(s"\n\nExamples:\n${wd.examples.map(e => s"- `$e`").mkString("\n")}")
          sb.toString
        }
      case l: LiteralNode =>
        // count consecutive literals ending at this node: odd run = key
        var run = 0
        var i = at
        while (i >= 0 && flat(i).isInstanceOf[LiteralNode]) { run += 1; i -= 1 }
        val isKey = run % 2 == 1
        val base =
          if (isKey) s"**${l.token}** (tag key)"
          else {
            val key = flat(at - 1).token
            s"**${l.token}** (value of `$key`)"
          }
        val live = catalog.map { cat =>
          import org.apache.spark.sql.functions._
          if (isKey) {
            val r = cat
              .filter(map_contains_key(col("tags"), l.token))
              .agg(count(lit(1)), countDistinct(col("tags").getItem(l.token)))
              .head()
            s"\n\nSeen in ${r.getLong(0)} series, ${r.getLong(1)} distinct values"
          } else {
            val key = flat(at - 1).token
            val n = cat.filter(col("tags").getItem(key) === l.token).count()
            s"\n\nMatches $n series"
          }
        }
        Some(base + live.getOrElse(""))
      case _ => None
    }
  }

  /**
   * Pretty-print a program for humans (reference
   * AslDocumentAnalyzer.formatExpression): each word groups with the
   * arguments it consumed, simple groups stay inline, complex arguments
   * break onto their own lines, and independent top-level expressions
   * separate with a blank line. The output re-tokenizes to the same
   * program (the tokenizer trims whitespace around commas), so
   * `normalize(format(p)) == normalize(p)` — asserted corpus-wide.
   *
   * Where the reference derives each word's arity from declared
   * parameter types (TypedWord), here it is INFERRED from the
   * syntaxTree's per-word stack snapshots: pops and pushes fall out of
   * the longest common suffix between the stacks before and after the
   * word. Macros, overloads and stack shufflers need no special-casing —
   * whatever the word actually did to the stack is what the formatter
   * groups by.
   */
  def format(program: String, vocab: String = "main", maxWidth: Int = 78): String = {
    def render(n: FNode): String = n match {
      case FSimple(t, _, _) => t
      case FParen(items, _, _) =>
        val inline = ("(" +: items :+ ")").mkString(",")
        if (inline.length <= maxWidth) inline
        else ("(" +: items.map("  " + _) :+ ")").mkString(",\n")
      case FCmd(args, word, _, _, _) =>
        val rendered = args.map(render)
        val inline = (rendered :+ word).mkString(",")
        if (!inline.contains('\n') && inline.length <= maxWidth) inline
        else {
          // complex: each argument block on its own line, the word last
          // (attached to a trailing simple argument when there is one)
          val lastSimple = args.nonEmpty && args.last.isInstanceOf[FSimple]
          if (lastSimple)
            (rendered.init :+ s"${rendered.last},$word").mkString(",\n")
          else (rendered :+ word).mkString(",\n")
        }
    }
    buildTree(program, vocab).map(render).mkString(",\n\n")
  }

  /** One outline symbol: the word (or literal) with the character span
    * covering it AND the arguments it consumed, nested (reference
    * AslDocumentAnalyzer.computeDocumentSymbols). `kind` is one of
    * `function`, `string`, `number`, `array`. */
  final case class Symbol(
      name: String, kind: String, start: Int, end: Int, children: List[Symbol])

  /** Outline of a program: one symbol tree per top-level expression,
    * grouped by the same inferred arities as [[format]]. */
  def documentSymbols(program: String, vocab: String = "main"): List[Symbol] = {
    def toSym(n: FNode): Symbol = n match {
      case FSimple(t, s, e) =>
        Symbol(t, if (Coerce.isNumber(t)) "number" else "string", s, e, Nil)
      case FParen(_, s, e) => Symbol("(...)", "array", s, e, Nil)
      case FCmd(args, word, _, s, e) => Symbol(word, "function", s, e, args.map(toSym))
    }
    buildTree(program, vocab).map(toSym)
  }

  /** One quick fix: replace `[start, end)` with `replacement` (reference
    * AslDocumentAnalyzer.computeCodeActions — typo and deprecated-offset
    * actions, minus the LSP transport envelope). */
  final case class CodeAction(title: String, start: Int, end: Int, replacement: String)

  /** Structured quick fixes for a program: semicolon-for-colon typos,
    * unknown words within edit distance 2 of a vocabulary word, and the
    * legacy list-form `:offset` migration (a whole-program rewrite, like
    * the reference's deprecated-offset action). A clean program yields
    * none. */
  def codeActions(program: String, vocab: String = "main"): List[CodeAction] = {
    import Interpreter._
    val in = interpreter(vocab)
    val tree = in.syntaxTree(program)
    val known = in.vocabulary.map(_.name).distinct

    val typos = tree.nodes.flatMap {
      case w: WordNode if w.matched.isEmpty &&
          w.diagnostic.exists(_.message.startsWith("unknown word")) =>
        val name = w.token.stripPrefix(":")
        nearestWord(name, known).map(s =>
          CodeAction(s"change to ':$s'", w.span.start, w.span.end, s":$s"))
      case _ => Nil
    }
    val semis = tree.diagnostics
      .filter(_.message.contains("semicolon instead of colon"))
      .map { d =>
        val word = program.substring(d.span.start + 1, d.span.end)
        CodeAction(s"change to ':$word'", d.span.start, d.span.end, s":$word")
      }
    val offsets = Try(rewrite(program)).toOption
      .map(_.mkString(","))
      .filter(r => Try(normalize(program).mkString(",")).toOption.exists(_ != r))
      .map(r => CodeAction("migrate legacy offset list to :offset", 0, program.length, r))
      .toList
    (semis ++ typos ++ offsets).sortBy(a => (a.start, a.title))
  }

  /** Closest vocabulary word within edit distance 2 (ties alphabetical). */
  private def nearestWord(name: String, known: Seq[String]): Option[String] = {
    def dist(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(
          math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    known.map(w => (dist(name, w), w)).filter(_._1 <= 2).sorted.headOption.map(_._2)
  }

  private sealed trait FNode { def size: Int; def start: Int; def end: Int }
  private final case class FSimple(text: String, start: Int, end: Int)
      extends FNode { val size = 1 }
  private final case class FParen(items: List[String], start: Int, end: Int)
      extends FNode { val size = 1 }
  private final case class FCmd(
      args: List[FNode], word: String, size: Int, start: Int, end: Int) extends FNode

  /** Shared grouping pass behind [[format]] and [[documentSymbols]]: each
    * word becomes a node over the arguments it consumed, with pops and
    * pushes inferred from consecutive stack snapshots. */
  private def buildTree(program: String, vocab: String): List[FNode] = {
    import Interpreter._
    val tree = interpreter(vocab).syntaxTree(program)
    require(!tree.diagnostics.exists(_.error),
      s"cannot process a program with errors: ${tree.diagnostics.filter(_.error).map(_.message).mkString("; ")}")
    val nodes = tree.nodes

    // stack AFTER word i = stack BEFORE the next word, minus the literal/
    // list pushes in between (they sit on top); after the last word it is
    // the final stack minus the trailing literals
    val wordIdxs = nodes.zipWithIndex.collect { case (_: WordNode, i) => i }
    def pushesBetween(from: Int, until: Int): Int =
      nodes.slice(from, until).count(n => !n.isInstanceOf[WordNode])
    val afterOf: Map[Int, List[String]] = wordIdxs.zipWithIndex.map {
      case (i, k) =>
        val (nextStack, upTo) =
          if (k + 1 < wordIdxs.length) {
            val j = wordIdxs(k + 1)
            (nodes(j).asInstanceOf[WordNode].stackBefore, j)
          } else (tree.stack, nodes.length)
        i -> nextStack.drop(pushesBetween(i + 1, upTo))
    }.toMap

    def commonSuffix(a: List[String], b: List[String]): Int =
      a.reverse.zip(b.reverse).takeWhile { case (x, y) => x == y }.length

    val stack = scala.collection.mutable.ArrayBuffer.empty[FNode]
    nodes.zipWithIndex.foreach {
      case (l: LiteralNode, _) => stack += FSimple(l.token, l.span.start, l.span.end)
      case (l: ListNode, _) =>
        stack += FParen(l.children.map(_.token), l.span.start, l.span.end)
      case (w: WordNode, i) =>
        val before = w.stackBefore
        val after = afterOf(i)
        val common = commonSuffix(before, after)
        val pops = before.length - common
        val pushes = after.length - common
        var remaining = pops
        val args = List.newBuilder[FNode]
        while (remaining > 0 && stack.nonEmpty) {
          val top = stack.remove(stack.length - 1)
          remaining -= top.size
          args += top
        }
        val argList = args.result().reverse
        val start = argList.headOption.map(_.start).getOrElse(w.span.start)
        stack += FCmd(argList, w.token, pushes, start, w.span.end)
    }
    stack.toList
  }
}
