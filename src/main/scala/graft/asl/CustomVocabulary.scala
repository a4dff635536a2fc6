package graft.asl

/**
 * Config-defined extension words (reference model/CustomVocabulary.scala:
 * 1-222): operators expressed as macros — a name plus a token program that
 * executes against the current stack — layered on top of the standard
 * vocabulary. This is the engine's user extension surface; a macro behaves
 * exactly like a built-in word (type dispatch, examples, round-trip).
 *
 * Example:
 * {{{
 * val vocab = CustomVocabulary(List(
 *   Macro("sdes-fast", List("10", "0.1", "0.02", ":sdes")),
 *   Macro("clamp-pos", List("0", ":clamp-min"))
 * ))
 * vocab.interpreter.execute("name,sps,:eq,:sum,:sdes-fast")
 * }}}
 */
final case class CustomVocabulary(macros: List[CustomVocabulary.Macro]) {

  private val macroWords: List[Word] = macros.map { m =>
    new Word {
      def name: String = m.name
      def signature: String = "? -- ?"
      def matches(stack: List[Any]): Boolean = true
      def execute(ctx: Context, in: Interpreter): Context =
        in.execute(m.program, ctx)
      override def examples: List[String] = m.examples
      // config-declared stability (reference TypedMacro.scala:51): an
      // experimental macro ships gated behind unstable features
      override def isStable: Boolean = m.stable
    }
  }

  /** Standard vocabulary first (built-ins win name clashes), then macros. */
  val allWords: List[Word] = Vocabulary.allWords ::: macroWords

  lazy val interpreter: Interpreter = Interpreter(allWords)

  def parse(program: String): TimeSeriesExpr = {
    val ctx = interpreter.execute(program)
    (ctx.stack.reverse ::: ctx.frozen.reverse).flatMap(Coerce.style) match {
      case s :: Nil => if (s.settings.isEmpty) s.expr else s
      case other    => throw new IllegalArgumentException(s"expected one expression, got $other")
    }
  }
}

object CustomVocabulary {
  final case class Macro(
      name: String,
      program: List[String],
      examples: List[String] = Nil,
      stable: Boolean = true)
}
