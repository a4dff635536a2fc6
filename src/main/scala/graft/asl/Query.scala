package graft.asl

import java.util.regex.Pattern

/**
 * Tag predicate AST. Semantics follow the reference query model
 * (atlas-core model/Query.scala:22-509): all predicates are
 * `tag-key op value` over string tags; `:lt`/`:gt`/... compare
 * lexicographically; `:re` regexes are anchored at the start.
 */
sealed trait Query extends Product with Serializable {

  /** In-memory evaluation, used for tests and small-side matching. */
  def matches(tags: Map[String, String]): Boolean

  /**
   * True if the query COULD match once additional tags are added — the
   * cheap pre-filter over a PARTIAL set of common tags (reference
   * Query.couldMatch, model/Query.scala:33-37 with the per-type
   * implementations at 242-508): a missing key is indeterminate (true), a
   * present key must pass the value check, `:has` is always possible, and
   * `:not` inverts full `matches` (its sub-query failing on the partial
   * tags does NOT mean it fails on the full set, so only a definite match
   * refutes the negation).
   *
   * APPROXIMATION CONTRACT (the reference's, kept for parity): the
   * `:not` reading is sound only when the negated body is itself
   * `:not`-free — `matches` of a `:not`-free query is MONOTONE under
   * adding tags, so a definite match refutes the negation for every
   * extension. A `:not` over a body containing `:not` (e.g. a double
   * negation) can refute a query that a fuller tag set satisfies —
   * pinned by AslSpec's soundness property. Callers using this as a
   * correctness-bearing filter must guard that fragment (the streaming
   * evaluator's [[graft.streaming.Evaluator]] does).
   */
  def couldMatch(tags: Map[String, String]): Boolean = this match {
    case Query.True              => true
    case Query.False             => false
    case Query.HasKey(_)         => true
    case kv: Query.KeyValueQuery => tags.get(kv.k).forall(Query.valueCheck(kv, _))
    case Query.And(a, b)         => a.couldMatch(tags) && b.couldMatch(tags)
    case Query.Or(a, b)          => a.couldMatch(tags) || b.couldMatch(tags)
    case Query.Not(q)            => !q.matches(tags)
  }

  /** True when this query sits in [[couldMatch]]'s SOUND fragment: every
    * `:not` body is `:not`-free, so the negated `matches` is monotone
    * under added tags and a definite sub-match refutes the negation for
    * every extension (the approximation contract above). */
  def couldMatchIsSound: Boolean = {
    def notFree(x: Query): Boolean = x match {
      case Query.Not(_)    => false
      case Query.And(a, b) => notFree(a) && notFree(b)
      case Query.Or(a, b)  => notFree(a) && notFree(b)
      case _               => true
    }
    this match {
      case Query.Not(s)    => notFree(s)
      case Query.And(a, b) => a.couldMatchIsSound && b.couldMatchIsSound
      case Query.Or(a, b)  => a.couldMatchIsSound && b.couldMatchIsSound
      case _               => true
    }
  }

  /** [[couldMatch]] as a CORRECTNESS-BEARING filter: outside the sound
    * fragment it never prunes (true), so a caller can never drop
    * something a fuller tag set satisfies — AslSpec's ScalaCheck property
    * pins this over random query trees. */
  def couldMatchSound(tags: Map[String, String]): Boolean =
    !couldMatchIsSound || couldMatch(tags)

  /**
   * Match against tags carrying a LIST of candidate values per key
   * (reference Query.matchesAny, model/Query.scala:30-31): a key-value
   * clause succeeds if ANY candidate value passes its check; `:not`
   * negates the any-match.
   */
  def matchesAny(tags: Map[String, List[String]]): Boolean = this match {
    case Query.True              => true
    case Query.False             => false
    case Query.HasKey(k)         => tags.contains(k)
    case kv: Query.KeyValueQuery => tags.get(kv.k).exists(_.exists(Query.valueCheck(kv, _)))
    case Query.And(a, b)         => a.matchesAny(tags) && b.matchesAny(tags)
    case Query.Or(a, b)          => a.matchesAny(tags) || b.matchesAny(tags)
    case Query.Not(q)            => !q.matchesAny(tags)
  }

  def and(q: Query): Query = Query.And(this, q).simplified
  def or(q: Query): Query = Query.Or(this, q).simplified
  def not: Query = this match {
    case Query.True      => Query.False
    case Query.False     => Query.True
    case Query.Not(q)    => q
    case q               => Query.Not(q)
  }

  /** Smart-constructor simplification against True/False (Query.scala:42-54, 218-240). */
  def simplified: Query = this match {
    case Query.And(q1, q2) =>
      (q1.simplified, q2.simplified) match {
        case (Query.True, q)  => q
        case (q, Query.True)  => q
        case (Query.False, _) => Query.False
        case (_, Query.False) => Query.False
        case (a, b)           => Query.And(a, b)
      }
    case Query.Or(q1, q2) =>
      (q1.simplified, q2.simplified) match {
        case (Query.True, _)  => Query.True
        case (_, Query.True)  => Query.True
        case (Query.False, q) => q
        case (q, Query.False) => q
        case (a, b)           => Query.Or(a, b)
      }
    case Query.Not(q) =>
      q.simplified match {
        case Query.True  => Query.False
        case Query.False => Query.True
        case s           => Query.Not(s)
      }
    case q => q
  }

  /** Keys that must have an exact value for the query to match (Query.exactKeys). */
  def exactKeys: Set[String] = this match {
    case Query.Equal(k, _) => Set(k)
    case Query.And(a, b)   => a.exactKeys ++ b.exactKeys
    case Query.Or(_, _)    => Set.empty
    case _                 => Set.empty
  }

  /** Exact (key -> value) pairs implied by the query, used for result tags. */
  def exactTags: Map[String, String] = this match {
    case Query.Equal(k, v) => Map(k -> v)
    case Query.And(a, b)   => a.exactTags ++ b.exactTags
    case _                 => Map.empty
  }

  /** All tag keys referenced anywhere in the query. */
  def allKeys: Set[String] = this match {
    case kq: Query.KeyQuery => Set(kq.k)
    case Query.And(a, b)    => a.allKeys ++ b.allKeys
    case Query.Or(a, b)     => a.allKeys ++ b.allKeys
    case Query.Not(q)       => q.allKeys
    case _                  => Set.empty
  }

  /** Conjunctive normal form as a list of clauses (Query.cnfList). */
  def cnfList: List[Query] = this match {
    case Query.And(a, b) => a.cnfList ::: b.cnfList
    case Query.Not(Query.Or(a, b))  => (a.not).cnfList ::: (b.not).cnfList
    case Query.Not(Query.And(a, b)) => List(Query.Or(a.not, b.not).simplified)
    case q => List(q)
  }

  /** Disjunctive normal form as a list of clauses (Query.dnfList). */
  def dnfList: List[Query] = this match {
    case Query.Or(a, b) => a.dnfList ::: b.dnfList
    case Query.And(a, b) =>
      for (x <- a.dnfList; y <- b.dnfList) yield Query.And(x, y).simplified
    case Query.Not(Query.And(a, b)) => (a.not).dnfList ::: (b.not).dnfList
    case Query.Not(Query.Or(a, b))  => List(Query.And(a.not, b.not).simplified)
    case q => List(q)
  }

  /** ASL display form, comma-joined postfix (round-trips through the interpreter). */
  def asl: String
}

object Query {

  /**
   * Split `:in` clauses of a conjunction into a list of `:eq` queries
   * (reference Query.expandInClauses, Query.scala:160-183): index lookups
   * work per exact tag value, so `k,(,a,b,),:in` fans out to two queries.
   * Clauses larger than `limit` stay unexpanded to avoid combinatorial
   * explosion. Input should be a normalized string of conjunctions (see
   * dnfList).
   */
  def expandInClauses(query: Query, limit: Int = 5): List[Query] = query match {
    case Query.And(q1, q2) =>
      for {
        a <- expandInClauses(q1, limit)
        b <- expandInClauses(q2, limit)
      } yield Query.And(a, b)
    case Query.In(k, vs) if vs.lengthCompare(limit) <= 0 =>
      vs.map(v => Query.Equal(k, v))
    case _ => List(query)
  }

  sealed trait KeyQuery extends Query { def k: String }
  sealed trait KeyValueQuery extends KeyQuery

  /** The per-type VALUE check shared by couldMatch/matchesAny (the
    * reference factors this as KeyValueQuery.check; graft keeps the
    * single-pattern-match idiom). */
  private[asl] def valueCheck(q: KeyValueQuery, s: String): Boolean = q match {
    case Equal(_, v)            => s == v
    case LessThan(_, v)         => s < v
    case LessThanEqual(_, v)    => s <= v
    case GreaterThan(_, v)      => s > v
    case GreaterThanEqual(_, v) => s >= v
    case r: Regex               => r.checkValue(s)
    case r: RegexIgnoreCase     => r.checkValue(s)
    case In(_, vs)              => vs.contains(s)
  }

  case object True extends Query {
    def matches(tags: Map[String, String]): Boolean = true
    def asl = ":true"
  }

  case object False extends Query {
    def matches(tags: Map[String, String]): Boolean = false
    def asl = ":false"
  }

  final case class HasKey(k: String) extends KeyQuery {
    def matches(tags: Map[String, String]): Boolean = tags.contains(k)
    def asl = s"$k,:has"
  }

  final case class Equal(k: String, v: String) extends KeyValueQuery {
    def matches(tags: Map[String, String]): Boolean = tags.get(k).contains(v)
    def asl = s"$k,$v,:eq"
  }

  final case class LessThan(k: String, v: String) extends KeyValueQuery {
    def matches(tags: Map[String, String]): Boolean = tags.get(k).exists(_ < v)
    def asl = s"$k,$v,:lt"
  }

  final case class LessThanEqual(k: String, v: String) extends KeyValueQuery {
    def matches(tags: Map[String, String]): Boolean = tags.get(k).exists(_ <= v)
    def asl = s"$k,$v,:le"
  }

  final case class GreaterThan(k: String, v: String) extends KeyValueQuery {
    def matches(tags: Map[String, String]): Boolean = tags.get(k).exists(_ > v)
    def asl = s"$k,$v,:gt"
  }

  final case class GreaterThanEqual(k: String, v: String) extends KeyValueQuery {
    def matches(tags: Map[String, String]): Boolean = tags.get(k).exists(_ >= v)
    def asl = s"$k,$v,:ge"
  }

  /** Regex anchored at the start (Query.scala:410-421). */
  final case class Regex(k: String, v: String) extends KeyValueQuery {
    private lazy val p = Pattern.compile("^" + v)
    private[asl] def checkValue(s: String): Boolean = p.matcher(s).find()
    def matches(tags: Map[String, String]): Boolean =
      tags.get(k).exists(checkValue)
    def asl = s"$k,$v,:re"
  }

  final case class RegexIgnoreCase(k: String, v: String) extends KeyValueQuery {
    private lazy val p = Pattern.compile("^" + v, Pattern.CASE_INSENSITIVE)
    private[asl] def checkValue(s: String): Boolean = p.matcher(s).find()
    def matches(tags: Map[String, String]): Boolean =
      tags.get(k).exists(checkValue)
    def asl = s"$k,$v,:reic"
  }

  final case class In(k: String, vs: List[String]) extends KeyValueQuery {
    def matches(tags: Map[String, String]): Boolean = tags.get(k).exists(vs.contains)
    def toOrQuery: Query = vs.map(v => Equal(k, v): Query)
      .reduceOption((a, b) => Or(a, b)).getOrElse(False)
    def asl = s"$k,(,${vs.mkString(",")},),:in"
  }

  final case class And(q1: Query, q2: Query) extends Query {
    def matches(tags: Map[String, String]): Boolean = q1.matches(tags) && q2.matches(tags)
    def asl = s"${q1.asl},${q2.asl},:and"
  }

  final case class Or(q1: Query, q2: Query) extends Query {
    def matches(tags: Map[String, String]): Boolean = q1.matches(tags) || q2.matches(tags)
    def asl = s"${q1.asl},${q2.asl},:or"
  }

  final case class Not(q: Query) extends Query {
    def matches(tags: Map[String, String]): Boolean = !q.matches(tags)
    def asl = s"${q.asl},:not"
  }

  // Sugar words (QueryVocabulary.scala :contains/:starts/:ends) desugar to Regex.
  def contains(k: String, v: String): Query = Regex(k, ".*" + Pattern.quote(v))
  def starts(k: String, v: String): Query = Regex(k, Pattern.quote(v))
  def ends(k: String, v: String): Query = Regex(k, ".*" + Pattern.quote(v) + "$")
}
