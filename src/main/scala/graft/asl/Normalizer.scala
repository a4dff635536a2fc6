package graft.asl

/**
 * Canonical expression normalization (reference model/ExprNormalizer.scala:
 * 22-70): queries are simplified, put in disjunctive normal form, clauses
 * within each conjunct sorted and deduped with configurable prefix/suffix
 * key priority, redundant conjuncts removed, and the disjuncts sorted —
 * so equivalent expressions share one canonical display string (the CSE /
 * caching key across graph requests).
 */
final class Normalizer(prefixKeys: List[String] = List("name"), suffixKeys: List[String] = Nil) {

  private def keyRank(k: String): (Int, Int, String) = {
    val p = prefixKeys.indexOf(k)
    val s = suffixKeys.indexOf(k)
    if (p >= 0) (0, p, k)
    else if (s >= 0) (2, s, k)
    else (1, 0, k)
  }

  private val clauseOrdering: Ordering[Query] = Ordering.by { q: Query =>
    q match {
      case kq: Query.KeyQuery => (keyRank(kq.k), kq.asl)
      case other              => ((3, 0, ""), other.asl)
    }
  }

  /** Canonical form of a query. */
  def normalize(q: Query): Query = {
    val simplified = q.simplified
    simplified match {
      case Query.True | Query.False => simplified
      case _ =>
        val disjuncts = simplified.dnfList
          .map(c => c.cnfList.distinct.sorted(clauseOrdering))
          .distinct
        val pruned = removeRedundant(disjuncts)
        pruned
          .map(_.reduce(Query.And.apply))
          .sortBy(_.asl)
          .reduce(Query.Or.apply)
    }
  }

  /** A conjunction that is a superset of another adds nothing to the OR. */
  private def removeRedundant(disjuncts: List[List[Query]]): List[List[Query]] = {
    val sets = disjuncts.map(_.toSet)
    disjuncts.zip(sets).filterNot { case (_, s) =>
      sets.exists(o => o != s && o.subsetOf(s))
    }.map(_._1) match {
      case Nil  => disjuncts.take(1)
      case kept => kept
    }
  }

  /** Normalize every query inside an expression tree. */
  def normalize(e: TimeSeriesExpr): TimeSeriesExpr =
    Rewrite.mapData(e, d => Rewrite.mapQuery(d, normalize))

  /** Canonical display string. */
  def normalizeToString(e: TimeSeriesExpr): String = normalize(e).asl
}
