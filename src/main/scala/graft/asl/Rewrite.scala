package graft.asl

/** Structural rewrites over expression trees, used by `:cq` (AND a common
  * query into every fetch), `:cg` (append common group-by keys), and
  * `:offset` applied to whole expressions. */
object Rewrite {

  /** Apply f to every DataExpr leaf. */
  def mapData(e: TimeSeriesExpr, f: DataExpr => DataExpr): TimeSeriesExpr = e match {
    case d: DataExpr                  => f(d)
    case m: MathExpr.Constant         => m
    case m: MathExpr.SeededRandom     => m
    case m: MathExpr.Time             => m
    case m: MathExpr.TimeSpan         => m
    case MathExpr.ClampMin(x, v)      => MathExpr.ClampMin(mapData(x, f), v)
    case MathExpr.ClampMax(x, v)      => MathExpr.ClampMax(mapData(x, f), v)
    case MathExpr.Unary(op, x)        => MathExpr.Unary(op, mapData(x, f))
    case MathExpr.PerStep(x)          => MathExpr.PerStep(mapData(x, f))
    case MathExpr.Binary(op, a, b)    => MathExpr.Binary(op, mapData(a, f), mapData(b, f))
    case MathExpr.Aggr(op, x)         => MathExpr.Aggr(op, mapData(x, f))
    case MathExpr.GroupBy(aggr, keys) =>
      MathExpr.GroupBy(mapData(aggr, f).asInstanceOf[MathExpr.Aggr], keys)
    case MathExpr.As(x, o, r)         => MathExpr.As(mapData(x, f), o, r)
    case MathExpr.NamedRewrite(d, x)  => MathExpr.NamedRewrite(d, mapData(x, f))
    case p: MathExpr.Percentiles      =>
      p.copy(expr = f(p.expr).asInstanceOf[DataExpr.GroupBy])
    case a: MathExpr.ApproxDistinct   => a.copy(expr = f(a.expr))
    case s: StatefulExpr              => mapStateful(s, f)
    case FilterExpr.Stat(x, st)       => FilterExpr.Stat(mapData(x, f), st)
    case s: FilterExpr.StatExpr       => s
    case FilterExpr.Filter(x, p)      => FilterExpr.Filter(mapData(x, f), mapData(p, f))
    case p: FilterExpr.PriorityFilter => p.copy(expr = mapData(p.expr, f))
    case c: FilterExpr.Consolidate    => c.copy(expr = mapData(c.expr, f))
    case StyleExpr(x, settings)       => StyleExpr(mapData(x, f), settings)
  }

  private def mapStateful(s: StatefulExpr, f: DataExpr => DataExpr): TimeSeriesExpr = s match {
    case x: StatefulExpr.Delay         => x.copy(expr = mapData(x.expr, f))
    case x: StatefulExpr.RollingCount  => x.copy(expr = mapData(x.expr, f))
    case x: StatefulExpr.RollingMin    => x.copy(expr = mapData(x.expr, f))
    case x: StatefulExpr.RollingMax    => x.copy(expr = mapData(x.expr, f))
    case x: StatefulExpr.RollingMean   => x.copy(expr = mapData(x.expr, f))
    case x: StatefulExpr.RollingSum    => x.copy(expr = mapData(x.expr, f))
    case x: StatefulExpr.Des           => x.copy(expr = mapData(x.expr, f))
    case x: StatefulExpr.SlidingDes    => x.copy(expr = mapData(x.expr, f))
    case x: StatefulExpr.Trend         => x.copy(expr = mapData(x.expr, f))
    case x: StatefulExpr.Integral      => x.copy(expr = mapData(x.expr, f))
    case x: StatefulExpr.CumulativeMax => x.copy(expr = mapData(x.expr, f))
    case x: StatefulExpr.Derivative    => x.copy(expr = mapData(x.expr, f))
  }

  /** AND a common query into a data expr (`:cq`). */
  def withCommonQuery(d: DataExpr, common: Query): DataExpr =
    mapQuery(d, _.and(common))

  /** Apply f to the query of a data expr. */
  def mapQuery(d: DataExpr, f: Query => Query): DataExpr = d match {
    case DataExpr.All(q, o)            => DataExpr.All(f(q), o)
    case DataExpr.Sum(q, o)            => DataExpr.Sum(f(q), o)
    case DataExpr.Count(q, o)          => DataExpr.Count(f(q), o)
    case DataExpr.Min(q, o)            => DataExpr.Min(f(q), o)
    case DataExpr.Max(q, o)            => DataExpr.Max(f(q), o)
    case DataExpr.Consolidation(af, cf) =>
      DataExpr.Consolidation(mapQuery(af, f).asInstanceOf[DataExpr.AggregateFunction], cf)
    case DataExpr.GroupBy(af, keys)    =>
      DataExpr.GroupBy(mapQuery(af, f).asInstanceOf[DataExpr.AggregateFunction], keys)
  }

  /** Rebuild a node with each direct TimeSeriesExpr child mapped by g.
    * DataExpr subtrees (including the ones inside `:percentiles` /
    * `:approx-distinct`) are leaves here — their internals are queries and
    * grouping, not nested time-series operators. */
  private def mapChildren(
      e: TimeSeriesExpr, g: TimeSeriesExpr => TimeSeriesExpr): TimeSeriesExpr = e match {
    case d: DataExpr                  => d
    case m: MathExpr.Constant         => m
    case m: MathExpr.SeededRandom     => m
    case m: MathExpr.Time             => m
    case m: MathExpr.TimeSpan         => m
    case MathExpr.ClampMin(x, v)      => MathExpr.ClampMin(g(x), v)
    case MathExpr.ClampMax(x, v)      => MathExpr.ClampMax(g(x), v)
    case MathExpr.Unary(op, x)        => MathExpr.Unary(op, g(x))
    case MathExpr.PerStep(x)          => MathExpr.PerStep(g(x))
    case MathExpr.Binary(op, a, b)    => MathExpr.Binary(op, g(a), g(b))
    case MathExpr.Aggr(op, x)         => MathExpr.Aggr(op, g(x))
    case MathExpr.GroupBy(aggr, keys) =>
      MathExpr.GroupBy(g(aggr).asInstanceOf[MathExpr.Aggr], keys)
    case MathExpr.As(x, o, r)         => MathExpr.As(g(x), o, r)
    case MathExpr.NamedRewrite(d, x)  => MathExpr.NamedRewrite(d, g(x))
    case p: MathExpr.Percentiles      => p
    case a: MathExpr.ApproxDistinct   => a
    case x: StatefulExpr.Delay         => x.copy(expr = g(x.expr))
    case x: StatefulExpr.RollingCount  => x.copy(expr = g(x.expr))
    case x: StatefulExpr.RollingMin    => x.copy(expr = g(x.expr))
    case x: StatefulExpr.RollingMax    => x.copy(expr = g(x.expr))
    case x: StatefulExpr.RollingMean   => x.copy(expr = g(x.expr))
    case x: StatefulExpr.RollingSum    => x.copy(expr = g(x.expr))
    case x: StatefulExpr.Des           => x.copy(expr = g(x.expr))
    case x: StatefulExpr.SlidingDes    => x.copy(expr = g(x.expr))
    case x: StatefulExpr.Trend         => x.copy(expr = g(x.expr))
    case x: StatefulExpr.Integral      => x.copy(expr = g(x.expr))
    case x: StatefulExpr.CumulativeMax => x.copy(expr = g(x.expr))
    case x: StatefulExpr.Derivative    => x.copy(expr = g(x.expr))
    case FilterExpr.Stat(x, st)        => FilterExpr.Stat(g(x), st)
    case s: FilterExpr.StatExpr        => s
    case FilterExpr.Filter(x, p)       => FilterExpr.Filter(g(x), g(p))
    case p: FilterExpr.PriorityFilter  => p.copy(expr = g(p.expr))
    case c: FilterExpr.Consolidate     => c.copy(expr = g(c.expr))
    case StyleExpr(x, settings)        => StyleExpr(g(x), settings)
  }

  /** Bottom-up structural rewrite (reference model Expr.rewrite): children
    * first, then pf at every node where it is defined. Used by the expr
    * tooling API to strip filter wrappers anywhere in a tree. */
  def transform(e: TimeSeriesExpr)(
      pf: PartialFunction[TimeSeriesExpr, TimeSeriesExpr]): TimeSeriesExpr = {
    def go(x: TimeSeriesExpr): TimeSeriesExpr = {
      val rebuilt = mapChildren(x, go)
      if (pf.isDefinedAt(rebuilt)) pf(rebuilt) else rebuilt
    }
    go(e)
  }

  /** Append common group-by keys to a data expr (`:cg`). */
  def withCommonGroup(d: DataExpr, keys: List[String]): DataExpr = d match {
    case DataExpr.GroupBy(af, existing) =>
      DataExpr.GroupBy(af, existing ++ keys.filterNot(existing.contains))
    case af: DataExpr.AggregateFunction => DataExpr.GroupBy(af, keys)
    case other                          => other
  }
}
