package graft.ops

import graft.core.NanMath
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Exact grouped quantiles without a per-group global sort.
 *
 * The naive plan — `Window.partitionBy(group).orderBy(value)` + row_number —
 * funnels every row of a group into ONE sort task, so a low-cardinality group
 * key (e.g. 3 return flags over a 100 TB lineitem) creates 3 straggler tasks
 * sorting the whole table. This implementation selects the same interpolated
 * order statistics (the `quantile_cont` definition) with nothing but hash
 * aggregations and windows over DOMAIN-bounded frames:
 *
 *  1. one hash aggregation to per-(group, value) counts — cardinality is the
 *     number of DISTINCT values per group, not rows;
 *  2. a coarse histogram per (group, unit bucket) — cardinality bounded by
 *     the value domain (e.g. integer dollars), independent of row count; the
 *     cumulative walk that locates each quantile's marker bucket runs on
 *     this tiny frame;
 *  3. the marker frame (a few rows) broadcast-joins back to the value counts
 *     and in-bucket ranking touches only the ONE bucket per marker — a
 *     1/#buckets slice of the group, never the group itself.
 *
 * Contract: exact for discrete / domain-bounded value columns (prices,
 * counts, durations in fixed units). For continuous unbounded domains the
 * histogram frame grows with the data — use the PercentileBuckets sketch
 * (`:percentiles`) instead, which is the approximate path the reference
 * itself takes for high-cardinality distributions.
 */
object Quantiles {

  /**
   * Interpolated quantiles of `valueCol` per `groupCol`, `quantile_cont`
   * semantics: rank r = q*(n-1), result = v[floor(r)] + (r - floor(r)) *
   * (v[ceil(r)] - v[floor(r)]) on the 0-indexed sorted values. Output: one
   * row per group with one column per requested quantile, named by
   * `names(i)`, rounded HALF_UP to 4 decimals (+RoundEps, matching the
   * engine-wide oracle convention).
   */
  def groupedExact(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      qs: Seq[Double],
      names: Seq[String]
  ): DataFrame = {
    require(qs.nonEmpty && qs.size == names.size)
    val g = col(groupCol)

    // 1. distinct-value counts: the only row-cardinality shuffle. Both the
    //    histogram and the marker-bucket ranking read this frame;
    //    localCheckpoint materializes it once (the exchange is not reused
    //    across the broadcast branch) and the blocks are freed by the
    //    ContextCleaner.
    val vc = df
      .select(g, col(valueCol).cast("double").as("v"))
      // quantile_cont semantics: NULL values are IGNORED (they are not
      // order statistics). Without this filter a null value forms a
      // floor(null)=null bucket that sorts first, inflates n, and the
      // marker join's === on the bucket key silently loses the whole
      // group's output row when a quantile rank lands in it. NaN is
      // dropped for the same reason (quantile_cont ignores it) AND
      // because Spark's max treats NaN as greatest: a single NaN would
      // make span — and the adaptive width w below — NaN, turning every
      // floor(v/NaN) bucket null and silently emptying EVERY group.
      .filter(col("v").isNotNull && !isnan(col("v")))
      .groupBy(g, col("v"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint()

    // 2. bucket histogram (floor(v/w) is monotonic in v, so bucket order =
    //    value order); frame size = groups x distinct buckets. The width is
    //    ADAPTIVE: spans up to 16384 stay unit buckets (the original
    //    discrete-domain shape), wider domains coarsen so the histogram —
    //    and the cumulative walk over it, whose parallelism is capped at
    //    |groups| — stays ~16k rows per group regardless of the value
    //    domain (measured: rel_pct_price's walk stage was 0.6 s over 3 x
    //    ~100k unit buckets; ~15k 7-unit buckets make it negligible).
    //    Exactness is unchanged for ANY w > 0: markers still locate the
    //    bucket holding each exact rank, and the in-bucket ranking selects
    //    the exact order statistic within a (now w-unit) slice — the w
    //    trade is walk size vs marker-slice size, sqrt-style two-level
    //    selection. One extra tiny job (min/max over the checkpointed
    //    value-count frame) picks w.
    val span = {
      val r = vc.agg(min(col("v")), max(col("v"))).head()
      if (r.isNullAt(0) || r.isNullAt(1)) 0.0 else r.getDouble(1) - r.getDouble(0)
    }
    // non-finite span (an Infinity value survives the NaN filter) falls
    // back to unit buckets — the pre-adaptive behavior — instead of
    // poisoning every bucket key with a non-finite width
    val w =
      if (java.lang.Double.isFinite(span)) math.max(1.0, math.ceil(span / 16384.0))
      else 1.0
    def bucketOf(v: Column): Column = floor(v / lit(w)).cast("long")
    val bc = vc
      .groupBy(g, bucketOf(col("v")).as("b"))
      .agg(sum(col("c")).as("bc"))
    val wOrd = Window.partitionBy(g).orderBy(col("b"))
    val bcum = bc
      .withColumn("cumBefore",
        coalesce(sum(col("bc")).over(wOrd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n", sum(col("bc")).over(Window.partitionBy(g)))

    // one marker row per (group, quantile, needed rank); the containment
    // filter picks exactly the bucket holding rank k, so (g, q, k) is unique
    // after it (floor(r) == ceil(r) duplicates collapse)
    val markers = bcum
      .withColumn("q", explode(array(qs.map(lit(_)): _*)))
      .withColumn("r", col("q") * (col("n") - lit(1)).cast("double"))
      .withColumn("k", explode(array(floor(col("r")).cast("long"), ceil(col("r")).cast("long"))))
      .filter(col("k") >= col("cumBefore") && col("k") < col("cumBefore") + col("bc"))
      .dropDuplicates(groupCol, "q", "k")
      // renamed join keys: markers derives from vc, so joining on the
      // original names trips Spark's ambiguous-self-join detection
      .select(g.as("mg"), col("b").as("mb"), col("q"), col("r"), col("k"),
        (col("k") - col("cumBefore")).as("kin"))

    // 3. rank within the marker bucket only: the window partitions by
    //    (group, q, k) over a 1/#buckets slice — bounded work per marker.
    //    <=> on the group key: a NULL group is a regular group everywhere
    //    else in this plan (groupBy and Window.partitionBy both keep it),
    //    and an === here silently dropped its quantile row entirely
    val mv = vc.join(
      broadcast(markers),
      (g <=> col("mg")) && bucketOf(col("v")) === col("mb"))
      .select(g, col("q"), col("r"), col("k"), col("kin"), col("v"), col("c"))
    val wIn = Window.partitionBy(g, col("q"), col("k")).orderBy(col("v"))
    val sel = mv
      .withColumn("cum", sum(col("c")).over(wIn))
      .filter(col("kin") >= col("cum") - col("c") && col("kin") < col("cum"))

    // marker values -> interpolation, then pivot quantiles to columns
    val interp = sel
      .groupBy(g, col("q"))
      .agg(
        min(when(col("k") === floor(col("r")).cast("long"), col("v"))).as("lo"),
        min(when(col("k") === ceil(col("r")).cast("long"), col("v"))).as("hi"),
        first(col("r")).as("rr"))
      .withColumn("pct",
        round(col("lo") + (col("rr") - floor(col("rr"))) * (col("hi") - col("lo"))
          + NanMath.RoundEps, 4))
    val pivotCols = qs.zip(names).map { case (q, name) =>
      min(when(col("q") === q, col("pct"))).as(name)
    }
    interp.groupBy(g).agg(pivotCols.head, pivotCols.tail: _*)
  }

  /**
   * Sketched grouped quantiles via Spark's native `percentile_approx`
   * (Greenwald-Khanna): ONE hash-aggregate exchange total, the mergeable-
   * sketch economics [[groupedExact]] deliberately does not use. The
   * trade, stated plainly: rank error is bounded by 1/accuracy (value
   * error unbounded in theory on adversarial distributions), results are
   * NOT quantile_cont-interpolated (the sketch returns an observed value),
   * so this is the dashboard/monitoring knob — groupedExact remains the
   * oracle-grade path. At 100 TB this is the difference between one
   * combiner-friendly pass and the exact plan's five exchanges.
   */
  def groupedApprox(
      df: DataFrame,
      groupCol: String,
      valueCol: String,
      qs: Seq[Double],
      names: Seq[String],
      accuracy: Int = 10000
  ): DataFrame = {
    require(qs.nonEmpty && qs.length == names.length, "qs/names mismatch")
    val agg = percentile_approx(
      col(valueCol),
      array(qs.map(lit): _*),
      lit(accuracy)).as("ps")
    df.groupBy(col(groupCol)).agg(agg)
      .select(col(groupCol) +: names.zipWithIndex.map { case (name, i) =>
        round(element_at(col("ps"), i + 1) + NanMath.RoundEps, 4).as(name)
      }: _*)
  }
}
