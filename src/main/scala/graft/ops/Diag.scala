package graft.ops

import graft.core.NanMath
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Pipeline-health diagnostics: before shuffling 100 TB on a key, measure
 * the key. A skewed `groupBy`/`join` key is the single most common way a
 * plan that works at test scale dies at cluster scale (one straggler
 * partition owning 30% of the rows) — these operators put numbers on
 * that BEFORE the expensive job runs, at key cardinality, so the caller
 * can decide to salt, AQE-skew-join, or cap.
 */
object Diag {

  /**
   * Top-k heaviest key values with row share and cumulative share:
   * `(key, cnt, share, cum_share, rank)`, heaviest first (ties to the
   * smaller key string). One count aggregate at key cardinality, a
   * TakeOrdered top-k cut (per-partition heaps — key-cardinality rows
   * never funnel into one task), then the rank/cum window over only the
   * k survivors.
   */
  def keySkew(df: DataFrame, keyCol: String, k: Int = 10): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum(col("cnt")).as("total"))
    // asc_nulls_last: Spark defaults NULLS FIRST on ASC where DuckDB (and
    // the oracle) default NULLS LAST — a NULL key tying at the k boundary
    // must rank identically in both engines
    val w = Window.orderBy(col("cnt").desc, col("key").asc_nulls_last)
    counts
      // orderBy + limit plans as TakeOrdered BEFORE the single-partition
      // window, so the global window (unavoidable for a global rank) only
      // ever sees k rows — ranks and cumulative shares over the top-k cut
      // are identical to ranking everything and filtering after
      .orderBy(col("cnt").desc, col("key").asc_nulls_last)
      .limit(k)
      .withColumn("rank", row_number().over(w))
      .crossJoin(broadcast(total))
      .withColumn("share", round(col("cnt") / col("total") + NanMath.RoundEps, 4))
      .withColumn("cum_share",
        round(sum(col("cnt")).over(w.rowsBetween(Window.unboundedPreceding, 0))
          / col("total") + NanMath.RoundEps, 4))
      .select(col("key"), col("cnt").cast("double").as("cnt"),
        col("share"), col("cum_share"), col("rank").cast("double").as("rank"))
  }

  /**
   * One-row key-distribution summary: `(n_keys, n_rows, max_share, gini)`.
   * Gini over the per-key counts via the sorted-index formula
   * `sum((2i - n - 1) * c_i) / (n * sum c)` on ascending counts —
   * 0 = perfectly uniform key, -> 1 = one key owns everything. The rank
   * window runs at KEY cardinality (the single-partition window warning
   * is the documented price; a key column with 10^9 distinct values
   * should be sampled first, at which point skew was not the question).
   */
  def skewStats(df: DataFrame, keyCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(keyCol).cast("string").as("key"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy(col("cnt").asc, col("key").asc_nulls_last)
    counts
      .withColumn("i", row_number().over(w))
      .agg(
        count(lit(1)).cast("double").as("n_keys"),
        sum(col("cnt")).cast("double").as("n_rows"),
        max(col("cnt")).cast("double").as("max_cnt"),
        // sum((2i - n - 1) c_i) = 2 sum(i c_i) - (n + 1) sum(c_i);
        // multiply in DOUBLE: at the corpus scale this op exists to
        // diagnose, long i*cnt overflows (n_keys * n_rows / 2 passes
        // 2^63 near 1e8 keys x 1e12 rows) — ANSI mode would throw and
        // non-ANSI would silently diverge from the HUGEINT oracle
        sum(col("i").cast("double") * col("cnt").cast("double")).as("sic"))
      .select(col("n_keys"), col("n_rows"),
        round(col("max_cnt") / col("n_rows") + NanMath.RoundEps, 4).as("max_share"),
        round((lit(2) * col("sic") - (col("n_keys") + 1) * col("n_rows"))
          / (col("n_keys") * col("n_rows")) + NanMath.RoundEps, 4).as("gini"))
  }

  /**
   * Precision/recall curve over a scored, binary-labeled frame — the
   * THRESHOLD-SELECTION report for a quality-classifier gate (the
   * FineWeb/DCLM practice: the keep threshold is read off exactly this
   * table). Per threshold t, predicted-positive = `score >= t`; emits the
   * confusion counts plus precision/recall/F1, with 0/0 cells as NULL
   * (an undefined precision must not masquerade as a real 0). Rows with
   * a null score or label are excluded (they belong to neither side of
   * any threshold).
   *
   * Scale shape: ONE global aggregate of 4x|thresholds| conditional sums
   * over a two-column projection — no threshold crossJoin amplifying the
   * corpus, no shuffle beyond the single reduce (|thresholds| is
   * report-sized by contract); the per-threshold rows explode from the
   * one aggregate row.
   */
  def prCurve(
      df: DataFrame,
      label: Column,
      score: Column,
      thresholds: Seq[Double]
  ): DataFrame = {
    require(thresholds.nonEmpty, "need at least one threshold")
    require(thresholds.distinct.size == thresholds.size, "duplicate thresholds")
    val base = df.select(label.as("__y"), score.cast("double").as("__s"))
      .filter(col("__s").isNotNull && col("__y").isNotNull)
    val aggs = thresholds.zipWithIndex.flatMap { case (t, i) =>
      Seq(
        sum(when(col("__s") >= t && col("__y"), 1L).otherwise(0L)).as(s"tp$i"),
        sum(when(col("__s") >= t && !col("__y"), 1L).otherwise(0L)).as(s"fp$i"),
        sum(when(col("__s") < t && col("__y"), 1L).otherwise(0L)).as(s"fn$i"),
        sum(when(col("__s") < t && !col("__y"), 1L).otherwise(0L)).as(s"tn$i"))
    }
    val one = base.agg(aggs.head, aggs.tail: _*)
    val rows = one.select(explode(array(thresholds.zipWithIndex.map { case (t, i) =>
      struct(lit(t).as("threshold"),
        coalesce(col(s"tp$i"), lit(0L)).as("tp"),
        coalesce(col(s"fp$i"), lit(0L)).as("fp"),
        coalesce(col(s"fn$i"), lit(0L)).as("fn"),
        coalesce(col(s"tn$i"), lit(0L)).as("tn"))
    }: _*)).as("r")).select(col("r.*"))
    val p = when(col("tp") + col("fp") === 0L, lit(null))
      .otherwise(round(col("tp") / (col("tp") + col("fp")) + NanMath.RoundEps, 4))
    val r = when(col("tp") + col("fn") === 0L, lit(null))
      .otherwise(round(col("tp") / (col("tp") + col("fn")) + NanMath.RoundEps, 4))
    rows
      // an EMPTY (or all-null) input yields an empty report, not
      // |thresholds| zero rows — the SQL replay (thresholds cross-joined
      // against an empty scored set) has no rows to group, and a report
      // over nothing should say nothing
      .filter(col("tp") + col("fp") + col("fn") + col("tn") > 0L)
      .withColumn("precision", p)
      .withColumn("recall", r)
      // F1 from the ROUNDED precision/recall (both engines mirror the
      // same two-step rounding; null when either side is undefined or
      // the pair sums to zero)
      .withColumn("f1",
        when(col("precision").isNull || col("recall").isNull ||
          col("precision") + col("recall") === 0.0, lit(null))
          .otherwise(round(lit(2) * col("precision") * col("recall")
            / (col("precision") + col("recall")) + NanMath.RoundEps, 4)))
  }

  /**
   * Reliability diagram (calibration report) for a probabilistic quality
   * classifier: probabilities bucket into `bins` equal-width bins
   * (probability 1.0 folds into the last), and each bin reports its row
   * count, mean predicted probability, and empirical positive rate — a
   * well-calibrated gate has mean_pred ~ frac_pos per bin, and a
   * data-card quotes this table next to the chosen threshold. One
   * bin-cardinality aggregate; null probabilities/labels are excluded.
   */
  def calibration(
      df: DataFrame,
      label: Column,
      prob: Column,
      bins: Int = 10
  ): DataFrame = {
    require(bins >= 2, "need at least 2 bins")
    df.select(label.as("__y"), prob.cast("double").as("__p"))
      .filter(col("__p").isNotNull && col("__y").isNotNull)
      .withColumn("bin",
        least(floor(col("__p") * bins), lit(bins - 1L)).cast("long"))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n"),
        round(avg(col("__p")) + NanMath.RoundEps, 4).as("mean_pred"),
        round(avg(when(col("__y"), 1.0).otherwise(0.0)) + NanMath.RoundEps, 4)
          .as("frac_pos"))
  }

  /**
   * Population Stability Index between a REFERENCE slice and a CURRENT
   * slice of a numeric feature — the standard drift monitor a continuous
   * ingestion pipeline runs per batch ("is today's crawl still shaped
   * like the corpus we tuned the gates on?"). The caller supplies
   * explicit ascending bin `edges`; bin `b` = number of edges the value
   * exceeds (so edges `[e1..ek]` define `(-inf,e1], (e1,e2], .., (ek,inf)`
   * — k+1 bins), and NULL values land in their own bin `-1` because drift
   * in nullness is drift. One row per bin observed on either side:
   * `(bin, n_ref, n_cur, ref_frac, cur_frac, psi_term)`; the headline PSI
   * is `sum(psi_term)` (common reading: < 0.1 stable, 0.1-0.25 moderate
   * shift, > 0.25 investigate). `psi_term = (c - r) * ln(c / r)` over
   * fractions floored at `floorFrac` so an empty bin contributes a large
   * finite term instead of an infinity.
   *
   * Determinism: fixed caller-declared edges (no quantile estimation
   * job), exact integer bin counts, one declared IEEE expression for the
   * term — DuckDB replays it bit for bit.
   *
   * Scale shape: each side is ONE map-side-combined count aggregate at
   * bin cardinality (k+2 rows max); the join/fraction arithmetic runs on
   * those tiny frames. No windows over data, no driver collect.
   */
  def psi(
      ref: DataFrame,
      cur: DataFrame,
      value: Column,
      edges: Seq[Double],
      floorFrac: Double = 1e-6
  ): DataFrame = {
    require(edges.nonEmpty, "need at least one bin edge")
    require(edges.sliding(2).forall(w => w.size < 2 || w(0) < w(1)),
      "edges must be strictly increasing")
    require(floorFrac > 0.0 && floorFrac < 1.0, "floorFrac must be in (0, 1)")
    def binCounts(df: DataFrame, nCol: String): DataFrame = {
      val b = edges.foldLeft(lit(0L)) { (acc, e) =>
        acc + when(value > lit(e), 1L).otherwise(0L)
      }
      df.select(when(value.isNull, lit(-1L)).otherwise(b).as("bin"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as(nCol))
    }
    val rc = binCounts(ref, "n_ref")
    val cc = binCounts(cur, "n_cur")
    val rt = rc.agg(sum(col("n_ref")).as("__tr"))
    val ct = cc.agg(sum(col("n_cur")).as("__tc"))
    // fractions AFTER the join so an absent bin is exactly 0/t = 0.0 on
    // its missing side — the same arithmetic the oracle's coalesce does
    val rf = col("n_ref").cast("double") / col("__tr").cast("double")
    val cf = col("n_cur").cast("double") / col("__tc").cast("double")
    val rfF = greatest(rf, lit(floorFrac))
    val cfF = greatest(cf, lit(floorFrac))
    rc.join(cc, Seq("bin"), "full_outer")
      .na.fill(0L, Seq("n_ref", "n_cur"))
      .crossJoin(rt)
      .crossJoin(ct)
      .select(
        col("bin"), col("n_ref"), col("n_cur"),
        round(rf + NanMath.RoundEps, 4).as("ref_frac"),
        round(cf + NanMath.RoundEps, 4).as("cur_frac"),
        round((cfF - rfF) * log(cfF / rfF) + NanMath.RoundEps, 4).as("psi_term"))
  }
}
