package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Linear quality classifier over hashed bag-of-words features — the
 * fastText/CCNet pipeline shape: train a cheap binary model on a labeled
 * seed set (e.g. "looks like the reference corpus" vs "random crawl"),
 * then score every document in one kernel scan and gate or bucket on the
 * probability.
 *
 * Features: the hashing trick. Each lowercased whitespace token hashes
 * into one of `dim` buckets (deterministic JVM string hash — stable
 * across runs and machines for the same strings); a document's feature
 * vector is its binary bucket-PRESENCE vector plus a bias (presence,
 * not tf/len: every active feature then has unit scale, which keeps the
 * logistic problem well-conditioned — tf/len features at 1/doclen need
 * weights of order doclen and converge an order of magnitude slower). No
 * vocabulary table exists, so the model is a single dense `double[dim+1]`
 * — broadcastable at any corpus size, robust to unseen tokens.
 *
 * Training: full-batch Adagrad on the logistic loss with L2 — per-
 * feature adaptive steps (rare informative buckets take large updates,
 * ubiquitous ones small), fully deterministic AND partition-layout-
 * independent: per-document gradient contributions are QUANTIZED to
 * integers (`floor(err * value * 2^34 + 0.5)` per active bucket — the
 * [[Similarity.kmeansFit]] M-step trick) and summed as Longs, so the
 * merged gradient is bit-identical whatever order partials arrive in,
 * and the whole training loop replays in DuckDB ([[fitOracleSql]]).
 * The 2^-34 per-contribution quantization is noise relative to the
 * learning dynamics (err is in (-1,1)); ClassifierSpec's planted-rule
 * and refit bars are unchanged. Each iteration is ONE corpus pass:
 * every partition folds its documents into a dense quantized partial
 * (`dim+1` longs, ~256 KB at the 2^15 default), the bounded partials
 * collect and reduce driver-side, and the updated weights re-broadcast.
 *
 * Scale notes (100 TB): per-iteration cost is one scan + partitions x dim
 * doubles to the driver — no shuffle at all; the corpus is re-tokenized
 * each pass, so for many iterations the caller should persist the
 * pre-featurized frame ([[featurize]]) and pass `pretokenized = true`
 * (same trade as kmeansFit's documented re-scan). Scoring is a pure
 * broadcast-weights kernel scan, 0 exchanges.
 */
object Classifier {

  /** Hashed-feature row: sorted distinct bucket indices + L1-normalized
    * counts. Top-level so the Dataset encoder can reach it. */
  final case class FeatRow(id: Long, label: Double, idx: Array[Int], value: Array[Double])

  /** Stable token -> bucket hash: JVM String.hashCode folded positive. */
  private def bucket(tok: String, dim: Int): Int = {
    val h = tok.hashCode % dim
    if (h < 0) h + dim else h
  }

  private def sigmoid(z: Double): Double = 1.0 / (1.0 + math.exp(-z))

  /** Gradient-contribution quantizer: 2^34, a power of two so `x * GradScale`
    * is a pure exponent shift (exact for every normal double) — the
    * quantized Longs are identical in the JVM and DuckDB, and Long sums
    * are exact and order-free. Headroom: |err*value| < 1, so a per-bucket
    * sum overflows only past ~5e8 contributing documents per bucket. */
  private val GradScale = 17179869184.0 // 2^34

  /** Hash a document into its sparse binary-presence feature row. */
  private def featurizeOne(id: Long, label: Double, text: String, dim: Int): FeatRow = {
    val present = new java.util.TreeSet[Integer]()
    // Locale.ROOT: the documented cross-machine hash stability would break
    // under locale-sensitive case folding (tr dotless-i), and it matches
    // the tokenization convention everywhere else in graft.ops
    text.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
      .foreach(t => present.add(bucket(t, dim)))
    val idx = new Array[Int](present.size)
    val it = present.iterator()
    var i = 0
    while (it.hasNext) { idx(i) = it.next(); i += 1 }
    FeatRow(id, label, idx, Array.fill(idx.length)(1.0))
  }

  /** Materializable featurized view `(id, label, idx, value)` — persist
    * this before a long [[fit]] to pay tokenization once. */
  def featurize(
      docs: DataFrame,
      labelCol: String,
      dim: Int = 1 << 15,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col(idCol).cast("long"), col(labelCol).cast("double"), col(textCol))
      .as[(Long, Double, String)]
      .map { case (id, y, text) => featurizeOne(id, y, text, dim) }
      .toDF("id", "label", "idx", "value")
  }

  /**
   * Fit logistic-regression weights; returns `double[dim + 1]`, bias last.
   * `labelCol` must be 0/1. Pass the output of [[featurize]] (with
   * `pretokenized = true`) to skip per-iteration re-tokenization; that
   * frame carries its own `label` column (labelCol is not consulted) and
   * MUST have been featurized at this `dim` — the fit validates the
   * index range and fails with a named error on a mismatch rather than
   * aliasing buckets into the bias slot. The raw-docs path featurizes
   * once behind a localCheckpoint, so the text is tokenized once, not
   * once per iteration.
   */
  def fit(
      docs: DataFrame,
      labelCol: String = "label",
      dim: Int = 1 << 15,
      iters: Int = 50,
      learningRate: Double = 0.5,
      l2: Double = 1e-6,
      pretokenized: Boolean = false,
      idCol: String = "doc_id",
      textCol: String = "text"
  ): Array[Double] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val feats =
      if (pretokenized) {
        val missing = Seq("id", "label", "idx", "value").filterNot(docs.columns.contains)
        require(missing.isEmpty,
          s"pretokenized frame lacks ${missing.mkString(",")} - pass featurize() output")
        val maxIdx = docs.agg(max(array_max(col("idx")))).head.get(0)
        require(maxIdx == null || maxIdx.asInstanceOf[Int] < dim,
          s"featurized index $maxIdx >= dim $dim - featurize() ran at a larger dim")
        docs.select(col("id"), col("label"), col("idx"), col("value")).as[FeatRow]
      } else
        featurize(docs, labelCol, dim, idCol, textCol).localCheckpoint().as[FeatRow]

    val n = feats.count().toDouble
    require(n > 0, "no labeled rows")
    var w = new Array[Double](dim + 1)
    val gsum = new Array[Double](dim + 1)
    var iter = 0
    while (iter < iters) {
      val bc = graft.core.BroadcastGate.gated(spark, w, "classifier weights")
      val partials = feats
        .mapPartitions { it =>
          val ww = bc.value
          // quantized Long partial: exact, associative, order-free — the
          // merged gradient is independent of partition layout, and the
          // identical floor(x * 2^34 + 0.5) replays in DuckDB
          val g = new Array[Long](ww.length)
          var any = false
          it.foreach { r =>
            any = true
            var z = ww(ww.length - 1)
            var i = 0
            while (i < r.idx.length) { z += ww(r.idx(i)) * r.value(i); i += 1 }
            val err = sigmoid(z) - r.label
            i = 0
            while (i < r.idx.length) {
              g(r.idx(i)) += math.floor(err * r.value(i) * GradScale + 0.5).toLong
              i += 1
            }
            g(ww.length - 1) += math.floor(err * GradScale + 0.5).toLong
          }
          if (any)
            Iterator.single((org.apache.spark.TaskContext.getPartitionId(), g))
          else Iterator.empty
        }
        .collect()
      bc.unpersist(blocking = false)
      val grad = new Array[Long](w.length)
      partials.foreach { case (_, g) =>
        var i = 0
        while (i < grad.length) { grad(i) += g(i); i += 1 }
      }
      val next = new Array[Double](w.length)
      var i = 0
      while (i < w.length) {
        val g = grad(i).toDouble / GradScale / n + l2 * w(i)
        gsum(i) += g * g
        next(i) = w(i) - learningRate * g / (math.sqrt(gsum(i)) + 1e-10)
        i += 1
      }
      w = next
      iter += 1
    }
    w
  }

  /** Persist fitted weights as one parquet row `(dim, weights)` — the
    * model artifact a scoring deployment loads without retraining (the
    * persisted-index lifecycle precedent). Doubles round-trip parquet
    * exactly, so save/load scores are bit-identical. */
  def save(spark: org.apache.spark.sql.SparkSession,
      weights: Array[Double], path: String): Unit = {
    import spark.implicits._
    Seq((weights.length - 1, weights)).toDF("dim", "weights")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load weights persisted by [[save]]. */
  def load(spark: org.apache.spark.sql.SparkSession, path: String): Array[Double] = {
    import spark.implicits._
    val (dim, w) = graft.sources.Pq.read(spark, path)
      .select(col("dim").cast("int"), col("weights"))
      .as[(Int, Array[Double])].head()
    require(w.length == dim + 1, s"corrupt model: ${w.length} weights for dim $dim")
    w
  }

  /** Score documents with fitted weights: `(id, prob)` rounded to 4
    * decimals — one broadcast-weights kernel scan, zero shuffle. */
  /**
   * DuckDB replica of [[score]] for FIXED weights — the hash-green twin
   * of the trained-classifier row: the TRAINING (full-batch Adagrad,
   * driver-reduced float partials) is legitimately not SQL-replayable,
   * but the SCORING kernel — tokenize, Java `String.hashCode` bucket,
   * distinct-presence features, ascending-bucket weight fold, sigmoid —
   * is, bit for bit: the 32-bit hash replays as a BIGINT fold mod 2^32
   * with the sign/`%` conventions matched (UTF-16 units == codepoints on
   * ASCII corpora), the weight sum folds in the same ascending bucket
   * order as the kernel's TreeSet loop (list_sort + list_reduce from the
   * bias), and the one libm divergence risk (exp vs Math.exp) is ulp-
   * scale, absorbed by the engine-wide 4-decimal rounding exactly like
   * the cosine oracles. Weights embed as literals from the SAME array
   * the catalog row passes to [[score]].
   */
  /** The hashing-trick feature CTEs shared by [[scoreOracleSql]] and
    * [[fitOracleSql]]: `bl(doc_id, bks)` — each document's SORTED distinct
    * bucket indices under the Java `String.hashCode` fold (BIGINT mod 2^32
    * with the sign/`%` conventions matched). */
  private def featureCtes(dim: Int, table: String): String =
    s"""tok AS (SELECT DISTINCT doc_id, unnest(list_distinct(string_split(lower(text), ' '))) AS t
       |        FROM $table),
       |h0 AS (SELECT doc_id, t,
       |         list_reduce(list_prepend(CAST(0 AS BIGINT),
       |           list_transform(range(1, len(t) + 1), i -> CAST(unicode(substr(t, i, 1)) AS BIGINT))),
       |           (a, c) -> (31 * a + c) % 4294967296) AS hm
       |       FROM tok),
       |b AS (SELECT DISTINCT doc_id,
       |        CASE WHEN m < 0 THEN m + $dim ELSE m END AS bkt
       |      FROM (SELECT doc_id,
       |              (CASE WHEN hm >= 2147483648 THEN hm - 4294967296 ELSE hm END) % $dim AS m
       |            FROM h0) q),
       |bl AS (SELECT doc_id, list_sort(list(DISTINCT bkt)) AS bks FROM b GROUP BY doc_id)""".stripMargin

  def scoreOracleSql(weights: Array[Double], table: String = "documents"): String = {
    require(weights.length >= 2, "need at least one feature weight + bias")
    val dim = weights.length - 1
    val lits = weights.map(w => s"CAST($w AS DOUBLE)").mkString(", ")
    s"""WITH wt(w) AS (SELECT [$lits]),
       |${featureCtes(dim, table)},
       |z AS (SELECT doc_id,
       |        list_reduce(list_prepend(wt.w[${dim + 1}], list_transform(bks, k -> wt.w[k + 1])),
       |          (a, x) -> a + x) AS z
       |      FROM bl, wt)
       |SELECT doc_id AS id, round(1.0 / (1.0 + exp(-z)), 4) AS prob FROM z""".stripMargin
  }

  /**
   * DuckDB replay of [[fit]] + [[score]] — the TRAINED-classifier oracle,
   * training included. Replayable because the engine's gradient merge is
   * quantized-integer ([[GradScale]]): per (doc, cell) contributions
   * `floor(err * 2^34 + 0.5)` fold as exact BIGINTs whatever partition
   * layout the engine ran with, and every other step (the bias-first
   * ascending-bucket z fold, sigmoid, the Adagrad scalar update chain) is
   * straight-line double arithmetic both engines execute identically.
   * Only ACTIVE cells (buckets present in the corpus, plus the bias)
   * carry state — untouched weights stay exactly 0 through every
   * iteration (g = 0/n + l2*0 = 0), so the recursive CTE's working set
   * is vocabulary-sized, not dim-sized. `labelExprSql` is the 0/1 label
   * as a SQL expression over the `$table` row (the engine side must
   * derive the label the same way).
   */
  def fitOracleSql(
      labelExprSql: String,
      dim: Int = 1 << 15,
      iters: Int = 50,
      learningRate: Double = 0.5,
      l2: Double = 1e-6,
      table: String = "documents"): String = {
    val s = GradScale
    s"""WITH RECURSIVE
       |${featureCtes(dim, table)},
       |lab AS MATERIALIZED (
       |  SELECT doc_id, CAST(($labelExprSql) AS DOUBLE) AS y FROM $table),
       |fxb AS MATERIALIZED (
       |  SELECT doc_id, unnest(bks) AS k FROM bl
       |  UNION ALL
       |  SELECT doc_id, $dim AS k FROM bl),
       |nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM bl),
       |tr(it, k, w, gsum) AS (
       |  SELECT 0, k, CAST(0 AS DOUBLE), CAST(0 AS DOUBLE) FROM (SELECT DISTINCT k FROM fxb)
       |  UNION ALL
       |  SELECT it + 1, k,
       |         w - $learningRate * g / (sqrt(gsum + g * g) + 1e-10),
       |         gsum + g * g
       |  FROM (
       |    SELECT t.it, t.k, t.w, t.gsum,
       |           CAST(q.qs AS DOUBLE) / $s / (SELECT n FROM nn) + $l2 * t.w AS g
       |    FROM tr t
       |    JOIN (
       |      SELECT f2.k, sum(CAST(floor(e.err * $s + 0.5) AS BIGINT)) AS qs
       |      FROM (
       |        SELECT z.doc_id, 1.0 / (1.0 + exp(-z.z)) - z.y AS err
       |        FROM (
       |          SELECT f.doc_id, any_value(l.y) AS y,
       |                 list_reduce(
       |                   list(t2.w ORDER BY (f.k = $dim) DESC, f.k ASC),
       |                   (a, x) -> a + x) AS z
       |          FROM fxb f JOIN tr t2 ON t2.k = f.k
       |          JOIN lab l ON l.doc_id = f.doc_id
       |          GROUP BY f.doc_id) z) e
       |      JOIN fxb f2 ON f2.doc_id = e.doc_id
       |      GROUP BY f2.k) q ON q.k = t.k)
       |  WHERE it < $iters),
       |wfin AS (SELECT k, w FROM tr WHERE it = $iters)
       |SELECT f.doc_id AS id,
       |       round(1.0 / (1.0 + exp(-list_reduce(
       |         list(t.w ORDER BY (f.k = $dim) DESC, f.k ASC),
       |         (a, x) -> a + x))), 4) AS prob
       |FROM fxb f JOIN wfin t ON t.k = f.k
       |GROUP BY f.doc_id""".stripMargin
  }

  def score(
      docs: DataFrame,
      weights: Array[Double],
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val dim = weights.length - 1
    val bc = graft.core.BroadcastGate.gated(spark, weights, "classifier scoring weights")
    docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions { it =>
        val ww = bc.value
        it.map { case (id, text) =>
          val r = featurizeOne(id, 0.0, text, dim)
          var z = ww(dim)
          var i = 0
          while (i < r.idx.length) { z += ww(r.idx(i)) * r.value(i); i += 1 }
          // the engine-wide rounding convention (half-up + RoundEps), so
          // a threshold gate on the rounded prob behaves like every other
          // rounded-threshold operator
          (id, BigDecimal(sigmoid(z) + graft.core.NanMath.RoundEps)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
      }
      .toDF("id", "prob")
  }
}
