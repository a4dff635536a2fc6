package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Distributed principal-component analysis over an embedding column —
 * the dimensionality-reduction preprocessor the SemDeDup / clustering
 * pipeline shapes call for (cluster or dedup in a compact r-dim space,
 * then act on the original rows).
 *
 * Execution shape (one corpus pass, d <= ~2048 BY CONTRACT):
 *  - each partition accumulates (count, sum[d], outer[d*d]) in primitive
 *    arrays — no per-row allocation, no shuffle;
 *  - the per-partition partials (numPartitions x ~d^2 doubles, ~32 KB
 *    each at d=64) collect to the driver WITH their partition index and
 *    reduce in index order, so the float sum is associativity-stable and
 *    two fits over the same files are bit-identical;
 *  - covariance = outer/n - mean mean^T; eigendecomposition is cyclic
 *    Jacobi on the driver (a d x d symmetric problem — microseconds at
 *    embedding dims, no cluster involvement);
 *  - [[project]] broadcasts the (r x d) basis and maps the corpus in one
 *    kernel scan.
 *
 * At 100 TB nothing changes: the only driver-side object is
 * partitions x d^2 partials (bound the partition count via coalesce for
 * absurd fan-in), and the corpus is read exactly twice (fit, project) —
 * or once if the caller persists the projection.
 *
 * Determinism: no RNG anywhere; eigenvector sign is normalized (largest-
 * magnitude component positive, first index on ties) so two fits agree
 * even across Jacobi rotation orderings.
 */
object Pca {

  /** Fitted basis: `components(i)` is the i-th principal axis (unit,
    * descending variance); `explained(i)` its variance share. */
  final case class PcaModel(
      mean: Array[Double],
      components: Array[Array[Double]],
      eigenvalues: Array[Double],
      explained: Array[Double])

  /** One partition's moment partial: n, sum, flattened upper outer. */
  private type Partial = (Int, Long, Array[Double], Array[Double])

  /**
   * Fit a PCA basis of rank `r` in one distributed pass.
   */
  def fit(
      emb: DataFrame,
      r: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      jacobiSweeps: Int = 50
  ): PcaModel = {
    val (n, sum, outer) = moments(emb, vecCol)
    modelFromMoments(n, sum, outer, r, jacobiSweeps)
  }

  /** The single distributed pass behind [[fit]] and the persisted-moment
    * lifecycle: per-partition (count, sum, outer) primitives reduced
    * driver-side in partition-index order (bit-stable). */
  private def moments(emb: DataFrame, vecCol: String): (Long, Array[Double], Array[Double]) = {
    val spark = emb.sparkSession
    import spark.implicits._
    val rows = emb.filter(col(vecCol).isNotNull) // failed-encoder rows are skipped
      .select(transform(col(vecCol), x => x.cast("double")).as("v"))
      .as[Array[Double]]
    val partials: Array[Partial] = rows
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          val first = it.next()
          val d = first.length
          val sum = new Array[Double](d)
          val outer = new Array[Double](d * d)
          var n = 0L
          def add(v: Array[Double]): Unit = {
            var i = 0
            while (i < d) {
              sum(i) += v(i)
              var j = i
              while (j < d) { outer(i * d + j) += v(i) * v(j); j += 1 }
              i += 1
            }
            n += 1
          }
          add(first)
          it.foreach(add)
          Iterator.single((org.apache.spark.TaskContext.getPartitionId(), n, sum, outer))
        }
      }
      .collect()
    require(partials.nonEmpty, "no vectors to fit")
    val d = partials.head._3.length
    // index-ordered driver reduce: bit-stable across runs
    val sum = new Array[Double](d)
    val outer = new Array[Double](d * d)
    var n = 0L
    partials.sortBy(_._1).foreach { case (_, pn, ps, po) =>
      n += pn
      var i = 0
      while (i < d) { sum(i) += ps(i); i += 1 }
      i = 0
      while (i < d * d) { outer(i) += po(i); i += 1 }
    }
    (n, sum, outer)
  }

  private def modelFromMoments(
      n: Long, sum: Array[Double], outer: Array[Double],
      r: Int, jacobiSweeps: Int): PcaModel = {
    val d = sum.length
    require(r >= 1 && r <= d, s"rank $r outside [1, $d]")
    val mean = sum.map(_ / n)
    val cov = Array.tabulate(d, d) { (i, j) =>
      val (a, b) = if (i <= j) (i, j) else (j, i)
      outer(a * d + b) / n - mean(i) * mean(j)
    }
    val (values, vectors) = jacobiEigen(cov, jacobiSweeps)
    val order = values.indices.sortBy(i => (-values(i), i))
    val totalVar = values.sum max Double.MinPositiveValue
    val comps = order.take(r).map(i => signNormalize(vectors(i))).toArray
    val eig = order.take(r).map(values).toArray
    PcaModel(mean, comps, eig, eig.map(_ / totalVar))
  }

  // --- persisted, incrementally-maintained moments -------------------------

  /**
   * Append one batch's moment row `(seq, n, sum, outer)` to a persisted
   * moment log. Moments are ADDITIVE, so a PCA basis over the whole
   * corpus-so-far comes from [[fromMoments]] without ever re-reading
   * prior batches — the model-maintenance analog of the persisted
   * dedup/ANN indexes: the heavy pass touches only the new data, the
   * driver merges a handful of d^2-sized rows. `seq` orders the merge
   * (use the micro-batch id / ingestion sequence) so the float reduce is
   * reproducible for a given ingestion history.
   */
  def appendMoments(
      emb: DataFrame,
      path: String,
      seq: Long,
      vecCol: String = "embedding"
  ): Unit = {
    val spark = emb.sparkSession
    import spark.implicits._
    val (n, sum, outer) = moments(emb, vecCol)
    Seq((seq, n, sum, outer)).toDF("seq", "n", "sum", "outer")
      .coalesce(1).write.mode("append").parquet(path)
  }

  /** Build the PCA basis from a persisted moment log: rows merge in
    * `seq` order on the driver (batches x d^2 doubles — no corpus
    * access at all). */
  def fromMoments(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      r: Int,
      jacobiSweeps: Int = 50
  ): PcaModel = {
    import spark.implicits._
    val all = spark.read.parquet(path)
      .select(col("seq").cast("long"), col("n").cast("long"), col("sum"), col("outer"))
      .as[(Long, Long, Array[Double], Array[Double])]
      .collect()
      .sortBy(_._1)
    require(all.nonEmpty, s"no moment rows at $path")
    // ONE row per seq: an at-least-once foreachBatch replay appends the
    // same batch's moments twice under the same seq, and for an ADDITIVE
    // statistic duplication is a silently wrong basis, not just extra
    // rows — the stored seq key makes the dedup exact (replayed rows are
    // recomputed from the same batch, so any survivor is correct)
    val rows = all.distinctBy(_._1)
    val d = rows.head._3.length
    val sum = new Array[Double](d)
    val outer = new Array[Double](d * d)
    var n = 0L
    rows.foreach { case (seq, bn, bs, bo) =>
      // loud failure on a mid-stream dimension change: a longer row would
      // otherwise be read through the WRONG d x d layout and corrupt the
      // covariance silently
      require(bs.length == d && bo.length == d.toLong * d,
        s"moment row seq=$seq has dim ${bs.length}, log started at $d")
      n += bn
      var i = 0
      while (i < d) { sum(i) += bs(i); i += 1 }
      i = 0
      while (i < d * d) { outer(i) += bo(i); i += 1 }
    }
    modelFromMoments(n, sum, outer, r, jacobiSweeps)
  }

  /** Largest-magnitude component positive (first index on ties) — the
    * deterministic sign convention. */
  private def signNormalize(v: Array[Double]): Array[Double] = {
    var best = 0
    var i = 1
    while (i < v.length) { if (math.abs(v(i)) > math.abs(v(best))) best = i; i += 1 }
    if (v(best) < 0) v.map(-_) else v
  }

  /**
   * Cyclic Jacobi eigendecomposition of a symmetric matrix: sweep the
   * upper triangle, rotate out each off-diagonal element, accumulate the
   * rotations. Returns (eigenvalues, eigenvectors-as-rows), unsorted.
   * Converges quadratically; `sweeps` is a hard cap, the off-diagonal
   * norm check exits early. Pure driver-side double arithmetic — no RNG,
   * no library dependency.
   */
  private[graft] def jacobiEigen(
      m: Array[Array[Double]], sweeps: Int): (Array[Double], Array[Array[Double]]) = {
    val d = m.length
    val a = m.map(_.clone)
    // v(i) accumulates as COLUMNS of the rotation product; row i of the
    // returned basis is column i read out at the end
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    // convergence is judged RELATIVE to the matrix's own Frobenius scale:
    // an absolute cutoff silently skips every sweep on small-magnitude
    // covariances (1e-6-scale embeddings -> 1e-12-scale entries) and
    // returns the identity basis as "principal" axes
    var frobSq = 0.0
    var fi = 0
    while (fi < d) {
      var fj = 0
      while (fj < d) { frobSq += a(fi)(fj) * a(fi)(fj); fj += 1 }
      fi += 1
    }
    val tol = 1e-20 * math.max(frobSq, Double.MinPositiveValue)
    var off = offDiag(a)
    while (sweep < sweeps && off > tol) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              if (theta == 0.0) 1.0
              else math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - s * akq
              a(k)(q) = s * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - s * aqk
              a(q)(k) = s * apk + c * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - s * vkq
              v(k)(q) = s * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), Array.tabulate(d)(i => Array.tabulate(d)(k => v(k)(i))))
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    s
  }

  /** Project the corpus onto the fitted basis: `(id, proj: array<double>)`
    * with `proj(i) = (v - mean) . components(i)`. One broadcast-basis
    * kernel scan, zero shuffle. */
  def project(
      emb: DataFrame,
      model: PcaModel,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val bc = graft.core.BroadcastGate.gated(spark, model, "pca model")
    emb.filter(col(vecCol).isNotNull) // failed-encoder rows are skipped
      .select(col(idCol).cast("long").as("id"),
        transform(col(vecCol), x => x.cast("double")).as("v"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val m = bc.value
        it.map { case (id, vec) =>
          val proj = new Array[Double](m.components.length)
          var i = 0
          while (i < m.components.length) {
            val comp = m.components(i)
            var s = 0.0
            var j = 0
            while (j < vec.length) { s += (vec(j) - m.mean(j)) * comp(j); j += 1 }
            proj(i) = s
            i += 1
          }
          (id, proj)
        }
      }
      .toDF("id", "proj")
  }

  /**
   * Johnson-Lindenstrauss random projection to `r` dims — the
   * data-INDEPENDENT complement to [[fit]]: zero training passes, the
   * projection matrix is a deterministic pseudo-random Rademacher
   * (+-1/sqrt(r)) matrix derived by hashing (row, col) with splitmix64,
   * so every executor regenerates it locally (nothing broadcast, nothing
   * collected) and two runs are bit-identical. JL guarantees pairwise
   * distances distort by at most (1 +- eps) with r = O(ln n / eps^2) —
   * the right tool when the corpus is too big to even take PCA's one
   * moment pass, or when dims must be cut BEFORE any statistics exist
   * (streaming ingest).
   */
  def randomProject(
      emb: DataFrame,
      r: Int,
      seed: Long = 0x9e3779b97f4a7c15L,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    require(r >= 1, s"rank $r < 1")
    val spark = emb.sparkSession
    import spark.implicits._
    emb.filter(col(vecCol).isNotNull) // failed-encoder rows are skipped
      .select(col(idCol).cast("long").as("id"),
        transform(col(vecCol), x => x.cast("double")).as("v"))
      .as[(Long, Array[Double])]
      .mapPartitions { it =>
        val scale = 1.0 / math.sqrt(r)
        // the sign matrix depends only on (seed, i, j): materialize it
        // ONCE per partition (r*d bytes) so the hot loop is one add per
        // entry, not three multiplies of splitmix per entry per row
        var signs: Array[Array[Boolean]] = null
        it.map { case (id, vec) =>
          if (signs == null) {
            signs = Array.tabulate(r, vec.length)(jlSign(seed, _, _))
          }
          val proj = new Array[Double](r)
          var i = 0
          while (i < r) {
            val row = signs(i)
            var s = 0.0
            var j = 0
            while (j < vec.length) {
              s += (if (row(j)) -vec(j) else vec(j))
              j += 1
            }
            proj(i) = s * scale
            i += 1
          }
          (id, proj)
        }
      }
      .toDF("id", "proj")
  }

  /** Fit + project, rounded to 4 decimals for a stable catalog surface. */
  def fitProject(
      emb: DataFrame,
      r: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    val model = fit(emb, r, idCol, vecCol)
    project(emb, model, idCol, vecCol)
      .select(col("id"),
        transform(col("proj"), x => round(x + graft.core.NanMath.RoundEps, 4)).as("proj"))
  }

  /** The [[randomProject]] sign for projection row `i`, input lane `j`:
    * splitmix64 of (seed, i, j), sign = top bit. Shared by the kernel and
    * [[jlOracleSql]] so the derivation exists in exactly one place. */
  private[ops] def jlSign(seed: Long, i: Int, j: Int): Boolean = {
    var z = seed + (i.toLong * 0x100000001L) + (j.toLong * 0xda942042e4dd58b5L)
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    z < 0
  }

  /**
   * DuckDB replica of the exploded [[randomProject]] catalog surface for a
   * KNOWN input dimensionality `d`. DuckDB has no splitmix64 (and no
   * wrapping 64-bit multiply to build one from), so the +-1/sqrt(r) sign
   * matrix — a pure (seed, i, j) constant, r*d entries — is EMBEDDED as
   * literals computed by [[jlSign]]. Scope is therefore explicit: the hash
   * check covers the projection arithmetic end-to-end (lane sum order,
   * the exact power-of-two 1/sqrt(r) scaling when r is a square of a
   * power of two, rounding convention, explode shape, schema), while the
   * sign DERIVATION is self-confirmed and stays pinned by
   * SimilaritySpec's bit-identical-re-run and distance-band bars. A +-1.0
   * multiply is IEEE-exact, so `list_dot_product(v, signs)` accumulates
   * the same bits as the kernel's conditional add, in the same lane order.
   */
  def jlOracleSql(r: Int, d: Int, seed: Long = 0x9e3779b97f4a7c15L): String = {
    require(r >= 1 && d >= 1, "r and d must be positive")
    val scale = 1.0 / math.sqrt(r)
    val rows = (0 until r).map { i =>
      val sgn = (0 until d)
        .map(j => if (jlSign(seed, i, j)) "-1.0" else "1.0").mkString(", ")
      s"($i, [$sgn])"
    }.mkString(",\n")
    s"""WITH signs(dim, sgn) AS (VALUES
       |$rows)
       |SELECT e.vec_id AS id, CAST(s.dim AS INTEGER) AS dim,
       |       round(CASE WHEN e.embedding IS NULL THEN 0.0
       |                  ELSE list_dot_product(CAST(e.embedding AS DOUBLE[]), s.sgn) END * $scale, 4) AS v
       |FROM (SELECT * FROM embeddings WHERE embedding IS NOT NULL) e, signs s""".stripMargin
  }
}
