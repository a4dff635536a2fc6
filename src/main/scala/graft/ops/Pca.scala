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

  /** One partition's moment partial: n, quantized sum, quantized
    * flattened upper outer (Longs — exact, order-free merge). */
  private type Partial = (Int, Long, Array[Long], Array[Long])

  /** Data-derived moment quantizer: the power of two bringing the
    * corpus' largest single contribution (max of |v_i| and |v_i|^2) into
    * [2^26, 2^27) — so the quantized Longs are identical in the JVM and
    * DuckDB (power-of-two multiplies are pure exponent shifts, exact for
    * every normal double), Long sums are exact and associative (the
    * merged moments are independent of partition layout, and the whole
    * fit replays in [[pcaOracleSql]]), precision stays ~1e-8 RELATIVE to
    * the data's own magnitude (a fixed absolute scale silently zeroed
    * tiny-magnitude corpora — the failure the relative-Frobenius Jacobi
    * tolerance exists for), and headroom holds ~2^36 rows before the
    * overflow-checked merge fails loudly. The derivation is a pure
    * double compare-and-double loop — replayed verbatim by the oracle. */
  private[ops] def momentScale(maxContrib: Double): Double = {
    var sc = 1.0
    while (maxContrib * sc < 67108864.0 && sc < 1e150) sc *= 2.0
    while (maxContrib * sc >= 134217728.0 && sc > 1e-150) sc /= 2.0
    sc
  }

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
    val (n, qs, qo, sc) = moments(emb, vecCol)
    modelFromMoments(n, qs.map(_.toDouble / sc),
      qo.map(_.toDouble / sc), r, jacobiSweeps)
  }

  /** The single distributed pass behind [[fit]] and the persisted-moment
    * lifecycle: per-partition quantized (count, sum, outer) primitives
    * merged driver-side with overflow-checked Long adds (bit-stable under
    * ANY partition layout or merge order — see [[MomentScale]]). */
  private def moments(emb: DataFrame, vecCol: String): (Long, Array[Long], Array[Long], Double) = {
    val spark = emb.sparkSession
    import spark.implicits._
    val rows = emb.filter(col(vecCol).isNotNull) // failed-encoder rows are skipped
      .select(transform(col(vecCol), x => x.cast("double")).as("v"))
      .as[Array[Double]]
    // scale pre-pass: one column-pruned scan for the corpus' largest
    // absolute lane (relational max — exact, order-free); the quantizer
    // derives from it so precision tracks the data's own magnitude
    val maxAbs = rows
      .agg(max(array_max(transform(col("v"), x => abs(x))))).head()
      .getDouble(0)
    val sc = momentScale(math.max(maxAbs * maxAbs, maxAbs))
    val partials: Array[Partial] = rows
      .mapPartitions { it =>
        if (!it.hasNext) Iterator.empty
        else {
          val first = it.next()
          val d = first.length
          val sum = new Array[Long](d)
          val outer = new Array[Long](d * d)
          var n = 0L
          def q(x: Double): Long = math.floor(x * sc + 0.5).toLong
          def add(v: Array[Double]): Unit = {
            var i = 0
            while (i < d) {
              sum(i) += q(v(i))
              var j = i
              while (j < d) { outer(i * d + j) += q(v(i) * v(j)); j += 1 }
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
    val (n, qs, qo) =
      mergeMoments(d, partials.iterator.map { case (_, pn, ps, po) => (pn, ps, po) })
    (n, qs, qo, sc)
  }

  /** Overflow-checked merge of quantized moment partials (order-free —
    * Long addition is exact and associative; addExact turns the one
    * silent failure mode, a wrap past 2^63 on an enormous corpus with
    * large-magnitude coordinates, into a loud error). */
  private def mergeMoments(
      d: Int, parts: Iterator[(Long, Array[Long], Array[Long])]): (Long, Array[Long], Array[Long]) = {
    val sum = new Array[Long](d)
    val outer = new Array[Long](d * d)
    var n = 0L
    try {
      parts.foreach { case (pn, ps, po) =>
        n += pn
        var i = 0
        while (i < d) { sum(i) = Math.addExact(sum(i), ps(i)); i += 1 }
        i = 0
        while (i < d * d) { outer(i) = Math.addExact(outer(i), po(i)); i += 1 }
      }
    } catch {
      case _: ArithmeticException =>
        throw new IllegalArgumentException(
          "quantized PCA moment sum overflowed 63 bits: the corpus is too " +
            "large for its coordinate magnitudes at the 2^26 lane quantizer. " +
            "Normalize or rescale the embedding column (moments are scale-" +
            "equivariant), or fit on a bounded sample.")
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
    val (n, qs, qo, sc) = moments(emb, vecCol)
    Seq((seq, n, qs, qo, sc)).toDF("seq", "n", "sum", "outer", "scale")
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
    val all = graft.sources.Pq.read(spark, path)
      .select(col("seq").cast("long"), col("n").cast("long"),
        col("sum"), col("outer"), col("scale").cast("double"))
      .as[(Long, Long, Array[Long], Array[Long], Double)]
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
    rows.foreach { case (seq, _, bs, bo, _) =>
      // loud failure on a mid-stream dimension change: a longer row would
      // otherwise be read through the WRONG d x d layout and corrupt the
      // covariance silently
      require(bs.length == d && bo.length == d.toLong * d,
        s"moment row seq=$seq has dim ${bs.length}, log started at $d")
    }
    // Batches quantize at their own data-derived scale. Same scale across
    // every row (the steady-state stream shape): EXACT Long merge — the
    // incremental basis is bit-identical to a one-shot fit. Mixed scales
    // (batch magnitude drifted): dequantize per row and double-add in seq
    // order — the pre-r13 approximate-but-order-pinned behavior.
    if (rows.iterator.map(_._5).distinct.size == 1) {
      val sc = rows.head._5
      val (n, qs, qo) = mergeMoments(d,
        rows.iterator.map { case (_, bn, bs, bo, _) => (bn, bs, bo) })
      modelFromMoments(n, qs.map(_.toDouble / sc),
        qo.map(_.toDouble / sc), r, jacobiSweeps)
    } else {
      val sum = new Array[Double](d)
      val outer = new Array[Double](d * d)
      var n = 0L
      rows.foreach { case (_, bn, bs, bo, bsc) =>
        n += bn
        var i = 0
        while (i < d) { sum(i) += bs(i).toDouble / bsc; i += 1 }
        i = 0
        while (i < d * d) { outer(i) += bo(i).toDouble / bsc; i += 1 }
      }
      modelFromMoments(n, sum, outer, r, jacobiSweeps)
    }
  }

  /**
   * DuckDB replay of [[fitProject]] — the `emb_pca` oracle, EIGENSOLVER
   * INCLUDED. Three engine properties make the full pipeline exactly
   * replayable: (1) moments are quantized-integer ([[MomentScale]]), so
   * the merged covariance is bit-identical whatever partition layout the
   * engine ran with; (2) [[jacobiEigen]] uses only IEEE-exact /
   * correctly-rounded ops (+ - * / sqrt abs sign), so replaying the same
   * rotation SEQUENCE reproduces every double bit-for-bit — each sweep
   * is one ordered fold over (p, q, phase) instruction structs carried
   * through a recursive CTE, with the engine\'s relative-Frobenius
   * early-exit replayed as a freeze; (3) sign normalization, component
   * selection and the projection fold are all order-pinned. The matrix
   * state rides as ONE fused 2*d^2 list (a ++ v): DuckDB 1.0 corrupts a
   * transformed SECOND list field of a struct accumulator past its 2048
   * vector size, found while building this replay.
   */
  def pcaOracleSql(
      dim: Int,
      r: Int,
      sweeps: Int = 50,
      table: String = "embeddings"): String = {
    val d = dim
    val n2 = d * d
    val q = "(SELECT sc FROM scq)"
    val P = "CAST(st.c AS BIGINT)"
    val Q_ = "CAST(st.s AS BIGINT)"
    val apq = s"acc.m[$P*$d+$Q_+1]"
    val app = s"acc.m[$P*$d+$P+1]"
    val aqq = s"acc.m[$Q_*$d+$Q_+1]"
    val theta = s"(($aqq) - ($app)) / (2.0 * ($apq))"
    val tt = s"(CASE WHEN ($theta) = 0.0 THEN 1.0 ELSE sign($theta) / (abs($theta) + sqrt(($theta)*($theta) + 1.0)) END)"
    val Z = "CAST(0 AS DOUBLE)"
    val phase0 =
      s"""CASE WHEN abs($apq) <= 1e-300 THEN {'m': acc.m, 'c': CAST(-2 AS DOUBLE), 's': $Z, 'ph': CAST(0 AS TINYINT)} ELSE {'m': acc.m, 'c': 1.0 / sqrt(($tt)*($tt) + 1.0), 's': ($tt) * (1.0 / sqrt(($tt)*($tt) + 1.0)), 'ph': CAST(0 AS TINYINT)} END"""
    val colA =
      s"""list_transform(range(0, ${2 * n2}), ii -> CASE WHEN ii < $n2 AND ii % $d = $P THEN acc.c * acc.m[(ii // $d)*$d+$P+1] - acc.s * acc.m[(ii // $d)*$d+$Q_+1] WHEN ii < $n2 AND ii % $d = $Q_ THEN acc.s * acc.m[(ii // $d)*$d+$P+1] + acc.c * acc.m[(ii // $d)*$d+$Q_+1] ELSE acc.m[ii+1] END)"""
    val phase1 =
      s"""CASE WHEN acc.c = -2.0 THEN acc ELSE {'m': $colA, 'c': acc.c, 's': acc.s, 'ph': CAST(0 AS TINYINT)} END"""
    val rowAcolV =
      s"""list_transform(range(0, ${2 * n2}), ii -> CASE WHEN ii < $n2 AND ii // $d = $P THEN acc.c * acc.m[$P*$d+(ii % $d)+1] - acc.s * acc.m[$Q_*$d+(ii % $d)+1] WHEN ii < $n2 AND ii // $d = $Q_ THEN acc.s * acc.m[$P*$d+(ii % $d)+1] + acc.c * acc.m[$Q_*$d+(ii % $d)+1] WHEN ii >= $n2 AND ii % $d = $P THEN acc.c * acc.m[$n2+((ii-$n2) // $d)*$d+$P+1] - acc.s * acc.m[$n2+((ii-$n2) // $d)*$d+$Q_+1] WHEN ii >= $n2 AND ii % $d = $Q_ THEN acc.s * acc.m[$n2+((ii-$n2) // $d)*$d+$P+1] + acc.c * acc.m[$n2+((ii-$n2) // $d)*$d+$Q_+1] ELSE acc.m[ii+1] END)"""
    val phase2 =
      s"""CASE WHEN acc.c = -2.0 THEN acc ELSE {'m': $rowAcolV, 'c': acc.c, 's': acc.s, 'ph': CAST(0 AS TINYINT)} END"""
    val rot =
      s"""(CASE WHEN st.ph = 0 THEN $phase0 WHEN st.ph = 1 THEN $phase1 ELSE $phase2 END)"""
    def offOf(m: String) =
      s"""list_reduce(list_transform(range(0, $n2), ii -> CASE WHEN ii % $d > ii // $d THEN $m[ii+1]*$m[ii+1] ELSE $Z END), (x, y) -> x + y)"""
    val frob =
      s"""list_reduce(list_transform(range(0, $n2), ii -> cv[ii+1]*cv[ii+1]), (x, y) -> x + y)"""
    val init =
      s"""list_transform(range(0, ${2 * n2}), ii -> CASE WHEN ii < $n2 THEN cv[ii+1] WHEN (ii-$n2) % $d = (ii-$n2) // $d THEN 1.0 ELSE $Z END)"""
    val z0 = "{'m': m, 'c': CAST(0 AS DOUBLE), 's': CAST(0 AS DOUBLE), 'ph': CAST(0 AS TINYINT)}"
    s"""WITH RECURSIVE
       |e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
       |      FROM $table WHERE embedding IS NOT NULL),
       |nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM e),
       |mxc AS (
       |  -- the corpus' largest single moment contribution: exact
       |  -- relational max of |v_i|, then greatest(mx^2, mx)
       |  SELECT greatest(mx * mx, mx) AS mc FROM (
       |    SELECT max(ux) AS mx FROM (
       |      SELECT unnest(list_transform(v, x -> abs(x))) AS ux FROM e))),
       |scq AS (
       |  -- the engine's momentScale loop verbatim: double up into
       |  -- [2^26, 2^27), then halve back — pure power-of-two steps,
       |  -- exact in both engines (mc rides in as a captured column:
       |  -- DuckDB lambdas reject subqueries but capture columns fine)
       |  SELECT list_reduce(
       |           list_prepend(
       |             list_reduce(
       |               list_prepend(CAST(1 AS DOUBLE),
       |                 list_transform(range(0, 1100), z -> CAST(0 AS DOUBLE))),
       |               (sc, z) -> CASE WHEN mxc.mc * sc < 67108864.0
       |                                   AND sc < 1e150 THEN sc * 2.0 ELSE sc END),
       |             list_transform(range(0, 1100), z -> CAST(0 AS DOUBLE))),
       |           (sc, z) -> CASE WHEN mxc.mc * sc >= 134217728.0
       |                               AND sc > 1e-150 THEN sc / 2.0 ELSE sc END) AS sc
       |  FROM mxc),
       |qs AS (
       |  SELECT u.range AS i,
       |         sum(CAST(floor(e.v[u.range+1] * $q + 0.5) AS BIGINT)) AS s
       |  FROM e, range(0, $d) u GROUP BY u.range),
       |qo AS (
       |  SELECT pr.i, pr.j,
       |         sum(CAST(floor(e.v[pr.i+1] * e.v[pr.j+1] * $q + 0.5) AS BIGINT)) AS s
       |  FROM e, (SELECT a.range AS i, b.range AS j
       |           FROM range(0, $d) a, range(0, $d) b WHERE b.range >= a.range) pr
       |  GROUP BY pr.i, pr.j),
       |mn AS (
       |  SELECT list(CAST(s AS DOUBLE) / $q / (SELECT n FROM nn) ORDER BY i) AS l FROM qs),
       |mat AS (
       |  SELECT list(val ORDER BY ii) AS cv FROM (
       |    SELECT g.range AS ii,
       |           CAST(o.s AS DOUBLE) / $q / (SELECT n FROM nn)
       |             - mn.l[(g.range // $d)+1] * mn.l[(g.range % $d)+1] AS val
       |    FROM range(0, $n2) g
       |    JOIN qo o ON o.i = least(g.range // $d, g.range % $d)
       |             AND o.j = greatest(g.range // $d, g.range % $d)
       |    CROSS JOIN mn)),
       |stp AS (
       |  SELECT list({'m': CAST([] AS DOUBLE[]),
       |               'c': CAST(p AS DOUBLE), 's': CAST(qc AS DOUBLE), 'ph': CAST(ph AS TINYINT)}
       |              ORDER BY p, qc, ph) AS steps
       |  FROM (SELECT pp.range AS p, qq.range AS qc, hh.range AS ph
       |        FROM range(0, ${d - 1}) pp, range(0, $d) qq, range(0, 3) hh
       |        WHERE qq.range > pp.range)),
       |t0 AS (SELECT 1e-20 * greatest($frob, 4.9e-324) AS tol FROM mat),
       |jac(sweep, m, frozen) AS (
       |  SELECT 0, $init, ${offOf("cv")} <= (SELECT tol FROM t0) FROM mat
       |  UNION ALL
       |  SELECT sweep + 1,
       |         CASE WHEN frozen THEN m ELSE fold.m END,
       |         frozen OR ${offOf("fold.m")} <= (SELECT tol FROM t0)
       |  FROM (
       |    SELECT sweep, m, frozen,
       |      CASE WHEN frozen THEN $z0
       |           ELSE list_reduce(list_prepend($z0, (SELECT steps FROM stp)), (acc, st) -> $rot) END AS fold
       |    FROM jac)
       |  WHERE sweep < $sweeps),
       |fin AS (SELECT m FROM jac WHERE sweep = $sweeps),
       |ord AS (
       |  SELECT i, row_number() OVER (ORDER BY val DESC, i ASC) AS rr FROM (
       |    SELECT u.range AS i, f.m[u.range*$d+u.range+1] AS val FROM fin f, range(0, $d) u)),
       |comp AS (
       |  -- basis row rr-1 = eigenvector column i of the accumulated
       |  -- rotations, read out of the fused state's vv half
       |  SELECT o.rr, list(f.m[$n2 + k.range*$d + o.i + 1] ORDER BY k.range) AS vec
       |  FROM ord o, fin f, range(0, $d) k WHERE o.rr <= $r GROUP BY o.rr, o.i),
       |compn AS (
       |  -- sign convention: largest-magnitude component positive, FIRST
       |  -- index on ties (list_position returns the first occurrence)
       |  SELECT rr, CASE WHEN vec[best] < 0 THEN list_transform(vec, x -> -x) ELSE vec END AS vec
       |  FROM (SELECT rr, vec,
       |          list_position(list_transform(vec, x -> abs(x)),
       |            list_reduce(list_transform(vec, x -> abs(x)),
       |              (x, y) -> CASE WHEN y > x THEN y ELSE x END)) AS best
       |        FROM comp))
       |SELECT e.vec_id AS id, CAST(c.rr - 1 AS INT) AS dim,
       |       round(list_reduce(
       |         list_transform(range(1, ${d + 1}), j -> (e.v[j] - mn.l[j]) * c.vec[j]),
       |         (x, y) -> x + y), 4) AS v
       |FROM e, compn c, mn""".stripMargin
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
