package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Similarity search over an embedding column (`array<float>`).
 *
 *  - bruteForceTopK: exact cosine top-k. The query side is broadcast, so
 *    the corpus is scanned once with no shuffle — the right baseline shape
 *    even at 100 TB when the query set is small.
 *  - cosinePairs: all pairs above a threshold (used for embedding near-dup).
 *  - lshTopK: random-hyperplane LSH bucketing as the scale path — candidates
 *    come from a (bucket) equi-join instead of a cross join, then are
 *    re-ranked exactly.
 *
 * Dot products are unrolled to fixed-width element_at chains: higher-order
 * functions (aggregate/zip_with) fall out of whole-stage codegen and cost
 * ~30x on the all-pairs path, while the unrolled form stays codegen'd.
 * Vectors are L2-normalized once per row before any join, so each candidate
 * pair costs exactly one dot product.
 */
object Similarity {

  /** Unrolled dot product of two fixed-length array columns (codegen'd). */
  def dot(a: Column, b: Column, dims: Int): Column =
    (0 until dims).map(i => element_at(a, i + 1) * element_at(b, i + 1)).reduce(_ + _)

  /** L2-normalized double copy of a vector column (one pass per row). */
  def normalized(vec: Column, dims: Int): Column = {
    val d = transform(vec, x => x.cast("double"))
    val n = sqrt(dot(d, d, dims))
    transform(d, x => x / n)
  }

  /** Cosine via HOFs, kept for callers without a static dim (small inputs). */
  def cosine(a: Column, b: Column): Column = {
    def dotH(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    dotH(a, b) / (sqrt(dotH(a, a)) * sqrt(dotH(b, b)))
  }

  private def dimsOf(emb: DataFrame, vecCol: String): Int =
    emb.select(size(col(vecCol))).head().getInt(0)

  /**
   * Exact top-k neighbors for each query vector (excluding self).
   * Deterministic: ties broken by neighbor id.
   */
  def bruteForceTopK(
      emb: DataFrame,
      queryPred: Column,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    val dims = dimsOf(emb, vecCol)
    val corpus = emb.select(col(idCol).as("nbr_id"), normalized(col(vecCol), dims).as("nbr_vec"))
    val queries = emb.filter(queryPred)
      .select(col(idCol).as("query_id"), normalized(col(vecCol), dims).as("q_vec"))
    val scored = corpus
      .join(broadcast(queries), col("query_id") =!= col("nbr_id"))
      .withColumn("score", dot(col("q_vec"), col("nbr_vec"), dims))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("nbr_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("nbr_id"), round(col("score"), 4).as("score"),
        col("rank").cast("double").as("rank"))
  }

  /** All distinct pairs with cosine above `threshold` (embedding near-dup). */
  def cosinePairs(
      emb: DataFrame,
      threshold: Double,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    val dims = dimsOf(emb, vecCol)
    val a = emb.select(col(idCol).as("id_a"), normalized(col(vecCol), dims).as("vec_a"))
    val b = emb.select(col(idCol).as("id_b"), normalized(col(vecCol), dims).as("vec_b"))
    a.join(b, col("id_a") < col("id_b"))
      .withColumn("score", round(dot(col("vec_a"), col("vec_b"), dims), 4))
      .filter(col("score") >= threshold)
      .select(col("id_a"), col("id_b"), col("score"))
  }

  /**
   * Deterministic pseudo-random hyperplane component for (plane p, dim d):
   * a value in [-1, 1) derived from a 64-bit mix of (p, d) — the same
   * splitmix64-style finalizer everywhere, no RNG state.
   */
  private def planeComponent(p: Int, d: Int): Double = {
    var z = p.toLong * 0x9E3779B97F4A7C15L + d.toLong * 0xBF58476D1CE4E5B9L + 0x94D049BB133111EBL
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    (z >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
  }

  /**
   * Multi-table random-hyperplane LSH ANN: `tables` independent hash tables,
   * each bucketing by the sign pattern of `planes` hyperplane dot products;
   * candidates share a (table, bucket) key; exact cosine re-rank over the
   * union of candidates. Recall rises with `tables`, candidate count (cost)
   * with `tables / 2^planes` — the standard tradeoff; recall < 1 by
   * construction, so pair with bruteForceTopK for evaluation.
   */
  def lshTopK(
      emb: DataFrame,
      queryPred: Column,
      k: Int,
      tables: Int = 8,
      planes: Int = 5,
      idCol: String = "vec_id",
      vecCol: String = "embedding"
  ): DataFrame = {
    val dims = dimsOf(emb, vecCol)
    def buckets(vec: Column): Column = array((0 until tables).map { tbl =>
      struct(
        lit(tbl).as("tbl"),
        concat_ws("", (0 until planes).map { p =>
          val planeDot = (0 until dims).map { d =>
            element_at(vec, d + 1) * lit(planeComponent(tbl * planes + p, d))
          }.reduce(_ + _)
          when(planeDot >= 0, "1").otherwise("0")
        }: _*).as("bucket")
      )
    }: _*)

    val corpus = emb.select(
      col(idCol).as("nbr_id"),
      normalized(col(vecCol), dims).as("nbr_vec")
    ).select(col("nbr_id"), col("nbr_vec"), explode(buckets(col("nbr_vec"))).as("tb"))
    val queries = emb.filter(queryPred).select(
      col(idCol).as("query_id"),
      normalized(col(vecCol), dims).as("q_vec")
    ).select(col("query_id"), col("q_vec"), explode(buckets(col("q_vec"))).as("tb"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("nbr_id").asc)
    corpus
      .join(broadcast(queries), Seq("tb"))
      .filter(col("query_id") =!= col("nbr_id"))
      .dropDuplicates("query_id", "nbr_id")
      .withColumn("score", dot(col("q_vec"), col("nbr_vec"), dims))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("nbr_id"), round(col("score"), 4).as("score"))
  }
}
