package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * End-to-end corpus-curation operators — the composed decisions a
 * training-data pipeline runs on top of the primitive dedup/text operators:
 * which near-duplicate to KEEP, which documents pass the quality gate, and
 * how to downsample per stratum. Everything is deterministic (hash-based,
 * no RNG) so runs are reproducible and the DuckDB oracles can replicate
 * results exactly.
 */
object Curate {

  /**
   * Near-duplicate removal decision: one representative (the minimum doc
   * id) survives per connected near-duplicate cluster. `pairs` is the
   * output of any Dedup pair operator (minhashLsh / simhash / cosinePairs).
   *
   * Scale shape: clustering runs on the pair list (edge cardinality, not
   * corpus); the corpus itself is touched once by a left_anti hash join on
   * the (small) drop list — with AQE the drop side broadcasts and the
   * corpus never shuffles.
   */
  def dedupKeep(docs: DataFrame, pairs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val cc = Dedup.connectedComponents(pairs)
    val drop = cc
      .filter(col("node") =!= col("cluster_id"))
      .select(col("node"))
    docs.join(drop, docs(idCol).cast("long") === drop("node"), "left_anti")
  }

  /**
   * Quality gate: language + lexical thresholds, evaluated as ONE codegen
   * projection over the scan (no joins against separate metric frames —
   * the signals are pure per-row functions of the text).
   */
  def qualityFilter(
      docs: DataFrame,
      lang: String = "en",
      minTokens: Double = 5.0,
      minTtr: Double = 0.2,
      minStopRatio: Double = 0.0,
      maxDup2gram: Double = 1.0,
      textCol: String = "text"
  ): DataFrame = {
    val t = col(textCol)
    val base =
      TextOps.langPredCol(t) === lang &&
        TextOps.nTokensCol(t) >= minTokens &&
        TextOps.ttrCol(t) >= minTtr &&
        TextOps.stopRatioCol(t) >= minStopRatio
    // the repetition signal costs an n-gram pass per row: skip it
    // entirely at the no-op default (every fraction is <= 1)
    docs.filter(
      if (maxDup2gram >= 1.0) base
      else base && TextOps.dup2FracCol(t) <= maxDup2gram)
  }

  /**
   * Deterministic stratified sampling: a document is kept when the 60-bit
   * md5 prefix of its id, modulo 10^4, falls under the stratum's rate.
   * Reproducible across engines/runs (no RNG seed to drift), uniform within
   * strata (md5 avalanche), and a pure projection — the corpus never
   * shuffles. `rates` maps stratum value -> sampling fraction; strata not
   * listed keep `defaultRate`.
   */
  def stratifiedSample(
      docs: DataFrame,
      stratum: Column,
      rates: Map[String, Double],
      defaultRate: Double = 1.0,
      idCol: String = "doc_id"
  ): DataFrame = {
    val bucket = conv(substring(md5(col(idCol).cast("string")), 1, 15), 16, 10)
      .cast("long") % 10000
    val rate = rates.foldLeft(lit(defaultRate): Column) { case (acc, (k, r)) =>
      when(stratum === k, lit(r)).otherwise(acc)
    }
    docs.filter(bucket < rate * 10000)
  }
}
