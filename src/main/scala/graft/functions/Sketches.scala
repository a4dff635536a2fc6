package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Percentile bucket scheme shared by the `:percentiles` / `:median` /
 * `:sample-count` operators and their ingest adapters (reference
 * MathExpr.Percentiles, atlas-core model/MathExpr.scala:859-1027, which uses
 * spectator's PercentileBuckets).
 *
 * Bucket boundaries follow spectator's public generation scheme: 1, 2, 3,
 * then each power-of-two octave [2^e, 2^(e+1)) contributes four boundaries
 * spaced by 2^e/3 (integer division); the last boundary is Long.MaxValue.
 * `indexOf(v)` returns the first index whose boundary is >= v.
 *
 * Everything here is plain column arithmetic (no UDFs) so bucketing stays
 * inside whole-stage codegen — at 100 TB the bucket assignment runs once per
 * ingested datapoint and must not fall out of codegen.
 */
object PercentileBuckets {

  /** Bucket boundary values; index in this array is the bucket id. */
  val values: Array[Long] = {
    val buf = scala.collection.mutable.ArrayBuffer[Long](1L, 2L, 3L)
    var e = 2
    while (e < 63) {
      val base = 1L << e
      val delta = base / 3
      var cur = base
      val next = base << 1
      while (cur < next && buf.size < 4 * 62 + 3) {
        buf += cur
        cur += delta
      }
      e += 1
    }
    buf += Long.MaxValue
    buf.toArray
  }

  val length: Int = values.length

  /** First bucket index with boundary >= v (driver-side, for tests/labels). */
  def indexOf(v: Long): Int = {
    if (v <= 0L) 0
    else if (v <= 4L) (v - 1).toInt
    else {
      val e = 63 - java.lang.Long.numberOfLeadingZeros(v)
      val base = 1L << e
      val delta = base / 3
      val j = ((v - base + delta - 1) / delta).toInt // ceil((v-base)/delta)
      math.min(3 + 4 * (e - 2) + j, length - 1)
    }
  }

  /** Bucket label for a raw value: D%04X (distribution) / T%04X (timer). */
  def label(prefix: String, v: Long): String = f"$prefix${indexOf(v)}%04X"

  /**
   * Column form of [[indexOf]] over a non-negative long column. `floor(log2)`
   * is exact for v < 2^53, far beyond any testdata value; the arithmetic
   * mirrors indexOf exactly (validated against it in SketchSpec).
   */
  def indexOfCol(v: Column): Column = {
    val e = floor(log(2.0, v)).cast("long")
    val base = pow(lit(2.0), e.cast("double")).cast("long")
    val delta = (base / 3).cast("long")
    val j = ceil((v - base).cast("double") / delta.cast("double")).cast("long")
    val idx = lit(3L) + lit(4L) * (e - 2) + j
    when(v <= 0L, 0L)
      .when(v <= 4L, (v - 1).cast("long"))
      .otherwise(least(idx, lit((length - 1).toLong)))
  }

  /** Boundary lookup: values(idx) as a double column (array literal). */
  def boundaryCol(idx: Column): Column =
    element_at(lit(values.map(_.toDouble)), (idx + 1).cast("int"))

  /** DuckDB list literal of the boundaries, for oracle SQL construction. */
  def boundariesSqlList: String =
    values.map(v => if (v == Long.MaxValue) "9223372036854775807" else v.toString)
      .mkString("[", ",", "]")

  /**
   * DuckDB expression computing [[indexOf]] for a BIGINT expression `v`
   * (same arithmetic as indexOfCol, so both engines bucket identically).
   */
  def indexOfSql(v: String): String =
    s"""CASE WHEN $v <= 0 THEN 0 WHEN $v <= 4 THEN CAST($v - 1 AS BIGINT) ELSE
       | least(3 + 4*(CAST(floor(log2($v)) AS BIGINT) - 2)
       |   + CAST(ceil(($v - (1::BIGINT << CAST(floor(log2($v)) AS INT)))::DOUBLE
       |       / ((1::BIGINT << CAST(floor(log2($v)) AS INT)) // 3)) AS BIGINT),
       |   ${length - 1}) END""".stripMargin.replace("\n", " ")
}

/**
 * HyperLogLog register sketch for `:approx-distinct` (reference
 * MathExpr.ApproxDistinct, atlas-core model/MathExpr.scala:1029-1182;
 * registers merge by max and the estimate is computed from the merged
 * register values).
 *
 * The spectator DistinctCountSketch implementation is not vendored in the
 * reference, so this uses the standard HLL construction: m = 64 registers,
 * register id = 6 bits of a hash, rho = 1 + count of leading zero bits in
 * the remaining hash stream, estimate = alpha_m * m^2 / sum(2^-M_j) with
 * linear counting for the small range. The hash is md5 so the ingest
 * adapter and the DuckDB oracle produce bit-identical registers.
 */
object Hll {

  val m = 64
  val alpha = 0.709 // standard alpha_m for m = 64

  /** Register id in [0, m) from an md5 hex string column. */
  def registerCol(md5Hex: Column): Column =
    pmod(conv(substring(md5Hex, 1, 2), 16, 10).cast("long"), lit(m.toLong))

  /**
   * Rho (1 + leading zero bits) of the 60-bit stream in hex chars 3..17 of
   * the md5. Computed with string ops (strip leading '0' hex digits, then a
   * CASE on the first digit) so DuckDB reproduces it exactly.
   */
  def rhoCol(md5Hex: Column): Column = {
    val s = substring(md5Hex, 3, 15)
    val stripped = regexp_replace(s, "^0+", "")
    val z = (lit(15) - length(stripped)) * 4
    val d = substring(stripped, 1, 1)
    val clz4 = when(d.isin("8", "9", "a", "b", "c", "d", "e", "f"), 0)
      .when(d.isin("4", "5", "6", "7"), 1)
      .when(d.isin("2", "3"), 2)
      .otherwise(3)
    when(length(stripped) === 0, 61).otherwise(z + clz4 + 1).cast("double")
  }

  /** Same rho computation as DuckDB SQL over an md5 hex expression. */
  def rhoSql(md5Hex: String): String =
    s"""(CASE WHEN regexp_replace(substr($md5Hex, 3, 15), '^0+', '') = '' THEN 61
       | ELSE (15 - length(regexp_replace(substr($md5Hex, 3, 15), '^0+', ''))) * 4
       |   + (CASE substr(regexp_replace(substr($md5Hex, 3, 15), '^0+', ''), 1, 1)
       |      WHEN '1' THEN 3 WHEN '2' THEN 2 WHEN '3' THEN 2
       |      WHEN '4' THEN 1 WHEN '5' THEN 1 WHEN '6' THEN 1 WHEN '7' THEN 1
       |      ELSE 0 END) + 1 END)""".stripMargin.replace("\n", " ")

  def registerSql(md5Hex: String): String =
    s"(CAST(('0x' || substr($md5Hex, 1, 2)) AS BIGINT) % $m)"

  /**
   * Cardinality estimate from per-register max-rho aggregates. Inputs are
   * per-group aggregate columns: `sumPow` = sum of 2^-rho over registers
   * present with rho > 0, `nSet` = count of those registers.
   */
  def estimateCol(sumPow: Column, nSet: Column): Column = {
    val zeros = lit(m) - nSet
    val full = sumPow + zeros.cast("double") // unset registers contribute 2^0
    val raw = lit(alpha * m * m) / full
    when(nSet === 0, lit(Double.NaN))
      .when(raw <= 2.5 * m && zeros > 0, lit(m.toDouble) * log(lit(m.toDouble) / zeros))
      .otherwise(raw)
  }

  /** Same estimate in DuckDB SQL from sumPow/nSet expressions. */
  def estimateSql(sumPow: String, nSet: String): String =
    s"""(CASE WHEN ($nSet) = 0 THEN NULL
       | WHEN (${alpha * m * m} / (($sumPow) + ($m - ($nSet)))) <= ${2.5 * m}
       |      AND ($m - ($nSet)) > 0
       | THEN $m * ln($m / CAST($m - ($nSet) AS DOUBLE))
       | ELSE ${alpha * m * m} / (($sumPow) + ($m - ($nSet))) END)""".stripMargin
      .replace("\n", " ")
}
