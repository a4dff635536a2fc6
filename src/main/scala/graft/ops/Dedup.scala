package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deduplication operators for document corpora, each designed around one
 * shuffle on a compact key so they hold at 100 TB:
 *
 *  - exact:        hash-groupBy on md5(text) — shuffle key is 16 bytes/doc.
 *  - minhashLsh:   shingle -> minhash signature -> banded LSH buckets ->
 *                  candidate pairs verified with exact Jaccard. The only
 *                  shuffle is the (band, bucket) join; no cross join ever
 *                  materializes.
 *  - simhash:      64-bit bit-vote fingerprint + segment blocking (pairs
 *                  within hamming distance r must share one of r+1 segments).
 *  - ngramJaccard: exact n-gram Jaccard on LSH-candidate pairs.
 *
 * All hashes are computed with codegen'd higher-order functions over
 * xxhash64 — deterministic, no UDFs, no driver-side randomness.
 */
object Dedup {

  /** Exact duplicates: one row per distinct text with the kept (min) id and
    * the duplicate count. */
  def exact(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).cast("double").as("n_dups"))

  /** Word n-gram shingles of a text column. */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(lower(text), " ")
    array_distinct(
      transform(
        sequence(lit(0), greatest(size(toks) - n, lit(0))),
        i => array_join(slice(toks, i + 1, lit(n)), " ")
      )
    )
  }

  /** MinHash signature: array of `h` minima over the shingle set, where
    * family member i is xxhash64 over (base shingle hash, i) — each shingle
    * string is hashed ONCE, the family fans out over cheap long hashing
    * (wrapping-multiply mixers would trip ANSI overflow checks). */
  def minhashSignature(shinglesCol: Column, h: Int): Column = {
    val bases = transform(shinglesCol, s => xxhash64(s))
    transform(
      sequence(lit(0), lit(h - 1)),
      i => array_min(transform(bases, b => xxhash64(b, i)))
    )
  }

  /**
   * MinHash + banded LSH near-duplicate pairs.
   *
   * @param bands     number of LSH bands; signature length = bands * rowsPerBand
   * @param threshold exact Jaccard cutoff applied to candidate pairs
   * @return (doc_a, doc_b, jaccard) with doc_a < doc_b, rounded to 4
   */
  /**
   * Distinct shingle HASHES per (doc, shingle position): tokens are hashed
   * once, an n-token shingle hashes as the xxhash of its n consecutive
   * token hashes via window `lead` — no shingle string is ever built
   * (building ~50 joined strings per doc through HOFs dominated the whole
   * operator). Equal to string shingles up to 64-bit collisions.
   */
  private def shingleHashes(docs: DataFrame, textCol: String, n: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val toks = docs
      .select(col("doc_id"), posexplode(split(lower(col(textCol)), " ")).as(Seq("pos", "tok")))
      .withColumn("h", xxhash64(col("tok")))
    val leads = (1 until n).foldLeft(toks.withColumn("sh0", col("h"))) { (df, i) =>
      df.withColumn(s"sh$i", lead(col("h"), i).over(w))
    }
    val shash = xxhash64((0 until n).map(i => coalesce(col(s"sh$i"), lit(-i.toLong))): _*)
    val cnt = count(lit(1)).over(Window.partitionBy(col("doc_id")))
    leads
      .withColumn("cnt", cnt)
      .filter(col("pos") <= greatest(col("cnt") - n, lit(0))) // shingle starts
      .select(col("doc_id"), shash.as("shash"))
      .dropDuplicates("doc_id", "shash")
  }

  def minhashLsh(
      docs: DataFrame,
      textCol: String = "text",
      shingleSize: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      threshold: Double = 0.5
  ): DataFrame = {
    val h = bands * rowsPerBand
    val sh = shingleHashes(docs, textCol, shingleSize)

    // Signatures as 64 MIN aggregates over the shingle hashes: family
    // members fan out over cheap long hashing, everything stays in codegen,
    // one doc_id shuffle. (A nested-HOF column form gets its shared shingle
    // subexpression inlined by CollapseProject into every family member —
    // 64x the work — once column pruning drops the standalone column.)
    val minCols = (0 until h).map(i => min(xxhash64(col("shash"), lit(i))).as(s"m$i"))
    val sigs = sh.groupBy(col("doc_id")).agg(minCols.head, minCols.tail: _*)

    // Explode to (doc_id, band, bucket) only — the bands explode multiplies
    // every row by `bands`, so it must carry no document payload. Shingle
    // hash sets are re-joined for surviving candidate pairs only.
    val buckets = sigs.select(
      col("doc_id"),
      explode(array((0 until bands).map { b =>
        struct(
          lit(b).as("band"),
          concat_ws("_", (0 until rowsPerBand).map(r =>
            col(s"m${b * rowsPerBand + r}").cast("string")): _*).as("bucket"))
      }: _*)).as("bb")
    ).select(col("doc_id"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))

    val a = buckets.select(col("band"), col("bucket"), col("doc_id").as("doc_a"))
    val b = buckets.select(col("band"), col("bucket"), col("doc_id").as("doc_b"))
    val candidates = a
      .join(b, Seq("band", "bucket"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")

    val shSets = sh.groupBy(col("doc_id")).agg(collect_set(col("shash")).as("sh"))
    candidates
      .join(shSets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), "doc_a")
      .join(shSets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), "doc_b")
      .withColumn("jaccard", round(jaccard(col("sh_a"), col("sh_b")) + graft.core.NanMath.RoundEps, 4))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Exact Jaccard similarity of two (distinct-element) array columns. */
  def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /**
   * Exact n-gram Jaccard near-dup pairs, using minhash LSH only to produce
   * the candidate set (so the exact measure never needs a cross join).
   */
  def ngramJaccard(
      docs: DataFrame,
      textCol: String = "text",
      n: Int = 3,
      threshold: Double = 0.3
  ): DataFrame =
    minhashLsh(docs, textCol, shingleSize = n, bands = 32, rowsPerBand = 2, threshold = threshold)

  /**
   * 64-bit SimHash signatures packed into a single long, one row per doc.
   * Bit votes run as 64 plain SUM aggregates over exploded (doc, token-hash)
   * rows — everything stays in whole-stage codegen and the only shuffle is
   * the per-doc partial-aggregated groupBy (the earlier per-bit string-array
   * form cost ~40x on binary-string HOFs).
   */
  def simhashSignatures(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = docs.select(
      col("doc_id"),
      explode(array_distinct(split(lower(col(textCol)), " "))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map(i =>
      sum(shiftrightunsigned(col("h"), i).bitwiseAND(1)).as(s"b$i"))
    val aggs = count(lit(1)).as("n") +: bitSums
    val grouped = toks.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
    val sig = (0 until 64).map { i =>
      when(col(s"b$i") * 2 > col("n"), lit(1L << i)).otherwise(0L)
    }.reduce(_ + _)
    grouped.select(col("doc_id"), sig.as("sig"))
  }

  /**
   * SimHash near-duplicate pairs within `maxHamming`. Blocking: split the
   * 64-bit signature into `maxHamming + 1` segments — by pigeonhole, any
   * pair within the distance agrees exactly on at least one segment, so the
   * join key is (segment index, segment bits), never a cross join. Hamming
   * distance is one `bit_count(a XOR b)` on the packed longs.
   */
  def simhash(
      docs: DataFrame,
      textCol: String = "text",
      maxHamming: Int = 3
  ): DataFrame = {
    val nSeg = maxHamming + 1
    val segLen = 64 / nSeg
    val withSig = simhashSignatures(docs, textCol)
    val seg = withSig.select(
      col("doc_id"),
      col("sig"),
      explode(array((0 until nSeg).map { s =>
        struct(
          lit(s).as("seg"),
          shiftrightunsigned(col("sig"), s * segLen)
            .bitwiseAND((1L << segLen) - 1).as("segbits"))
      }: _*)).as("sb")
    ).select(col("doc_id"), col("sig"), col("sb.seg").as("seg"), col("sb.segbits").as("segbits"))

    val a = seg.select(col("seg"), col("segbits"), col("doc_id").as("doc_a"), col("sig").as("sig_a"))
    val b = seg.select(col("seg"), col("segbits"), col("doc_id").as("doc_b"), col("sig").as("sig_b"))
    a.join(b, Seq("seg", "segbits"))
      .filter(col("doc_a") < col("doc_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming").cast("double").as("hamming"))
  }
}
