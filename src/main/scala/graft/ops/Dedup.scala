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
 *  - simhash:      60-bit bit-vote fingerprint + segment blocking (pairs
 *                  within hamming distance r must share one of r+1 segments).
 *  - ngramJaccard: exact n-gram Jaccard on LSH-candidate pairs.
 *
 * All hashes derive from md5 (JVM MessageDigest in partition-local kernels,
 * fanned out through a 2-universal modular family) — deterministic, no
 * driver-side randomness, and exactly reproducible by the DuckDB oracles.
 */
object Dedup {

  /** Exact duplicates: one row per distinct text with the kept (min) id and
    * the duplicate count. */
  def exact(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .groupBy(md5(col(textCol)).as("text_hash"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).cast("double").as("n_dups"))

  /**
   * Streaming exact dedup: pass through the first document per content
   * hash, dropping re-arrivals within the watermark horizon. Uses Spark's
   * dropDuplicatesWithinWatermark so the per-hash state is evicted once the
   * watermark passes it — bounded state at unbounded stream length, which
   * is the only form that survives an ingest firehose (a plain
   * dropDuplicates on a stream retains every hash forever).
   */
  def streamingExact(
      docs: DataFrame,
      textCol: String = "text",
      tsCol: String = "ts",
      watermark: String = "10 minutes"
  ): DataFrame =
    docs
      .withColumn("event_time", timestamp_millis(col(tsCol)))
      .withWatermark("event_time", watermark)
      .withColumn("text_hash", md5(col(textCol)))
      .dropDuplicatesWithinWatermark("text_hash")

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

  /**
   * 2-universal hash family over a 60-bit md5-derived base: member i is
   * ((base % P) * A_i + B_i) % P. Every intermediate stays below 2^62, so
   * the arithmetic is ANSI-overflow-safe in Spark AND exactly reproducible
   * in DuckDB BIGINT math (xxhash64 has no DuckDB equivalent — this family
   * is what makes the minhash/simhash oracles possible).
   */
  private[ops] val FamP = 2147483647L
  private[ops] def famA(i: Int): Long = (2654435761L * (i + 1)) % FamP
  private[ops] def famB(i: Int): Long = (40503L * (i + 1) + 17) % FamP

  /** 60-bit cross-engine base hash: the numeric value of the first 15 hex
    * digits of an md5 (DuckDB: CAST('0x' || substr(md5(s),1,15) AS BIGINT);
    * Spark: conv(substring(md5(s),1,15),16,10)). */
  private[ops] def md5Base60(md: java.security.MessageDigest, s: String): Long = {
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xffL) >>> 4)
  }

  /** Per-doc minhash state: distinct shingle hashes + h-member signature. */
  final case class MinhashDoc(doc_id: Long, sh: Array[Long], sig: Array[Long])

  /**
   * Spread a narrow input across all cores before a CPU-bound per-row
   * kernel. A small parquet file arrives as one split -> one task, which
   * serializes the signature computation; on a real cluster the scan has
   * thousands of splits and this is a no-op (condition false). The
   * repartition shuffles only (id, text) rows, negligible next to the
   * kernel it parallelizes.
   */
  private def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /**
   * One partition-local pass computing, per document, the distinct
   * shingle-hash set AND the full minhash signature — no shuffle at all
   * until the LSH bucket join. Column-expression formulations of this
   * kernel lose 4-10x: shingle construction through higher-order functions
   * runs outside whole-stage codegen, a window-lead form adds a per-doc
   * shuffle+sort, and md5 via string expressions (md5 -> substring -> conv)
   * costs 3x a JVM MessageDigest call. Per-doc work is embarrassingly
   * parallel and memory is bounded by document size, so this scales
   * linearly with corpus bytes.
   */
  private def minhashDocs(docs: DataFrame, textCol: String, n: Int, h: Int) = {
    val spark = docs.sparkSession
    import spark.implicits._
    val as = Array.tabulate(h)(famA)
    val bs = Array.tabulate(h)(famB)
    spread(docs.select(col("doc_id").cast("long"), col(textCol))).as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          val toks = text.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
          val nSh = math.max(toks.length - (n - 1), 1)
          val seen = new java.util.HashSet[java.lang.Long]()
          val sig = Array.fill(h)(Long.MaxValue)
          var i = 0
          while (i < nSh) {
            val base = md5Base60(md, toks.slice(i, i + n).mkString(" "))
            if (seen.add(base)) {
              val r = base % FamP
              var j = 0
              while (j < h) {
                val m = (r * as(j) + bs(j)) % FamP
                if (m < sig(j)) sig(j) = m
                j += 1
              }
            }
            i += 1
          }
          val sh = new Array[Long](seen.size())
          val iter = seen.iterator()
          var k = 0
          while (iter.hasNext) { sh(k) = iter.next(); k += 1 }
          // Sorted so that identical shingle SETS yield identical arrays —
          // the array is used directly as a grouping key downstream.
          java.util.Arrays.sort(sh)
          MinhashDoc(id, sh, sig)
        }
      }
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
    // Duplicate-heavy corpora put many docs with IDENTICAL shingle sets
    // (hence identical signatures) into the same LSH buckets, making the
    // bucket self-join quadratically skewed on exactly the hottest keys.
    // Collapse to one row per DISTINCT shingle set first: candidate
    // generation and the exact-jaccard measure run at distinct-set
    // cardinality, and doc-id groups expand afterwards. Output-identical:
    // identical sets share every bucket (so all in-group pairs are LSH
    // candidates by construction) and have jaccard exactly 1.0. The
    // materialized group frame (~1 KB/set vs full text) is the "index
    // build"; every downstream pass reads the compact frame, never the raw
    // corpus. localCheckpoint (not persist) so the blocks are freed by the
    // ContextCleaner once the frame is unreachable — a catalog run executes
    // ~100 queries in one JVM and leaked cache blocks evict each other.
    val groups = sigGroups(docs, textCol, shingleSize, h)

    // identical shingle sets: every in-group pair is a duplicate at 1.0
    val intra = intraPairs(groups, "gid").withColumn("jaccard", lit(1.0))

    // Explode to (gid, band, bucket) only — the bands explode multiplies
    // every row by `bands`, so it must carry no set payload. Shingle sets
    // are re-joined for surviving candidate group pairs only.
    val buckets = bucketize(groups, bands, rowsPerBand)

    val a = buckets.select(col("band"), col("bucket"), col("gid").as("gid_a"))
    val b = buckets.select(col("band"), col("bucket"), col("gid").as("gid_b"))
    val candGroups = a
      .join(b, Seq("band", "bucket"))
      .filter(col("gid_a") < col("gid_b"))
      .select(col("gid_a"), col("gid_b"))
      .dropDuplicates("gid_a", "gid_b")

    val sets = groups.select(col("gid"), col("sh"), col("ids"))
    val cross = candGroups
      .join(sets.select(col("gid").as("gid_a"), col("sh").as("sh_a"), col("ids").as("ids_a")), "gid_a")
      .join(sets.select(col("gid").as("gid_b"), col("sh").as("sh_b"), col("ids").as("ids_b")), "gid_b")
      .withColumn("jaccard", round(jaccard(col("sh_a"), col("sh_b")) + graft.core.NanMath.RoundEps, 4))
      .filter(col("jaccard") >= threshold)
      .select(explode(col("ids_a")).as("id_a"), col("ids_b"), col("jaccard"))
      .select(col("id_a"), explode(col("ids_b")).as("id_b"), col("jaccard"))
      .select(
        least(col("id_a"), col("id_b")).as("doc_a"),
        greatest(col("id_a"), col("id_b")).as("doc_b"),
        col("jaccard"))

    intra.unionAll(cross)
  }

  /** (gid, band, bucket) rows of a signature-group frame: the bands
    * explode carries no set payload (see the [[minhashLsh]] comment). */
  private def bucketize(groups: DataFrame, bands: Int, rowsPerBand: Int): DataFrame =
    groups.select(
      col("gid"),
      explode(array((0 until bands).map { b =>
        struct(
          lit(b).as("band"),
          concat_ws("_", (0 until rowsPerBand).map(r =>
            element_at(col("sig"), b * rowsPerBand + r + 1).cast("string")): _*).as("bucket"))
      }: _*)).as("bb")
    ).select(col("gid"), col("bb.band").as("band"), col("bb.bucket").as("bucket"))

  /** Signature-group ("index") frame of a corpus: one row per DISTINCT
    * shingle set with its member doc ids, minhash signature and gid. */
  private def sigGroups(
      docs: DataFrame, textCol: String, shingleSize: Int, h: Int): DataFrame =
    minhashDocs(docs, textCol, shingleSize, h).toDF()
      .groupBy(col("sh"))
      .agg(collect_list(col("doc_id")).as("ids"), first(col("sig")).as("sig"))
      .withColumn("gid", array_min(col("ids")))
      .localCheckpoint()

  /**
   * Incremental near-dup detection: minhash-LSH pairs BETWEEN an existing
   * corpus and a new batch only — the daily-ingest shape, where the corpus
   * is assumed already deduplicated and re-pairing it against itself every
   * day would be quadratic waste. Output is (corpus_id, batch_id, jaccard)
   * for cross-side pairs at or above `threshold`; batch-internal duplicates
   * are a separate (plain [[minhashLsh]] on the batch) concern.
   *
   * Scale shape: the corpus side's signature groups and bucket rows are
   * exactly the frames a production deployment PERSISTS as its dedup index
   * (~1 KB/distinct set, built once, appended per batch) — per-batch cost
   * is then batch-cardinality signature building plus a bucket equi-join
   * against the corpus bucket table. The corpus never self-joins, and the
   * identical-set fast path needs no special case: byte-identical sets
   * share every bucket and measure jaccard 1.0 through the same join.
   */
  /** Build the PERSISTABLE dedup index of a document frame: the signature
    * groups (one row per distinct shingle set: member ids, minhash
    * signature, gid) that [[minhashPairsVsIndex]] joins new batches
    * against. ~1 KB per distinct set; append each batch's kept docs'
    * groups and the index stays current with no rebuild. */
  def minhashIndex(
      docs: DataFrame,
      textCol: String = "text",
      shingleSize: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4
  ): DataFrame = sigGroups(docs, textCol, shingleSize, bands * rowsPerBand)

  /** Cross-side near-dup pairs between a persisted index ([[minhashIndex]]
    * output, possibly re-read from parquet) and a new batch — the join
    * half of [[minhashLshIncremental]] without rebuilding the corpus side. */
  def minhashPairsVsIndex(
      index: DataFrame,
      batch: DataFrame,
      textCol: String = "text",
      shingleSize: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      threshold: Double = 0.5
  ): DataFrame = {
    val gb = sigGroups(batch, textCol, shingleSize, bands * rowsPerBand)
    pairGroups(index, gb, bands, rowsPerBand, threshold)
  }

  def minhashLshIncremental(
      corpus: DataFrame,
      batch: DataFrame,
      textCol: String = "text",
      shingleSize: Int = 3,
      bands: Int = 16,
      rowsPerBand: Int = 4,
      threshold: Double = 0.5
  ): DataFrame = {
    val h = bands * rowsPerBand
    val gc = sigGroups(corpus, textCol, shingleSize, h)
    val gb = sigGroups(batch, textCol, shingleSize, h)
    pairGroups(gc, gb, bands, rowsPerBand, threshold)
  }

  /** Bucket equi-join + exact-jaccard confirm between two signature-group
    * frames (corpus side `gc`, batch side `gb`). */
  private def pairGroups(gc: DataFrame, gb: DataFrame, bands: Int,
      rowsPerBand: Int, threshold: Double): DataFrame = {
    val cand = bucketize(gc, bands, rowsPerBand)
      .select(col("band"), col("bucket"), col("gid").as("gid_a"))
      .join(bucketize(gb, bands, rowsPerBand)
        .select(col("band"), col("bucket"), col("gid").as("gid_b")),
        Seq("band", "bucket"))
      .select(col("gid_a"), col("gid_b"))
      .dropDuplicates("gid_a", "gid_b")
    cand
      .join(gc.select(col("gid").as("gid_a"), col("sh").as("sh_a"), col("ids").as("ids_a")), "gid_a")
      .join(gb.select(col("gid").as("gid_b"), col("sh").as("sh_b"), col("ids").as("ids_b")), "gid_b")
      .withColumn("jaccard", round(jaccard(col("sh_a"), col("sh_b")) + graft.core.NanMath.RoundEps, 4))
      .filter(col("jaccard") >= threshold)
      .select(explode(col("ids_a")).as("corpus_id"), col("ids_b"), col("jaccard"))
      .select(col("corpus_id"), explode(col("ids_b")).as("batch_id"), col("jaccard"))
      // doc ids are global across the two sides by contract, so an equal-id
      // pair is a document meeting ITSELF (e.g. a crash-replayed streaming
      // batch matching its own already-indexed signatures) — never a dup.
      // Disjoint-side callers are unaffected; replay callers stop
      // misclassifying every survivor as a duplicate of itself.
      .filter(col("corpus_id") =!= col("batch_id"))
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
   * Asymmetric n-gram CONTAINMENT pairs: `cont_a = |A n B| / |A|` (and the
   * `_b` mirror), emitted when either side is >= `threshold`. Containment
   * catches what jaccard structurally cannot: a short document quoted or
   * wholly subsumed by a much longer one has jaccard ~ |A|/|B| -> 0 but
   * containment 1.0 — minhash-LSH candidates (jaccard-tuned) MISS exactly
   * these pairs, so this operator joins on the grams themselves.
   *
   * Scale shape: distinct (doc, gram) rows from the partition-local kernel
   * ([[TextOps.ngramRows]]), one gram-keyed self-join producing only
   * co-occurring pairs, then pair-count + two size join-backs — exchanges
   * at gram/pair cardinality. A gram shared by df docs contributes df^2/2
   * candidate rows, so a stopword-like n-gram is a skew hotspot; the join
   * input is therefore BOUNDED by `maxGramDf`: grams with document
   * frequency above the ceiling are dropped before the self-join (the
   * spot-signature convention — a gram in that many documents is
   * boilerplate, not evidence of quotation), which caps the worst single
   * gram's join contribution at maxGramDf^2/2 rows. `maxGramDf < 1.0` is
   * read as a FRACTION of the corpus document count (sklearn's `max_df`
   * convention; the corpus count is the docs-with->=n-tokens count, one
   * cheap count over the checkpointed gram frame), values >= 2 as an
   * absolute ceiling. The zone [1.0, 2.0) is REJECTED: 1.0 is ambiguous
   * by construction (100% of the corpus vs an absolute cap of 1 — and an
   * absolute 1 is inexpressible nonsense anyway, since a df-1 gram pairs
   * with nobody), so the boundary is an error, not a silent
   * reinterpretation. The trade is explicit in the output: `|A|` (the
   * containment denominator) stays exact over ALL grams, so capped
   * containments are LOWER BOUNDS; `dropped_a`/`dropped_b` carry each
   * doc's count of over-ceiling grams and `exact` is true iff both are 0
   * (no hot gram touched either doc, so the pair's containment is the
   * uncapped value). A pair whose overlap is ONLY boilerplate grams does
   * not appear at all — that is the point of the cap. Docs shorter than
   * `n` tokens have NO grams (the [[TextOps.ngramSet]] convention) and
   * never pair.
   */
  def ngramContainment(
      docs: DataFrame,
      textCol: String = "text",
      n: Int = 3,
      threshold: Double = 0.8,
      maxGramDf: Double = 10000.0
  ): DataFrame = {
    require(maxGramDf > 0 && (maxGramDf < 1.0 || maxGramDf >= 2.0),
      s"maxGramDf $maxGramDf is ambiguous: values in (0, 1) read as a " +
        "corpus FRACTION (sklearn max_df), values >= 2 as an ABSOLUTE " +
        "ceiling; [1.0, 2.0) is rejected because 1.0 could mean either " +
        "(and an absolute cap of 1 can never pair)")
    // materialize the tokenization kernel once (every downstream consumer
    // would otherwise re-scan and re-shingle the text), spread first so a
    // single-split local file doesn't serialize the whole join DAG behind
    // one-partition stages (a lazy checkpoint here measured SLOWER: the
    // main DAG's consumers race to materialize the blocks)
    val grams = TextOps.ngramRows(spread(docs), n, textCol).localCheckpoint()
    val cap: Long =
      if (maxGramDf <= 1.0)
        math.ceil(maxGramDf * grams.select(col("doc_id")).distinct().count()).toLong
      else maxGramDf.toLong
    // one gram-keyed df join-back: (doc_id, gram, df) is the single frame
    // every downstream consumer derives from — per-doc stats (|A| over ALL
    // grams + over-ceiling count) come from ONE doc-keyed agg, and the
    // self-join input is a filter of it (the previous shape re-aggregated
    // the df frame per consumer: measured ~30% slower at sf0.1 with 4
    // redundant exchanges)
    val gdf = grams
      .join(grams.groupBy(col("gram")).agg(count(lit(1)).as("df")), Seq("gram"))
    val docStats = gdf.groupBy(col("doc_id")).agg(
      count(lit(1)).as("sz"),
      sum(when(col("df") > cap, 1L).otherwise(0L)).as("nd"))
    // df >= 2 prune BEFORE the self-join: a gram appearing in one document
    // pairs with nobody, and on a Zipfian corpus hapax grams are ~half the
    // distinct grams — |A| (the containment denominator) is taken from the
    // UNPRUNED rows, so it stays exact while the join input shrinks to the
    // co-occurring tail below the boilerplate ceiling. Exactness of the
    // lower bound is unchanged; the df <= cap drop is surfaced per-pair
    // via dropped_a/dropped_b and the exact flag.
    val kept = gdf.filter(col("df") >= 2 && col("df") <= cap)
      .select(col("gram"), col("doc_id"))
    val inter = kept.toDF("gram", "doc_a")
      .join(kept.toDF("gram_b", "doc_b"), col("gram") === col("gram_b"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
    inter
      .join(docStats.toDF("doc_a", "sz_a", "nd_a"), Seq("doc_a"))
      .join(docStats.toDF("doc_b", "sz_b", "nd_b"), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        round(col("inter") / col("sz_a") + graft.core.NanMath.RoundEps, 4).as("cont_a"),
        round(col("inter") / col("sz_b") + graft.core.NanMath.RoundEps, 4).as("cont_b"),
        col("nd_a").as("dropped_a"), col("nd_b").as("dropped_b"))
      .withColumn("exact", col("dropped_a") === 0L && col("dropped_b") === 0L)
      .filter(greatest(col("cont_a"), col("cont_b")) >= threshold)
  }

  /**
   * Optimal (bands, rowsPerBand) for a target jaccard `threshold` under a
   * signature-size budget: minimize the weighted area of the LSH S-curve's
   * false-positive region below the threshold plus the false-negative
   * region above it, where `P(candidate | jaccard = s) = 1 - (1 - s^r)^b`
   * — the standard MinHashLSH parameter construction (the datasketch
   * `_optimal_param` idea), reimplemented as a pure driver-side function.
   * Ties break to the smaller band count (cheaper bucket explode).
   * Feed the result into [[minhashLsh]]'s `bands`/`rowsPerBand` instead
   * of hand-picking — a mis-tuned geometry silently trades recall for
   * candidate volume at corpus scale.
   */
  /**
   * Corpus-wide exact PARAGRAPH dedup — the line/paragraph-granular
   * sibling of [[exact]] (whole documents) and
   * [[graft.ops.TextOps.removeSharedSpans]] (token windows): every
   * occurrence of a repeated paragraph except the globally FIRST (by
   * (doc id, position) order) is cut, and documents are reassembled from
   * their surviving paragraphs in order — the boilerplate-removal pass
   * (headers, footers, cookie banners) that document-level dedup cannot
   * see and span removal treats token-wise. Documents losing every
   * paragraph drop out. Returns (id, text, n_paras_kept,
   * n_paras_dropped). Empty paragraphs (from consecutive separators)
   * participate like any other — the first survives, the rest cut.
   *
   * Scale shape: paragraphs explode in-scan (no shuffle); the keep
   * decision is a `min(struct(doc_id, idx))` aggregate per paragraph hash
   * — map-side combinable, so the hottest paragraph (the exact boilerplate
   * this operator targets: cookie banners, nav headers, empty paragraphs,
   * each repeated across millions of documents) reduces to ONE row per
   * input partition before the exchange — joined back on the hash to mark
   * winners (an equi-join AQE splits when a hash is still skewed; a
   * row_number window over the hash would instead funnel every occurrence
   * of the hottest paragraph into one unsplittable task). Reassembly is
   * one exchange on the doc id with an array_sort(collect_list) rebuild,
   * so corpus text crosses the wire exactly twice (the floor for a global
   * first-occurrence decision plus a positional rebuild).
   */
  def paragraphDedup(
      docs: DataFrame,
      sep: String = "\n",
      idCol: String = "doc_id",
      textCol: String = "text"
  ): DataFrame = {
    val paras = docs
      .select(col(idCol).cast("long").as("__id"),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
          .as(Seq("__idx", "__para")))
      .withColumn("__h", md5(col("__para")))
    // global first occurrence per paragraph: partial-aggregable min, never
    // a window (identical semantics to rn=1 under (__id, __idx) order —
    // struct ordering is lexicographic by field)
    val firsts = paras
      .groupBy(col("__h"))
      .agg(min(struct(col("__id"), col("__idx"))).as("__first"))
    paras
      .join(firsts, Seq("__h"))
      // null-SAFE winner match: a null doc id (idCol cast failure, null
      // source id) is a real group member under min(struct(...)) ordering
      // — === would evaluate null for the winner's own row and silently
      // drop the paragraph from EVERY document; <=> keeps the rn=1-window
      // semantics the agg/join plan replaced
      .withColumn("__keep",
        col("__first.__id") <=> col("__id") && col("__first.__idx") <=> col("__idx"))
      .groupBy(col("__id"))
      .agg(
        array_join(array_sort(collect_list(
          when(col("__keep"), struct(col("__idx"), col("__para"))))) // nulls drop
          .getField("__para"), sep).as("text"),
        sum(when(col("__keep"), 1L).otherwise(0L)).as("n_paras_kept"),
        sum(when(!col("__keep"), 1L).otherwise(0L)).as("n_paras_dropped"))
      .filter(col("n_paras_kept") > 0)
      .select(col("__id").as(idCol), col("text"),
        col("n_paras_kept"), col("n_paras_dropped"))
  }

  def optimalBands(
      threshold: Double,
      numHashes: Int,
      fpWeight: Double = 0.5
  ): (Int, Int) = {
    require(threshold > 0 && threshold < 1, s"threshold $threshold outside (0, 1)")
    require(numHashes >= 2, "need at least 2 hashes")
    require(fpWeight >= 0 && fpWeight <= 1, "fpWeight outside [0, 1]")
    def prob(s: Double, b: Int, r: Int): Double =
      1.0 - math.pow(1.0 - math.pow(s, r), b)
    // trapezoid over 200 panels: the integrand is smooth, and the same
    // discretization judges every candidate pair, so the argmin is exact
    // for the discretized objective
    def integral(lo: Double, hi: Double)(f: Double => Double): Double = {
      val n = 200
      val h = (hi - lo) / n
      var s = (f(lo) + f(hi)) / 2
      var i = 1
      while (i < n) { s += f(lo + i * h); i += 1 }
      s * h
    }
    val candidates = for {
      b <- 1 to numHashes
      r <- 1 to numHashes / b
    } yield {
      val fp = integral(0.0, threshold)(s => prob(s, b, r))
      val fn = integral(threshold, 1.0)(s => 1.0 - prob(s, b, r))
      (fpWeight * fp + (1 - fpWeight) * fn, b, r)
    }
    val best = candidates.minBy { case (err, b, r) => (err, b, r) }
    (best._2, best._3)
  }

  /** DuckDB replica of [[ngramContainment]] over the `documents` table
    * (same fraction-vs-absolute cap reading, same rejected boundary). */
  def containmentOracleSql(n: Int, threshold: Double, maxGramDf: Double = 10000.0): String = {
    require(maxGramDf > 0 && (maxGramDf < 1.0 || maxGramDf >= 2.0),
      s"maxGramDf $maxGramDf is ambiguous — see ngramContainment")
    s"""WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS tk FROM documents),
       |g AS MATERIALIZED (SELECT DISTINCT doc_id, gram FROM (
       |  SELECT doc_id, unnest(list_transform(range(0, len(tk) - ${n - 1}),
       |    i -> array_to_string(list_slice(tk, i + 1, i + $n), ' '))) AS gram
       |  FROM toks WHERE len(tk) >= $n)),
       |dfr AS MATERIALIZED (SELECT gram, count(*) AS df FROM g GROUP BY 1),
       |cap AS MATERIALIZED (SELECT CASE WHEN $maxGramDf <= 1.0
       |  THEN CAST(ceil($maxGramDf * (SELECT count(DISTINCT doc_id) FROM g)) AS BIGINT)
       |  ELSE CAST($maxGramDf AS BIGINT) END AS c),
       |kept AS MATERIALIZED (SELECT g.doc_id, g.gram FROM g JOIN dfr USING (gram)
       |  WHERE df >= 2 AND df <= (SELECT c FROM cap)),
       |dropped AS MATERIALIZED (SELECT g.doc_id, count(*) AS nd FROM g JOIN dfr USING (gram)
       |  WHERE df > (SELECT c FROM cap) GROUP BY 1),
       |sz AS (SELECT doc_id, CAST(count(*) AS DOUBLE) AS sz FROM g GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(count(*) AS DOUBLE) AS c
       |  FROM kept a JOIN kept b ON a.gram = b.gram AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, cont_a, cont_b, dropped_a, dropped_b,
       |       (dropped_a = 0 AND dropped_b = 0) AS exact FROM (
       |  SELECT doc_a, doc_b, round(c / sa.sz, 4) AS cont_a, round(c / sb.sz, 4) AS cont_b,
       |         CAST(coalesce(da.nd, 0) AS BIGINT) AS dropped_a,
       |         CAST(coalesce(db.nd, 0) AS BIGINT) AS dropped_b
       |  FROM inter JOIN sz sa ON inter.doc_a = sa.doc_id JOIN sz sb ON inter.doc_b = sb.doc_id
       |  LEFT JOIN dropped da ON inter.doc_a = da.doc_id
       |  LEFT JOIN dropped db ON inter.doc_b = db.doc_id)
       |WHERE greatest(cont_a, cont_b) >= $threshold""".stripMargin
  }

  /** SimHash signature width: 60 bits (the md5-derived base hash width),
    * packed into one long. */
  private[ops] val SimhashBits = 60

  /**
   * SimHash signatures packed into a single long, one row per doc, computed
   * in one partition-local pass (distinct tokens, per-bit majority votes) —
   * no shuffle, no explode: the signature is a pure per-document function,
   * so nothing leaves the partition but one (doc_id, sig) row per doc.
   */
  def simhashSignatures(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    spread(docs.select(col("doc_id").cast("long"), col(textCol))).as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, text) =>
          val toks = text.toLowerCase(java.util.Locale.ROOT).split(" ", -1)
          val seen = new java.util.HashSet[String]()
          val votes = new Array[Int](SimhashBits)
          var n = 0
          var i = 0
          while (i < toks.length) {
            if (seen.add(toks(i))) {
              val hv = md5Base60(md, toks(i))
              var b = 0
              while (b < SimhashBits) {
                votes(b) += ((hv >>> b) & 1L).toInt
                b += 1
              }
              n += 1
            }
            i += 1
          }
          var sig = 0L
          var b = 0
          while (b < SimhashBits) {
            if (votes(b) * 2 > n) sig |= (1L << b)
            b += 1
          }
          (id, sig)
        }
      }
      .toDF("doc_id", "sig")
  }

  /**
   * SimHash near-duplicate pairs within `maxHamming`. Blocking: split the
   * 60-bit signature into `maxHamming + 1` segments — by pigeonhole, any
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
    val segLen = SimhashBits / nSeg
    // Duplicate-heavy corpora produce many docs with IDENTICAL signatures,
    // which makes segment buckets quadratically skewed (one hot bucket ->
    // one straggler task doing |bucket|^2 pair work). Collapse to one row
    // per DISTINCT signature before the self-join and expand the doc-id
    // groups afterwards: same output, candidate volume shrinks by the
    // square of the duplication factor, and the id lists ride along the
    // (much smaller) signature join.
    val sigGroups = simhashSignatures(docs, textCol)
      .groupBy(col("sig")).agg(collect_list(col("doc_id")).as("ids"))
      .localCheckpoint() // freed by ContextCleaner, unlike a leaked persist

    // identical signatures: every in-group pair is a duplicate at distance 0
    val intra = intraPairs(sigGroups, "sig").withColumn("hamming", lit(0.0))

    val seg = sigGroups.select(
      col("sig"),
      col("ids"),
      explode(array((0 until nSeg).map { s =>
        struct(
          lit(s).as("seg"),
          shiftrightunsigned(col("sig"), s * segLen)
            .bitwiseAND((1L << segLen) - 1).as("segbits"))
      }: _*)).as("sb")
    ).select(col("sig"), col("ids"), col("sb.seg").as("seg"), col("sb.segbits").as("segbits"))

    val a = seg.select(col("seg"), col("segbits"), col("sig").as("sig_a"), col("ids").as("ids_a"))
    val b = seg.select(col("seg"), col("segbits"), col("sig").as("sig_b"), col("ids").as("ids_b"))
    val cross = a.join(b, Seq("seg", "segbits"))
      .filter(col("sig_a") < col("sig_b"))
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("sig_a", "sig_b")
      .select(explode(col("ids_a")).as("id_a"), col("ids_b"), col("hamming"))
      .select(col("id_a"), explode(col("ids_b")).as("id_b"), col("hamming"))
      .select(
        least(col("id_a"), col("id_b")).as("doc_a"),
        greatest(col("id_a"), col("id_b")).as("doc_b"),
        col("hamming").cast("double").as("hamming"))

    intra.unionAll(cross)
  }

  /**
   * Connected components over an undirected near-duplicate pair list —
   * the step that turns pairwise LSH output into dedup decisions (one
   * cluster id per document; keep the min id, drop the rest).
   *
   * Alternating large-star/small-star (Kiveris et al., "Connected
   * Components in MapReduce and Beyond", SoCC'14): each round is two
   * groupBy-explode passes over the edge list, and the edge set provably
   * converges to per-component stars in O(log^2 n) rounds regardless of
   * component diameter — unlike naive min-label propagation, whose round
   * count is the graph diameter (a 100 TB corpus chained through shared
   * boilerplate can have long dup paths). Each pass shuffles only (long,
   * long) edges; no adjacency ever has to fit in one task except a
   * component's direct star, which is the output itself.
   *
   * Returns (node, cluster_id) for every node that appears in `pairs`,
   * where cluster_id is the component's minimum node id.
   */
  def connectedComponents(
      pairs: DataFrame,
      srcCol: String = "doc_a",
      dstCol: String = "doc_b",
      maxLocalEdges: Long = 100000L
  ): DataFrame = {
    val spark = pairs.sparkSession

    // (u, v) with u > v, deduped — canonical directed form
    def canon(df: DataFrame): DataFrame = df
      .filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .distinct()

    // per-node neighborhood with its min: one groupBy over the edge list
    def withMin(nbrs: DataFrame): DataFrame = nbrs
      .groupBy(col("u"))
      .agg(collect_set(col("v")).as("nb"))
      .withColumn("m", least(col("u"), array_min(col("nb"))))

    // large-star: link every strictly-larger neighbor to the local min
    def largeStar(edges: DataFrame): DataFrame = {
      val nbrs = edges.select(col("u"), col("v"))
        .unionAll(edges.select(col("v").as("u"), col("u").as("v")))
      canon(withMin(nbrs)
        .select(explode(filter(col("nb"), _ > col("u"))).as("u"), col("m").as("v")))
    }

    // small-star: link every smaller-or-equal neighbor (and self) to the min
    def smallStar(edges: DataFrame): DataFrame = {
      val st = withMin(edges)
      canon(st.select(explode(array_append(col("nb"), col("u"))).as("u"), col("m").as("v")))
    }

    // localCheckpoint per round: materializes the frame (the loop needs an
    // action anyway), truncates the iterative lineage so plans stay flat,
    // and — unlike persist — the blocks are freed by the ContextCleaner
    // when the previous round's frame goes unreachable.
    //
    // Failure semantics, acknowledged (here and at every localCheckpoint in
    // graft.ops): the blocks are unreplicated and lineage is truncated, so
    // losing an executor mid-job fails the job instead of recomputing —
    // the job RESTARTS rather than degrades. That is the deliberate trade:
    // these frames are small (edge sets, gram sets, distinct-value counts —
    // orders of magnitude below the input), so re-running the job is cheap,
    // while reliable checkpointing would put a DFS round-trip in every
    // iteration and persist() leaks blocks across a long catalog session.
    // On a cluster where node loss is routine and restarts are expensive,
    // swap in df.checkpoint() (reliable, HDFS-backed) via one call site.
    // Materialize the NON-distinct canonical form first: the fast path
    // below tolerates duplicate edges (union-find is idempotent), so the
    // distinct's exchange+aggregate is deferred to the distributed path —
    // one less shuffle inside this checkpoint job for the common case.
    // (Pair operators emit unique pairs by construction, so the row count
    // against maxLocalEdges is the same either way in practice.)
    var edges = pairs
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .filter(col("u") =!= col("v"))
      .select(greatest(col("u"), col("v")).as("u"), least(col("u"), col("v")).as("v"))
      .localCheckpoint()

    // Fixpoint test on (count, order-independent xor of row hashes): both
    // come out of ONE aggregation over the already-materialized frame — no
    // per-round exceptAll shuffle. Edge sets are canonical and distinct, so
    // equal signatures mean equal sets up to a 2^-64 xxhash64 collision.
    def signature(df: DataFrame): (Long, Long) = {
      val r = df.agg(
        count(lit(1)),
        coalesce(bit_xor(xxhash64(col("u"), col("v"))), lit(0L))).head()
      (r.getLong(0), r.getLong(1))
    }

    // Small-edge fast path: near-dup edge lists are orders of magnitude
    // smaller than the corpus by construction (they are the OUTPUT of the
    // banded LSH join, bounded by true duplicate volume) — so most real
    // corpora land here at any input scale. Below the bound (1e5 edges ~
    // 1.6 MB) a driver union-find replaces O(log^2 n) distributed rounds,
    // each a full Spark job, with ONE bounded job over the materialized
    // frame: each partition yields at most bound+1 of its 16-byte edge
    // rows (driver worst case = partitions x bound x 16 B, a few MB), so
    // the gate and the collect that the r13 shape paid two jobs for are
    // one job. A full result (no partition truncated) means the whole
    // edge multiset is on the driver; past the bound the alternating-star
    // path below runs unchanged, so a pathologically-duplicated corpus
    // degrades to the distributed algorithm rather than a driver OOM.
    val capInt = math.min(maxLocalEdges, Int.MaxValue.toLong - 1).toInt
    val capped = {
      import spark.implicits._
      edges.select(col("u"), col("v")).as[(Long, Long)]
        .mapPartitions(_.take(capInt + 1)).collect()
    }
    if (capped.length <= capInt) {
      import spark.implicits._
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      val nodes = scala.collection.mutable.TreeSet.empty[Long]
      capped.foreach { case (a, b) =>
        nodes += a; nodes += b
        val (ra, rb) = (find(a), find(b))
        // min-root union: the root of every class IS the component min,
        // matching the distributed output's cluster_id convention
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      return nodes.toSeq.map(n => (n, find(n))).toDF("node", "cluster_id")
    }

    // distributed path: restore the canonical DISTINCT edge set the
    // alternating-star rounds and the signature fixpoint assume
    edges = canon(edges).localCheckpoint()
    var cur = signature(edges)

    var converged = false
    var iter = 0
    while (!converged && iter < 50) {
      val next = smallStar(largeStar(edges)).localCheckpoint()
      val ns = signature(next)
      converged = ns == cur
      edges = next
      cur = ns
      iter += 1
    }
    // Alternating star converges in O(log^2 n) rounds, so the cap should
    // never trigger; returning non-star edges silently would emit WRONG
    // cluster ids, so fail loudly instead.
    require(converged, s"connectedComponents did not converge within $iter rounds")
    // at fixpoint every edge points directly at its component min
    edges.select(col("u").as("node"), col("v").as("cluster_id"))
      .unionAll(edges.select(col("v"), col("v")).distinct())
  }

  /**
   * All unordered member pairs (doc_a < doc_b) of each duplicate group,
   * generated distributively: explode the id lists to (key, id) rows and
   * self-join on the group key. An in-row flattened pair array would put
   * all k^2 pairs of a group into ONE record — a ~100k-member group of
   * identical docs (routine in duplicate-heavy corpora) means ~5e9 array
   * elements, past the 2 GB record limit. The join form streams pairs, and
   * AQE's skew-join split parallelizes a single hot group across tasks.
   */
  private def intraPairs(groups: DataFrame, key: String): DataFrame = {
    val m = groups
      .filter(size(col("ids")) > 1)
      .select(col(key).as("k"), explode(col("ids")).as("id"))
    m.select(col("k"), col("id").as("doc_a"))
      .join(m.select(col("k"), col("id").as("doc_b")), Seq("k"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
  }

  // --- DuckDB oracle SQL (same hash family constants, so values match) ----

  /** DuckDB replica of [[minhashLsh]] over the `documents` table. */
  /** The shingle/signature/bucket CTE prefix shared by the minhash oracle
    * replicas; the candidate-pair condition is what varies per variant. */
  private def minhashOraclePrefix(
      shingleSize: Int, bands: Int, rowsPerBand: Int,
      table: String = "documents"): String = {
    val h = bands * rowsPerBand
    val minExprs = (0 until h).map(i =>
      s"min(((shash % $FamP) * ${famA(i)} + ${famB(i)}) % $FamP) AS m$i").mkString(", ")
    val bucketStructs = (0 until bands).map { b =>
      val cat = (0 until rowsPerBand)
        .map(r => s"CAST(m${b * rowsPerBand + r} AS VARCHAR)")
        .mkString(" || '_' || ")
      s"struct_pack(band := $b, bucket := $cat)"
    }.mkString(", ")
    s"""WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS tk FROM $table),
       |sh AS (SELECT doc_id, CAST(('0x' || substr(md5(s), 1, 15)) AS BIGINT) AS shash FROM (
       |  SELECT doc_id, unnest(list_transform(range(0, greatest(len(tk) - ${shingleSize - 1}, 1)),
       |    i -> array_to_string(list_slice(tk, i + 1, i + $shingleSize), ' '))) AS s
       |  FROM toks)),
       |sigs AS (SELECT doc_id, $minExprs FROM sh GROUP BY doc_id),
       |buckets AS (SELECT doc_id, bb.band AS band, bb.bucket AS bucket FROM (
       |  SELECT doc_id, unnest([$bucketStructs]) AS bb FROM sigs)),""".stripMargin
  }

  def minhashOracleSql(
      shingleSize: Int, bands: Int, rowsPerBand: Int, threshold: Double,
      table: String = "documents"): String =
    s"""${minhashOraclePrefix(shingleSize, bands, rowsPerBand, table)}
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM buckets a JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id),
       |shs AS (SELECT doc_id, list_distinct(list(shash)) AS s FROM sh GROUP BY doc_id)
       |SELECT doc_a, doc_b, jaccard FROM (
       |  SELECT doc_a, doc_b,
       |         round(CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
       |               / CAST(len(list_distinct(list_concat(sa.s, sb.s))) AS DOUBLE), 4) AS jaccard
       |  FROM cand JOIN shs sa ON cand.doc_a = sa.doc_id JOIN shs sb ON cand.doc_b = sb.doc_id)
       |WHERE jaccard >= $threshold""".stripMargin

  /** DuckDB replica of [[minhashLshIncremental]]: `corpusPred`/`batchPred`
    * are SQL predicates over `doc_id` selecting the two sides. */
  def minhashIncrementalOracleSql(
      shingleSize: Int, bands: Int, rowsPerBand: Int, threshold: Double,
      corpusPred: String, batchPred: String): String =
    s"""${minhashOraclePrefix(shingleSize, bands, rowsPerBand)}
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM buckets a JOIN buckets b ON a.band = b.band AND a.bucket = b.bucket
       |  WHERE (${corpusPred.replace("doc_id", "a.doc_id")})
       |    AND (${batchPred.replace("doc_id", "b.doc_id")})),
       |shs AS (SELECT doc_id, list_distinct(list(shash)) AS s FROM sh GROUP BY doc_id)
       |SELECT doc_a AS corpus_id, doc_b AS batch_id, jaccard FROM (
       |  SELECT doc_a, doc_b,
       |         round(CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
       |               / CAST(len(list_distinct(list_concat(sa.s, sb.s))) AS DOUBLE), 4) AS jaccard
       |  FROM cand JOIN shs sa ON cand.doc_a = sa.doc_id JOIN shs sb ON cand.doc_b = sb.doc_id)
       |WHERE jaccard >= $threshold""".stripMargin

  /**
   * DuckDB replay of BOTH rounds of [[graft.streaming.StreamRunner
   * .streamingDedupIngest]] fed `batch1Pred` docs then `batch2Pred` docs:
   * round 1 keeps the min-id representative per intra-batch near-dup
   * component (the [[graft.ops.Curate.dedupKeep]] rule) and seeds the
   * signature index; round 2 applies the same intra-batch rule, then
   * drops every survivor near-duplicating a KEPT round-1 doc (the
   * vs-index match — replayed as the incremental pair oracle filtered to
   * both kept sides, a superset-candidates-then-filter equivalence).
   * Returns the final kept doc ids.
   */
  def ingestStreamOracleSql(
      shingleSize: Int, bands: Int, rowsPerBand: Int, threshold: Double,
      batch1Pred: String, batch2Pred: String): String = {
    def side(pred: String) = s"(SELECT * FROM documents WHERE $pred)"
    val p1 = minhashOracleSql(shingleSize, bands, rowsPerBand, threshold, side(batch1Pred))
    val p2 = minhashOracleSql(shingleSize, bands, rowsPerBand, threshold, side(batch2Pred))
    val px = minhashIncrementalOracleSql(shingleSize, bands, rowsPerBand, threshold,
      batch1Pred, batch2Pred)
    s"""WITH RECURSIVE
       |p1 AS MATERIALIZED (SELECT doc_a, doc_b FROM ($p1)),
       |e1 AS MATERIALIZED (SELECT doc_a AS u, doc_b AS v FROM p1
       |       UNION SELECT doc_b, doc_a FROM p1),
       |w1(node, r) AS (
       |  SELECT u, v FROM e1
       |  UNION
       |  SELECT w.node, e.v FROM w1 w JOIN e1 e ON w.r = e.u),
       |keep1 AS MATERIALIZED (
       |  SELECT doc_id FROM documents WHERE ($batch1Pred)
       |    AND doc_id NOT IN (SELECT node FROM w1 GROUP BY node HAVING min(r) < node)),
       |p2 AS MATERIALIZED (SELECT doc_a, doc_b FROM ($p2)),
       |e2 AS MATERIALIZED (SELECT doc_a AS u, doc_b AS v FROM p2
       |       UNION SELECT doc_b, doc_a FROM p2),
       |w2(node, r) AS (
       |  SELECT u, v FROM e2
       |  UNION
       |  SELECT w.node, e.v FROM w2 w JOIN e2 e ON w.r = e.u),
       |keep2 AS MATERIALIZED (
       |  SELECT doc_id FROM documents WHERE ($batch2Pred)
       |    AND doc_id NOT IN (SELECT node FROM w2 GROUP BY node HAVING min(r) < node)),
       |x AS MATERIALIZED (SELECT corpus_id, batch_id FROM ($px)),
       |dropx AS (
       |  SELECT DISTINCT x.batch_id FROM x
       |  JOIN keep1 k1 ON x.corpus_id = k1.doc_id
       |  JOIN keep2 k2 ON x.batch_id = k2.doc_id)
       |SELECT doc_id FROM keep1
       |UNION ALL
       |SELECT doc_id FROM keep2
       |WHERE doc_id NOT IN (SELECT batch_id FROM dropx)""".stripMargin
  }

  /**
   * DuckDB replica of [[connectedComponents]] over [[minhashLsh]] pairs on
   * the `documents` table: transitive closure by recursive CTE, cluster id
   * = min reachable node, singletons mapped to themselves.
   */
  def clustersOracleSql(
      shingleSize: Int, bands: Int, rowsPerBand: Int, threshold: Double,
      table: String = "documents"): String = {
    val pairSql = minhashOracleSql(shingleSize, bands, rowsPerBand, threshold, table)
    s"""WITH RECURSIVE
       |pairs AS MATERIALIZED (SELECT doc_a, doc_b FROM ($pairSql)),
       |edges AS MATERIALIZED (SELECT doc_a AS u, doc_b AS v FROM pairs
       |          UNION SELECT doc_b, doc_a FROM pairs),
       |walk(node, r) AS (
       |  SELECT u, v FROM edges
       |  UNION
       |  SELECT w.node, e.v FROM walk w JOIN edges e ON w.r = e.u),
       |labels AS (SELECT node, least(node, min(r)) AS cluster_id FROM walk GROUP BY node)
       |SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS cluster_id
       |FROM $table d LEFT JOIN labels l ON d.doc_id = l.node""".stripMargin
  }

  /**
   * DuckDB replica of [[Curate.dedupKeepBest]] over [[minhashLsh]] pairs
   * on the `documents` table: per transitive cluster keep the row
   * maximizing `qualityExpr` (ties to the smallest doc id); singletons
   * keep themselves.
   */
  def keepBestOracleSql(
      shingleSize: Int, bands: Int, rowsPerBand: Int, threshold: Double,
      qualityExpr: String): String = {
    val pairSql = minhashOracleSql(shingleSize, bands, rowsPerBand, threshold)
    s"""WITH RECURSIVE
       |pairs AS MATERIALIZED (SELECT doc_a, doc_b FROM ($pairSql)),
       |edges AS MATERIALIZED (SELECT doc_a AS u, doc_b AS v FROM pairs
       |          UNION SELECT doc_b, doc_a FROM pairs),
       |walk(node, r) AS (
       |  SELECT u, v FROM edges
       |  UNION
       |  SELECT w.node, e.v FROM walk w JOIN edges e ON w.r = e.u),
       |labels AS (SELECT node, least(node, min(r)) AS cluster_id FROM walk GROUP BY node),
       |cl AS (SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS cid,
       |              $qualityExpr AS q
       |       FROM documents d LEFT JOIN labels l ON d.doc_id = l.node),
       |rk AS (SELECT doc_id,
       |         row_number() OVER (PARTITION BY cid ORDER BY q DESC, doc_id ASC) AS rk
       |       FROM cl)
       |SELECT doc_id FROM rk WHERE rk = 1""".stripMargin
  }

  /** DuckDB replica of [[simhash]] over the `documents` table. */
  def simhashOracleSql(maxHamming: Int): String = {
    val nSeg = maxHamming + 1
    val segLen = SimhashBits / nSeg
    val bitSums = (0 until SimhashBits).map(i => s"sum((h >> $i) & 1) AS b$i").mkString(", ")
    val sigExpr = (0 until SimhashBits)
      .map(i => s"CASE WHEN b$i * 2 > n THEN (1::BIGINT << $i) ELSE 0 END")
      .mkString(" + ")
    val segStructs = (0 until nSeg).map(s =>
      s"struct_pack(seg := $s, segbits := (sig >> ${s * segLen}) & ${(1L << segLen) - 1})")
      .mkString(", ")
    s"""WITH toks AS (
       |  SELECT doc_id, CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h FROM (
       |    SELECT doc_id, unnest(list_distinct(string_split(lower(text), ' '))) AS tok FROM documents)),
       |votes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n, $bitSums FROM toks GROUP BY doc_id),
       |sigs AS (SELECT doc_id, $sigExpr AS sig FROM votes),
       |segs AS (SELECT doc_id, sig, sb.seg AS seg, sb.segbits AS segbits FROM (
       |  SELECT doc_id, sig, unnest([$segStructs]) AS sb FROM sigs)),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b, a.sig AS sig_a, b.sig AS sig_b
       |  FROM segs a JOIN segs b ON a.seg = b.seg AND a.segbits = b.segbits AND a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, CAST(bit_count(xor(sig_a, sig_b)) AS DOUBLE) AS hamming
       |FROM cand WHERE bit_count(xor(sig_a, sig_b)) <= $maxHamming""".stripMargin
  }
}
