package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/**
 * Multimodal-column plumbing: media (image/audio/video) travels as an opaque
 * `binary` column with typed metadata, and decode / feature-extraction runs
 * as a per-partition batch transform (the Scala analog of a Pandas-UDF
 * `mapInPandas` stage: one iterator pass per partition, no per-row
 * serialization churn, trivially parallel across executors).
 *
 * The codec: real image payloads (PNG/JPEG/GIF/BMP, detected by magic
 * bytes) decode through the JDK's javax.imageio — real width/height/format
 * and an 8-bin luminance histogram as the feature vector. Anything else
 * (audio/video containers, and the text stand-ins in the testdata) falls
 * back to a deterministic STUB decoder so the Spark-side contract stays
 * testable without media libraries.
 */
object Multimodal {

  /** Decoded media metadata + a small feature vector. */
  final case class MediaFeatures(
      media_id: Long,
      format: String,
      width: Int,
      height: Int,
      n_bytes: Long,
      features: Array[Float]
  )

  /** Magic-byte sniff: the container format when the payload starts like a
    * real image, None otherwise. Cheap (no reader lookup), so attempting it
    * per row costs a few byte compares. */
  private def sniff(payload: Array[Byte]): Option[String] = {
    def b(i: Int): Int = payload(i) & 0xff
    if (payload.length >= 8 && b(0) == 0x89 && b(1) == 'P' && b(2) == 'N' && b(3) == 'G')
      Some("image/png")
    else if (payload.length >= 3 && b(0) == 0xff && b(1) == 0xd8 && b(2) == 0xff)
      Some("image/jpeg")
    else if (payload.length >= 6 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F')
      Some("image/gif")
    else if (payload.length >= 2 && b(0) == 'B' && b(1) == 'M')
      Some("image/bmp")
    else None
  }

  /**
   * Codec entry point, called from inside the partition iterators: real
   * image payloads decode via javax.imageio (in-JDK, executor-local, no
   * native deps); everything else — audio/video containers and non-media
   * payloads — takes the deterministic stub path. Features for real images
   * are the normalized 8-bin luminance histogram (Rec.601 integer weights,
   * deterministic across JVMs).
   */
  def decodeMedia(mediaId: Long, format: String, payload: Array[Byte]): MediaFeatures =
    sniff(payload) match {
      case Some(fmt) =>
        javax.imageio.ImageIO.setUseCache(false) // no executor temp-dir churn
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        if (img == null) decodeStub(mediaId, format, payload) // sniffed but unreadable
        else {
          val w = img.getWidth
          val h = img.getHeight
          val hist = new Array[Float](8)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
              hist(lum >> 5) += 1f
              x += 1
            }
            y += 1
          }
          val n = (w.toLong * h.toLong).toFloat
          MediaFeatures(mediaId, fmt, w, h, payload.length.toLong, hist.map(_ / n))
        }
      case None => decodeStub(mediaId, format, payload)
    }

  /**
   * STUB decoder for payloads with no in-JDK codec: derives deterministic
   * fake metadata and features from the payload bytes. Swapping in a real
   * audio/video codec means replacing this body — the signature is the
   * contract: one media row in, one decoded row out, called from inside a
   * partition iterator.
   *
   * The fake content hash is the 60-bit md5 prefix so the DuckDB oracle can
   * reproduce the derived metadata exactly (a rolling wrapping-multiply
   * hash has no SQL equivalent).
   */
  def decodeStub(mediaId: Long, format: String, payload: Array[Byte]): MediaFeatures = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val d = md.digest(payload)
    var h = 0L
    var i = 0
    while (i < 7) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h = (h << 4) | ((d(7) & 0xffL) >>> 4)
    val w = 64 + (h % 1024).toInt
    val ht = 64 + ((h >>> 10) % 1024).toInt
    val feat = Array.tabulate(8) { dim =>
      (((h >>> (dim * 7)) % 1000) / 500.0f) - 1.0f
    }
    MediaFeatures(mediaId, format, w, ht, payload.length.toLong, feat)
  }

  /**
   * Wrap a corpus as media rows: id + format tag + binary payload.
   * (Testdata has no real media, so documents' text bytes stand in for the
   * payload; with real data this is the parquet binary column as-is.)
   */
  def asMedia(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(
      col(idCol).as("media_id"),
      concat(lit("fake/"), substring(md5(col(textCol)), 1, 4)).as("format"),
      encode(col(textCol), "UTF-8").as("payload")
    )

  /**
   * Per-partition batch decode: the real pipeline shape. Each partition's
   * rows stream through the decoder once; output is a typed Dataset with a
   * columnar-friendly schema (scalars + array<float>).
   */
  def extractFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("media_id"), col("format"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        // One iterator pass per partition (real codecs are expensive to init).
        it.map { case (id, fmt, bytes) => decodeMedia(id, fmt, bytes) }
      }
  }

  /** 64-bit average perceptual hash (aHash) of an image payload: box-
    * average luminance onto an 8x8 grid, set bit i when cell i exceeds
    * the grid mean. Robust to resizing and re-encoding (the properties a
    * byte hash has none of); non-image payloads fall back to the stub's
    * md5-derived value so the column is total. */
  private def aHash(payload: Array[Byte]): (Long, Boolean) =
    sniff(payload) match {
      case Some(_) =>
        javax.imageio.ImageIO.setUseCache(false)
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
        if (img == null) (stubHash(payload), false)
        else {
          val w = img.getWidth
          val h = img.getHeight
          val sums = new Array[Long](64)
          val counts = new Array[Long](64)
          var y = 0
          while (y < h) {
            val cy = y * 8 / h
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val lum = (((rgb >> 16) & 0xff) * 299 + ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000
              val c = cy * 8 + x * 8 / w
              sums(c) += lum
              counts(c) += 1
              x += 1
            }
            y += 1
          }
          val cells = Array.tabulate(64)(i =>
            if (counts(i) == 0) 0.0 else sums(i).toDouble / counts(i))
          val mean = cells.sum / 64.0
          var bits = 0L
          var i = 0
          while (i < 64) { if (cells(i) > mean) bits |= (1L << i); i += 1 }
          (bits, true)
        }
      case None => (stubHash(payload), false)
    }

  /** The stub decoder's md5-prefix value, reused so non-image rows hash
    * deterministically. */
  private def stubHash(payload: Array[Byte]): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(payload)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
    h
  }

  /** Perceptual hash per media row: (media_id, phash, is_image) — the
    * zero-shuffle kernel pass [[phashPairs]] builds on. */
  def perceptualHash(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("media_id").cast("long"), col("format"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions(_.map { case (id, _, payload) =>
        val (hash, isImage) = aHash(payload)
        (id, hash, isImage)
      })
      .toDF("media_id", "phash", "is_image")
  }

  /**
   * Near-duplicate IMAGES by perceptual hash: pairs within `maxHamming`
   * bits — the multimodal analog of simhash text dedup, catching resized
   * and re-encoded copies a byte hash misses.
   *
   * Scale shape: pigeonhole blocking — the 64 bits split into
   * maxHamming+1 segments, and any pair within the bound must agree on at
   * least one whole segment, so candidates come from an EQUI-join on
   * (segment index, segment value), never a cross join; the exact
   * bit_count(xor) confirm runs on candidates only.
   */
  def phashPairs(
      media: DataFrame, maxHamming: Int = 8, imagesOnly: Boolean = true): DataFrame = {
    require(maxHamming >= 0 && maxHamming < 64, "maxHamming must be in [0, 64)")
    val nSeg = maxHamming + 1
    // imagesOnly=false widens the pass to every payload via the stub's
    // md5-derived hash — near-dup detection degrades to exact-payload
    // detection there (md5 bits are independent), which is exactly what a
    // corpus without decodable images can still support
    val all = perceptualHash(media)
    val hashed = if (imagesOnly) all.filter(col("is_image")) else all
    // collapse IDENTICAL hashes first (the [[graft.ops.Dedup]] lesson:
    // duplicate-heavy corpora put byte-identical copies in the same
    // bucket of every segment, making the self-join quadratically skewed
    // on exactly the hottest keys). One representative per distinct hash
    // joins; members expand afterwards.
    val groups = hashed
      .groupBy(col("phash"))
      .agg(collect_list(col("media_id")).as("ids"), min(col("media_id")).as("rep"))
      .localCheckpoint()
    // intra-group pairs: identical hashes, hamming 0 by definition
    val intra = groups
      .filter(size(col("ids")) > 1)
      .select(explode(col("ids")).as("media_a"), col("ids"))
      .select(col("media_a"), explode(col("ids")).as("media_b"))
      .filter(col("media_a") < col("media_b"))
      .withColumn("hamming", lit(0))
    val segs = groups.select(
      col("rep"), col("phash"), col("ids"),
      explode(array((0 until nSeg).map { s =>
        val lo = s * 64 / nSeg
        val hi = (s + 1) * 64 / nSeg
        // a full-width segment needs -1L: (1L << 64) wraps to 1 in JVM shifts
        val mask = if (hi - lo == 64) -1L else (1L << (hi - lo)) - 1L
        struct(lit(s).as("seg"),
          (shiftrightunsigned(col("phash"), lo).bitwiseAND(lit(mask))).as("v"))
      }: _*)).as("sv"))
      .select(col("rep"), col("phash"), col("ids"),
        col("sv.seg").as("seg"), col("sv.v").as("v"))
    val cross = segs.as("a")
      .join(segs.as("b"),
        col("a.seg") === col("b.seg") && col("a.v") === col("b.v") &&
          col("a.rep") < col("b.rep"))
      .select(
        col("a.ids").as("ids_a"), col("b.ids").as("ids_b"),
        bit_count(col("a.phash").bitwiseXOR(col("b.phash"))).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .dropDuplicates("ids_a", "ids_b")
      .select(explode(col("ids_a")).as("media_a"), col("ids_b"), col("hamming"))
      .select(col("media_a"), explode(col("ids_b")).as("media_b"), col("hamming"))
      .select(least(col("media_a"), col("media_b")).as("media_a"),
        greatest(col("media_a"), col("media_b")).as("media_b"), col("hamming"))
    intra.unionByName(cross)
  }

  /**
   * Resize shape: per media row, the stub-decoded dimensions scaled to fit
   * inside a target box (aspect preserved, never upscaled — the standard
   * training-data normalization). The scale metadata is real contract; the
   * pixel work would live in the decode kernel. Everything derives from the
   * md5-based stub hash, so the DuckDB oracle reproduces it exactly.
   */
  def resize(media: DataFrame, maxW: Int = 256, maxH: Int = 256): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("media_id"), col("format"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, fmt, bytes) =>
          val m = decodeMedia(id, fmt, bytes)
          val scale = math.min(1.0, math.min(maxW.toDouble / m.width, maxH.toDouble / m.height))
          val w = math.max(1, math.floor(m.width * scale).toInt)
          val h = math.max(1, math.floor(m.height * scale).toInt)
          // half-up at 4 decimals via floor(x*1e4 + 0.5): the same double
          // operations exist in DuckDB (rint would be half-even, and SQL
          // round() half-away — neither matches across engines)
          (id, m.width, m.height, w, h, math.floor(scale * 1e4 + 0.5) / 1e4)
        }
      }
      .toDF("media_id", "src_width", "src_height", "width", "height", "scale")
  }

  /** Frame-sampling shape for video-like payloads: one row per sampled
    * offset, produced without exploding the payload per frame. Chunking is
    * by decoded characters and the signature is the 60-bit md5 prefix —
    * both reproducible in the DuckDB oracle (char-based substr + md5). */
  def sampleFrames(media: DataFrame, everyNChars: Int = 64): DataFrame = {
    val txt = decode(col("payload"), "UTF-8")
    media.select(
      col("media_id"),
      posexplode(
        transform(
          sequence(lit(0), greatest(floor((length(txt) - 1) / everyNChars).cast("int"), lit(0))),
          i => conv(substring(md5(txt.substr(i * everyNChars + 1, lit(everyNChars))), 1, 15), 16, 10).cast("long")
        )
      ).as(Seq("frame_idx", "frame_sig"))
    )
  }

  /**
   * Video-style near-duplicate detection by frame-signature overlap: two
   * media items are near-dups when the JACCARD similarity of their
   * DISTINCT frame-signature sets reaches `threshold` — the standard
   * video-dedup shape (sample frames, hash each, compare as sets), which
   * catches re-encodes, trims, and concatenations that byte- or
   * whole-payload-hash dedup misses. Frames come from [[sampleFrames]]
   * (the deterministic stub signature on this corpus), so the DuckDB
   * oracle replays the pipeline end to end.
   *
   * Scale shape: an inverted-index equi-join on the frame signature —
   * candidate pairs exist ONLY where a signature is shared (never a cross
   * join), intersections are counted per pair, and set sizes join in at
   * media cardinality. Like [[graft.ops.Dedup.ngramContainment]], a
   * signature shared by df media contributes df² pair rows, and a real
   * corpus has pathological stock frames (black frame, station logo) with
   * corpus-scale df — so signatures with df > `maxSigDf` are DROPPED
   * before the join, bounding the worst signature's contribution at
   * maxSigDf²/2 rows. Unlike the containment cap, the drop applies to
   * sizes too: the jaccard is computed over each medium's INFORMATIVE
   * signature set (stop-frame removal, the standard video-dedup practice —
   * a ubiquitous frame would otherwise inflate similarity between
   * unrelated media, so removing it from numerator AND denominator is the
   * semantically right measure, not just an efficiency trade).
   * `dropped_a`/`dropped_b` report how many hot signatures each medium
   * lost; media whose EVERY signature is hot carry no discriminative
   * signal and exit the pair set entirely.
   */
  def frameNearDup(
      media: DataFrame,
      threshold: Double = 0.5,
      everyNChars: Int = 64,
      maxSigDf: Long = 10000L
  ): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, "threshold must be in (0, 1]")
    require(maxSigDf >= 2, s"maxSigDf $maxSigDf must be >= 2 (below 2 nothing can pair)")
    val all = sampleFrames(media, everyNChars)
      .select(col("media_id"), col("frame_sig")).distinct()
      // one materialization: every downstream consumer would otherwise
      // re-decode the payloads
      .localCheckpoint()
    // one sig-keyed df join-back: (media_id, frame_sig, df) is the single
    // frame everything derives from — per-media stats (informative-set
    // size + hot-frame count) come from ONE media-keyed agg, and the
    // self-join input is a filter of it (the same shape as
    // [[graft.ops.Dedup.ngramContainment]]'s gdf; a per-consumer df
    // re-aggregation costs 2 extra exchanges)
    val adf = all.join(
      all.groupBy(col("frame_sig")).agg(count(lit(1)).as("df")), Seq("frame_sig"))
    val mediaStats = adf.groupBy(col("media_id")).agg(
      sum(when(col("df") <= maxSigDf, 1L).otherwise(0L)).as("n"),
      sum(when(col("df") > maxSigDf, 1L).otherwise(0L)).as("nd"))
      .filter(col("n") > 0) // media with ONLY hot frames exit the pair set
    val kept = adf.filter(col("df") <= maxSigDf)
      .select(col("media_id"), col("frame_sig"))
    val inter = kept.as("a")
      .join(kept.as("b"),
        col("a.frame_sig") === col("b.frame_sig") &&
          col("a.media_id") < col("b.media_id"))
      .groupBy(col("a.media_id").as("media_a"), col("b.media_id").as("media_b"))
      .agg(count(lit(1)).as("common"))
    inter
      .join(mediaStats.toDF("media_a", "na", "nd_a"), Seq("media_a"))
      .join(mediaStats.toDF("media_b", "nb", "nd_b"), Seq("media_b"))
      .withColumn("jaccard",
        round(col("common") / (col("na") + col("nb") - col("common"))
          + graft.core.NanMath.RoundEps, 4))
      .filter(col("jaccard") >= threshold)
      .select(col("media_a"), col("media_b"), col("common"), col("jaccard"),
        col("nd_a").as("dropped_a"), col("nd_b").as("dropped_b"))
  }
}
