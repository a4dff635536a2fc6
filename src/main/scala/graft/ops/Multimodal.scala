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
 * The actual codec step is STUBBED — this container has no image/audio
 * libraries — with a deterministic fake decoder, so the Spark-side contract
 * (schema, partitioning, batch iteration shape) is real and tested while the
 * codec call is a single clearly-marked function to swap out.
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

  /**
   * STUB decoder: derives deterministic fake metadata and features from the
   * payload bytes. Replace the body with a real codec (e.g. javax.imageio /
   * ffmpeg bindings) — the signature is the real contract: one media row in,
   * one decoded row out, called from inside a partition iterator.
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
        // One decoder instance per partition (real codecs are expensive to init).
        it.map { case (id, fmt, bytes) => decodeStub(id, fmt, bytes) }
      }
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
          val m = decodeStub(id, fmt, bytes)
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
}
