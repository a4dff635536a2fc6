package graft.sources

import scala.collection.mutable

/**
 * Minimal clean-room decoder for the Smile binary JSON format (public
 * specification: github.com/FasterXML/smile-format-specification, v1.0) —
 * the binary payload variant the reference's publish endpoint accepts
 * alongside JSON (atlas-webapi PublishApi). The Spark classpath carries no
 * smile dataformat module, so the subset a publish payload can contain is
 * decoded here directly: objects, arrays, short ASCII/Unicode strings,
 * shared-name/shared-value back-references, small ints, zigzag VInt
 * 32/64-bit integers, and 7-bit-packed float32/float64.
 *
 * Out of scope (decode returns None -> the payload is dropped exactly like
 * malformed JSON in [[Publish.parse]]): BigInteger/BigDecimal, raw/7-bit
 * binary values, long (0xE0/0xE4) string segments — none of which a
 * publish payload produced by the reference client emits.
 */
private[sources] object Smile {

  sealed trait SValue
  final case class SObj(fields: List[(String, SValue)]) extends SValue
  final case class SArr(items: List[SValue]) extends SValue
  final case class SStr(s: String) extends SValue
  final case class SLong(v: Long) extends SValue
  final case class SDouble(v: Double) extends SValue
  final case class SBool(v: Boolean) extends SValue
  case object SNull extends SValue

  /** Decode one Smile document; None on malformed/unsupported input. */
  def decode(bytes: Array[Byte]): Option[SValue] =
    try {
      if (bytes.length < 4 || bytes(0) != 0x3A.toByte ||
        bytes(1) != 0x29.toByte || bytes(2) != 0x0A.toByte) None
      else {
        val flags = bytes(3) & 0xFF
        if ((flags >> 4) != 0) None // unknown version
        val p = new Parser(bytes, 4,
          sharedNames = (flags & 0x01) != 0,
          sharedValues = (flags & 0x02) != 0)
        Some(p.readValue())
      }
    } catch { case _: Exception => None }

  private final class Parser(buf: Array[Byte], var pos: Int,
      sharedNames: Boolean, sharedValues: Boolean) {

    private val names = mutable.ArrayBuffer.empty[String]
    private val values = mutable.ArrayBuffer.empty[String]

    private def next(): Int = { val b = buf(pos) & 0xFF; pos += 1; b }

    private def takeString(n: Int): String = {
      val s = new String(buf, pos, n, java.nio.charset.StandardCharsets.UTF_8)
      pos += n
      s
    }

    /** Zigzag VInt: 7 bits per byte big-endian, the LAST byte carries 6
      * bits and has its high bit set. */
    private def vlong(): Long = {
      var acc = 0L
      var b = next()
      while ((b & 0x80) == 0) { acc = (acc << 7) | b; b = next() }
      acc = (acc << 6) | (b & 0x3F)
      (acc >>> 1) ^ -(acc & 1L) // zigzag decode
    }

    /** 7-bit-packed big-endian bit string (float32: 5 bytes, float64: 10). */
    private def packed(nBytes: Int): Long = {
      var acc = 0L
      var i = 0
      while (i < nBytes) { acc = (acc << 7) | (next() & 0x7F); i += 1 }
      acc
    }

    private def sharedName(ref: Int): String = names(ref)

    private def addName(s: String): String = {
      // per spec: names of <= 64 encoded bytes enter the shared buffer,
      // which resets when full (1024)
      if (sharedNames) {
        if (names.size == 1024) names.clear()
        names += s
      }
      s
    }

    private def addValue(s: String): String = {
      if (sharedValues) {
        if (values.size == 1024) values.clear()
        values += s
      }
      s
    }

    def readValue(): SValue = {
      val tok = next()
      tok match {
        case t if t >= 0x01 && t <= 0x1F => SStr(values(t - 1)) // shared value ref
        case 0x20 => SStr("")
        case 0x21 => SNull
        case 0x22 => SBool(false)
        case 0x23 => SBool(true)
        case 0x24 => SLong(vlong()) // 32-bit int, same vint wire form
        case 0x25 => SLong(vlong()) // 64-bit int
        case 0x28 => SDouble(java.lang.Float.intBitsToFloat(packed(5).toInt).toDouble)
        case 0x29 => SDouble(java.lang.Double.longBitsToDouble(packed(10)))
        case t if t >= 0x40 && t <= 0x5F => SStr(addValue(takeString(t - 0x40 + 1)))
        case t if t >= 0x60 && t <= 0x7F => SStr(addValue(takeString(t - 0x60 + 33)))
        case t if t >= 0x80 && t <= 0x9F => SStr(addValue(takeString(t - 0x80 + 2)))
        case t if t >= 0xA0 && t <= 0xBF => SStr(addValue(takeString(t - 0xA0 + 34)))
        case t if t >= 0xC0 && t <= 0xDF => // small int, zigzag in the token
          val z = (t - 0xC0).toLong
          SLong((z >>> 1) ^ -(z & 1L))
        case 0xF8 => // array
          val items = List.newBuilder[SValue]
          while ((buf(pos) & 0xFF) != 0xF9) items += readValue()
          pos += 1
          SArr(items.result())
        case 0xFA => readObject()
        case other => throw new IllegalArgumentException(s"unsupported Smile value token 0x${other.toHexString}")
      }
    }

    private def readObject(): SObj = {
      val fields = List.newBuilder[(String, SValue)]
      var tok = next()
      while (tok != 0xFB) {
        val name = tok match {
          case 0x20 => addName("")
          case t if t >= 0x30 && t <= 0x33 => sharedName(((t & 0x03) << 8) | next())
          case t if t >= 0x40 && t <= 0x7F => sharedName(t - 0x40)
          case t if t >= 0x80 && t <= 0xBF => addName(takeString(t - 0x80 + 1))
          case t if t >= 0xC0 && t <= 0xF7 => addName(takeString(t - 0xC0 + 2))
          case other => throw new IllegalArgumentException(s"unsupported Smile key token 0x${other.toHexString}")
        }
        fields += name -> readValue()
        tok = next()
      }
      SObj(fields.result())
    }
  }

  /** Render a decoded value as compact JSON text — the transcoding step
    * that lets a Smile payload flow through the EXACT same
    * [[Publish.parse]] column pipeline (schema coercion, tag merge,
    * validation) as a JSON payload. */
  def toJson(v: SValue): String = v match {
    case SObj(fs)   => fs.map { case (k, x) => jstr(k) + ":" + toJson(x) }.mkString("{", ",", "}")
    case SArr(xs)   => xs.map(toJson).mkString("[", ",", "]")
    case SStr(s)    => jstr(s)
    case SLong(v)   => v.toString
    case SDouble(v) =>
      if (java.lang.Double.isFinite(v)) v.toString
      else "null" // JSON has no NaN/Inf literal; dropped like the JSON path
    case SBool(b)   => b.toString
    case SNull      => "null"
  }

  private def jstr(s: String): String = {
    val sb = new StringBuilder(s.length + 2)
    sb.append('"')
    s.foreach {
      case '"'           => sb.append("\\\"")
      case '\\'          => sb.append("\\\\")
      case c if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
      case c             => sb.append(c)
    }
    sb.append('"')
    sb.toString()
  }
}
