package graft.sources

import java.io.{EOFException, InputStream, OutputStream}

import org.apache.spark.sql.types._

/** The reference engine's variable-length number codec, used by its COMPACT
  * rubix block serialization (io/VariableLengthEncoder.java,
  * io/CompactSerializer.java, io/CompactDeserializer.java) — flat schemas
  * only, no per-field type tags: each field is length-prefix-coded with the
  * prefix packed in unary into the leading bits after `h` header bits
  * (h = 1 for standalone ints/longs: 1 sign bit; h = 2 when a number is
  * embedded in a float/double slot: 1 marker + 1 sign bit).
  *
  * Encoding of a non-negative value: big-endian bytes with leading zeros
  * dropped; the count of extra bytes is written as that many 1-bits
  * following the header bits of the first emitted byte. Nulls: integer
  * slots use -0 (0x80); float/double slots use the 0x04 marker byte.
  * Floats/doubles with zero fraction store as compact integers (h = 2);
  * fractional ones store the raw IEEE bits after a 0x00 marker.
  */
object Vle {

  // leading-bit masks: masks(k) = k high bits set
  private val masks = Array(0x00, 0x80, 0xC0, 0xE0, 0xF0, 0xF8, 0xFC, 0xFE, 0xFF)
  private val PosZero = 0x1
  private val NegZero = 0x2
  private val NullCode = 0x4

  def supports(dt: DataType): Boolean = dt match {
    case BooleanType | ByteType | IntegerType | LongType |
         FloatType | DoubleType | StringType => true
    case _ => false
  }

  // ---- schema-driven field codec (CompactSerializer field mapping) --------

  def encodeField(out: OutputStream, v: Any, dt: DataType): Unit = dt match {
    case BooleanType =>
      if (v == null) out.write(0x80) else encodeInt(if (v.asInstanceOf[Boolean]) 1 else 0, out, 1)
    case ByteType =>
      if (v == null) out.write(0x80) else encodeInt(v.asInstanceOf[Byte].toInt, out, 1)
    case IntegerType =>
      if (v == null) out.write(0x80) else encodeInt(v.asInstanceOf[Int], out, 1)
    case LongType =>
      if (v == null) out.write(0x80) else encodeLong(v.asInstanceOf[Long], out, 1)
    case FloatType =>
      if (v == null) out.write(NullCode) else encodeFloat(v.asInstanceOf[Float], out)
    case DoubleType =>
      if (v == null) out.write(NullCode) else encodeDouble(v.asInstanceOf[Double], out)
    case StringType =>
      if (v == null) out.write(0x80)
      else {
        val b = v.asInstanceOf[String].getBytes("UTF-8")
        encodeInt(b.length, out, 1)
        out.write(b)
      }
    case other =>
      throw new IllegalArgumentException(s"COMPACT cannot encode ${other.simpleString}")
  }

  def decodeField(in: InputStream, dt: DataType): Any = dt match {
    case BooleanType => decodeInt(in) match { case null => null; case i => i.intValue != 0 }
    case ByteType    => decodeInt(in) match { case null => null; case i => i.byteValue }
    case IntegerType => decodeInt(in)
    case LongType    => decodeLong(in)
    case FloatType   => decodeFloat(in)
    case DoubleType  => decodeDouble(in)
    case StringType =>
      decodeInt(in) match {
        case null => null
        case n =>
          val buf = new Array[Byte](n.intValue)
          var read = 0
          while (read < buf.length) {
            val k = in.read(buf, read, buf.length - read)
            if (k < 0) throw new EOFException("COMPACT string truncated")
            read += k
          }
          new String(buf, "UTF-8")
      }
    case other =>
      throw new IllegalArgumentException(s"COMPACT cannot decode ${other.simpleString}")
  }

  // ---- integers -----------------------------------------------------------

  def encodeInt(v: Int, out: OutputStream, h: Int): Unit = {
    val headerBit = if (h == 2) 0x80 else 0
    var num = v
    var sign = 0
    if (num < 0) {
      require(num != Int.MinValue, "VLE cannot encode Int.MinValue (sign-magnitude)")
      num = -num; sign = if (h == 2) 0x40 else 0x80
    }
    val buf = new Array[Int](5)
    buf(1) = (num >>> 24) & 0xFF; buf(2) = (num >>> 16) & 0xFF
    buf(3) = (num >>> 8) & 0xFF; buf(4) = num & 0xFF
    var offset = 4
    var i = 1
    var done = false
    while (i <= 4 && !done) {
      if (buf(i) != 0) {
        // if the value's top bits collide with the length prefix, spill one byte left
        offset = if ((buf(i) & masks(5 - i + h)) != 0) i - 1 else i
        buf(offset) |= masks(4 - offset) >>> h
        done = true
      }
      i += 1
    }
    buf(offset) |= headerBit | sign
    var j = offset
    while (j <= 4) { out.write(buf(j)); j += 1 }
  }

  def decodeInt(in: InputStream): java.lang.Integer = {
    val first = in.read()
    if (first < 0) throw new EOFException("COMPACT int truncated")
    if (first == 0x80) null // null = negative zero
    else {
      val neg = (first & 0x80) != 0
      val v = extractInt(first, in, 1)
      if (neg) -v else v
    }
  }

  private def extractInt(first: Int, in: InputStream, h: Int): Int = {
    val len = lengthOf(first | masks(h), h, 4)
    var num = first & ~masks(math.min(len + h, 8))
    var i = 0
    while (i < len) { num = (num << 8) | nextByte(in); i += 1 }
    num
  }

  // ---- longs --------------------------------------------------------------

  def encodeLong(v: Long, out: OutputStream, h: Int): Unit = {
    val headerBit = if (h == 2) 0x80 else 0
    var num = v
    var sign = 0
    if (num < 0) {
      require(num != Long.MinValue, "VLE cannot encode Long.MinValue (sign-magnitude)")
      num = -num; sign = if (h == 2) 0x40 else 0x80
    }
    val buf = new Array[Int](10)
    var k = 0
    while (k < 8) { buf(9 - k) = ((num >>> (8 * k)) & 0xFF).toInt; k += 1 }
    var offset = 9
    // lengths needing a continuation prefix into the second byte
    if (buf(2) != 0) { buf(0) = 0xFF >>> h; buf(1) = masks(1 + h); offset = 0 }
    else if (buf(3) != 0) { buf(1) = 0xFF >>> h; buf(2) = masks(h); offset = 1 }
    else if (buf(4) != 0 && h == 2) { buf(2) = 0xFF >>> h; buf(3) = masks(1); offset = 2 }
    else {
      var i = 4
      var done = false
      while (i <= 9 && !done) {
        if (buf(i) != 0) {
          offset = if ((buf(i) & masks(10 - i + h)) != 0) i - 1 else i
          buf(offset) |= masks(9 - offset) >>> h
          done = true
        }
        i += 1
      }
    }
    buf(offset) |= headerBit | sign
    var j = offset
    while (j <= 9) { out.write(buf(j)); j += 1 }
  }

  def decodeLong(in: InputStream): java.lang.Long = {
    val first = in.read()
    if (first < 0) throw new EOFException("COMPACT long truncated")
    if (first == 0x80) null
    else {
      val neg = (first & 0x80) != 0
      val v = extractLong(first, in, 1)
      if (neg) -v else v
    }
  }

  private def extractLong(first: Int, in: InputStream, h: Int): Long = {
    val marked = first | masks(h)
    var num: Long = 0L
    var len = 0
    if (marked == 0xFF) {
      // length continues into the second byte
      val second = nextByte(in)
      len = lengthOf(second, 0, 3)
      num = (second & ~masks(len)).toLong
      len += 7 - h
    } else {
      len = lengthOf(marked, h, if (h == 2) 6 else 7)
      num = (first & ~masks(math.min(len + h, 8))).toLong
    }
    var i = 0
    while (i < len) { num = (num << 8) | nextByte(in); i += 1 }
    num
  }

  // ---- floats / doubles ---------------------------------------------------

  def encodeFloat(v: Float, out: OutputStream): Unit =
    if (v == 0.0f) out.write(if (java.lang.Float.floatToIntBits(v) == 0) PosZero else NegZero)
    // Int.MinValue has no sign-magnitude form — raw IEEE bits instead
    else if (v - v.toInt != 0 || v.toInt.toFloat != v || v.toInt == Int.MinValue) {
      val bits = java.lang.Float.floatToIntBits(v)
      out.write(0)
      out.write((bits >>> 24) & 0xFF); out.write((bits >>> 16) & 0xFF)
      out.write((bits >>> 8) & 0xFF); out.write(bits & 0xFF)
    } else encodeInt(v.toInt, out, 2)

  def decodeFloat(in: InputStream): java.lang.Float = {
    val first = in.read()
    if (first < 0) throw new EOFException("COMPACT float truncated")
    first match {
      case PosZero  => 0.0f
      case NegZero  => -0.0f
      case NullCode => null
      case 0 =>
        var bits = 0
        var i = 0
        while (i < 4) { bits = (bits << 8) | nextByte(in); i += 1 }
        java.lang.Float.intBitsToFloat(bits)
      case _ =>
        val neg = (first & 0x40) != 0
        val v = extractInt(first, in, 2)
        (if (neg) -v else v).toFloat
    }
  }

  def encodeDouble(v: Double, out: OutputStream): Unit =
    if (v == 0.0) out.write(if (java.lang.Double.doubleToLongBits(v) == 0L) PosZero else NegZero)
    // Long.MinValue has no sign-magnitude form — raw IEEE bits instead
    else if (v - v.toLong != 0 || v.toLong.toDouble != v || v.toLong == Long.MinValue) {
      val bits = java.lang.Double.doubleToLongBits(v)
      out.write(0)
      var k = 7
      while (k >= 0) { out.write(((bits >>> (8 * k)) & 0xFF).toInt); k -= 1 }
    } else encodeLong(v.toLong, out, 2)

  def decodeDouble(in: InputStream): java.lang.Double = {
    val first = in.read()
    if (first < 0) throw new EOFException("COMPACT double truncated")
    first match {
      case PosZero  => 0.0d
      case NegZero  => -0.0d
      case NullCode => null
      case 0 =>
        var bits = 0L
        var i = 0
        while (i < 8) { bits = (bits << 8) | nextByte(in); i += 1 }
        java.lang.Double.longBitsToDouble(bits)
      case _ =>
        val neg = (first & 0x40) != 0
        val v = extractLong(first, in, 2)
        (if (neg) -v else v).toDouble
    }
  }

  // ---- helpers ------------------------------------------------------------

  /** Longest run of 1-bits following `h` header bits, capped at `max`. */
  private def lengthOf(byte: Int, h: Int, max: Int): Int = {
    var len = max
    while (len > 0 && (byte & masks(len + h)) != masks(len + h)) len -= 1
    len
  }

  private def nextByte(in: InputStream): Int = {
    val b = in.read()
    if (b < 0) throw new EOFException("COMPACT value truncated")
    b
  }
}
