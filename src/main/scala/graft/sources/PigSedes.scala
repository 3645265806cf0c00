package graft.sources

import java.io.{DataInput, DataOutput, IOException}

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** The Pig BinInterSedes wire format (Pig 0.13 — the version the reference
  * builds against), reimplemented from the published format for rubix
  * block decode/encode: every datum is a 1-byte type tag followed by a
  * type-specific payload. Compact variants (tiny/small sizes, in-byte/
  * in-short integers) shrink the common cases; the writer emits exactly
  * the variants Pig 0.13 picks so round-tripped files are byte-authentic,
  * and the reader additionally accepts the post-0.13 compact-long tags so
  * files from newer Pig stacks still decode.
  *
  * Read side returns Spark-native values: tuples as [[Row]], bags as
  * Vector, maps as Map[String, Any]; [[toSpark]] finishes the mapping
  * against the declared column type (ARRAY unwraps single-field tuples).
  */
object PigSedes {

  // type tags (org.apache.pig.data.BinInterSedes, Pig 0.13)
  private val BooleanTrue = 0
  private val BooleanFalse = 1
  private val TByte = 2
  private val TInt = 3
  private val Int0 = 4
  private val Int1 = 5
  private val IntInShort = 6
  private val IntInByte = 7
  private val TLong = 8
  private val TFloat = 9
  private val TDouble = 10
  private val ByteArray = 11
  private val SmallByteArray = 12
  private val TinyByteArray = 13
  private val CharArray = 14
  private val SmallCharArray = 15
  private val TMap = 16
  private val SmallMap = 17
  private val TinyMap = 18
  private val TTuple = 19
  private val SmallTuple = 20
  private val TinyTuple = 21
  private val TBag = 22
  private val SmallBag = 23
  private val TinyBag = 24
  private val TNull = 27
  private val DateTime = 33
  // post-0.13 compact longs — accepted on read, never written
  private val LongInByte = 34
  private val LongInShort = 35
  private val LongInInt = 36
  private val Long0 = 37
  private val Long1 = 38

  private val UnsignedByteMax = 255
  private val UnsignedShortMax = 65535

  // ---- read ---------------------------------------------------------------

  /** Decode one datum. Tuples → Row, bags → Vector[Any], maps → Map. */
  def readDatum(in: DataInput): Any = {
    val tag = in.readUnsignedByte()
    tag match {
      case BooleanTrue    => true
      case BooleanFalse   => false
      case TByte          => in.readByte()
      case TInt           => in.readInt()
      case Int0           => 0
      case Int1           => 1
      case IntInShort     => in.readShort().toInt
      case IntInByte      => in.readByte().toInt
      case TLong          => in.readLong()
      case TFloat         => in.readFloat()
      case TDouble        => in.readDouble()
      case ByteArray      => readBytes(in, in.readInt())
      case SmallByteArray => readBytes(in, in.readUnsignedShort())
      case TinyByteArray  => readBytes(in, in.readUnsignedByte())
      case CharArray      => new String(readBytes(in, in.readInt()), "UTF-8")
      case SmallCharArray => new String(readBytes(in, in.readUnsignedShort()), "UTF-8")
      case TMap           => readMap(in, in.readInt())
      case SmallMap       => readMap(in, in.readUnsignedShort())
      case TinyMap        => readMap(in, in.readUnsignedByte())
      case TTuple         => readTuple(in, in.readInt())
      case SmallTuple     => readTuple(in, in.readUnsignedShort())
      case TinyTuple      => readTuple(in, in.readUnsignedByte())
      case TBag           => readBag(in, in.readLong())
      case SmallBag       => readBag(in, in.readUnsignedShort().toLong)
      case TinyBag        => readBag(in, in.readUnsignedByte().toLong)
      case TNull          => null
      case DateTime       => val millis = in.readLong(); in.readShort(); millis
      case LongInByte     => in.readByte().toLong
      case LongInShort    => in.readShort().toLong
      case LongInInt      => in.readInt().toLong
      case Long0          => 0L
      case Long1          => 1L
      case other => throw new IOException(s"unsupported BinInterSedes tag: $other")
    }
  }

  private def readBytes(in: DataInput, n: Int): Array[Byte] = {
    val buf = new Array[Byte](n); in.readFully(buf); buf
  }
  private def readTuple(in: DataInput, n: Int): Row =
    Row.fromSeq((0 until n).map(_ => readDatum(in)))
  private def readBag(in: DataInput, n: Long): Vector[Any] =
    (0L until n).map(_ => readDatum(in)).toVector
  private def readMap(in: DataInput, n: Int): Map[String, Any] =
    (0 until n).map { _ =>
      val k = readDatum(in) match {
        case s: String => s
        case other => throw new IOException(s"map key is not chararray: $other")
      }
      k -> readDatum(in)
    }.toMap

  /** Raw decoded value → the Spark type the schema declares. */
  def toSpark(v: Any, dt: DataType): Any =
    if (v == null) null
    else (dt, v) match {
      case (st: StructType, r: Row) =>
        Row.fromSeq(st.fields.toSeq.zip(r.toSeq).map { case (f, x) => toSpark(x, f.dataType) })
      case (ArrayType(st: StructType, _), bag: Vector[_]) =>
        bag.map(toSpark(_, st))
      case (ArrayType(et, _), bag: Vector[_]) =>
        // cubert ARRAY = bag of single-field tuples; unwrap to the element
        bag.map {
          case r: Row => toSpark(r.get(0), et)
          case x      => toSpark(x, et)
        }
      case (MapType(StringType, StringType, _), m: Map[_, _]) =>
        m.map { case (k, x) => k.toString -> (if (x == null) null else x.toString) }
      case (StringType, s: String) => s
      case (LongType, i: Int)      => i.toLong // widen compact ints
      case (DoubleType, f: Float)  => f.toDouble
      case _ => v
    }

  // ---- write --------------------------------------------------------------

  /** Encode one value as the datum Pig 0.13 would write for it, guided by
    * the declared Spark type (so e.g. a long 1 still writes as LONG, the
    * tag a 0.13 reader understands, never a post-0.13 compact tag).
    */
  def writeDatum(out: DataOutput, v: Any, dt: DataType): Unit =
    if (v == null) out.writeByte(TNull)
    else dt match {
      case BooleanType => out.writeByte(if (v.asInstanceOf[Boolean]) BooleanTrue else BooleanFalse)
      case ByteType    => out.writeByte(TByte); out.writeByte(v.asInstanceOf[Byte].toInt)
      case IntegerType => writeInt(out, v.asInstanceOf[Int])
      case LongType    => out.writeByte(TLong); out.writeLong(v.asInstanceOf[Long])
      case FloatType   => out.writeByte(TFloat); out.writeFloat(v.asInstanceOf[Float])
      case DoubleType  => out.writeByte(TDouble); out.writeDouble(v.asInstanceOf[Double])
      case StringType  => writeChararray(out, v.asInstanceOf[String])
      case BinaryType =>
        val b = v.asInstanceOf[Array[Byte]]
        if (b.length < UnsignedByteMax) { out.writeByte(TinyByteArray); out.writeByte(b.length) }
        else if (b.length < UnsignedShortMax) { out.writeByte(SmallByteArray); out.writeShort(b.length) }
        else { out.writeByte(ByteArray); out.writeInt(b.length) }
        out.write(b)
      case st: StructType =>
        val r = v.asInstanceOf[Row]
        writeTupleHeader(out, st.fields.length)
        st.fields.toSeq.zipWithIndex.foreach { case (f, i) =>
          writeDatum(out, r.get(i), f.dataType) }
      case ArrayType(st: StructType, _) =>
        val bag = v.asInstanceOf[scala.collection.Seq[Any]]
        writeBagHeader(out, bag.size.toLong)
        bag.foreach(t => writeDatum(out, t, st))
      case ArrayType(et, _) =>
        // cubert ARRAY: each element wrapped in a single-field tuple
        val bag = v.asInstanceOf[scala.collection.Seq[Any]]
        writeBagHeader(out, bag.size.toLong)
        bag.foreach { e => writeTupleHeader(out, 1); writeDatum(out, e, et) }
      case MapType(StringType, StringType, _) =>
        val m = v.asInstanceOf[scala.collection.Map[String, String]]
        if (m.size < UnsignedByteMax) { out.writeByte(TinyMap); out.writeByte(m.size) }
        else if (m.size < UnsignedShortMax) { out.writeByte(SmallMap); out.writeShort(m.size) }
        else { out.writeByte(TMap); out.writeInt(m.size) }
        m.foreach { case (k, x) => writeChararray(out, k); writeDatum(out, x, StringType) }
      case other =>
        throw new IllegalArgumentException(s"cannot rubix-encode ${other.simpleString}")
    }

  private def writeInt(out: DataOutput, i: Int): Unit =
    if (i == 0) out.writeByte(Int0)
    else if (i == 1) out.writeByte(Int1)
    else if (i >= Byte.MinValue && i <= Byte.MaxValue) { out.writeByte(IntInByte); out.writeByte(i) }
    else if (i >= Short.MinValue && i <= Short.MaxValue) { out.writeByte(IntInShort); out.writeShort(i) }
    else { out.writeByte(TInt); out.writeInt(i) }

  private def writeChararray(out: DataOutput, s: String): Unit = {
    val b = s.getBytes("UTF-8")
    if (b.length < UnsignedShortMax) { out.writeByte(SmallCharArray); out.writeShort(b.length) }
    else { out.writeByte(CharArray); out.writeInt(b.length) }
    out.write(b)
  }

  private def writeTupleHeader(out: DataOutput, n: Int): Unit =
    if (n < UnsignedByteMax) { out.writeByte(TinyTuple); out.writeByte(n) }
    else if (n < UnsignedShortMax) { out.writeByte(SmallTuple); out.writeShort(n) }
    else { out.writeByte(TTuple); out.writeInt(n) }

  private def writeBagHeader(out: DataOutput, n: Long): Unit =
    if (n < UnsignedByteMax) { out.writeByte(TinyBag); out.writeByte(n.toInt) }
    else if (n < UnsignedShortMax) { out.writeByte(SmallBag); out.writeShort(n.toInt) }
    else { out.writeByte(TBag); out.writeLong(n) }
}
