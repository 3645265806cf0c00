package graft.functions

import org.apache.spark.sql.types._

/** Codec between Cubert's schema strings ("INT a, STRING b, ARRAY<DOUBLE> c")
  * and Spark `StructType`, for fixture/API parity with the reference's
  * `BlockSchema(String)` constructor (reference: block/BlockSchema.java:58-78;
  * type lattice block/DataType.java:26-56).
  *
  * Type mapping per SURVEY.md §1.3: BYTE→ByteType, BOOLEAN→BooleanType,
  * INT→IntegerType, LONG→LongType, FLOAT→FloatType, DOUBLE→DoubleType,
  * STRING/ENUM→StringType, BYTES→BinaryType, MAP→MapType(String, String),
  * TUPLE/RECORD→StructType (nested, parenthesized), BAG/ARRAY→ArrayType.
  */
object SchemaCodec {

  def parse(schema: String): StructType = StructType(parseFields(schema))

  /** Render a StructType back to the Cubert schema-string form. */
  def render(schema: StructType): String =
    schema.fields.map(f => s"${renderType(f.dataType)} ${f.name}").mkString(", ")

  private def renderType(dt: DataType): String = dt match {
    case ByteType      => "BYTE"
    case BooleanType   => "BOOLEAN"
    case IntegerType   => "INT"
    case LongType      => "LONG"
    case FloatType     => "FLOAT"
    case DoubleType    => "DOUBLE"
    case StringType    => "STRING"
    case BinaryType    => "BYTES"
    case MapType(_, v, _)  => s"MAP<${renderType(v)}>"
    case ArrayType(e, _)   => s"ARRAY<${renderType(e)}>"
    case s: StructType     => s"TUPLE(${render(s)})"
    // extensions beyond Cubert's lattice, paired with parseType below so
    // render∘parse round-trips for the types Spark relations produce
    case ShortType         => "SHORT"
    case DateType          => "DATE"
    case TimestampType     => "TIMESTAMP"
    case TimestampNTZType  => "TIMESTAMP_NTZ"
    case d: DecimalType    => s"DECIMAL(${d.precision},${d.scale})"
    // loud, not simpleString.toUpperCase: emitting a string parse() itself
    // rejects would silently break the documented codec round-trip
    case other => throw new IllegalArgumentException(
      s"type ${other.simpleString} has no Cubert schema-string form")
  }

  // --- parsing ---------------------------------------------------------

  /** Split on top-level commas (not inside <> or ()). */
  private def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0
    val cur = new StringBuilder
    s.foreach {
      case c @ ('<' | '(') => depth += 1; cur += c
      case c @ ('>' | ')') => depth -= 1; cur += c
      case ',' if depth == 0 => out += cur.result().trim; cur.clear()
      case c => cur += c
    }
    val last = cur.result().trim
    if (last.nonEmpty) out += last
    out.result()
  }

  private def parseFields(s: String): Seq[StructField] =
    splitTop(s).map { part =>
      // "TYPE name" where TYPE may contain <...> or (...)
      val idx = lastTopLevelSpace(part)
      require(idx > 0, s"malformed schema field: '$part'")
      val (tpe, name) = (part.substring(0, idx).trim, part.substring(idx + 1).trim)
      StructField(name, parseType(tpe))
    }

  private def lastTopLevelSpace(s: String): Int = {
    var depth = 0
    var last = -1
    s.zipWithIndex.foreach {
      case ('<' | '(', _) => depth += 1
      case ('>' | ')', _) => depth -= 1
      case (' ', i) if depth == 0 => last = i
      case _ =>
    }
    last
  }

  private[graft] def parseType(t0: String): DataType = {
    val t = t0.trim
    val upper = t.toUpperCase
    upper match {
      case "BYTE"            => ByteType
      case "BOOLEAN" | "BOOL" => BooleanType
      case "INT" | "INTEGER" => IntegerType
      case "LONG" | "BIGINT" => LongType
      case "FLOAT"           => FloatType
      case "DOUBLE"          => DoubleType
      case "STRING" | "CHARARRAY" | "ENUM" => StringType
      case "BYTES" | "BYTEARRAY" => BinaryType
      case "SHORT" | "SMALLINT"  => ShortType
      case "DATE"                => DateType
      case "TIMESTAMP"           => TimestampType
      case "TIMESTAMP_NTZ"       => TimestampNTZType
      case _ if upper.startsWith("DECIMAL(") && upper.endsWith(")") =>
        val args = t.substring(8, t.length - 1).split(",").map(_.trim.toInt)
        require(args.length == 2, s"malformed DECIMAL type: $t")
        DecimalType(args(0), args(1))
      case "MAP"             => MapType(StringType, StringType)
      case _ if upper.startsWith("MAP<") =>
        MapType(StringType, parseType(t.substring(4, t.length - 1)))
      case _ if upper.startsWith("ARRAY<") =>
        ArrayType(parseType(t.substring(6, t.length - 1)))
      case _ if upper.startsWith("BAG<") =>
        ArrayType(parseType(t.substring(4, t.length - 1)))
      case _ if upper.startsWith("TUPLE(") || upper.startsWith("RECORD(") =>
        StructType(parseFields(t.substring(t.indexOf('(') + 1, t.length - 1)))
      case other => throw new IllegalArgumentException(s"unknown Cubert type: $other")
    }
  }
}
