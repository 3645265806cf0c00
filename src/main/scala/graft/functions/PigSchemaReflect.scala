package graft.functions

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.types._

/** Reflective bridge to Pig's public `Schema`/`FieldSchema` surface, used
  * to type tuple/bag-returning EvalFuncs from their own declared
  * `outputSchema(inputSchema)` — the same information the reference's
  * PigEvalFuncWrapper.java:56-99 consumed. Like the rest of [[PigUdf]],
  * everything resolves by name against the user's Pig jar: no
  * compile-time Pig dependency.
  *
  * Reads `FieldSchema.alias/schema/type` field-or-method: real Pig
  * exposes them as public Java fields; a mirror (such as the test stub)
  * may expose same-named accessor methods instead.
  */
private[functions] final class PigSchemaReflect(loader: ClassLoader) {

  val schemaCls: Class[_] =
    Class.forName("org.apache.pig.impl.logicalLayer.schema.Schema", true, loader)
  private val fieldCls: Class[_] =
    Class.forName("org.apache.pig.impl.logicalLayer.schema.Schema$FieldSchema",
      true, loader)
  private val addM = schemaCls.getMethod("add", fieldCls)
  private val getFieldsM = schemaCls.getMethod("getFields")
  private val fieldCtor =
    fieldCls.getConstructor(classOf[String], schemaCls, java.lang.Byte.TYPE)

  // Pig's public type-byte constants (org.apache.pig.data.DataType) —
  // stable published API values, inlined to avoid one more class lookup.
  private val PBOOLEAN: Byte = 5
  private val PINTEGER: Byte = 10
  private val PLONG: Byte = 15
  private val PFLOAT: Byte = 20
  private val PDOUBLE: Byte = 25
  private val PBYTEARRAY: Byte = 50
  private val PCHARARRAY: Byte = 55
  private val PTUPLE: Byte = 110
  private val PBAG: Byte = 120

  private def member(obj: AnyRef, name: String): AnyRef =
    try obj.getClass.getField(name).get(obj)
    catch {
      case _: NoSuchFieldException =>
        obj.getClass.getMethod(name).invoke(obj)
    }

  private def typeByteOf(field: AnyRef): Byte =
    member(field, "type").asInstanceOf[java.lang.Byte].byteValue()

  private def aliasOf(field: AnyRef, i: Int): String =
    member(field, "alias") match {
      case s: String if s.nonEmpty => s
      case _                       => s"c$i"
    }

  private def innerOf(field: AnyRef): AnyRef = member(field, "schema")

  private def fieldsOf(schema: AnyRef): Seq[AnyRef] = {
    val list = getFieldsM.invoke(schema).asInstanceOf[java.util.List[AnyRef]]
    val b = Seq.newBuilder[AnyRef]
    val it = list.iterator()
    while (it.hasNext) b += it.next()
    b.result()
  }

  // ---------------------------------------------------------------- input

  /** Build the Pig input Schema the UDF's `outputSchema` sees, from the
    * call site's resolved child expression types (the reference resolved
    * it the same way, at plan time: PigEvalFuncWrapper.java:56-62).
    */
  def inputSchemaOf(children: Seq[Expression]): AnyRef =
    newSchema(children.zipWithIndex.map { case (c, i) =>
      pigField(s"c$i", c.dataType)
    })

  private def newSchema(fields: Seq[AnyRef]): AnyRef = {
    val s = schemaCls.getDeclaredConstructor().newInstance().asInstanceOf[AnyRef]
    fields.foreach(f => addM.invoke(s, f))
    s
  }

  private def pigField(alias: String, dt: DataType): AnyRef = dt match {
    case st: StructType =>
      fieldCtor.newInstance(alias, structSchema(st),
        java.lang.Byte.valueOf(PTUPLE)).asInstanceOf[AnyRef]
    case ArrayType(st: StructType, _) =>
      // Pig convention: a bag's schema holds one TUPLE field
      val bagSchema = newSchema(Seq(pigField("t", st)))
      fieldCtor.newInstance(alias, bagSchema,
        java.lang.Byte.valueOf(PBAG)).asInstanceOf[AnyRef]
    case other =>
      fieldCtor.newInstance(alias, null,
        java.lang.Byte.valueOf(scalarByte(other, alias)))
        .asInstanceOf[AnyRef]
  }

  private def structSchema(st: StructType): AnyRef =
    newSchema(st.fields.toSeq.map(f => pigField(f.name, f.dataType)))

  private def scalarByte(dt: DataType, where: String): Byte = dt match {
    case BooleanType => PBOOLEAN
    case IntegerType | ShortType | ByteType => PINTEGER
    case LongType    => PLONG
    case FloatType   => PFLOAT
    case DoubleType  => PDOUBLE
    case BinaryType  => PBYTEARRAY
    case StringType  => PCHARARRAY
    case other => throw new IllegalArgumentException(
      s"cannot map Spark type $other (at $where) into a Pig input schema")
  }

  // --------------------------------------------------------------- output

  /** Map the UDF's declared output Schema to a Spark type with the
    * reference's decision tree (PigEvalFuncWrapper.java:63-99): more than
    * one column → tuple of all; a single TUPLE or BAG column → descend
    * into its nested schema; a single scalar column → a one-field tuple.
    */
  def outputTypeOf(schema: AnyRef): DataType = {
    val fs = fieldsOf(schema)
    require(fs.nonEmpty, "EvalFunc outputSchema declares no fields")
    if (fs.length == 1) {
      val f = fs.head
      typeByteOf(f) match {
        case PTUPLE => structOf(innerOf(f), f)
        case PBAG   => ArrayType(bagElemType(innerOf(f), f), containsNull = true)
        case _      => StructType(Seq(toStructField(f, 0)))
      }
    } else StructType(fs.zipWithIndex.map { case (f, i) => toStructField(f, i) })
  }

  private def structOf(schema: AnyRef, owner: AnyRef): StructType = {
    require(schema != null,
      s"FieldSchema '${aliasOf(owner, 0)}' is a TUPLE with no nested schema")
    StructType(fieldsOf(schema).zipWithIndex.map { case (f, i) => toStructField(f, i) })
  }

  /** A bag's element type. Pig convention wraps the row in one TUPLE
    * field; tolerate schemas that list the row's scalar fields directly.
    */
  private def bagElemType(schema: AnyRef, owner: AnyRef): StructType = {
    require(schema != null,
      s"FieldSchema '${aliasOf(owner, 0)}' is a BAG with no nested schema")
    fieldsOf(schema) match {
      case Seq(only) if typeByteOf(only) == PTUPLE => structOf(innerOf(only), only)
      case fs => StructType(fs.zipWithIndex.map { case (f, i) => toStructField(f, i) })
    }
  }

  private def toStructField(f: AnyRef, i: Int): StructField =
    StructField(aliasOf(f, i), fieldType(f), nullable = true)

  private def fieldType(f: AnyRef): DataType = typeByteOf(f) match {
    case PBOOLEAN   => BooleanType
    case PINTEGER   => IntegerType
    case PLONG      => LongType
    case PFLOAT     => FloatType
    case PDOUBLE    => DoubleType
    case PBYTEARRAY => BinaryType
    case PCHARARRAY => StringType
    case PTUPLE     => structOf(innerOf(f), f)
    case PBAG       => ArrayType(bagElemType(innerOf(f), f), containsNull = true)
    case other => throw new IllegalArgumentException(
      s"unsupported Pig schema type byte $other in EvalFunc outputSchema")
  }
}
