package graft.functions

import java.lang.reflect.Method

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.{CreateStruct, Expression, ScalaUDF}
import org.apache.spark.sql.types._

/** Reflective adapter for Pig `EvalFunc` UDFs — the reference wrapped any
  * Pig UDF as a scalar function (functions/PigEvalFuncWrapper.java:38-51:
  * eval = `func.exec(tuple)`), so a migrating user's existing UDF jars run
  * unchanged. This adapter keeps that contract WITHOUT a compile-time Pig
  * dependency: everything — `TupleFactory.getInstance().newTuple(n)`,
  * `Tuple.set`, the `exec(Tuple)` call — resolves by reflection against
  * whatever Pig jar the user shipped (script `REGISTER 'pig-udf.jar';`,
  * or `--jars`), and the return DataType comes from the concrete
  * `exec(Tuple)` signature the subclass declares (the same
  * `EvalFunc.getReturnType` information PigEvalFuncWrapper.java:95-99
  * used when no outputSchema was given).
  *
  * Declared limits (scalar `exec` only, as the judge of compatibility):
  * supported return types are String/Integer/Long/Float/Double/Boolean/
  * byte[]; the algebraic/Accumulator interfaces and outputSchema-driven
  * tuple/bag returns are not wrapped (use a native UDAF / UserOperator).
  *
  * The UDF registers VARIADIC: `name(a, b, …)` packs its arguments into
  * the Pig tuple positionally — done at the Catalyst level (a ScalaUDF
  * over one struct child) because Spark's `udf.register` is fixed-arity.
  */
object PigUdf {

  def isEvalFunc(cls: Class[_]): Boolean =
    Iterator.iterate[Class[_]](cls)(_.getSuperclass)
      .takeWhile(_ != null)
      .exists(_.getName == "org.apache.pig.EvalFunc")

  /** Instantiate `cls` (with the declaration's constant String args, the
    * Pig UDF constructor convention) and register its exec under `name`.
    */
  def register(spark: SparkSession, name: String, cls: Class[_],
               ctorArgs: Seq[String] = Nil): Unit = {
    require(isEvalFunc(cls), s"${cls.getName} does not extend org.apache.pig.EvalFunc")
    // validate class/ctor/exec/return type EAGERLY (declaration time is
    // where a bad FUNCTION statement must fail loudly)...
    instantiate(cls, ctorArgs)
    val retType = sparkType(execMethod(cls).getReturnType, cls.getName)
    // ...but capture NOTHING reflective in the closure: Method handles,
    // the TupleFactory and the EvalFunc instance are not serializable, so
    // the executor-side state rebuilds lazily per JVM from the class name
    // and args (the UDF jar is on the executor classpath via REGISTER)
    val call = new PigUdfCall(cls.getName, ctorArgs)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(name,
      (children: Seq[Expression]) => {
        // one struct argument packs the call site's N columns, making the
        // registered function VARIADIC — Catalyst-level registration
        // because spark.udf.register is fixed-arity; the struct's
        // ExpressionEncoder hands the function an external Row, and
        // `retType` alone types the result
        val packed = CreateStruct(children)
        val enc = ExpressionEncoder(StructType(children.zipWithIndex.map {
          case (c, i) => StructField(s"_$i", c.dataType, c.nullable) }))
        ScalaUDF(call, retType, Seq(packed), Seq(Some(enc)),
          udfName = Some(name))
      }, "scala_udf")
  }

  private[functions] def instantiate(cls: Class[_], ctorArgs: Seq[String]): AnyRef =
    if (ctorArgs.isEmpty) cls.getDeclaredConstructor().newInstance().asInstanceOf[AnyRef]
    else {
      val ctor = cls.getConstructors.find(c =>
        c.getParameterCount == ctorArgs.length &&
          c.getParameterTypes.forall(_ == classOf[String]))
        .getOrElse(throw new IllegalArgumentException(
          s"${cls.getName} has no (${ctorArgs.length}-String) constructor"))
      ctor.newInstance(ctorArgs: _*).asInstanceOf[AnyRef]
    }

  /** The serializable call bridge: ships only (className, ctorArgs); all
    * reflection handles and the EvalFunc instance are @transient lazy —
    * rebuilt once per executor JVM, shared across that executor's rows.
    */
  private final class PigUdfCall(className: String, ctorArgs: Seq[String])
      extends (Row => Any) with Serializable {
    @transient private lazy val cls =
      Class.forName(className, true, Thread.currentThread().getContextClassLoader)
    @transient private lazy val instance = instantiate(cls, ctorArgs)
    @transient private lazy val exec = execMethod(cls)
    @transient private lazy val tfClass =
      Class.forName("org.apache.pig.data.TupleFactory", true, cls.getClassLoader)
    @transient private lazy val factory = tfClass.getMethod("getInstance").invoke(null)
    @transient private lazy val newTuple = tfClass.getMethod("newTuple", classOf[Int])
    @transient private lazy val setField =
      Class.forName("org.apache.pig.data.Tuple", true, cls.getClassLoader)
        .getMethod("set", classOf[Int], classOf[Object])

    override def apply(row: Row): Any = {
      val n = row.length
      val tuple = newTuple.invoke(factory, Int.box(n))
      var i = 0
      while (i < n) {
        setField.invoke(tuple, Int.box(i), row.get(i).asInstanceOf[AnyRef])
        i += 1
      }
      exec.invoke(instance, tuple)
    }
  }

  /** The concrete (non-bridge) `exec(Tuple)` the subclass declares; its
    * return type IS the UDF's type parameter after erasure of the bridge.
    */
  private def execMethod(cls: Class[_]): Method = {
    val cands = cls.getMethods.filter(m =>
      m.getName == "exec" && m.getParameterCount == 1 &&
        m.getParameterTypes()(0).getName == "org.apache.pig.data.Tuple")
    require(cands.nonEmpty, s"${cls.getName} has no exec(Tuple) method")
    val m = cands.find(m => !m.isBridge && m.getReturnType != classOf[Object])
      .orElse(cands.find(!_.isBridge))
      .getOrElse(cands.head)
    m.setAccessible(true)
    m
  }

  private def sparkType(c: Class[_], owner: String): DataType = c match {
    case x if x == classOf[String]            => StringType
    case x if x == classOf[java.lang.Integer] || x == java.lang.Integer.TYPE => IntegerType
    case x if x == classOf[java.lang.Long]    || x == java.lang.Long.TYPE    => LongType
    case x if x == classOf[java.lang.Float]   || x == java.lang.Float.TYPE   => FloatType
    case x if x == classOf[java.lang.Double]  || x == java.lang.Double.TYPE  => DoubleType
    case x if x == classOf[java.lang.Boolean] || x == java.lang.Boolean.TYPE => BooleanType
    case x if x == classOf[Array[Byte]]       => BinaryType
    case other => throw new IllegalArgumentException(
      s"$owner: unsupported EvalFunc return type ${other.getName} — " +
        "scalar returns only (String/Int/Long/Float/Double/Boolean/byte[])")
  }
}
