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
  * Coverage: scalar `exec` wraps as a variadic scalar UDF; an
  * `exec` returning a Pig `Tuple` or `DataBag` wraps as a struct- or
  * array&lt;struct&gt;-returning UDF, typed from the UDF's own
  * `outputSchema(inputSchema)` exactly the way the reference's
  * PigEvalFuncWrapper.java:56-99 honored it (the Schema walk is the same
  * decision tree: &gt;1 column → tuple of all; a single TUPLE/BAG column →
  * descend into its nested schema); the `Algebraic` interface wraps as a
  * partial-aggregating Spark UDAF ([[registerAlgebraic]]:
  * Initial→reduce, Intermed→merge — the combiner stage the reference ran
  * via CubertCombiner.java — Final→finish); the `Accumulator` interface
  * wraps as a whole-group UDAF ([[registerAccumulator]]; no combiner
  * exists in that contract).
  * Declared limits: leaf types are String/Integer/Long/Float/Double/
  * Boolean/byte[] (nested arbitrarily through tuples and bags); a
  * tuple/bag-returning UDF MUST declare a non-null `outputSchema` (there
  * is nothing else to type it from — same failure the reference hit);
  * algebraic partial tuples must carry Java-serializable scalar fields.
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

  /** Does `cls` (or an ancestor) implement the named interface? Pure name
    * matching — no compile-time Pig dependency, same posture as
    * [[isEvalFunc]].
    */
  private def implementsIface(cls: Class[_], name: String): Boolean = {
    def ifaceMatches(i: Class[_]): Boolean =
      i.getName == name || i.getInterfaces.exists(ifaceMatches)
    Iterator.iterate[Class[_]](cls)(_.getSuperclass)
      .takeWhile(_ != null)
      .exists(_.getInterfaces.exists(ifaceMatches))
  }

  /** `org.apache.pig.Algebraic` — the combiner-aware UDAF contract the
    * reference honored through its CubertCombiner (the getInitial/
    * getIntermed/getFinal stage classes).
    */
  def isAlgebraic(cls: Class[_]): Boolean =
    implementsIface(cls, "org.apache.pig.Algebraic")

  /** `org.apache.pig.Accumulator` — Pig's streaming reduce-side UDAF
    * contract (no combiner; the whole group streams through accumulate).
    */
  def isAccumulator(cls: Class[_]): Boolean =
    implementsIface(cls, "org.apache.pig.Accumulator")

  /** Instantiate `cls` (with the declaration's constant String args, the
    * Pig UDF constructor convention) and register its exec under `name`.
    */
  def register(spark: SparkSession, name: String, cls: Class[_],
               ctorArgs: Seq[String] = Nil): Unit = {
    require(isEvalFunc(cls), s"${cls.getName} does not extend org.apache.pig.EvalFunc")
    // validate class/ctor/exec EAGERLY (declaration time is where a bad
    // FUNCTION statement must fail loudly)...
    instantiate(cls, ctorArgs)
    val execRet = execMethod(cls).getReturnType
    val complex = isPigComplexType(execRet)
    // scalar returns type eagerly from the exec signature; tuple/bag
    // returns type PER CALL SITE from the UDF's own outputSchema — the
    // input schema only exists once the children are known, exactly when
    // the reference resolved it (PigEvalFuncWrapper.java:56-62)
    val scalarRet = if (complex) null else sparkType(execRet, cls.getName)
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(name,
      (children: Seq[Expression]) => {
        // one struct argument packs the call site's N columns, making the
        // registered function VARIADIC — Catalyst-level registration
        // because spark.udf.register is fixed-arity; the struct's
        // ExpressionEncoder hands the function an external Row
        val retType =
          if (complex) complexReturnType(cls, ctorArgs, children, execRet)
          else scalarRet
        // ...but capture NOTHING reflective in the closure: Method
        // handles, the TupleFactory and the EvalFunc instance are not
        // serializable, so the executor-side state rebuilds lazily per
        // JVM from the class name and args (the UDF jar is on the
        // executor classpath via REGISTER)
        val call = new PigUdfCall(cls.getName, ctorArgs,
          if (complex) Some(retType) else None, children.map(_.dataType))
        val packed = CreateStruct(children)
        val enc = ExpressionEncoder(StructType(children.zipWithIndex.map {
          case (c, i) => StructField(s"_$i", c.dataType, c.nullable) }))
        ScalaUDF(call, retType, Seq(packed), Seq(Some(enc)),
          udfName = Some(name))
      }, "scala_udf")
  }

  /** Is `c` (or an interface it carries) Pig's Tuple or DataBag? */
  private def isPigComplexType(c: Class[_]): Boolean = {
    def names(k: Class[_]): Iterator[String] =
      Iterator(k.getName) ++ k.getInterfaces.iterator.flatMap(names)
    names(c).exists(n =>
      n == "org.apache.pig.data.Tuple" || n == "org.apache.pig.data.DataBag")
  }

  private def isPigBagType(c: Class[_]): Boolean = {
    def names(k: Class[_]): Iterator[String] =
      Iterator(k.getName) ++ k.getInterfaces.iterator.flatMap(names)
    names(c).contains("org.apache.pig.data.DataBag")
  }

  /** Resolve the Spark type of a tuple/bag-returning EvalFunc at the call
    * site: build the Pig input Schema from the children's types, hand it
    * to the UDF (setInputSchema, then outputSchema — the reference's
    * exact sequence, PigEvalFuncWrapper.java:60-62), and map the declared
    * Schema through the same decision tree the reference used.
    */
  private def complexReturnType(cls: Class[_], ctorArgs: Seq[String],
                                children: Seq[Expression],
                                execRet: Class[_]): DataType = {
    val inst = instantiate(cls, ctorArgs)
    val refl = new PigSchemaReflect(cls.getClassLoader)
    val in = refl.inputSchemaOf(children)
    try cls.getMethod("setInputSchema", refl.schemaCls).invoke(inst, in)
    catch { case _: NoSuchMethodException => () } // optional in the contract
    val out = cls.getMethod("outputSchema", refl.schemaCls).invoke(inst, in)
    require(out != null,
      s"${cls.getName} returns a Pig ${execRet.getSimpleName} but declares " +
        "no outputSchema — tuple/bag returns need one to be typed")
    val dt = refl.outputTypeOf(out)
    (dt, isPigBagType(execRet)) match {
      case (_: StructType, false) | (_: ArrayType, true) => dt
      case _ => throw new IllegalArgumentException(
        s"${cls.getName}: outputSchema-derived type $dt is inconsistent " +
          s"with exec's return ${execRet.getName}")
    }
  }

  /** Register a Pig `Algebraic` UDF as a genuine partial-aggregating Spark
    * UDAF: getInitial maps onto the Aggregator's per-row `reduce` step,
    * getIntermed onto partial-state `merge` (exactly the stage the
    * reference's combiner ran — functions/PigEvalFuncWrapper.java's
    * algebraic path + CubertCombiner.java), getFinal onto `finish`. This
    * is legal for ANY conforming Algebraic: Pig's contract requires
    * Initial/Intermed/Final to compose correctly under arbitrary
    * partitionings of the input bag (combiners run 0..n times), which is
    * precisely the Aggregator laws.
    *
    * The partial state is the Tuple returned by Initial/Intermed, carried
    * between stages as its Java-serialized field array (rebuilt through
    * TupleFactory on the other side) — so partial tuples must hold
    * serializable scalar fields, which every practical algebraic partial
    * (sums, counts, min/max, (sum, count) pairs) does. The final value
    * types follow the scalar wrapper's supported set.
    *
    * Registered variadic at the Catalyst level, like the scalar wrapper:
    * the input encoder is built per call site from the children.
    */
  def registerAlgebraic(spark: SparkSession, name: String, cls: Class[_],
                        ctorArgs: Seq[String] = Nil): Unit = {
    require(isAlgebraic(cls), s"${cls.getName} does not implement org.apache.pig.Algebraic")
    // declaration-time validation: instantiate the top class, resolve the
    // three stage classes, and type the result from Final's exec
    val top = instantiate(cls, ctorArgs)
    def stage(getter: String): Class[_] = {
      val m = cls.getMethod(getter)
      val stageName = m.invoke(top).asInstanceOf[String]
      val sc = Class.forName(stageName, true, cls.getClassLoader)
      require(isEvalFunc(sc), s"${cls.getName}.$getter() = $stageName is not an EvalFunc")
      sc
    }
    stage("getInitial"); stage("getIntermed")
    val finalCls = stage("getFinal")
    val outType = sparkType(execMethod(finalCls).getReturnType, finalCls.getName)
    val agg = new PigAlgebraicAggregator(cls.getName, ctorArgs, outType)
    registerAggregator(spark, name, agg)
  }

  /** Register a Pig `Accumulator` UDF. No combiner exists in this contract
    * (that is WHY Pig UDFs implement it instead of Algebraic), so the
    * partial state is the buffered group rows themselves — the same
    * full-group bag Pig streams reduce-side — and the single accumulate/
    * getValue pass runs at finish. Use an Algebraic UDF when partial
    * aggregation matters; this path exists for migration fidelity.
    */
  def registerAccumulator(spark: SparkSession, name: String, cls: Class[_],
                          ctorArgs: Seq[String] = Nil): Unit = {
    require(isAccumulator(cls), s"${cls.getName} does not implement org.apache.pig.Accumulator")
    instantiate(cls, ctorArgs) // declaration-time validation
    val getValue = cls.getMethods.find(m =>
      m.getName == "getValue" && m.getParameterCount == 0 &&
        m.getReturnType != classOf[Object])
      .orElse(cls.getMethods.find(m => m.getName == "getValue" && m.getParameterCount == 0))
      .getOrElse(throw new IllegalArgumentException(s"${cls.getName} has no getValue()"))
    val outType = sparkType(getValue.getReturnType, cls.getName)
    val agg = new PigAccumulatorAggregator(cls.getName, ctorArgs, outType)
    registerAggregator(spark, name, agg)
  }

  /** Catalyst-level variadic registration shared by both UDAF wrappers. */
  private def registerAggregator[BUF](
      spark: SparkSession, name: String,
      agg: org.apache.spark.sql.expressions.Aggregator[Row, BUF, Any]): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(name,
      (children: Seq[Expression]) => {
        val inEnc = ExpressionEncoder(StructType(children.zipWithIndex.map {
          case (c, i) => StructField(s"_$i", c.dataType, c.nullable) }))
        val bufEnc =
          org.apache.spark.sql.catalyst.encoders.encoderFor(agg.bufferEncoder)
        org.apache.spark.sql.execution.aggregate.ScalaAggregator(
          children, agg, inEnc, bufEnc, nullable = true, isDeterministic = true,
          mutableAggBufferOffset = 0, inputAggBufferOffset = 0,
          aggregatorName = Some(name)).toAggregateExpression()
      }, "scala_udf")

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

  /** The serializable call bridge: ships only (className, ctorArgs,
    * declared return type); all reflection handles and the EvalFunc
    * instance are @transient lazy — rebuilt once per executor JVM, shared
    * across that executor's rows. When `retType` is set (tuple/bag
    * returns), the Pig result converts to Spark's external shape —
    * Tuple→Row, DataBag→Seq[Row], recursively per the declared type — so
    * ScalaUDF's catalyst converter can serialize it.
    */
  private final class PigUdfCall(className: String, ctorArgs: Seq[String],
                                 retType: Option[DataType],
                                 inputTypes: Seq[DataType])
      extends (Row => Any) with Serializable {
    @transient private lazy val cls =
      Class.forName(className, true, Thread.currentThread().getContextClassLoader)
    @transient private lazy val instance = instantiate(cls, ctorArgs)
    @transient private lazy val exec = execMethod(cls)
    @transient private lazy val tfClass =
      Class.forName("org.apache.pig.data.TupleFactory", true, cls.getClassLoader)
    @transient private lazy val factory = tfClass.getMethod("getInstance").invoke(null)
    @transient private lazy val newTuple = tfClass.getMethod("newTuple", classOf[Int])
    @transient private lazy val tupleCls =
      Class.forName("org.apache.pig.data.Tuple", true, cls.getClassLoader)
    @transient private lazy val setField =
      tupleCls.getMethod("set", classOf[Int], classOf[Object])
    @transient private lazy val getField = tupleCls.getMethod("get", classOf[Int])
    @transient private lazy val tupleSize = tupleCls.getMethod("size")
    @transient private lazy val bagIter =
      Class.forName("org.apache.pig.data.DataBag", true, cls.getClassLoader)
        .getMethod("iterator")
    @transient private lazy val bfClass =
      Class.forName("org.apache.pig.data.BagFactory", true, cls.getClassLoader)
    @transient private lazy val bagFactory = bfClass.getMethod("getInstance").invoke(null)
    @transient private lazy val newBag = bfClass.getMethod("newDefaultBag")
    @transient private lazy val bagAdd =
      Class.forName("org.apache.pig.data.DataBag", true, cls.getClassLoader)
        .getMethod("add", tupleCls)

    /** Spark external value → what a Pig UDF expects on its input tuple:
      * struct args become Pig Tuples and array&lt;struct&gt; args become
      * DataBags, recursively (the input-side mirror of [[convert]]).
      * Conversion is driven by the DECLARED column type, never the row's
      * runtime shape, so a column converts identically on every row
      * (null elements and empty bags included); scalars — and arrays of
      * scalars, which Pig has no type for — pass through as-is.
      */
    private def toPig(v: Any, dt: DataType): AnyRef =
      if (v == null) null
      else dt match {
        case st: StructType =>
          val r = v.asInstanceOf[Row]
          val t = newTuple.invoke(factory, Int.box(r.length))
          var i = 0
          while (i < r.length) {
            setField.invoke(t, Int.box(i), toPig(r.get(i), st(i).dataType)); i += 1
          }
          t
        case ArrayType(et: StructType, _) =>
          val bag = newBag.invoke(bagFactory)
          v.asInstanceOf[scala.collection.Seq[_]].foreach { e =>
            bagAdd.invoke(bag, if (e == null) null else toPig(e, et))
          }
          bag
        case _ => v.asInstanceOf[AnyRef]
      }

    override def apply(row: Row): Any = {
      val n = row.length
      val tuple = newTuple.invoke(factory, Int.box(n))
      var i = 0
      while (i < n) {
        setField.invoke(tuple, Int.box(i), toPig(row.get(i), inputTypes(i)))
        i += 1
      }
      val out = exec.invoke(instance, tuple)
      retType match {
        case Some(dt) => convert(out, dt)
        case None     => out
      }
    }

    private def convert(v: AnyRef, dt: DataType): Any =
      if (v == null) null
      else dt match {
        case st: StructType =>
          val n = tupleSize.invoke(v).asInstanceOf[java.lang.Integer].intValue()
          require(n == st.length,
            s"$className returned a ${n}-field tuple where outputSchema " +
              s"declared ${st.length} fields")
          Row.fromSeq(Seq.tabulate(n)(i =>
            convert(getField.invoke(v, Int.box(i)), st(i).dataType)))
        case ArrayType(elem, _) =>
          val it = bagIter.invoke(v).asInstanceOf[java.util.Iterator[AnyRef]]
          val b = Seq.newBuilder[Any]
          while (it.hasNext) b += convert(it.next(), elem)
          b.result()
        case _ => v
      }
  }

  /** Boxed-scalar output encoder for the UDAF wrappers, from the validated
    * Spark type of the Pig side's return.
    */
  private def outEncoder(dt: DataType): ExpressionEncoder[Any] = {
    import org.apache.spark.sql.catalyst.encoders.AgnosticEncoders._
    (dt match {
      case StringType  => ExpressionEncoder(StringEncoder)
      case IntegerType => ExpressionEncoder(BoxedIntEncoder)
      case LongType    => ExpressionEncoder(BoxedLongEncoder)
      case FloatType   => ExpressionEncoder(BoxedFloatEncoder)
      case DoubleType  => ExpressionEncoder(BoxedDoubleEncoder)
      case BooleanType => ExpressionEncoder(BoxedBooleanEncoder)
      case BinaryType  => ExpressionEncoder(BinaryEncoder)
      case other => throw new IllegalArgumentException(s"unsupported UDAF type $other")
    }).asInstanceOf[ExpressionEncoder[Any]]
  }

  /** Executor-side reflective state shared by both UDAF wrappers — like
    * [[PigUdfCall]], rebuilt lazily once per JVM from class names only.
    */
  private final class PigBagBridge(className: String) extends Serializable {
    @transient lazy val cls: Class[_] =
      Class.forName(className, true, Thread.currentThread().getContextClassLoader)
    @transient private lazy val tfClass =
      Class.forName("org.apache.pig.data.TupleFactory", true, cls.getClassLoader)
    @transient private lazy val factory = tfClass.getMethod("getInstance").invoke(null)
    @transient private lazy val newTupleM = tfClass.getMethod("newTuple", classOf[Int])
    @transient private lazy val tupleClass =
      Class.forName("org.apache.pig.data.Tuple", true, cls.getClassLoader)
    @transient private lazy val tupleSet =
      tupleClass.getMethod("set", classOf[Int], classOf[Object])
    @transient private lazy val tupleGet = tupleClass.getMethod("get", classOf[Int])
    @transient private lazy val tupleSize = tupleClass.getMethod("size")
    @transient private lazy val bfClass =
      Class.forName("org.apache.pig.data.BagFactory", true, cls.getClassLoader)
    @transient private lazy val bagFactory = bfClass.getMethod("getInstance").invoke(null)
    @transient private lazy val newBagM = bfClass.getMethod("newDefaultBag")
    @transient private lazy val bagAdd =
      Class.forName("org.apache.pig.data.DataBag", true, cls.getClassLoader)
        .getMethod("add", tupleClass)

    def newTuple(n: Int): AnyRef = newTupleM.invoke(factory, Int.box(n))

    def tupleOf(vals: Array[AnyRef]): AnyRef = {
      val t = newTuple(vals.length)
      var i = 0
      while (i < vals.length) { tupleSet.invoke(t, Int.box(i), vals(i)); i += 1 }
      t
    }

    def fieldsOf(tuple: AnyRef): Array[AnyRef] = {
      val n = tupleSize.invoke(tuple).asInstanceOf[java.lang.Integer].intValue()
      Array.tabulate[AnyRef](n)(i => tupleGet.invoke(tuple, Int.box(i)))
    }

    def rowFields(row: Row): Array[AnyRef] =
      Array.tabulate[AnyRef](row.length)(i => row.get(i).asInstanceOf[AnyRef])

    /** Pig's aggregate calling convention: a 1-field outer tuple holding a
      * DataBag of the inner tuples.
      */
    def bagTuple(inners: Seq[AnyRef]): AnyRef = {
      val bag = newBagM.invoke(bagFactory)
      inners.foreach(t => bagAdd.invoke(bag, t))
      val outer = newTuple(1)
      tupleSet.invoke(outer, Int.box(0), bag)
      outer
    }

    def ser(vals: Array[AnyRef]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val oos = new java.io.ObjectOutputStream(bos)
      oos.writeObject(vals); oos.close()
      bos.toByteArray
    }

    def deser(bytes: Array[Byte]): Array[AnyRef] = {
      val ois = new java.io.ObjectInputStream(
        new java.io.ByteArrayInputStream(bytes)) {
        override def resolveClass(d: java.io.ObjectStreamClass): Class[_] =
          Class.forName(d.getName, false, cls.getClassLoader)
      }
      try ois.readObject().asInstanceOf[Array[AnyRef]] finally ois.close()
    }
  }

  /** Spark Aggregator over a Pig Algebraic UDF: reduce = Initial (+ fold
    * into the running partial via Intermed), merge = Intermed, finish =
    * Final. Partial state travels as the Java-serialized field array of
    * the stage tuple.
    */
  private final class PigAlgebraicAggregator(className: String, ctorArgs: Seq[String],
                                             outType: DataType)
      extends org.apache.spark.sql.expressions.Aggregator[Row, Array[Byte], Any] {
    private val bridge = new PigBagBridge(className)
    @transient private lazy val top = instantiate(bridge.cls, ctorArgs)
    private def stageInstance(getter: String): (AnyRef, Method) = {
      val stageName = bridge.cls.getMethod(getter).invoke(top).asInstanceOf[String]
      val sc = Class.forName(stageName, true, bridge.cls.getClassLoader)
      // Pig instantiates stage classes with the UDF's ctor args when such
      // a constructor exists, else no-arg (the overwhelmingly common case)
      val inst =
        try instantiate(sc, ctorArgs)
        catch { case _: IllegalArgumentException | _: NoSuchMethodException =>
          instantiate(sc, Nil) }
      (inst, execMethod(sc))
    }
    @transient private lazy val (initialInst, initialExec) = stageInstance("getInitial")
    @transient private lazy val (intermedInst, intermedExec) = stageInstance("getIntermed")
    @transient private lazy val (finalInst, finalExec) = stageInstance("getFinal")

    override def zero: Array[Byte] = Array.emptyByteArray

    override def reduce(buf: Array[Byte], row: Row): Array[Byte] = {
      val init = initialExec.invoke(initialInst,
        bridge.bagTuple(Seq(bridge.tupleOf(bridge.rowFields(row)))))
      if (buf.isEmpty) bridge.ser(bridge.fieldsOf(init))
      else {
        val merged = intermedExec.invoke(intermedInst,
          bridge.bagTuple(Seq(bridge.tupleOf(bridge.deser(buf)), init)))
        bridge.ser(bridge.fieldsOf(merged))
      }
    }

    override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] =
      if (b1.isEmpty) b2
      else if (b2.isEmpty) b1
      else {
        val merged = intermedExec.invoke(intermedInst, bridge.bagTuple(Seq(
          bridge.tupleOf(bridge.deser(b1)), bridge.tupleOf(bridge.deser(b2)))))
        bridge.ser(bridge.fieldsOf(merged))
      }

    override def finish(buf: Array[Byte]): Any = {
      val partials =
        if (buf.isEmpty) Nil // empty input: Final sees an empty bag (Pig semantics)
        else Seq(bridge.tupleOf(bridge.deser(buf)))
      finalExec.invoke(finalInst, bridge.bagTuple(partials))
    }

    override def bufferEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
      ExpressionEncoder[Array[Byte]]()
    override def outputEncoder: org.apache.spark.sql.Encoder[Any] = outEncoder(outType)
  }

  /** Spark Aggregator over a Pig Accumulator UDF: the buffer is the
    * group's row-value arrays (the same full bag Pig streams reduce-side —
    * no combiner exists in this contract), and accumulate/getValue run at
    * finish. The buffer is a MUTABLE ArrayBuffer appended in place (the
    * documented Aggregator pattern, like Spark's typed collect_list): a
    * reduce that re-serialized the whole accumulated group per row would
    * be O(n²) in group size. Java-serialization only touches the buffer
    * when Spark spills or shuffles it.
    */
  private final class PigAccumulatorAggregator(className: String, ctorArgs: Seq[String],
                                               outType: DataType)
      extends org.apache.spark.sql.expressions.Aggregator[
        Row, scala.collection.mutable.ArrayBuffer[Array[AnyRef]], Any] {
    private type Buf = scala.collection.mutable.ArrayBuffer[Array[AnyRef]]
    private val bridge = new PigBagBridge(className)
    @transient private lazy val accumulateM = bridge.cls.getMethods
      .find(m => m.getName == "accumulate" && m.getParameterCount == 1).get
    @transient private lazy val getValueM = bridge.cls.getMethods
      .filter(m => m.getName == "getValue" && m.getParameterCount == 0)
      .sortBy(_.getReturnType == classOf[Object]).head
    @transient private lazy val cleanupM = bridge.cls.getMethod("cleanup")

    override def zero: Buf = scala.collection.mutable.ArrayBuffer.empty
    override def reduce(buf: Buf, row: Row): Buf = { buf += bridge.rowFields(row); buf }
    override def merge(b1: Buf, b2: Buf): Buf = { b1 ++= b2; b1 }
    override def finish(buf: Buf): Any = {
      val acc = instantiate(bridge.cls, ctorArgs) // fresh per group
      accumulateM.invoke(acc, bridge.bagTuple(buf.toSeq.map(bridge.tupleOf)))
      val v = getValueM.invoke(acc)
      cleanupM.invoke(acc)
      v
    }
    override def bufferEncoder: org.apache.spark.sql.Encoder[Buf] =
      org.apache.spark.sql.Encoders.javaSerialization[Buf]
    override def outputEncoder: org.apache.spark.sql.Encoder[Any] = outEncoder(outType)
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
