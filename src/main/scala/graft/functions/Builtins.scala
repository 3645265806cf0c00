package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cubert's built-in scalar function surface as `Column` combinators
  * (reference: functions/builtin/FunctionType.java:20-68, factory
  * FunctionFactory.java:31). Everything delegates to codegen'd Spark
  * built-ins — no UDFs — so these stay inside whole-stage codegen.
  *
  * Arithmetic/comparison/boolean operators are native `Column` ops and need
  * no wrappers; this object covers the named functions.
  */
object Builtins {

  /** NVL(a, b) — reference: functions/builtin/Nvl.java:30. */
  def nvl(a: Column, b: Column): Column = coalesce(a, b)

  /** CASE as (cond, value) pairs with optional default —
    * reference: functions/builtin/Case.java:30, grammar CubertPhysical.g4:160.
    */
  def caseWhen(pairs: Seq[(Column, Column)], default: Option[Column] = None): Column = {
    val base = when(pairs.head._1, pairs.head._2)
    val chained = pairs.tail.foldLeft(base) { case (acc, (c, v)) => acc.when(c, v) }
    default.map(chained.otherwise).getOrElse(chained)
  }

  /** MATCHES(s, regex) — the reference compiles to dk.brics.automaton for
    * speed (functions/builtin/Match.java:37); Spark's codegen'd `rlike` is
    * the modern equivalent.
    */
  def matches(c: Column, regex: String): Column = c.rlike(regex)

  /** CONCAT — reference: functions/builtin/Concat.java:34. */
  def concatAll(cols: Column*): Column = concat(cols: _*)

  /** SIZEOF over array/map/string — reference: functions/builtin/Sizeof.java:33. */
  def sizeof(c: Column): Column = size(c)

  /** UNIQUEID — unique long per row (reference: functions/builtin/UniqueId.java:32,
    * which combines task id + counter; `monotonically_increasing_id` is the
    * partition-id + offset analog).
    */
  def uniqueId(): Column = monotonically_increasing_id()

  /** SEQNO — sequential number within the partition ("block"), 1-based
    * (reference: functions/builtin/SeqNo.java:34 counts per task).
    */
  def seqNo(): Column =
    expr("row_number() over (partition by spark_partition_id() order by monotonically_increasing_id())")

  /** Typecasts — reference: functions/builtin/Typecast.java:30. */
  def castToInt(c: Column): Column = c.cast("int")
  def castToLong(c: Column): Column = c.cast("long")
  def castToFloat(c: Column): Column = c.cast("float")
  def castToDouble(c: Column): Column = c.cast("double")
  def castToString(c: Column): Column = c.cast("string")

  /** TOBYTEARRAY — reference: functions/builtin/ToByteArray.java:32. */
  def toByteArray(c: Column): Column = encode(c, "UTF-8")

  /** Map projection `m#"key"` — grammar CubertPhysical.g4:178-179. */
  def mapGet(m: Column, key: String): Column = m(key)

  /** Bit shifts (LSHIFT/RSHIFT) — reference: functions/builtin/ArithmeticFunction.java:43. */
  def lshift(c: Column, n: Int): Column = shiftleft(c, n)
  def rshift(c: Column, n: Int): Column = shiftright(c, n)
}
