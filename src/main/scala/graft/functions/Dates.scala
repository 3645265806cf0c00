package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cubert models dates as `yyyyMMdd` ints/longs (reference:
  * utils/DateTimeUtilities.java:25 — Joda-based; used by the incremental
  * rewriters for time-partitioned facts). These helpers bridge that
  * convention to Spark's native DateType, so time-partitioned workloads can
  * keep int-date columns while using real date arithmetic.
  */
object Dates {

  /** DateType/TimestampType column → yyyyMMdd int. */
  def dateToInt(c: Column): Column =
    (year(c) * 10000 + month(c) * 100 + dayofmonth(c)).cast("int")

  /** yyyyMMdd int column → DateType. */
  def intToDate(c: Column): Column =
    to_date(c.cast("string"), "yyyyMMdd")

  /** Add n days to a yyyyMMdd int, returning yyyyMMdd int. */
  def addDays(c: Column, n: Int): Column =
    dateToInt(date_add(intToDate(c), n))

  /** Whole-day difference between two yyyyMMdd ints (a - b). */
  def daysBetween(a: Column, b: Column): Column =
    datediff(intToDate(a), intToDate(b))
}
