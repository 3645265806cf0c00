package graft

import org.apache.spark.sql.functions._
import graft.functions.Dates

class DatesSpec extends SparkSpec {
  import spark.implicits._

  test("yyyyMMdd int bridge: roundtrip, addDays, daysBetween") {
    val df = Seq(20240131, 20231229).toDF("d")
    val out = df.select(
      Dates.dateToInt(Dates.intToDate(col("d"))).as("rt"),
      Dates.addDays(col("d"), 3).as("plus3"),
      Dates.daysBetween(lit(20240105), col("d")).as("diff")).collect()
    assert(out(0).getInt(0) == 20240131)
    assert(out(0).getInt(1) == 20240203) // month boundary
    assert(out(1).getInt(1) == 20240101) // year boundary
    assert(out(0).getInt(2) == -26 && out(1).getInt(2) == 7)
  }
}
