package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (getOrCreate dedupes across
  * suites within the forked test JVM).
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  def sf(name: String): DataFrame = Tables.load(spark, "/root/testdata/sf0.001", name)
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = GraftSession.builder(appName = "graft-test", cores = "4").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
