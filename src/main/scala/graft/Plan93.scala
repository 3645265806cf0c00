package graft
import org.apache.spark.sql.functions._
object Plan93 {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder(cores = "16").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries("q93_duplicate_spans")(spark, "/root/testdata/sf0.1")
    df.write.mode("overwrite").format("noop").save()
    println(df.queryExecution.executedPlan.toString.take(6000))
    spark.stop()
  }
}
