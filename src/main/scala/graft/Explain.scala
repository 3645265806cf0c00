package graft

/** Dev tool: dump formatted physical plans for the headline queries plus a
  * shuffle/broadcast/codegen summary line per query, to audit that plans
  * stay scale-shaped (pushdown reaches the scan, small dims broadcast,
  * aggregates split partial/final). Usage:
  *   dev/run.sh graft.Explain [sfDir] [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.tail.toSeq else Bench.headline
    val spark = GraftSession.builder(cores = "8").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.count() // execute so AQE finalizes the plan and codegen spans exist
      val plan = df.queryExecution.executedPlan.toString
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      val broadcasts = "BroadcastExchange".r.findAllIn(plan).size
      val scans = "FileScan|BatchScan|Scan parquet".r.findAllIn(plan).size
      val codegen = "codegen id : (\\d+)".r.findAllMatchIn(formatted).map(_.group(1)).toSet.size
      println(s"==== $name  shuffles=$exchanges broadcasts=$broadcasts scans=$scans codegenSpans=$codegen")
      if (sys.env.contains("GRAFT_EXPLAIN_FULL")) {
        println(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      }
    }
    spark.stop()
  }
}
