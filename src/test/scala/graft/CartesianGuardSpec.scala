package graft

import org.apache.spark.sql.functions._

/** The opt-in CartesianGuard optimizer rule: fails unconditioned large×
  * large joins at planning time, leaves equi-joins, broadcastable dims,
  * and theta joins with equality untouched, and is inert when off.
  */
class CartesianGuardSpec extends SparkSpec {
  import spark.implicits._

  private def withGuard[A](maxBytes: Long = 1024)(f: => A): A = {
    spark.conf.set("spark.graft.guard.cartesian", "true")
    spark.conf.set("spark.graft.guard.cartesian.maxBytes", maxBytes.toString)
    try f
    finally {
      spark.conf.unset("spark.graft.guard.cartesian")
      spark.conf.unset("spark.graft.guard.cartesian.maxBytes")
    }
  }

  // comfortably above a 1 KB cap on both sides
  private def big = spark.range(10000).select(col("id"), lit("x").as("pad"))

  test("unconditioned large crossJoin fails at planning time") {
    withGuard() {
      val e = intercept[Exception] {
        big.crossJoin(big.select(col("id").as("id2"))).queryExecution.optimizedPlan
      }
      def msgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
      assert(msgs(e).exists(m => m != null && m.contains("CartesianGuard")), e.toString)
    }
  }

  test("equi-joins and small-side products pass; guard off is inert") {
    withGuard() {
      // equality condition → legal however large
      assert(big.join(big.select(col("id").as("id2")),
        col("id") === col("id2")).queryExecution.optimizedPlan != null)
      // a dim×dim product under the cap → legal
      val dim = Seq(1, 2).toDF("a")
      assert(dim.crossJoin(Seq(3).toDF("b")).count() == 2)
      // theta join WITH an embedded equality → legal (the skyline shape)
      assert(big.join(big.select(col("id").as("id2")),
        col("id") === col("id2") && col("id") > 5).queryExecution.optimizedPlan != null)
    }
    // off by default: the same product plans fine
    assert(big.crossJoin(big.select(col("id").as("id2")))
      .queryExecution.optimizedPlan != null)
  }
}
