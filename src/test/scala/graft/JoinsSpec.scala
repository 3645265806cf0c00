package graft

import org.apache.spark.sql.functions._

import graft.operators.Joins

class JoinsSpec extends SparkSpec {
  import spark.implicits._

  private def li = sf("lineitem")
  private def ord = sf("orders").withColumnRenamed("o_orderkey", "l_orderkey")

  test("join-type keywords map per grammar CubertPhysical.g4:112-114") {
    assert(Joins.joinType("") == "inner")
    assert(Joins.joinType("LEFT OUTER") == "left_outer")
    assert(Joins.joinType("full") == "full_outer")
    assert(Joins.joinType("semi") == "left_semi")
  }

  test("merge join and hash join agree with each other and with key arithmetic") {
    val m = Joins.mergeJoin(li, ord, Seq("l_orderkey")).count()
    val h = Joins.hashJoin(li, ord, Seq("l_orderkey")).count()
    val r = Joins.rsJoin(li, ord, Seq("l_orderkey")).count()
    assert(m == h && h == r && m == li.count()) // every lineitem has its order
  }

  test("outer joins keep unmatched sides (MergeJoinOperator outer variants)") {
    val a = Seq((1, "a"), (2, "b")).toDF("k", "va")
    val b = Seq((2, "x"), (3, "y")).toDF("k", "vb")
    assert(Joins.mergeJoin(a, b, Seq("k"), "left").count() == 2)
    assert(Joins.mergeJoin(a, b, Seq("k"), "right").count() == 2)
    assert(Joins.mergeJoin(a, b, Seq("k"), "full").count() == 3)
    assert(Joins.semiJoin(a, b, Seq("k")).collect().map(_.getInt(0)).toSeq == Seq(2))
    assert(Joins.antiJoin(a, b, Seq("k")).collect().map(_.getInt(0)).toSeq == Seq(1))
  }

  test("hash join broadcasts the build side (HashJoinOperator.java:39)") {
    val plan = Joins.hashJoin(li, ord, Seq("l_orderkey")).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"expected broadcast join, got:\n$plan")
  }

  test("theta join supports range predicates (absent in reference, free here)") {
    val a = Seq(1, 5, 10).toDF("x")
    val b = Seq(3, 7).toDF("y")
    val out = Joins.thetaJoin(a, b, $"x" < $"y").count()
    assert(out == 3) // (1,3) (1,7) (5,7)
  }
}
