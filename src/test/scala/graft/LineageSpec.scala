package graft

import org.apache.spark.sql.functions._

import graft.operators.{CubeOps, Joins}
import graft.plans.Lineage

/** Column-level lineage over analyzed plans: projections, aggregates,
  * joins, windows, generators, and grouping sets all resolve to the
  * source-table columns that actually feed each output.
  */
class LineageSpec extends SparkSpec {

  test("projection, literal, and multi-source expression lineage") {
    val li = sf("lineitem")
    val lin = Lineage.columnLineage(li.select(
      col("l_orderkey"),
      lit(1).as("one"),
      (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue")))
    assert(lin("l_orderkey") == Set("lineitem.l_orderkey"))
    assert(lin("one") == Set.empty)
    assert(lin("revenue") == Set("lineitem.l_extendedprice", "lineitem.l_discount"))
  }

  test("aggregate and join lineage crosses tables") {
    val li = sf("lineitem"); val ord = sf("orders")
    val q = Joins.rsJoin(li, ord.withColumnRenamed("o_orderkey", "l_orderkey"),
      Seq("l_orderkey"))
      .groupBy("o_orderpriority")
      .agg(sum("l_quantity").as("sum_qty"), count(lit(1)).as("n"))
    val lin = Lineage.columnLineage(q)
    assert(lin("o_orderpriority") == Set("orders.o_orderpriority"))
    assert(lin("sum_qty") == Set("lineitem.l_quantity"))
    assert(lin("n") == Set.empty)
  }

  test("window lineage includes partition and order keys") {
    val lin = Lineage.columnLineage(graft.operators.WindowOps.rank(
      sf("lineitem"), "rnk", Seq("l_returnflag"), Seq(col("l_quantity"))))
    assert(lin("rnk") == Set("lineitem.l_returnflag", "lineitem.l_quantity"))
  }

  test("generator and grouping-set lineage") {
    val ex = sf("documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("word"))
    assert(Lineage.columnLineage(ex)("word") == Set("documents.text"))

    val cube = CubeOps.cube(sf("lineitem"), Seq("l_returnflag", "l_linestatus"),
      Seq(("SUM", col("l_quantity"), "sum_qty")))
    val lin = Lineage.columnLineage(cube)
    assert(lin("l_returnflag") == Set("lineitem.l_returnflag"))
    assert(lin("sum_qty") == Set("lineitem.l_quantity"))
  }
}
