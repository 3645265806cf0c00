package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import graft.operators.PivotOps

class PivotOpsSpec extends SparkSpec {
  import spark.implicits._

  test("perPivot groups consecutive sorted runs per key") {
    val df = Seq(("a", 1), ("b", 10), ("a", 2), ("b", 20), ("a", 3)).toDF("k", "v")
    val out = PivotOps.perPivot(df, Seq("k"),
      StructType(Seq(StructField("k", StringType), StructField("sum_v", IntegerType),
        StructField("n", IntegerType)))) { (key, rows) =>
      Iterator(Row(key.head, rows.map(_.getInt(1)).sum, rows.size))
    }
    val got = out.collect().map(r => (r.getString(0), r.getInt(1), r.getInt(2))).sortBy(_._1)
    assert(got.toSeq == Seq(("a", 6, 3), ("b", 30, 2)))
  }

  test("validateSorted passes sorted partitions and rejects unsorted ones") {
    val sorted = Seq(1, 2, 3, 4).toDF("x").coalesce(1).sortWithinPartitions("x")
    assert(graft.operators.Relational.validateSorted(sorted, Seq("x")).count() == 4)
    val unsorted = Seq(3, 1, 2).toDF("x").coalesce(1)
    val ex = intercept[org.apache.spark.SparkException] {
      graft.operators.Relational.validateSorted(unsorted, Seq("x")).count()
    }
    assert(ex.getMessage.contains("VALIDATE failed") ||
      Option(ex.getCause).exists(_.getMessage.contains("VALIDATE failed")))
  }

  test("validateSorted: non-null then NULL raises VALIDATE (not NPE); non-scalar cols rejected") {
    // nulls sort first in Spark's ascending order, so (1, null) is unsorted
    val df = Seq(Some(1), None).toDF("x").coalesce(1)
    val ex = intercept[org.apache.spark.SparkException] {
      graft.operators.Relational.validateSorted(df, Seq("x")).count()
    }
    val msg = ex.getMessage + Option(ex.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("VALIDATE failed"))
    val arr = Seq(Seq(1, 2)).toDF("a")
    val bad = intercept[IllegalArgumentException] {
      graft.operators.Relational.validateSorted(arr, Seq("a"))
    }
    assert(bad.getMessage.contains("non-orderable-scalar"))
  }

  test("collateVectors assembles sorted (coord, value) vectors") {
    val df = Seq((1L, 2, 0.5), (1L, 0, 0.1), (2L, 1, 0.9)).toDF("vid", "coord", "v")
    val out = graft.operators.Relational.collateVectors(df, "vid", "coord", "v")
      .orderBy("vid").collect()
    val v1 = out(0).getSeq[Row](1).map(r => (r.getInt(0), r.getDouble(1)))
    assert(v1 == Seq((0, 0.1), (2, 0.5)))
    assert(out(1).getSeq[Row](1).map(_.getInt(0)) == Seq(1))
  }

  test("perRowBlock applies f to fixed-size row groups") {
    val df = Seq(1, 2, 3, 4, 5).toDF("v").coalesce(1)
    val out = PivotOps.perRowBlock(df, 2,
      StructType(Seq(StructField("block_sum", IntegerType)))) { rows =>
      Iterator(Row(rows.map(_.getInt(0)).sum))
    }
    // groups of 2 within the single partition: (1,2),(3,4),(5)
    assert(out.collect().map(_.getInt(0)).sorted.toSeq == Seq(3, 5, 7))
  }
}
