package graft

import org.apache.spark.sql.functions._

import graft.similarity.Pca

/** PCA/whitening: exact eigen math on known matrices, recovered axes on
  * synthetic data, and identity covariance after whitening.
  */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("jacobiEigen solves a known symmetric matrix exactly") {
    val (vals, vecs) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    val order = vals.indices.sortBy(k => -vals(k))
    val sorted = order.map(vals).toSeq
    assert(math.abs(sorted(0) - 3.0) < 1e-12 && math.abs(sorted(1) - 1.0) < 1e-12,
      sorted.toString)
    // eigenvector for 3 is ±(1,1)/sqrt(2)
    val v0 = Array(vecs(0)(order(0)), vecs(1)(order(0)))
    assert(math.abs(math.abs(v0(0)) - math.sqrt(0.5)) < 1e-12)
    assert(math.abs(v0(0) - v0(1)) < 1e-12, "eigenvector of 3 must be the diagonal")
  }

  test("fit recovers rotated principal axes and their variances") {
    // points spread along (1,1)/sqrt2 with sd 4 and (1,-1)/sqrt2 with sd 1
    val rnd = new scala.util.Random(7)
    val pts = (0 until 2000).map { i =>
      val t = rnd.nextGaussian() * 4.0
      val s = rnd.nextGaussian() * 1.0
      val x = (t + s) / math.sqrt(2.0)
      val y = (t - s) / math.sqrt(2.0)
      (i.toLong, Seq(x.toFloat, y.toFloat))
    }
    val df = pts.toDF("vec_id", "embedding")
    val m = Pca.fit(df, dim = 2)
    assert(m.variances(0) > m.variances(1))
    assert(math.abs(m.variances(0) - 16.0) < 2.5, m.variances.toSeq.toString)
    assert(math.abs(m.variances(1) - 1.0) < 0.3, m.variances.toSeq.toString)
    // top component is ±(1,1)/sqrt2
    val c0 = m.components(0)
    assert(math.abs(math.abs(c0(0)) - math.sqrt(0.5)) < 0.05, c0.toSeq.toString)
    assert(math.abs(c0(0) - c0(1)) < 0.07, c0.toSeq.toString)
  }

  test("whitened output has ~identity covariance and zero mean") {
    val rnd = new scala.util.Random(11)
    val pts = (0 until 2000).map { i =>
      val t = rnd.nextGaussian() * 3.0
      val s = rnd.nextGaussian() * 0.5
      (i.toLong, Seq((t + s + 5.0).toFloat, (t - s - 2.0).toFloat))
    }
    val df = pts.toDF("vec_id", "embedding")
    val m = Pca.fit(df, dim = 2)
    val w = Pca.transform(df, m, k = 2, whiten = true)
      .select(element_at(col("pca"), 1).as("a"), element_at(col("pca"), 2).as("b"))
    val stats = w.agg(avg("a"), avg("b"), avg(col("a") * col("a")),
      avg(col("b") * col("b")), avg(col("a") * col("b"))).head()
    assert(math.abs(stats.getDouble(0)) < 1e-6 && math.abs(stats.getDouble(1)) < 1e-6)
    assert(math.abs(stats.getDouble(2) - 1.0) < 0.05, s"var(a)=${stats.getDouble(2)}")
    assert(math.abs(stats.getDouble(3) - 1.0) < 0.05, s"var(b)=${stats.getDouble(3)}")
    assert(math.abs(stats.getDouble(4)) < 0.05, s"cov(a,b)=${stats.getDouble(4)}")
  }

  test("fit works on the real embeddings table and projection shrinks width") {
    val emb = sf("embeddings")
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val m = Pca.fit(emb, dim)
    assert(m.variances.length == dim)
    assert(m.variances.zip(m.variances.tail).forall { case (a, b) => a >= b },
      "variances must be sorted descending")
    val proj = Pca.transform(emb, m, k = 8, whiten = true)
    assert(proj.select(size(col("pca"))).distinct().head().getInt(0) == 8)
    assert(proj.count() == emb.count())
  }

  test("fit rejects a frame with no valid vectors") {
    val bad = Seq((1L, Seq(1.0f)), (2L, null.asInstanceOf[Seq[Float]]))
      .toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] { Pca.fit(bad, dim = 2) }
    assert(e.getMessage.contains("no rows"), e.getMessage)
  }
}
