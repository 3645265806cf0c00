package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PCA and whitening over an embedding column — the standard pre-rotation
  * for product quantization (decorrelate/equalize dimensions so the PQ
  * subspaces carry comparable variance; the OPQ idea's first-order cousin)
  * and the classic dimensionality-reduction step before clustering.
  *
  * Scale shape: fitting is ONE distributed aggregation — the d-vector of
  * sums and the d×d Gram matrix accumulate with map-side partials (the
  * shuffle carries partitions × d² partial sums, never n × d²) — followed
  * by a driver-side cyclic-Jacobi eigendecomposition of the d×d covariance
  * (d is embedding width: 64–1024, so the d³ driver cost is microseconds to
  * seconds and independent of corpus size). Transforming is a narrow
  * codegen'd map (d² multiply-adds per row), no shuffle, exactly like
  * [[Classifier.score]]. For 100 TB corpora fit on a [[graft.operators.
  * Sampling.hashSample]] of the rows — the covariance of a deterministic
  * sample is the standard estimator — then transform everything.
  */
object Pca {

  /** Fitted model: `mean` (d), `components` (d×d orthonormal rows, sorted
    * by descending eigenvalue), `variances` (d, descending).
    */
  final case class PcaModel(mean: Array[Double], components: Array[Array[Double]],
                            variances: Array[Double])

  /** Fit PCA from the covariance of `vecCol`. Deterministic: the Gram
    * aggregation is integer-free but fixed-shape (each (i,j) cell is one
    * double sum), and the Jacobi sweep order is fixed.
    */
  def fit(df: DataFrame, dim: Int, vecCol: String = "embedding"): PcaModel = {
    val base = df.select(col(vecCol).cast("array<double>").as("__x"))
      .filter(col("__x").isNotNull && size(col("__x")) === dim)
    // one pass: n, per-dimension sums, upper-triangle Gram sums
    def arrTx(c: Column, f: (Column, Column) => Column): Column =
      org.apache.spark.sql.functions.transform(c, f)
    val pairs = base.select(explode(arrTx(col("__x"),
      (v, i) => struct(i.cast("int").as("i"), v.as("v")))).as("__e"), col("__x"))
      .select(col("__e.i").as("i"), col("__e.v").as("v"), col("__x"))
      .select(col("i"), col("v"), explode(arrTx(col("__x"),
        (u, j) => struct(j.cast("int").as("j"), u.as("u")))).as("__f"))
      .select(col("i"), col("v"), col("__f.j").as("j"), col("__f.u").as("u"))
      .filter(col("j") >= col("i")) // symmetric: accumulate the upper triangle
      .groupBy("i", "j")
      .agg(sum(col("v") * col("u")).as("g"), count(lit(1)).as("cnt"),
        sum(col("v")).as("si"), sum(col("u")).as("sj"))
      .collect()
    require(pairs.nonEmpty, s"no rows with a $dim-wide $vecCol")
    // row layout: i(0), j(1), g(2), cnt(3), si(4), sj(5)
    val n = pairs.find(r => r.getInt(0) == 0 && r.getInt(1) == 0).get.getLong(3).toDouble
    val sums = Array.fill(dim)(0.0)
    pairs.foreach { r => if (r.getInt(0) == r.getInt(1)) sums(r.getInt(0)) = r.getDouble(4) }
    val mean = sums.map(_ / n)
    val cov = Array.fill(dim)(Array.fill(dim)(0.0))
    pairs.foreach { r =>
      val (i, j, g) = (r.getInt(0), r.getInt(1), r.getDouble(2))
      val c = g / n - mean(i) * mean(j)
      cov(i)(j) = c; cov(j)(i) = c
    }
    val (vals, vecs) = jacobiEigen(cov)
    // sort descending by eigenvalue, ties by original index for determinism
    val order = vals.indices.sortBy(k => (-vals(k), k))
    val comps: Array[Array[Double]] = order.map(k => vecs.map(_(k))).toArray
    val vars: Array[Double] = order.map(vals).toArray
    PcaModel(mean, comps, vars)
  }

  /** Deterministic data-independent fixture model (for oracle-checked
    * projection queries: the corpus-scale TRANSFORM pass is what the
    * oracle exercises — fitting is covered by PcaSpec). Values are small
    * rationals from a fixed formula, identical in the SQL oracle.
    */
  def fixtureModel(dim: Int, k: Int): PcaModel = PcaModel(
    mean = Array.tabulate(dim)(i => ((i * 37) % 19 - 9) / 10.0),
    components = Array.tabulate(k, dim)((c, i) => ((i * 31 + c * 17) % 23 - 11) / 25.0),
    variances = Array.tabulate(k)(c => 4.0 - c))

  /** Cyclic Jacobi eigendecomposition of a symmetric matrix: returns
    * (eigenvalues, eigenvector matrix with eigenvectors as COLUMNS).
    * Fixed sweep order (row-major upper triangle) for determinism;
    * converges quadratically, 30 sweeps is far past double precision for
    * any realistic d.
    */
  private[graft] def jacobiEigen(a0: Array[Array[Double]],
                                 sweeps: Int = 30): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var s = 0
    var off = offDiag(a)
    while (s < sweeps && off > 1e-14) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) match {
              case 0.0 => 1.0 / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
              case sgn => sgn / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val sn = t * c
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = c * akp - sn * akq
              a(k)(q) = sn * akp + c * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = c * apk - sn * aqk
              a(q)(k) = sn * apk + c * aqk
              k += 1
            }
            k = 0
            while (k < d) {
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = c * vkp - sn * vkq
              v(k)(q) = sn * vkp + c * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      s += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    s
  }

  /** Project onto the top `k` principal components (k ≤ d): adds `outCol`
    * as a k-wide array. With `whiten = true` each component is scaled by
    * 1/sqrt(variance + eps), so the output has identity covariance — the
    * PQ/clustering-friendly form. Narrow codegen'd map, no shuffle, no UDF.
    */
  def transform(df: DataFrame, model: PcaModel, k: Int,
                whiten: Boolean = false, eps: Double = 1e-9,
                vecCol: String = "embedding",
                outCol: String = "pca"): DataFrame = {
    require(k >= 1 && k <= model.mean.length, s"k out of range: $k")
    val centered = (i: Int) => element_at(col(vecCol), i + 1).cast("double") - lit(model.mean(i))
    val comps = (0 until k).map { c =>
      val row = model.components(c)
      val proj = row.indices.map(i => lit(row(i)) * centered(i)).reduce(_ + _)
      if (whiten) proj / lit(math.sqrt(model.variances(c) + eps)) else proj
    }
    df.withColumn(outCol, array(comps: _*))
  }
}
