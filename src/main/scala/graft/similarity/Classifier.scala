package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Model-based quality scoring — the classifier-filter stage of modern
  * corpus curation (train a small linear model on labeled examples, score
  * the whole corpus, keep the top mass). The reference has no ML surface;
  * this is additive, expressed as the same join+aggregate dataflow as
  * [[Similarity.kmeansFit]] (reference README's stance: iterate
  * relational passes, never a driver-side data loop).
  *
  * Scale shape per GD iteration: ONE aggregation pass. The per-row residual
  * scales the feature vector; posexplode + groupBy(pos) sums component-wise
  * WITH map-side partials, so the shuffle carries (partitions × (d+1))
  * partial rows — never n × d. Weights travel as broadcast literals; the
  * plan is rebuilt from the source each iteration (O(1) lineage depth).
  * Training-set scans are the cost: `iters` passes over what is typically a
  * 10^4-10^6-row labeled sample, then ONE narrow scoring pass over the
  * 100 TB corpus.
  */
object Classifier {

  /** Sequential-fold dot product of a vector column with a constant weight
    * vector (codegen'd, no UDF): aggregate(zip_with(x, w, _*_), 0, _+_).
    */
  private def dotConst(vec: Column, w: Seq[Double]): Column =
    aggregate(
      zip_with(vec.cast("array<double>"), array(w.map(lit): _*), (a, b) => a * b),
      lit(0.0), (acc, v) => acc + v)

  /** Fit L2-regularized binary logistic regression by full-batch gradient
    * descent. `labelCol` must evaluate to 0.0/1.0. Returns (weights, bias).
    */
  def logregFit(df: DataFrame, labelCol: Column, dim: Int, iters: Int = 30,
                lr: Double = 0.5, l2: Double = 0.0,
                vecCol: String = "embedding"): (Array[Double], Double) = {
    val base = df.select(col(vecCol).cast("array<double>").as("__x"),
      labelCol.cast("double").as("__y"))
    // Fail loudly on ragged input: a null/short vector would silently
    // drop out of the posexplode gradient while still counting in n (a
    // skewed fit), and a long one would index past gradW.
    val stats = base.agg(count(lit(1)).as("n"),
      sum(when(col("__x").isNull || size(col("__x")) =!= dim, 1L)
        .otherwise(0L)).as("bad")).head()
    val n = stats.getLong(0).toDouble
    require(n > 0, "empty training set")
    require(stats.getLong(1) == 0L,
      s"${stats.getLong(1)} training rows have a null or non-$dim-wide $vecCol")
    var w = Array.fill(dim)(0.0)
    var b = 0.0
    for (_ <- 1 to iters) {
      // residual g = sigmoid(w·x + b) - y; gradient = [g · x_i per i, g]
      val g = lit(1.0) / (lit(1.0) + exp(-(dotConst(col("__x"), w.toSeq) + lit(b)))) -
        col("__y")
      val sums = base
        .select(g.as("__g"), posexplode(col("__x")).as(Seq("__i", "__v")))
        .groupBy("__i")
        .agg(sum(col("__g") * col("__v")).as("__gw"), sum("__g").as("__gb"))
        .collect()
      val gradW = Array.fill(dim)(0.0)
      sums.foreach(r => gradW(r.getInt(0)) = r.getDouble(1))
      // every component group sees every row (validated above), so any
      // single group's residual sum is the bias gradient — pin group 0
      // rather than relying on iteration order
      val gradB = sums.find(_.getInt(0) == 0).map(_.getDouble(2)).getOrElse(0.0)
      w = w.zip(gradW).map { case (wi, gi) => wi - lr * (gi / n + l2 * wi) }
      b = b - lr * (gradB / n)
    }
    (w, b)
  }

  /** Score rows with a fitted model: sigmoid(w·x + b) as `as`. One narrow
    * codegen'd pass — this is the stage that runs over the full corpus.
    */
  def score(df: DataFrame, weights: Array[Double], bias: Double,
            vecCol: String = "embedding", as: String = "quality_score"): DataFrame =
    df.withColumn(as,
      lit(1.0) / (lit(1.0) + exp(-(dotConst(col(vecCol), weights.toSeq) + lit(bias)))))

  /** One-vs-rest multiclass fit: a binary model per class (fastText-style
    * domain/quality buckets). Training cost is nClasses × logregFit over
    * the same small labeled frame; returns class -> (weights, bias).
    */
  def logregFitOvr(df: DataFrame, labelCol: Column, nClasses: Int, dim: Int,
                   iters: Int = 30, lr: Double = 0.5, l2: Double = 0.0,
                   vecCol: String = "embedding"): Map[Int, (Array[Double], Double)] =
    (0 until nClasses).map { c =>
      c -> logregFit(df, (labelCol === c).cast("int"), dim, iters, lr, l2, vecCol)
    }.toMap

  /** Multiclass scoring: argmax of the per-class sigmoid scores, ties to
    * the lowest class id. One narrow pass — the per-class score columns
    * fold into a single greatest() comparison, no shuffle.
    */
  def scoreOvr(df: DataFrame, models: Map[Int, (Array[Double], Double)],
               vecCol: String = "embedding",
               as: String = "predicted_class"): DataFrame = {
    val scored = models.toSeq.sortBy(_._1).foldLeft(df) { case (acc, (c, (w, b))) =>
      score(acc, w, b, vecCol, s"__s$c")
    }
    val best = models.keys.toSeq.sorted.map(c =>
      struct(col(s"__s$c").as("s"), lit(-c).as("negc")))
    val pick = if (best.length == 1) lit(models.keys.head)
               else -greatest(best: _*).getField("negc")
    scored
      .withColumn(as, pick)
      .drop(models.keys.toSeq.sorted.map(c => s"__s$c"): _*)
  }

  /** Train-and-score quality filter: fit on the labeled frame, score the
    * corpus, keep rows with score >= `threshold`. The labeled set is small
    * by construction; the corpus pass is one narrow map.
    */
  def qualityFilter(corpus: DataFrame, labeled: DataFrame, labelCol: Column,
                    dim: Int, threshold: Double = 0.5, iters: Int = 30,
                    vecCol: String = "embedding"): DataFrame = {
    val (w, b) = logregFit(labeled, labelCol, dim, iters, vecCol = vecCol)
    score(corpus, w, b, vecCol).filter(col("quality_score") >= threshold)
  }
}
