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

  /** Raw linear margin w·x + b (no sigmoid): the transcendental-free score
    * for oracle-replayable pipelines — the dot is a fixed index-order fold
    * of exactly-rounded ops, so an external engine reproduces it
    * bit-for-bit (the q112 discipline). Rank-equivalent to [[score]].
    */
  def linearScore(df: DataFrame, weights: Array[Double], bias: Double,
                  vecCol: String = "embedding", as: String = "margin"): DataFrame =
    df.withColumn(as, dotConst(col(vecCol), weights.toSeq) + lit(bias))

  /** Reliability-diagram bins + ECE mass for a scored, binary-labeled
    * frame — is the classifier's confidence honest? Scores must live in
    * [0, 1). Emits per bin: `n`, `hits` (positives), `acc` (= hits/n),
    * `conf` (mean score), and `ece_num` — the EXACT integer ECE numerator
    * |hits·10^9 − Σ floor(score·10^9)|, so total ECE = Σ ece_num / (N·10^9)
    * is one division of exact integers (no float summation order; the
    * distribution-drift / KMV posture). One partial-aggregating groupBy.
    */
  def calibration(df: DataFrame, scoreCol: Column, labelCol: Column,
                  nBins: Int = 10): DataFrame = {
    require(nBins >= 2, s"nBins must be >= 2: $nBins")
    val q = floor(scoreCol * lit(1000000000.0)).cast("long")
    val bin = greatest(least(floor(scoreCol * nBins), lit(nBins - 1)), lit(0))
      .cast("int")
    df.select(bin.as("bin"), labelCol.cast("long").as("__y"), q.as("__q"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n"), sum("__y").as("hits"),
        sum("__q").as("sum_qscore"))
      .withColumn("acc", col("hits").cast("double") / col("n").cast("double"))
      .withColumn("conf",
        col("sum_qscore").cast("double") / (col("n").cast("double") * lit(1e9)))
      .withColumn("ece_num",
        abs(col("hits") * lit(1000000000L) - col("sum_qscore")))
  }

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

  // ---- softmax multiclass ---------------------------------------------------

  /** Per-row softmax class probabilities for constant weights: max-shifted
    * for stability, all expression-level (codegen'd), returned as the
    * probability columns `__p0..__p{C-1}` appended to `df`.
    */
  private def withSoftmax(df: DataFrame, weights: Array[Array[Double]],
                          bias: Array[Double], vecCol: String): DataFrame = {
    val c = weights.length
    val logits = (0 until c).map(k => dotConst(col(vecCol), weights(k).toSeq) + lit(bias(k)))
    val zmax = if (c == 1) logits.head else greatest(logits: _*)
    val es = logits.map(z => exp(z - zmax))
    val denom = es.reduce(_ + _)
    es.zipWithIndex.foldLeft(df) { case (acc, (e, k)) =>
      acc.withColumn(s"__p$k", e / denom)
    }
  }

  /** Fit multinomial (softmax) logistic regression by full-batch gradient
    * descent — the proper multiclass model, vs [[logregFitOvr]]'s
    * independent binary fits (OvR trains C separate sigmoids whose scores
    * are not calibrated against each other; softmax trains one coupled
    * distribution). `labelCol` must evaluate to an integer in [0, C).
    *
    * Scale shape per iteration: ONE aggregation pass, same as
    * [[logregFit]]. Each row computes its C-vector of residuals
    * (p_k − 1[y=k]) as expressions; the feature array (with a prepended
    * pseudo-feature for the bias) explodes to d+1 rows carrying the
    * residuals, and groupBy(position) sums C products with map-side
    * partials — the shuffle carries partitions × (d+1) × C partial sums,
    * never n × d. Weights travel as broadcast literals; lineage is rebuilt
    * from the source each iteration.
    */
  def softmaxFit(df: DataFrame, labelCol: Column, nClasses: Int, dim: Int,
                 iters: Int = 30, lr: Double = 0.5, l2: Double = 0.0,
                 vecCol: String = "embedding"): (Array[Array[Double]], Array[Double]) = {
    require(nClasses >= 2, s"softmax needs >= 2 classes, got $nClasses")
    val base = df.select(col(vecCol).cast("array<double>").as("__x"),
      labelCol.cast("int").as("__y"))
    val stats = base.agg(count(lit(1)).as("n"),
      sum(when(col("__x").isNull || size(col("__x")) =!= dim ||
        col("__y").isNull || col("__y") < 0 || col("__y") >= nClasses, 1L)
        .otherwise(0L)).as("bad")).head()
    val n = stats.getLong(0).toDouble
    require(n > 0, "empty training set")
    require(stats.getLong(1) == 0L,
      s"${stats.getLong(1)} training rows have a bad label or a null/non-$dim-wide $vecCol")
    var w = Array.fill(nClasses)(Array.fill(dim)(0.0))
    var b = Array.fill(nClasses)(0.0)
    for (_ <- 1 to iters) {
      val withP = withSoftmax(base, w, b, "__x")
      val resid = array((0 until nClasses).map(k =>
        col(s"__p$k") - when(col("__y") === k, 1.0).otherwise(0.0)): _*)
      // position -1 is the bias pseudo-feature (value 1.0)
      val feats = concat(
        array(struct(lit(-1).as("i"), lit(1.0).as("v"))),
        transform(col("__x"),
          (v, i) => struct(i.cast("int").as("i"), v.as("v"))))
      val aggs = (0 until nClasses).map(k =>
        sum(element_at(col("__r"), k + 1) * col("__f").getField("v")).as(s"__g$k"))
      val sums = withP.select(resid.as("__r"), explode(feats).as("__f"))
        .groupBy(col("__f").getField("i").as("__i"))
        .agg(aggs.head, aggs.tail: _*)
        .collect()
      val gradW = Array.fill(nClasses)(Array.fill(dim)(0.0))
      val gradB = Array.fill(nClasses)(0.0)
      sums.foreach { r =>
        val i = r.getInt(0)
        (0 until nClasses).foreach { k =>
          if (i == -1) gradB(k) = r.getDouble(k + 1)
          else gradW(k)(i) = r.getDouble(k + 1)
        }
      }
      w = Array.tabulate(nClasses)(k =>
        w(k).zip(gradW(k)).map { case (wi, gi) => wi - lr * (gi / n + l2 * wi) })
      b = Array.tabulate(nClasses)(k => b(k) - lr * gradB(k) / n)
    }
    (w, b)
  }

  /** Deterministic fixture model for the BINARY logreg scoring path —
    * the [[fixtureSoftmaxModel]] discipline applied to [[score]]: weights
    * are small integers scaled by an exact binary fraction (2^-5), so an
    * external engine replaying the same sequential fold reproduces the
    * margin bit-for-bit, and the 2^-5 scale keeps 64-dim margins in
    * ±~0.5 — deep inside sigmoid's strictly-monotone, non-saturating
    * range, so `sigmoid(margin) >= 0.5 ⟺ margin >= 0` holds exactly
    * (sigmoid(0) = 0.5 and double rounding cannot cross the threshold
    * for margins of real-data magnitude).
    */
  def fixtureLogregModel(dim: Int): (Array[Double], Double) =
    (Array.tabulate(dim)(i => (((i * 29 + 7) % 11) - 5) * 0.03125), 0.03125)

  /** Deterministic integer-weight fixture model (for oracle-checked
    * multiclass scoring queries: argmax of the softmax equals argmax of
    * the logits, so the oracle replays the raw dot products — no
    * transcendentals — while the query runs the full scoring path).
    */
  def fixtureSoftmaxModel(dim: Int, nClasses: Int): (Array[Array[Double]], Array[Double]) =
    (Array.tabulate(nClasses, dim)((k, i) => (((i * 29 + k * 13) % 11) - 5).toDouble),
      Array.tabulate(nClasses)(k => (k - 1).toDouble))

  /** Deterministic fixture models for the ONE-VS-REST scoring path
    * ([[scoreOvr]]): [[fixtureLogregModel]]'s integer-times-2^-5 weights,
    * one pattern per class. The 2^-5 scale keeps every class margin in
    * sigmoid's strictly-monotone non-saturating range (integer weights
    * would saturate several classes to exactly 1.0 and turn the argmax
    * into a tie), so argmax of the per-class sigmoids equals argmax of
    * the raw margins — which an external engine replays with no
    * transcendentals (the q210/q112 discipline).
    */
  def fixtureOvrModels(dim: Int, nClasses: Int): Map[Int, (Array[Double], Double)] =
    (0 until nClasses).map { k =>
      k -> (Array.tabulate(dim)(i => (((i * 29 + k * 13) % 11) - 5) * 0.03125),
        (k - 1) * 0.03125)
    }.toMap

  /** Score with a fitted softmax model: adds per-class probability columns
    * `prob_0..prob_{C-1}` and the argmax `as` column (ties to the lowest
    * class id). One narrow codegen'd pass over the corpus.
    */
  def scoreSoftmax(df: DataFrame, weights: Array[Array[Double]], bias: Array[Double],
                   vecCol: String = "embedding",
                   as: String = "predicted_class"): DataFrame = {
    val c = weights.length
    val scored = withSoftmax(df, weights, bias, vecCol)
    val renamed = (0 until c).foldLeft(scored)((acc, k) =>
      acc.withColumnRenamed(s"__p$k", s"prob_$k"))
    renamed.withColumn(as,
      if (c == 1) lit(0) else -greatest((0 until c).map(k =>
        struct(col(s"prob_$k").as("s"), lit(-k).as("negc"))): _*).getField("negc"))
  }
}
