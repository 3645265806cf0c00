package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed user-defined aggregates — the Spark-native form of the reference's
  * UDAF surfaces (operator/UDAFOperatorAdapter.java:26 for GROUP BY,
  * operator/cube/EasyCubeAggregator.java:36 for CUBE). An
  * `Aggregator[IN, BUF, OUT]` registered via `functions.udaf` works in
  * groupBy, cube, rollup, grouping sets, and windows alike — Spark plans the
  * partial/final split that the reference's combiner/bridge machinery
  * hand-wired (CubertCombiner.java:53, EasyCubeAggregatorBridge.java:35).
  */
object Udafs {

  /** Day-presence bitmap over a ≤64-day window: input is the day offset
    * from the window start; offsets outside [0, 63] are ignored, matching
    * PresenceBitmapUDAF (reference: PresenceBitmapUDAF.java:23,81) and the
    * expression form Aggregations.presenceBitmap.
    */
  class PresenceBitmap extends Aggregator[java.lang.Long, Long, Long] {
    override def zero: Long = 0L
    override def reduce(buf: Long, dayOffset: java.lang.Long): Long =
      if (dayOffset == null || dayOffset < 0 || dayOffset > 63) buf
      else buf | (1L << dayOffset.toInt)
    override def merge(a: Long, b: Long): Long = a | b
    override def finish(buf: Long): Long = buf
    override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
    override def outputEncoder: Encoder[Long] = Encoders.scalaLong
  }

  /** Exact streaming-friendly mean via (count, sum) pairs — the canonical
    * EasyCubeAggregator example shape (sum+count duple in one buffer).
    */
  class MeanAgg extends Aggregator[java.lang.Double, (Long, Double), Double] {
    override def zero: (Long, Double) = (0L, 0.0)
    override def reduce(b: (Long, Double), x: java.lang.Double): (Long, Double) =
      if (x == null) b else (b._1 + 1, b._2 + x)
    override def merge(a: (Long, Double), b: (Long, Double)): (Long, Double) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(b: (Long, Double)): Double =
      if (b._1 == 0) Double.NaN else b._2 / b._1
    override def bufferEncoder: Encoder[(Long, Double)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** KMV output: how many minima the sketch holds (= exact distinct count
    * while < k) and the kth-smallest hash (-1 until the sketch is full).
    */
  case class KmvOut(n_mins: Int, kth_hash: Long)

  /** K-minimum-values distinct sketch over pre-hashed inputs: the buffer
    * is the sorted array of the k smallest DISTINCT hash values seen — at
    * most k longs, so partial-aggregate state is bounded and merges are a
    * sorted-array union. Deterministic given the hash (unlike HLL register
    * layouts, which are impl-defined), so results are oracle-checkable:
    * n < k reports the exact distinct count; otherwise the estimator
    * (k-1)·M / kth_hash applies downstream (one division — left to the
    * caller so the expression tree stays visible and portable).
    * Reference analog: the COUNT_DISTINCT family (AggregationFunctions,
    * functions/builtin/FunctionType.java:20-68) — this is its mergeable
    * fixed-memory form.
    */
  class Kmv(k: Int) extends Aggregator[java.lang.Long, Array[Long], KmvOut] {
    require(k >= 2, s"k must be >= 2: $k")
    override def zero: Array[Long] = Array.emptyLongArray
    override def reduce(buf: Array[Long], h: java.lang.Long): Array[Long] = {
      if (h == null) return buf
      val v = h.longValue()
      val i = java.util.Arrays.binarySearch(buf, v)
      if (i >= 0) buf // already present
      else {
        val ins = -i - 1
        if (buf.length < k) {
          val out = new Array[Long](buf.length + 1)
          System.arraycopy(buf, 0, out, 0, ins)
          out(ins) = v
          System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
          out
        } else if (ins < k) { // evict the current max
          val out = new Array[Long](k)
          System.arraycopy(buf, 0, out, 0, ins)
          out(ins) = v
          System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
          out
        } else buf
      }
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      if (a.isEmpty) return b
      if (b.isEmpty) return a
      val out = new Array[Long](math.min(k, a.length + b.length))
      var i = 0; var j = 0; var n = 0
      while (n < out.length && (i < a.length || j < b.length)) {
        val take =
          if (i >= a.length) { val v = b(j); j += 1; v }
          else if (j >= b.length) { val v = a(i); i += 1; v }
          else if (a(i) < b(j)) { val v = a(i); i += 1; v }
          else if (a(i) > b(j)) { val v = b(j); j += 1; v }
          else { val v = a(i); i += 1; j += 1; v } // equal: consume both
        out(n) = take; n += 1
      }
      if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    }
    override def finish(buf: Array[Long]): KmvOut =
      KmvOut(buf.length, if (buf.length == k) buf(k - 1) else -1L)
    override def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
    override def outputEncoder: Encoder[KmvOut] = Encoders.product[KmvOut]
  }

  /** Kmv variant that emits the raw sorted min-hash array instead of the
    * (n, kth) summary — the PERSISTABLE sketch form: sketch tables merge
    * by re-aggregating their unions (Sketches.kmvMerge), so per-shard /
    * per-batch sketches compose incrementally without rescanning raw keys.
    */
  class KmvMins(k: Int) extends Aggregator[java.lang.Long, Array[Long], Seq[Long]] {
    private val inner = new Kmv(k)
    override def zero: Array[Long] = inner.zero
    override def reduce(buf: Array[Long], h: java.lang.Long): Array[Long] = inner.reduce(buf, h)
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = inner.merge(a, b)
    override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
    override def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }
}
