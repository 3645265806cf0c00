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
}
