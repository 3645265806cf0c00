package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** PIVOT — split a relation into per-key sub-blocks and run arbitrary logic
  * per block (reference: operator/PivotBlockOperator.java:62,
  * block/PivotedBlock.java:29, RowPivotedBlock.java:26). This is also the
  * USER_DEFINED_BLOCK_OPERATOR escape hatch (OperatorType.java:59-60):
  * everything declarative should use groupBy/Window instead — this exists
  * for genuinely imperative per-group logic.
  *
  * Plan shape: repartition on the pivot keys + sort within partitions, then
  * one pass per partition grouping consecutive equal-key runs — exactly the
  * reference's sorted-pivot iteration, distributed. Each run is buffered in
  * memory (a "block"), so key cardinality per group, not partition size,
  * bounds memory.
  */
object PivotOps {

  /** Apply `f(keyValues, rows)` to each pivot group; `f` returns output rows
    * conforming to `outSchema`.
    */
  def perPivot(df: DataFrame, keys: Seq[String], outSchema: StructType)(
      f: (Seq[Any], Seq[Row]) => Iterator[Row]): DataFrame = {
    val arranged = df
      .repartition(keys.map(col): _*)
      .sortWithinPartitions(keys.map(col): _*)
    val keyIdx = keys.map(arranged.schema.fieldIndex)
    arranged.mapPartitions { it =>
      val buf = it.buffered
      new Iterator[Iterator[Row]] {
        def hasNext: Boolean = buf.hasNext
        def next(): Iterator[Row] = {
          val keyVals = keyIdx.map(buf.head.get)
          val run = Seq.newBuilder[Row]
          while (buf.hasNext && keyIdx.map(buf.head.get) == keyVals) run += buf.next()
          f(keyVals, run.result())
        }
      }.flatten
    }(Encoders.row(outSchema))
  }

  /** PIVOT BY ROW n — fixed-size row blocks within each partition
    * (reference: block/RowPivotedBlock.java:26).
    */
  def perRowBlock(df: DataFrame, n: Int, outSchema: StructType)(
      f: Seq[Row] => Iterator[Row]): DataFrame =
    df.mapPartitions(_.grouped(n).flatMap(g => f(g)))(Encoders.row(outSchema))
}
