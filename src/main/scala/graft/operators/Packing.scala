package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Sequence packing for LLM training pipelines: assign documents to
  * fixed-capacity "packs" (context windows) greedily in a deterministic
  * order, so short documents share a window instead of wasting padding.
  *
  * Algorithm: within each group (e.g. language or shard), scan rows in
  * `orderCol` order keeping a running token total; when adding the next row
  * would exceed `capacity`, close the pack and open a new one. A single row
  * larger than `capacity` gets a pack of its own (it is up to the caller to
  * pre-chunk oversized documents).
  *
  * Scale shape: one shuffle — `repartition(group)` +
  * `sortWithinPartitions(group, order)` — then a streaming single pass per
  * partition (mapPartitions holds only the running counters, O(1) state, no
  * materialization). Packing is inherently sequential *within* a group, so
  * parallelism = number of groups; at 100 TB the caller shards each group
  * first (e.g. group = (lang, pmod(hash(id), 1024))) and packs shards
  * independently — padding loss grows only by O(1) window per shard.
  */
object Packing {

  /** Returns the input columns plus `pack_id` (0-based per group) and
    * `pack_pos` (0-based position within the pack). `sizeCol` must be a
    * non-negative integral column; `orderCol` must be unique within a group
    * for a deterministic result.
    */
  def packGreedy(df: DataFrame, groupCol: String, orderCol: String,
      sizeCol: String, capacity: Long): DataFrame = {
    require(capacity > 0, s"capacity must be positive: $capacity")
    val outSchema = StructType(df.schema.fields ++ Seq(
      StructField("pack_id", LongType, nullable = false),
      StructField("pack_pos", LongType, nullable = false)))
    val gi = df.schema.fieldIndex(groupCol)
    val si = df.schema.fieldIndex(sizeCol)
    df.repartition(col(groupCol))
      .sortWithinPartitions(col(groupCol), col(orderCol))
      .mapPartitions { rows =>
        // a partition holds whole groups (hash-partitioned on groupCol);
        // reset the running state at every group boundary
        var curGroup: Any = null
        var first = true
        var cum = 0L
        var packId = 0L
        var packPos = 0L
        rows.map { r =>
          val g = r.get(gi)
          val sz = r.get(si).asInstanceOf[Number].longValue()
          if (first || g != curGroup) {
            curGroup = g; first = false
            cum = sz; packId = 0L; packPos = 0L
          } else if (cum + sz <= capacity) {
            cum += sz; packPos += 1
          } else {
            cum = sz; packId += 1; packPos = 0L
          }
          Row.fromSeq(r.toSeq :+ packId :+ packPos)
        }
      }(RowEncoder.encoderFor(outSchema))
  }

  /** The 100 TB shape: pre-split each group into `shards` deterministic
    * hash shards and pack each (group, shard) independently — parallelism
    * becomes groups × shards instead of groups, and padding loss grows by
    * at most one under-filled window per shard. Adds `pack_shard` next to
    * `pack_id`/`pack_pos`; a pack is identified by (group, pack_shard,
    * pack_id). Shard assignment uses the deterministic content hash, so
    * packing is reproducible run-to-run.
    */
  def packGreedySharded(df: DataFrame, groupCol: String, orderCol: String,
      sizeCol: String, capacity: Long, shards: Int): DataFrame = {
    require(shards > 0, s"shards must be positive: $shards")
    val sharded = df
      .withColumn("pack_shard",
        graft.operators.Sampling.hashBucket(col(orderCol), "packshard", shards).cast("int"))
      .withColumn("__grp", concat_ws("\u0001", col(groupCol), col("pack_shard")))
    packGreedy(sharded, "__grp", orderCol, sizeCol, capacity).drop("__grp")
  }
}
