package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.broadcast

/** Join operators from SURVEY.md §2.3. Cubert exposes each physical strategy
  * as a distinct user-chosen operator (MERGE JOIN over blockgen'd data,
  * HASH-JOIN over an in-memory build side, reduce-side JOIN via shuffle
  * macro, MeshJoin via LOAD BLOCK). On Spark these collapse to one logical
  * join; the strategy surface is preserved as explicit hints so a user can
  * still pin the physical plan the way Cubert scripts did, while Catalyst +
  * AQE remain free to handle skew and runtime re-planning.
  */
object Joins {

  /** Map Cubert join-type keywords to Spark join type strings
    * (grammar CubertPhysical.g4:112-114: default inner, LEFT/RIGHT/FULL OUTER).
    */
  def joinType(t: String): String = t.trim.toLowerCase match {
    case "" | "inner"        => "inner"
    case "left" | "left outer"   => "left_outer"
    case "right" | "right outer" => "right_outer"
    case "full" | "full outer"   => "full_outer"
    case "semi" | "left semi"    => "left_semi"
    case "anti" | "left anti"    => "left_anti"
    case other => other
  }

  /** MERGE JOIN — sort-merge join of co-partitioned, co-sorted inputs
    * (reference: operator/MergeJoinOperator.java:36, merge loop :148-210).
    * Spark's SortMergeJoin IS this operator; when both sides are bucketed
    * tables on the keys (see Blockgen) the shuffle and sort are elided,
    * exactly like Cubert's blockgen precondition. The MERGE hint pins SMJ.
    */
  def mergeJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
                how: String = "inner"): DataFrame =
    left.hint("merge").join(right, keys, joinType(how))

  /** HASH-JOIN — broadcast-hash join, build side = right
    * (reference: operator/HashJoinOperator.java:39, columnar build store
    * :346-355 → Spark's broadcast hash relation).
    */
  def hashJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
               how: String = "inner"): DataFrame =
    left.join(broadcast(right), keys, joinType(how))

  /** Reduce-side JOIN (shuffle macro) — shuffle both sides on keys and join
    * within each partition (reference: analyzer/physical/ShuffleRewriter.java:549+,
    * operator/RSJoinOperator.java:33 with its `___tag` column). Spark's
    * default shuffled join is exactly this; AQE may still promote to
    * broadcast at runtime, which is strictly better.
    */
  def rsJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
             how: String = "inner"): DataFrame =
    left.join(right, keys, joinType(how))

  /** Join with an arbitrary condition (theta/range) — absent from the
    * reference grammar, free in Spark (SURVEY.md §2.3 last row).
    */
  def thetaJoin(left: DataFrame, right: DataFrame, cond: Column,
                how: String = "inner"): DataFrame =
    left.join(right, cond, joinType(how))

  /** LEFT SEMI — EXISTS semantics (no reference counterpart; free). */
  def semiJoin(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(right, keys, "left_semi")

  /** LEFT ANTI — NOT EXISTS semantics (no reference counterpart; free). */
  def antiJoin(left: DataFrame, right: DataFrame, keys: Seq[String]): DataFrame =
    left.join(right, keys, "left_anti")

  /** Salted join for skewed keys: scatter left rows across `salts` salt
    * values (deterministic hash of the whole row) and replicate the right
    * side once per salt, so a hot key spreads over `salts` tasks. The
    * explicit form of what AQE skew-join does at runtime — for when AQE is
    * off, or the skew needs a fixed plan (the reference split oversized
    * blocks in MeshJoin the same way). Right side is replicated: only
    * left-preserving join types are valid.
    */
  def saltedJoin(leftDf: DataFrame, rightDf: DataFrame, keys: Seq[String], salts: Int,
                 how: String = "inner"): DataFrame = {
    import org.apache.spark.sql.functions.{col, explode, hash, lit, pmod, sequence}
    val jt = joinType(how)
    require(Set("inner", "left_outer", "left_semi", "left_anti").contains(jt),
      s"saltedJoin replicates the right side; $jt would duplicate unmatched right rows")
    val l = leftDf.withColumn("__salt",
      pmod(hash(leftDf.columns.map(col(_)): _*), lit(salts)))
    val r = rightDf.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, keys :+ "__salt", jt).drop("__salt")
  }

  /** MeshJoin pattern — LOAD BLOCK ... MATCHING + MERGE JOIN (reference:
    * operator/LoadBlockOperator.java:37, block/Index.java:111): join a
    * streamed relation against a stored, pre-partitioned one without
    * re-shuffling the stored side. Spark equivalent: read both sides as
    * bucketed tables with the same bucket spec (see Blockgen.blockgen) and
    * sort-merge join — no shuffle on either side. For skewed keys, AQE
    * skew-join replaces Cubert's block-splitting.
    */
  def meshJoin(spark: org.apache.spark.sql.SparkSession,
               leftTable: String, rightTable: String, keys: Seq[String],
               how: String = "inner"): DataFrame =
    mergeJoin(spark.table(leftTable), spark.table(rightTable), keys, how)
}
