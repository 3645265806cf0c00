package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sparse-matrix operations as relational dataflow — the reference's "graph
  * computation" story (README §Graph: sparse matrix multiplication written
  * as blocked join+aggregate scripts; COLLATE VECTOR BLOCK feeds per-vector
  * blocks — operator/CollateVectorBlockOperator.java:45). In Spark the whole
  * pattern is one shuffle join on the contraction dimension plus one
  * aggregation — Catalyst plans the partial aggregation and AQE handles the
  * hub-row skew that made the reference pre-block its matrices.
  *
  * Matrices are COO triples (i, k, v). At 100 TB scale: the join shuffles
  * both operands on `k` (or runs shuffle-free over blockgen'd/bucketed
  * operands with a shared bucket spec on `k`), and the (i,j) aggregation is
  * partial+final. Power-law graphs (hub columns) → AQE skew split or
  * `Joins.saltedJoin` on the same keys.
  */
object Matrix {

  /** C = A × B over COO triples: A(i,k,v), B(k,j,w) → C(i,j) = Σ_k v·w.
    * Column names are positional contracts: a = (i, k, v), b = (k, j, w).
    */
  def spMM(a: DataFrame, b: DataFrame): DataFrame = {
    val l = a.toDF("i", "k", "v")
    val r = b.toDF("k", "j", "w")
    l.join(r, Seq("k"))
      .groupBy("i", "j")
      .agg(sum(col("v") * col("w")).as("val"))
  }

  /** A^T as COO: swap coordinates (pure projection, no shuffle). */
  def transpose(a: DataFrame): DataFrame = {
    val t = a.toDF("i", "k", "v")
    t.select(col("k").as("i"), col("i").as("k"), col("v"))
  }

  /** Sparse matrix–vector product: A(i,k,v) × x(k,w) → y(i) = Σ_k v·w.
    * The vector side broadcasts when small (the common iterative-algorithm
    * case: PageRank-style iterations are repeated spMV calls).
    */
  def spMV(a: DataFrame, x: DataFrame, broadcastVector: Boolean = true): DataFrame = {
    val l = a.toDF("i", "k", "v")
    val r0 = x.toDF("k", "w")
    val r = if (broadcastVector) broadcast(r0) else r0
    l.join(r, Seq("k"))
      .groupBy("i")
      .agg(sum(col("v") * col("w")).as("val"))
  }
}
