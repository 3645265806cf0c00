package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, ExprId, Expression}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.LogicalRelation

/** Column-level lineage: which source-table columns feed each output column.
  *
  * The reference tracked this with a dedicated lineage graph over its
  * physical operators (analyzer/Lineage.java:39, LineageGraph.java:39,
  * ColumnLineage.java:30) to drive the incremental-MV rewriters; in Spark
  * the analyzed logical plan already carries the full dependency structure,
  * so lineage is one bottom-up walk mapping every named expression's
  * `references` down to leaf-relation attributes. No execution happens —
  * this reads the plan, not the data.
  *
  * Scale note: plan-size work only (O(plan nodes × expr refs)), driver-side
  * by nature, independent of data volume.
  */
object Lineage {

  /** For each output column of `df`: the set of "table.column" source
    * columns it transitively derives from (empty set for literals).
    * Tables are named by catalog identifier when present, else by the
    * file path's basename without extension, else "local".
    */
  def columnLineage(df: DataFrame): Map[String, Set[String]] = {
    val plan = df.queryExecution.analyzed
    val m = walk(plan)
    plan.output.map(a => a.name -> m.getOrElse(a.exprId, Set.empty[String])).toMap
  }

  private def leafName(l: LeafNode): String = l match {
    case lr: LogicalRelation =>
      lr.catalogTable.map(_.identifier.table).orElse {
        import org.apache.spark.sql.execution.datasources.HadoopFsRelation
        lr.relation match {
          case fs: HadoopFsRelation =>
            fs.location.rootPaths.headOption.map(_.getName.replaceAll("\\.[a-z]+$", ""))
          case _ => None
        }
      }.getOrElse("relation")
    case _: LocalRelation => "local"
    case other => other.nodeName.toLowerCase
  }

  private def refs(e: Expression, m: Map[ExprId, Set[String]]): Set[String] =
    e.references.toSeq.flatMap(a => m.getOrElse(a.exprId, Set.empty[String])).toSet

  private def walk(plan: LogicalPlan): Map[ExprId, Set[String]] = {
    val fromChildren: Map[ExprId, Set[String]] = plan match {
      case l: LeafNode =>
        l.output.map(a => a.exprId -> Set(s"${leafName(l)}.${a.name}")).toMap
      case _ => plan.children.map(walk).foldLeft(Map.empty[ExprId, Set[String]])(_ ++ _)
    }
    // every node that NAMES new expressions contributes aliases; everything
    // else (Filter, Join, Sort, Limit, Distinct, set ops) passes attributes
    // through unchanged, which fromChildren already covers
    val named: Seq[(ExprId, Set[String])] = plan match {
      case p: Project   => aliases(p.projectList, fromChildren)
      case a: Aggregate => aliases(a.aggregateExpressions, fromChildren)
      case w: Window    => aliases(w.windowExpressions, fromChildren)
      case g: Generate  =>
        g.generatorOutput.map(o => o.exprId -> refs(g.generator, fromChildren))
      case e: Expand =>
        // each output position unions the refs of that column across all
        // projection rows (grouping-set branches)
        e.output.zipWithIndex.map { case (o, i) =>
          o.exprId -> e.projections.flatMap(row => refs(row(i), fromChildren)).toSet
        }
      case u: Union =>
        u.output.zipWithIndex.map { case (o, i) =>
          o.exprId -> u.children.flatMap(c => fromChildren.getOrElse(c.output(i).exprId,
            Set.empty[String])).toSet
        }
      case _ => Seq.empty
    }
    fromChildren ++ named
  }

  private def aliases(es: Seq[Expression],
                      m: Map[ExprId, Set[String]]): Seq[(ExprId, Set[String])] =
    es.collect { case a: Alias => a.exprId -> refs(a.child, m) }

  /** Render lineage as sorted "col <- a.b, c.d" lines (debug/audit aid). */
  def format(df: DataFrame): String =
    columnLineage(df).toSeq.sortBy(_._1).map { case (c, srcs) =>
      s"$c <- ${if (srcs.isEmpty) "(literal)" else srcs.toSeq.sorted.mkString(", ")}"
    }.mkString("\n")
}
