package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeSet, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode, LogicalPlan, Project, UnaryNode, Union}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.graft.PlanBridge

/** A predicate-pushdown fence for screen pipelines.
  *
  * The canonical training-data screen — compute quality features, then
  * `.filter` on them — hits a Catalyst composition hazard: pushing the
  * filter through the feature projection substitutes every referenced
  * alias, so the predicate RECOMPUTES the features (and, containing
  * higher-order functions, the Filter falls out of whole-stage codegen and
  * evaluates them interpreted, without common-subexpression elimination).
  * Measured on q61 at sf10: tokenize ran 8× per row inside the pushed
  * predicate and the surviving rows re-ran the full feature projection —
  * pushdown through the projection that DEFINES the predicate's inputs
  * can never win, because those inputs must be evaluated for every row
  * either way.
  *
  * `PushdownBarrier(df)` wraps the frame in a logical node that
  * `PushPredicateThroughNonJoin` cannot cross (its pushdown whitelist is
  * closed over known node types), so downstream filters stay ABOVE the
  * feature projection and read computed columns. The node must survive
  * ALL logical optimization — a strip-after-pushdown optimizer rule is
  * NOT enough, because SparkOptimizer re-runs `PushDownPredicates` in the
  * late "Pushdown Filters from PartitionPruning" batch, after every
  * injectable optimizer/pre-CBO point (measured: a pre-CBO strip rule let
  * that batch re-push q61's predicate). Instead
  * [[PushdownBarrierStrategy]] (injected by [[graft.GraftExtensions]])
  * plans the node as an identity `ProjectExec`, which whole-stage codegen
  * fuses away — the fence costs nothing physical.
  *
  * Trade-offs, deliberately accepted for screens: column pruning and
  * CHEAP-predicate pushdown (e.g. a partition-pruning filter on a raw
  * column) also stop at the fence — place the barrier directly above the
  * feature projection, below nothing you want pushed further down.
  * Requires GraftExtensions (true everywhere in this engine); without the
  * strategy, planning fails loudly on the unknown node rather than
  * silently mis-planning.
  */
case class PushdownBarrier(child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): PushdownBarrier =
    copy(child = newChild)
}

object PushdownBarrier {
  /** Wrap a frame so downstream filters are not pushed into it. */
  def apply(df: DataFrame): DataFrame =
    PlanBridge.ofRows(df.sparkSession, new PushdownBarrier(df.queryExecution.analyzed))
}

/** Selective permeability for the fence: a filter conjunct that references
  * ONLY pass-through attributes (columns the projection below the barrier
  * forwards untouched from its input — e.g. a raw `doc_id` range predicate
  * above a quality screen) is moved below the barrier, where the standard
  * pushdown batches carry it on to the scan (partition/row-group pruning
  * intact). Conjuncts referencing any COMPUTED column stay above — pushing
  * those is exactly the re-derivation hazard the barrier exists to stop.
  * Runs in the operator-optimization fixpoint; idempotent (after the move,
  * nothing above the barrier is pushable).
  *
  * The rewrite pattern matches `Filter` DIRECTLY above the fence only, and
  * that is sufficient: a user select interposed between their raw-column
  * filter and the barrier is a plain deterministic `Project`, which
  * Catalyst's own `PushPredicateThroughNonJoin` rebases the filter through
  * (alias-substituting) in the SAME operator-optimization fixpoint — the
  * filter arrives at the fence a few iterations later and crosses here
  * (pinned by PlanAuditSpec "barrier permeability survives an interposed
  * select"). The only selects the composition refuses are ones containing
  * nondeterministic fields, where Spark itself never reorders a filter —
  * being more permissive than Spark there would change evaluation counts.
  */
object PushThroughBarrier extends Rule[LogicalPlan] with PredicateHelper {

  /** Outputs of `plan` forwarded raw from a leaf — never defined by an
    * Alias at any node on their path up. A one-level projectList check is
    * wrong: after a two-operator screen the TOP project forwards
    * n_tokens as a bare attribute while the project two levels down
    * computes it — letting its predicate cross re-derives the feature
    * at the scan. Renames are conservatively treated as computations, so
    * a crossed conjunct can never be substituted into a computation by
    * the standard pushdown batches.
    *
    * A Union needs positional treatment, not an exprId scan — Union
    * output attrs take the FIRST child's exprIds, so a column forwarded
    * raw in branch 1 but computed via Alias in branch 2 would classify
    * as pass-through under a flat alias collection, and the crossed
    * conjunct would re-derive the expensive expression inside branch 2.
    * Here a Union output is raw only when the attribute at the SAME
    * position is raw in EVERY branch; otherwise it is computed. This
    * keeps partition pruning for unioned-corpus screens where all
    * branches forward the filter column untouched, while the
    * branch-computed case stays fenced (both pinned by PlanAuditSpec).
    */
  private def rawOutputs(plan: LogicalPlan): AttributeSet = plan match {
    case leaf: LeafNode => leaf.outputSet
    case u: Union =>
      val childRaw = u.children.map(rawOutputs)
      val byPosition = u.children.map(_.output).transpose
      AttributeSet(u.output.zip(byPosition).collect {
        case (out, branchAttrs)
            if branchAttrs.zip(childRaw).forall { case (a, raw) => raw.contains(a) } =>
          out
      })
    case other =>
      val childRaw = other.children.foldLeft(AttributeSet.empty)(_ ++ rawOutputs(_))
      val childOut = other.children.foldLeft(AttributeSet.empty)(_ ++ _.outputSet)
      val aliasedHere = AttributeSet(other.expressions.flatMap(_.collect {
        case a: Alias => a.toAttribute
      }))
      // An output is raw when not aliased at this node and either raw in a
      // child or node-generated without an Alias (e.g. a Generate output;
      // Expand reuses child exprIds while changing values per projection,
      // so its outputs classify raw too). Crossing such a conjunct is
      // sound NOT because the attribute names the same value below —
      // Expand shows it may not — but because this rule only moves the
      // filter to just above `child`, i.e. above the ENTIRE subtree that
      // computes the attribute; any further descent is Catalyst's own
      // pushdown rules, which carry their own correctness arguments.
      AttributeSet(other.output.filter(a =>
        !aliasedHere.contains(a) && (!childOut.contains(a) || childRaw.contains(a))))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, barrier @ PushdownBarrier(child)) =>
      val passThrough = rawOutputs(child)
      val (push, keep) = splitConjunctivePredicates(cond)
        .partition(c => c.deterministic && c.references.subsetOf(passThrough))
      if (push.isEmpty) f
      else {
        val below = barrier.copy(child = Filter(push.reduce(And), child))
        keep.reduceOption(And).map(Filter(_, below)).getOrElse(below)
      }
  }
}

/** Plans [[PushdownBarrier]] as an identity projection — `ProjectExec`
  * participates in whole-stage codegen, so the fence leaves zero runtime
  * footprint; its whole effect is having been opaque during optimization.
  */
object PushdownBarrierStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[org.apache.spark.sql.execution.SparkPlan] =
    plan match {
      case PushdownBarrier(child) =>
        org.apache.spark.sql.execution.ProjectExec(child.output, planLater(child)) :: Nil
      case _ => Nil
    }
}
