package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, EqualNullSafe, EqualTo, Expression}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Opt-in guardrail against accidental cartesian products — the classic
  * 100 TB incident: a join whose condition was misspelled (or references
  * only one side) silently plans as a cross product and runs for days.
  * With `spark.graft.guard.cartesian=true`, any Inner/Cross join with NO
  * usable equality condition whose BOTH sides exceed
  * `spark.graft.guard.cartesian.maxBytes` (default 64 MB — anything
  * bigger than a broadcastable dim) fails at PLANNING time with the
  * offending plan fragment, before a single task launches. Small-side
  * cartesians (dim × dim, the pivot/duple/chi-square shapes) stay legal,
  * and the guard is off by default so deliberate products still work.
  *
  * An optimizer rule, not an analyzer one, so it sees the join AFTER
  * predicate pushdown has had the chance to turn a WHERE clause into the
  * join condition (no false alarms on `a, b WHERE a.k = b.k` syntax).
  */
object CartesianGuard extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!conf.getConfString("spark.graft.guard.cartesian", "false").toBoolean)
      return plan
    val maxBytes = conf
      .getConfString("spark.graft.guard.cartesian.maxBytes", (64L << 20).toString)
      .toLong
    plan.foreach {
      case j @ Join(left, right, Inner | Cross, cond, _)
          if !cond.exists(hasEquiJoinKey(_, left, right)) =>
        val l = left.stats.sizeInBytes
        val r = right.stats.sizeInBytes
        if (l > maxBytes && r > maxBytes)
          throw new IllegalStateException(
            s"CartesianGuard: unconditioned ${j.joinType} join of two large " +
              s"inputs (left ~$l bytes, right ~$r bytes, cap $maxBytes). " +
              s"Add an equality condition, broadcast a side, or disable " +
              s"spark.graft.guard.cartesian.\n${j.simpleString(3)}")
      case _ =>
    }
    plan
  }

  /** Mirrors ExtractEquiJoinKeys' notion of a usable key: an equality that
    * is a TOP-LEVEL CONJUNCT (an `=` under an OR — `a.k = b.k OR a.j =
    * b.j` — still plans as a nested-loop product, exactly the accident
    * this guard exists to catch) with one side evaluable from each input.
    */
  private def hasEquiJoinKey(cond: Expression, left: LogicalPlan,
                             right: LogicalPlan): Boolean = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(a, b) => conjuncts(a) ++ conjuncts(b)
      case other => Seq(other)
    }
    val lOut = left.outputSet
    val rOut = right.outputSet
    def keyed(a: Expression, b: Expression): Boolean =
      a.references.nonEmpty && b.references.nonEmpty &&
        ((a.references.subsetOf(lOut) && b.references.subsetOf(rOut)) ||
         (a.references.subsetOf(rOut) && b.references.subsetOf(lOut)))
    conjuncts(cond).exists {
      case EqualTo(a, b)       => keyed(a, b)
      case EqualNullSafe(a, b) => keyed(a, b)
      case _ => false
    }
  }
}
