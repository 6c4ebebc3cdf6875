package graft.plans

import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Semi/anti-join right-side dedup (SURVEY.md §2 J4; the reference's
  * engine performs the same reduction for `EXISTS` / `NOT EXISTS`
  * probes).
  *
  * For `LeftSemi` and `LeftAnti` joins only the EXISTENCE of a
  * matching right row matters: the output is
  * `{l ∈ left : ∃ r ∈ right, cond(l, r)}` (negated for anti), and
  * duplicate right tuples cannot change an existential. After column
  * pruning the right side carries exactly the attributes the join
  * condition references, so grouping it on its full output is a pure
  * key-dedup — on a fact-table probe (`part WHERE NOT EXISTS (… FROM
  * lineitem …)`) the shuffle moves ~|distinct keys| rows instead of
  * the full fact table, with the dedup itself done map-side by the
  * partial aggregate. At 100 TB this is the difference between
  * shuffling the fact table and shuffling its key domain; measured
  * 3× on the q07b anti-join shape at sf1 (BASELINE.md).
  *
  * Guarded to stay net-positive:
  *  - right sides at or under `autoBroadcastJoinThreshold` are left
  *    alone — they broadcast without any shuffle, and inserting an
  *    aggregate would ADD one (a threshold of -1 disables
  *    broadcasting, so every right side is eligible);
  *  - explicit right-side join hints are respected (a user asking
  *    for BROADCAST gets exactly that plan);
  *  - aggregates are not re-wrapped (also the fixed-point bound) and
  *    streaming right sides are skipped (a blind streaming aggregate
  *    would demand watermark/output-mode changes).
  *
  * Registered through `SparkSessionExtensions.injectOptimizerRule`
  * ([[graft.expressions.GraftExtensions]]), which lands it in the
  * "User Provided Optimizers" batch — after column pruning has
  * narrowed the right side to the condition's attributes. The
  * inserted [[Aggregate]] reuses the child's own output attributes,
  * so the join condition's references stay bound and physical
  * planning gives the standard partial → exchange → final hash
  * aggregate whose key-partitioned output the join reuses without a
  * second exchange.
  */
object SemiAntiRightDedup extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(_, right, LeftSemi | LeftAnti, Some(_), hint)
        if hint.rightHint.isEmpty && eligible(right) =>
      j.copy(right = Aggregate(right.output, right.output, right))
  }

  private def eligible(right: LogicalPlan): Boolean = {
    val threshold = conf.autoBroadcastJoinThreshold
    !right.isStreaming &&
    !right.isInstanceOf[Aggregate] &&
    (threshold < 0 || right.stats.sizeInBytes > threshold)
  }
}
