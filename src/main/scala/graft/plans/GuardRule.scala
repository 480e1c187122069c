package graft.plans

import org.apache.spark.internal.Logging
import org.apache.spark.sql.catalyst.plans.Cross
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Runtime plan guard — the PlanGuardSpec net moved INTO the engine as a
  * Catalyst optimizer rule, for production sessions where a scale-hostile
  * plan shape is a bug, not a test failure. Two shapes are flagged, the
  * same two the test-time net pins (they are correct at test SF and
  * serialize or explode at 100 TB):
  *
  *  1. a join with NO condition (cross/cartesian) — all-pairs candidate
  *     generation sneaking into a pipeline;
  *  2. a window with an EMPTY partition spec — the whole input moves into
  *     ONE task for the sort.
  *
  * Default behavior is to WARN — once per distinct message per JVM (a
  * bounded seen-set dedupes the optimizer's fixed-point re-visits of the
  * same node, so a deliberate bounded shape does not spam the log every
  * pass) — so that deliberately-bounded shapes — a broadcast 1-row
  * aggregate cross, a value-histogram global cumulative — keep working
  * untouched; setting `spark.graft.guard.strict=true` upgrades both to
  * an optimization-time exception (the rule runs in the optimizer, so
  * the query still fails before any task is scheduled), the right mode
  * for scheduled ETL where no such shape is ever intended. The rule
  * rewrites nothing — `apply` returns the plan unchanged — so it cannot
  * perturb optimization; it only observes.
  *
  * Registered by [[graft.expressions.GraftExtensions]]
  * (`spark.sql.extensions=graft.expressions.GraftExtensions`) or
  * imperatively via `spark.experimental.extraOptimizations`. */
object GuardRule extends Rule[LogicalPlan] with Logging {

  val StrictKey = "spark.graft.guard.strict"

  /** Messages already warned, so fixed-point optimizer iterations (and
    * re-runs of the same query) log each shape once. Bounded: cleared
    * wholesale past 4096 distinct messages rather than growing forever
    * in a long-lived session. */
  private val warned =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private val WarnedCap = 4096

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val strict = conf.getConfString(StrictKey, "false").toBoolean
    plan.foreach {
      case j @ Join(_, _, joinType, cond, _)
          if cond.isEmpty || joinType == Cross =>
        flag(strict,
          s"graft guard: unconditioned $joinType join (all-pairs at scale): " +
            j.simpleString(maxFields = 4))
      case w: Window if w.partitionSpec.isEmpty =>
        flag(strict,
          "graft guard: window with empty PARTITION BY (single-task " +
            "global sort at scale): " + w.simpleString(maxFields = 4))
      case _ =>
    }
    plan
  }

  private def flag(strict: Boolean, msg: String): Unit =
    if (strict) throw new IllegalStateException(
      msg + s" — set $StrictKey=false to allow")
    else {
      if (warned.size > WarnedCap) warned.clear()
      if (warned.add(msg)) logWarning(msg)
    }
}
