package graft.plans

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.NfcNormalize

/** Catalyst optimizer rule: Unicode NFC normalization is idempotent, so
  * nested applications collapse to one. Library pipelines compose freely
  * (a cleaning stage normalizes, then a fingerprint stage defensively
  * normalizes its input again); this rewrite makes the second application
  * free instead of re-walking every string at runtime.
  *
  * Registered two ways, mirroring [[graft.functions.GraftFunctions]]:
  * injected by [[graft.functions.GraftExtensions]] at session build, or
  * appended imperatively to `spark.experimental.extraOptimizations` by
  * `GraftFunctions.register` for sessions the caller didn't build.
  */
object CollapseNfcNormalize extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case NfcNormalize(inner @ NfcNormalize(_)) => inner
    }
}
