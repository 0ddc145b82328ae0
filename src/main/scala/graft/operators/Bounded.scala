package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Global ordering for BOUNDED results — outputs whose row count is
  * capped by a literal predicate or a bounded grouping domain (a KV
  * range read's ≤|range| keys, q1's ≤6 flag×status groups, an hourly
  * dashboard's |hours|×|types| rows), not by corpus size.
  *
  * `orderBy` on such a result plans a RANGE EXCHANGE: one shuffle, one
  * RangePartitioner SAMPLING job, one AQE stage job — ~0.1 s of fixed
  * cost (PROFILE_r08) to sort rows that fit in a single page. Sorting
  * the coalesced single partition instead produces the identical
  * global order (one partition ⇒ within-partition order IS total
  * order) with zero exchanges: the upstream aggregate still reduces
  * map-side in parallel; only the final ≤-thousands-row reduce runs
  * single-task — which is also exactly how a client consumes it.
  *
  * NOT for corpus-sized outputs: those keep `orderBy`'s sampled range
  * sort (a single-partition sort of unbounded data is the anti-shape
  * PlanAuditSpec's global-window sweep exists to catch).
  */
object Bounded {
  def ordered(df: DataFrame, cols: Column*): DataFrame =
    df.coalesce(1).sortWithinPartitions(cols: _*)

  /** [[ordered]] gated on the plan's SIZE ESTIMATE (VERDICT r9
    * task 3): API faces like `KVTable.range()`/`multiGet()` take
    * caller-controlled predicates, so boundedness there is a runtime
    * property, not a literal one — an unconditional single-partition
    * sort would let `range(MIN, MAX)` funnel the whole keyspace
    * through one task. When Catalyst's optimized-plan stats put the
    * result at or under `maxBytes` the zero-exchange shape applies;
    * anything wider falls back to `orderBy`'s sampled range exchange.
    * The estimate costs no job (it folds scan file sizes through the
    * plan), and size-only estimation is deliberately CONSERVATIVE —
    * a Filter doesn't shrink it, so a huge table stays on the range
    * path even under a narrow-looking predicate. */
  def orderedIfSmall(df: DataFrame, maxBytes: Long, cols: Column*): DataFrame =
    if (df.queryExecution.optimizedPlan.stats.sizeInBytes <= maxBytes)
      ordered(df, cols: _*)
    else df.orderBy(cols: _*)
}
