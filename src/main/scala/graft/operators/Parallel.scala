package graft.operators

import org.apache.spark.sql.DataFrame

/** Conditional parallelism FLOOR for ×R EXPANSION kernels: when a
  * scan feeding a constant-factor expansion (permutation replicates,
  * bootstrap resamples — `explode` of an R-literal followed by
  * per-replicate hashing/aggregation) has far fewer splits than the
  * session has cores, one round-robin exchange of the PRE-expansion
  * rows buys cores× kernel parallelism for 1/R of the kernel's row
  * volume in shuffle bytes.
  *
  * The boundary is measured, not guessed (r10): for 1×-work-per-row
  * aggregates the floor LOSES — the shuffle write serializes every
  * row in the same single scan task it is trying to relieve
  * (stats_sketch: 0.89 s at 32 partials vs 0.57 s single-task;
  * dedup text kernels: +0.1 s construct) — so scan-dominated ops
  * deliberately do NOT use this. It pays exactly when work/row ≫
  * serialize/row: stats_permutation's 49-replicate kernel measured
  * 1.58 s → ~0.3 s on the single-row-group layout.
  *
  * At the 100 TB target this is a no-op by construction: a corpus
  * scan carries thousands of row-group splits, `parts * 2 < target`
  * never holds, and the plan stays shuffle-free with the expansion
  * running inside the scan. The floor exists for layouts where a
  * table is a handful of row groups (the sf harness writes ONE per
  * table — parquet cannot split below a row group).
  */
object Parallel {
  def floor(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // getNumPartitions plans the query but launches no job; for the
    // scan-shaped inputs this guards it is file listing only
    if (df.rdd.getNumPartitions * 2 < target) df.repartition(target) else df
  }
}
