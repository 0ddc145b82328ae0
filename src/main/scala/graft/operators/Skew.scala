package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual key-salting for skew-heavy equi-joins (SURVEY §4).
  *
  * AQE's skew-join splitting (enabled on every graft session) handles
  * most skew at runtime, but it only splits SORT-MERGE join
  * partitions; a shuffled-hash join on a pathological hot key, or a
  * skewed aggregation, still funnels one key through one task. This
  * is the explicit fallback: spread each hot left-side key over
  * `salts` sub-keys and replicate the right side once per sub-key —
  * shuffle volume rises by |right|·(salts−1), hot-key parallelism
  * rises by salts×.
  */
object Skew {

  /** Inner equi-join with the left side's `key` salted `salts` ways.
    * Result is identical to `left.join(right, key)` for any salt
    * assignment, so the salt is just a cheap per-row hash. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salts: Int): DataFrame = {
    val salted = left.withColumn("_salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(salts)))
    val replicated = right.withColumn("_salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /** Two-phase skew-proof aggregation: partial aggregate on
    * (key, salt), then final aggregate on key. `partials` maps a
    * column to its two-phase (partial, finalize) aggregate pair,
    * e.g. count → (count, sum). */
  def saltedAgg(df: DataFrame, key: String, salts: Int,
                partial: Seq[Column], finalize: Seq[Column]): DataFrame =
    df.withColumn("_salt", pmod(xxhash64(col(key), monotonically_increasing_id()), lit(salts)))
      .groupBy(col(key), col("_salt"))
      .agg(partial.head, partial.tail: _*)
      .groupBy(col(key))
      .agg(finalize.head, finalize.tail: _*)
}
