package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed EXACT rank selection — the scalable replacement for
  * `ntile(k) OVER (ORDER BY ...)`, whose empty partition-by collapses
  * the whole input into one partition (the one plan shape that cannot
  * survive a 100× scale-up).
  *
  * Shape: range-repartition by the sort key (the TeraSort
  * partitioner — globally ordered across partitions), per-partition
  * `row_number`, then global rank = partition offset + local rank,
  * with the per-partition counts (|partitions| longs of driver-side
  * index metadata, same discipline as the IVF centroids) broadcast
  * back. The value at cumulative ntile-bucket rank
  * `b·(n div k) + min(b, n mod k)` is EXACTLY ntile's bucket upper
  * bound, so results are bit-identical to the window formulation —
  * StreamingSpec pins that equality.
  */
object RankSelect {

  /** Decile upper bounds of `df` ordered by (valueCol, idCol), as a
    * DataFrame of (b, ub) — one row per NONEMPTY ntile bucket,
    * matching `ntile(10) … GROUP BY b → max(value)` exactly. */
  def decileBoundsDF(df: DataFrame, valueCol: String, idCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // ONE materialized partitioning for the counting and ranking
    // passes: range boundaries come from SAMPLING, so a second
    // instantiation may split boundary rows differently once the
    // input outgrows the sample, and offsets from partitioning A
    // applied to partitioning B would mis-rank the straddlers
    val keyed = df.select(col(idCol), col(valueCol))
      .repartitionByRange(col(valueCol), col(idCol))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint(true)
    val counts = keyed.groupBy("pid").agg(count(lit(1)).as("c"))
      .orderBy("pid").as[(Int, Long)].collect()
    val n = counts.map(_._2).sum
    val offsets = counts.map(_._1).zip(counts.map(_._2).scanLeft(0L)(_ + _))
    // bucket b's cumulative rank; strictly-increasing filter drops the
    // empty buckets an n<10 input leaves behind (ntile emits no row)
    val targets = (1 to 10)
      .map(b => b -> (b * (n / 10) + math.min(b, n % 10)))
      .foldLeft(Vector.empty[(Int, Long)]) { (acc, t) =>
        if (acc.nonEmpty && acc.last._2 >= t._2) acc else acc :+ t
      }
    val offs = spark.createDataset(offsets.toSeq).toDF("pid", "off")
    val tgt = spark.createDataset(targets).toDF("b", "rank")
    keyed
      .withColumn("rn", row_number().over(
        Window.partitionBy("pid").orderBy(valueCol, idCol)))
      .join(broadcast(offs), Seq("pid"))
      .withColumn("rank", col("rn") + col("off"))
      .join(broadcast(tgt), Seq("rank"))
      .select(col("b"), col(valueCol).as("ub"))
  }

  /** Sentinel join key carried by NULL groups inside [[groupRanks]]
    * (a plain null key would drop the rows at the offsets equi-join). */
  private val NullGroupKey = "\u0000<null-group>"

  /** EXACT rank within each group, distributed — the per-group
    * analog of [[decileBoundsDF]] and the scalable replacement for
    * `row_number() OVER (PARTITION BY group ORDER BY ...)` when the
    * groups are FEW and HUGE (per-language corpus slices: one window
    * partition per language would put corpus/|langs| rows on a single
    * task). Range-repartition by (group, order keys) — the range
    * partitioner keeps partitions globally ordered, so a group's rows
    * span consecutive partitions in order — then per-(partition,
    * group) local `row_number` plus broadcast prefix offsets. The
    * driver holds only |partitions|×|groups| counting metadata (the
    * IVF-centroid discipline). Appends `rank` (1-based within group)
    * and `n` (group size); TextSpec pins bit-equality with the window
    * formulation.
    *
    * Group-key contract: the group column is keyed by its STRING cast
    * (offsets travel through a driver-built table), so the cast must
    * be injective on the actual values — true for the atomic types
    * this is meant for (strings, integers, dates), NOT for e.g.
    * floats that render equal. NULL groups are ranked as their own
    * partition, exactly like `PARTITION BY` — internally they ride a
    * NUL-prefixed sentinel key no real-world group string contains
    * (a plain null key would silently drop the rows at the equi-join). */
  def groupRanks(df: DataFrame, groupCol: String,
                 orderCols: Seq[Column]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // ONE materialized partitioning shared by the counting pass and
    // the ranking pass: range boundaries come from SAMPLING, so two
    // separate instantiations of repartitionByRange may split rows
    // near a boundary differently once the input outgrows the sample
    // — and offsets computed against partitioning A applied to
    // partitioning B would mis-rank every straddling row. The eager
    // localCheckpoint pins a single physical partitioning for both.
    val keyed = df
      .repartitionByRange((col(groupCol) +: orderCols): _*)
      .withColumn("pid", spark_partition_id())
      .localCheckpoint(true)
    val gKey = coalesce(col(groupCol).cast("string"), lit(NullGroupKey))
    val counts = keyed.groupBy(col("pid"), gKey.as("g"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    val byGroup = counts.groupBy(_._2)
    val offRows = byGroup.toSeq.flatMap { case (g, rows) =>
      val sorted = rows.sortBy(_._1)
      sorted.map(_._1).zip(sorted.map(_._3).scanLeft(0L)(_ + _))
        .map { case (pid, off) => (pid, g, off) }
    }
    val nRows = byGroup.toSeq.map { case (g, rows) => (g, rows.map(_._3).sum) }
    val offs = spark.createDataset(offRows).toDF("pid", "g", "off")
    val ns = spark.createDataset(nRows).toDF("g", "n")
    keyed
      .withColumn("g", gKey)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("pid"), col("g")).orderBy(orderCols: _*)))
      .join(broadcast(offs), Seq("pid", "g"))
      .join(broadcast(ns), Seq("g"))
      .withColumn("rank", col("rn") + col("off"))
      .drop("pid", "g", "rn", "off")
  }

  /** The ten decile bounds as driver-side literals (index metadata
    * for stream-static enrichment). */
  def decileBounds(df: DataFrame, valueCol: String, idCol: String): Seq[Double] = {
    val spark = df.sparkSession
    import spark.implicits._
    decileBoundsDF(df, valueCol, idCol)
      .orderBy("b").select("ub").as[Double].collect().toSeq
  }
}
