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
    def keyed = df.select(col(idCol), col(valueCol))
      .repartitionByRange(col(valueCol), col(idCol))
      .withColumn("pid", spark_partition_id())
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

  /** The ten decile bounds as driver-side literals (index metadata
    * for stream-static enrichment). */
  def decileBounds(df: DataFrame, valueCol: String, idCol: String): Seq[Double] = {
    val spark = df.sparkSession
    import spark.implicits._
    decileBoundsDF(df, valueCol, idCol)
      .orderBy("b").select("ub").as[Double].collect().toSeq
  }
}
