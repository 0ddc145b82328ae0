package graft

import org.apache.spark.sql.catalyst.plans.logical.{Repartition, RepartitionByExpression}

import graft.operators.Parallel

/** Pins Parallel.floor's boundary contract: the pre-expansion
  * parallelism floor exists ONLY for few-split layouts — an input
  * already carrying at least half the session's cores in partitions
  * must pass through UNTOUCHED (the 100 TB no-op guarantee; a floor
  * that repartitioned real multi-split scans would shuffle the
  * corpus for nothing). */
class ParallelSpec extends SparkSuite {

  private def hasRepartition(df: org.apache.spark.sql.DataFrame): Boolean =
    df.queryExecution.logical.collectFirst {
      case r: Repartition => r
      case r: RepartitionByExpression => r
    }.nonEmpty

  test("floor repartitions a single-split input up to the session cores") {
    import spark.implicits._
    val one = Seq.tabulate(100)(i => (i.toLong, i * 2.0)).toDF("k", "v").coalesce(1)
    val floored = Parallel.floor(one)
    assert(hasRepartition(floored), "single-partition input must be floored")
    assert(floored.rdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    // values untouched (round-robin moves rows, never changes them)
    assert(floored.collect().map(_.getLong(0)).sorted.toSeq == (0L until 100L))
  }

  test("floor is a NO-OP once the input carries >= cores/2 partitions (the at-scale path)") {
    import spark.implicits._
    val cores = spark.sparkContext.defaultParallelism
    val wide = Seq.tabulate(100)(i => (i.toLong, i * 2.0)).toDF("k", "v")
      .repartition(math.max(1, (cores + 1) / 2))
    val out = Parallel.floor(wide)
    // floor must not stack a SECOND repartition on top of the input's
    assert(out.queryExecution.logical.collect {
      case r: Repartition => r
      case r: RepartitionByExpression => r
    }.size == 1, "floor must pass a sufficiently-split input through untouched")
    assert(out.rdd.getNumPartitions == wide.rdd.getNumPartitions)
  }
}
