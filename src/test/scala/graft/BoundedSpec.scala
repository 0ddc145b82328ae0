package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

import graft.operators.Bounded

/** Pins the tail-sort size gates' BOTH directions (r11): the small
  * path must drop the range exchange + RangePartitioner sampling job,
  * and any frame whose plan estimate outgrows the gate must fall back
  * to the sampled parallel sort — the gate exists to cut fixed cost
  * on small frames, never to serialize a corpus-sized sort. The
  * narrow variant's small path must additionally be a SHUFFLE
  * (repartition(1)), never a coalesce that would fold a parallel
  * scan into one task (the q22 lesson, VERDICT r10). */
class BoundedSpec extends SparkSuite {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.explainString(FormattedMode)

  private def frame() = {
    import spark.implicits._
    Seq.tabulate(500)(i => (i.toLong, s"v$i")).toDF("k", "s").repartition(4)
  }

  test("orderedIfSmall: small estimate -> coalesced single-partition sort, no range exchange") {
    val p = plan(Bounded.orderedIfSmall(frame(), Bounded.SmallSortBytes, col("k")))
    assert(!p.toLowerCase.contains("rangepartitioning"),
      s"small path must not range-exchange:\n$p")
    assert(p.contains("Coalesce"), s"small path lost its single-partition sort:\n$p")
  }

  test("orderedIfSmall: oversized estimate falls back to the sampled range sort") {
    val p = plan(Bounded.orderedIfSmall(frame(), 0L, col("k")))
    assert(p.toLowerCase.contains("rangepartitioning"),
      s"a frame past the gate must keep the parallel sampled sort:\n$p")
    assert(!p.contains("Coalesce"), s"oversized frame must never coalesce:\n$p")
  }

  test("orderedNarrowIfSmall: small path is a repartition(1) SHUFFLE, never a coalesce") {
    val p = plan(Bounded.orderedNarrowIfSmall(frame(), Bounded.SmallSortBytes, col("k")))
    assert(!p.toLowerCase.contains("rangepartitioning"),
      s"small path must not range-exchange:\n$p")
    assert(p.contains("SinglePartition, REPARTITION_BY_NUM"),
      s"narrow small path must shuffle (repartition(1)) so the input stays parallel:\n$p")
    assert(!p.contains("Coalesce"),
      s"narrow small path must never coalesce the input:\n$p")
  }

  test("orderedNarrowIfSmall: oversized estimate falls back to the sampled range sort") {
    val p = plan(Bounded.orderedNarrowIfSmall(frame(), 0L, col("k")))
    assert(p.toLowerCase.contains("rangepartitioning"),
      s"a frame past the gate must keep the parallel sampled sort:\n$p")
  }

  test("both small paths produce the identical total order as orderBy") {
    val f = frame()
    val expect = f.orderBy(col("k")).collect().map(_.getLong(0)).toSeq
    val a = Bounded.orderedIfSmall(f, Bounded.SmallSortBytes, col("k"))
      .collect().map(_.getLong(0)).toSeq
    val b = Bounded.orderedNarrowIfSmall(f, Bounded.SmallSortBytes, col("k"))
      .collect().map(_.getLong(0)).toSeq
    assert(a == expect && b == expect)
  }
}
