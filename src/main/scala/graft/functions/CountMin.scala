package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Count-min sketch over a long key: a d×w counter matrix where
  * row i increments cell `xxhash64(key, i) mod w`; the estimate for a
  * key is the MIN over rows — always ≥ the true count, and over by
  * more than 2N/w with probability ≤ 2^−d.
  *
  * This is the custom-mergeable-aggregation-state capability the
  * reference implements as hand-written aggregate executors
  * (`/root/reference/src/query_engine/src/execution/volcano_executor/aggregate`):
  * on Spark it is a typed [[Aggregator]] — `reduce` builds partial
  * sketches map-side, `merge` adds matrices pairwise, so only
  * d·w·8-byte buffers cross the wire, never rows. The PROBE side
  * needs no UDF at all: the hash rows use Spark's own `xxhash64`
  * chain (seed 42, fold left), so `estimateCol` reconstructs cell
  * indices with codegen'd builtins over the broadcast sketch array.
  *
  * At 100 TB: one sketch per partition merges up a binary tree —
  * cost d·w per merge regardless of row count (contrast the measured
  * QuantileSummaries merge cliff in [[graft.operators.Sketches]] —
  * CMS merges are flat adds, so partial parallelism is FREE here).
  */
final class CountMin(d: Int, w: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
  require(d >= 1 && w >= 2, s"need d>=1, w>=2, got d=$d w=$w")

  override def zero: Array[Long] = new Array[Long](d * w)

  override def reduce(buf: Array[Long], key: Long): Array[Long] = {
    var i = 0
    while (i < d) {
      // Spark's xxhash64(key, i) = hashLong(i, hashLong(key, 42))
      val h = XXH64.hashLong(i.toLong, XXH64.hashLong(key, 42L))
      buf(i * w + java.lang.Math.floorMod(h, w.toLong).toInt) += 1L
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}

object CountMin {
  /** The aggregate column: builds the sketch over `key`. The key is
    * pinned to LongType HERE and in [[estimateCol]]: build hashes
    * with `hashLong`, and xxhash64 over a non-long column would use a
    * different per-type hash — probing the wrong cells and silently
    * voiding the never-undercount guarantee. The explicit cast makes
    * both sides long for any integral input (no-op when already
    * long). */
  def sketchCol(key: Column, d: Int, w: Int): Column =
    udaf(new CountMin(d, w), Encoders.scalaLong).apply(key.cast("long"))

  /** The probe: min over rows of the sketch cell each hash row maps
    * `key` to — all codegen'd builtins (xxhash64 / pmod /
    * element_at), evaluated against the (broadcast) sketch array. */
  def estimateCol(sketch: Column, key: Column, d: Int, w: Int): Column =
    least((0 until d).map { i =>
      element_at(sketch,
        (lit(i * w) + pmod(xxhash64(key.cast("long"), lit(i.toLong)), lit(w.toLong))).cast("int") + 1)
    }: _*)
}
