package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches
import graft.sources.Tables

/** Sketch accuracy bounds vs exact answers (the correctness contract
  * an estimator can honestly make). */
class SketchSpec extends SparkSuite {

  private lazy val li = Tables.load(spark, sfDir, "lineitem").cache()

  test("HLL cardinalities within 5% of exact distinct counts") {
    val sk = Sketches.profile(li).head()
    val exact = li.agg(
      countDistinct(col("l_orderkey")), countDistinct(col("l_partkey")),
      countDistinct(col("l_suppkey"))).head()
    Seq(("orderkey", sk.getLong(1), exact.getLong(0)),
      ("partkey", sk.getLong(2), exact.getLong(1)),
      ("suppkey", sk.getLong(3), exact.getLong(2))).foreach {
      case (name, est, truth) =>
        val err = math.abs(est - truth).toDouble / truth
        assert(err <= 0.05, s"$name: estimate $est vs exact $truth (err $err)")
    }
  }

  test("approximate percentiles fall between neighboring exact quantiles") {
    val sk = Sketches.profile(li).head()
    val Array(p40, p60) = li.stat.approxQuantile("l_extendedprice",
      Array(0.40, 0.60), 0.0) // relativeError 0 → exact
    val p50est = sk.getDouble(4)
    assert(p50est >= p40 && p50est <= p60,
      s"p50 estimate $p50est outside exact [p40=$p40, p60=$p60]")
  }

  test("count-min: estimates dominate exact counts within the 2N/w bound, every key") {
    import graft.functions.CountMin
    import graft.sources.Tables
    val (d, w) = (4, 2048)
    val ev = Tables.load(spark, sfDir, "events").select(col("user_id"))
    val n = ev.count()
    val sk = ev.agg(CountMin.sketchCol(col("user_id"), d, w).as("sk"))
    val all = ev.groupBy("user_id").agg(count(lit(1)).as("n_exact"))
      .crossJoin(broadcast(sk))
      .select(col("n_exact"),
        CountMin.estimateCol(col("sk"), col("user_id"), d, w).as("n_est"))
      .collect()
    assert(all.nonEmpty)
    // CMS guarantees: never under; over by > 2N/w w.p. <= 2^-d per key
    // (allow 4N/w+2 across ALL keys — still far tighter than useless)
    val bound = 4.0 * n / w + 2
    all.foreach { r =>
      assert(r.getLong(1) >= r.getLong(0), "CMS under-counted")
      assert(r.getLong(1) - r.getLong(0) <= bound,
        s"over-count ${r.getLong(1) - r.getLong(0)} exceeds $bound")
    }
  }

  test("count-min: sketch is merge-order invariant (partition-count independent)") {
    import graft.functions.CountMin
    import graft.sources.Tables
    val ev = Tables.load(spark, sfDir, "events").select(col("user_id"))
    def sketch(parts: Int): Seq[Long] =
      ev.repartition(parts)
        .agg(CountMin.sketchCol(col("user_id"), 4, 256).as("sk"))
        .head().getSeq[Long](0)
    assert(sketch(1) == sketch(7), "partial merge changed the sketch")
  }
}
