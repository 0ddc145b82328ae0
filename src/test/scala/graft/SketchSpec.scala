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
}
