package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Exactness contract of [[graft.functions.SumScaledExact]]: the
  * long-partial/decimal-carry sum must be BIT-IDENTICAL to Spark's
  * own decimal(12,2)-cast sum — same rounding, same null semantics —
  * and invariant to partitioning (the merge path is exercised by
  * splitting the input across partial buffers). */
class SumScaledSpec extends SparkSuite {

  private def sumScaled(c: org.apache.spark.sql.Column, d: Int) =
    call_function("graft_sum_scaled", c, lit(d))

  test("matches decimal-cast sum exactly on lineitem, any partitioning") {
    val li = Tables.load(spark, sfDir, "lineitem")
    for (parts <- Seq(1, 13)) {
      val df = li.repartition(parts)
      val r = df.groupBy("l_returnflag").agg(
        sumScaled(col("l_quantity"), 2).as("a"),
        sum(col("l_quantity").cast("decimal(12,2)")).cast("decimal(38,2)").as("b"),
        sumScaled(col("l_extendedprice"), 2).as("c"),
        sum(col("l_extendedprice").cast("decimal(12,2)")).cast("decimal(38,2)").as("d"),
        // scale-4 product: cents(price) * cents(1-discount) / 10^4 —
        // both factors are exact integers <= 1e9 and 100, the double
        // product is exact, so this equals the decimal-product sum
        sumScaled(round(col("l_extendedprice") * 100)
          * round((lit(1) - col("l_discount")) * 100) / 1e4, 4).as("e"),
        sum(col("l_extendedprice").cast("decimal(12,2)")
          * (lit(1) - col("l_discount").cast("decimal(12,2)")))
          .cast("decimal(38,4)").as("f"))
        .collect()
      assert(r.nonEmpty)
      r.foreach { row =>
        assert(row.getDecimal(1) == row.getDecimal(2),
          s"qty mismatch at $parts parts: ${row.getDecimal(1)} vs ${row.getDecimal(2)}")
        assert(row.getDecimal(3) == row.getDecimal(4),
          s"price mismatch at $parts parts")
        assert(row.getDecimal(5) == row.getDecimal(6),
          s"disc-product mismatch at $parts parts: ${row.getDecimal(5)} vs ${row.getDecimal(6)}")
      }
    }
  }

  test("null semantics match SQL SUM: all-null group is null, nulls skipped") {
    import spark.implicits._
    val df = Seq(("a", Some(1.25)), ("a", None), ("a", Some(2.25)),
      ("b", None), ("b", None)).toDF("k", "v")
    val r = df.groupBy("k").agg(
      sumScaled(col("v"), 2).as("s"),
      sum(col("v").cast("decimal(12,2)")).as("ref"))
      .orderBy("k").collect()
    assert(r(0).getDecimal(1).compareTo(new java.math.BigDecimal("3.50")) == 0)
    assert(r(1).get(1) == null && r(1).get(2) == null)
  }

  test("SQL-callable through the extension; in-contract inputs match the decimal cast") {
    import spark.implicits._
    Seq(1.01, 2.02, -1.0, 0.07).toDF("v")
      .createOrReplaceTempView("sum_scaled_probe")
    val Array(r) = spark.sql(
      """SELECT graft_sum_scaled(v, 2) AS a,
        |       CAST(sum(CAST(v AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS b
        |FROM sum_scaled_probe""".stripMargin).collect()
    assert(r.getDecimal(0) == r.getDecimal(1),
      s"diverged: ${r.getDecimal(0)} vs ${r.getDecimal(1)}")
  }

  test("documented out-of-contract divergence: binary rounding vs decimal-string rounding") {
    import spark.implicits._
    // 1.005 as a double is just BELOW the halfway point: the decimal
    // cast rounds its shortest decimal rendering up (1.01), the
    // scaled sum rounds the binary value down (1.00). Pinned so the
    // doc's claim stays true — if either engine path changes, this
    // fails and the contract must be re-examined.
    Seq(1.005).toDF("v").createOrReplaceTempView("sum_scaled_edge")
    val Array(r) = spark.sql(
      """SELECT graft_sum_scaled(v, 2) AS a,
        |       CAST(sum(CAST(v AS DECIMAL(12,2))) AS DECIMAL(38,2)) AS b
        |FROM sum_scaled_edge""".stripMargin).collect()
    assert(r.getDecimal(0).compareTo(new java.math.BigDecimal("1.00")) == 0)
    assert(r.getDecimal(1).compareTo(new java.math.BigDecimal("1.01")) == 0)
  }
}
