package graft

import graft.sources.Tables

/** A user of the reference engine drives it with SQL. This spec
  * proves the same workflow on graft: register the tables once
  * (`Tables.registerAll`) and run ANSI SQL via `spark.sql` — the
  * results match the library's DataFrame operators row-for-row
  * (slt-style statements drawn from the reference's tests/slt
  * surface: aggregation, join, distinct, order/limit, having). */
class SqlParitySpec extends SparkSuite {

  override def beforeAll(): Unit = {
    super.beforeAll()
    Tables.registerAll(spark, sfDir)
  }

  private def parity(opName: String, sql: String): Unit = {
    val viaSql = spark.sql(sql).collect()
    val viaOp = SparkEntry.queries(opName)(spark, sfDir).collect()
    assert(viaSql.toSeq == viaOp.toSeq, s"$opName: SQL and DataFrame disagree")
    assert(viaSql.nonEmpty)
  }

  test("aggregation (q1) via spark.sql") {
    parity("q1_agg",
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))
        |           * (1 - CAST(l_discount AS DECIMAL(12,2)))) AS DOUBLE) AS sum_disc_price,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / count(*) AS DOUBLE) AS avg_qty,
        |  CAST(min(l_extendedprice) AS DOUBLE) AS min_price,
        |  CAST(max(l_extendedprice) AS DOUBLE) AS max_price,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
  }

  test("join + filter (q3) via spark.sql") {
    parity("q3_join_inner",
      """SELECT o_orderkey, c_name, o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderstatus = 'O'
        |ORDER BY o_orderkey""".stripMargin)
  }

  test("distinct (q12) via spark.sql") {
    parity("q12_distinct",
      """SELECT DISTINCT c_mktsegment, c_nationkey FROM customer
        |ORDER BY c_mktsegment, c_nationkey""".stripMargin)
  }

  test("having (q20) via spark.sql") {
    parity("q20_having",
      """SELECT o_custkey, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS tot
        |FROM orders GROUP BY o_custkey
        |HAVING count(*) >= 12
        |ORDER BY o_custkey""".stripMargin)
  }

  test("cube (q40) via spark.sql") {
    parity("q40_cube",
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin)
  }

  test("window frames (q43) via spark.sql") {
    parity("q43_window_frames",
      """SELECT o_orderkey, o_custkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS run_sum,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mov_sum,
        |  CAST(lag(o_totalprice) OVER
        |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS DOUBLE) AS prev_price
        |FROM orders WHERE o_custkey < 200
        |ORDER BY o_custkey, o_orderkey""".stripMargin)
  }

  test("exact quantiles (q45) via spark.sql") {
    parity("q45_exact_quantiles",
      """WITH ranked AS (
        |  SELECT l_returnflag, l_quantity,
        |    row_number() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rn,
        |    count(*)    OVER (PARTITION BY l_returnflag) AS cnt
        |  FROM lineitem)
        |SELECT l_returnflag,
        |  min(CASE WHEN rn = CAST(ceil(cnt * 0.5) AS BIGINT) THEN l_quantity END) AS p50,
        |  min(CASE WHEN rn = CAST(ceil(cnt * 0.9) AS BIGINT) THEN l_quantity END) AS p90,
        |  max(cnt) AS n
        |FROM ranked GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin)
  }

  test("custom graft functions are SQL-callable through the extension") {
    val r = spark.sql(
      """SELECT doc_id, graft_simhash64(text) AS sh,
        |       graft_minhash_bands(text, 64, 16) AS bands
        |FROM documents ORDER BY doc_id LIMIT 5""".stripMargin).collect()
    assert(r.length == 5)
    assert(r.forall(_.getSeq[Long](2).length == 16))
  }
}
