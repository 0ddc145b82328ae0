package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew
import graft.sources.Tables

/** Salted join/agg equivalence: salting must never change results,
  * only the shuffle key distribution. */
class SkewSpec extends SparkSuite {

  // heavily skewed fact: every order re-keyed so ~half hit one key
  private lazy val skewed = Tables.load(spark, sfDir, "orders")
    .withColumn("k", when(col("o_orderkey") % 2 === 0, 1L)
      .otherwise(col("o_custkey")))
  private lazy val dim = Tables.load(spark, sfDir, "customer")
    .select(col("c_custkey").as("k"), col("c_name"))

  test("salted join returns exactly the plain join's rows") {
    val plain = skewed.join(dim, Seq("k"))
      .select("k", "o_orderkey", "c_name").orderBy("k", "o_orderkey", "c_name")
    val salted = Skew.saltedJoin(skewed, dim, "k", salts = 8)
      .select("k", "o_orderkey", "c_name").orderBy("k", "o_orderkey", "c_name")
    assert(salted.collect().toSeq == plain.collect().toSeq)
  }

  test("salted two-phase aggregation equals direct aggregation") {
    val direct = skewed.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("o_totalprice").cast("decimal(18,2)").as("tot"))
      .orderBy("k")
    val salted = Skew.saltedAgg(skewed, "k", salts = 8,
      partial = Seq(count(lit(1)).as("pn"), sum("o_totalprice").as("pt")),
      finalize = Seq(sum("pn").as("n"), sum(col("pt")).cast("decimal(18,2)").as("tot")))
      .orderBy("k")
    assert(salted.collect().toSeq == direct.collect().toSeq)
  }
}
