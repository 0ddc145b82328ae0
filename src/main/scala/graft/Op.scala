package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability: a named DataFrame-producing operator plus an
  * optional DuckDB oracle SQL used by the driver's correctness gate.
  * Column names/order and row ordering are part of the contract and
  * must match between `run` and `oracle`.
  */
final case class Op(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object Op {
  def sql(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): Op =
    Op(name, run, Some(oracle))
  def rowsOnly(name: String)(run: (SparkSession, String) => DataFrame): Op =
    Op(name, run, None)
}
