package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** The data contracts the oracle-exactness arguments stand on,
  * asserted against the actual testdata so a regeneration that
  * breaks one fails HERE — at the contract, with the cause named —
  * instead of as an unexplained hash mismatch in the gate.
  *
  * Chief contract: money/quantity columns are 2-decimal quantities.
  * Every `CAST(x AS DECIMAL(12,2))` shared by an op and its oracle
  * is exact (a no-op rounding) only then; for finer values the two
  * engines legitimately diverge on ties — Spark HALF_UP-rounds the
  * double's shortest decimal rendering while DuckDB rounds the full
  * binary value (ADVICE r7: 2.675 → 2.68 vs 2.67). kv_merge_operator
  * already sidesteps the cast entirely (integer cents via
  * floor(v·100+0.5), IEEE-identical on both engines); the remaining
  * decimal-cast sites (stream_matview, q48_gapfill, q64_locf,
  * q66_zscore, q69_decay, stats_ttest, layout ops, …) rely on this
  * contract, as SURVEY §5 documents. */
class DataContractSpec extends SparkSuite {

  test("money/quantity columns are 2-decimal quantities (decimal-cast exactness)") {
    val cols = Seq(
      ("events", "value"), ("orders", "o_totalprice"),
      ("lineitem", "l_quantity"), ("lineitem", "l_extendedprice"),
      ("lineitem", "l_discount"), ("customer", "c_acctbal"),
      ("supplier", "s_acctbal"), ("part", "p_retailprice"))
    for ((t, c) <- cols) {
      val bad = Tables.load(spark, sfDir, t)
        .filter(col(c).isNotNull && col(c) =!= round(col(c), 2)).count()
      assert(bad == 0,
        s"$t.$c carries values with more than 2 decimals ($bad rows): the " +
          "DECIMAL(12,2)-cast oracles are no longer exact on this data — " +
          "re-derive those ops through integer cents (kv_merge_operator's " +
          "floor(v*100+0.5) pattern) before trusting the gate")
    }
  }
}
