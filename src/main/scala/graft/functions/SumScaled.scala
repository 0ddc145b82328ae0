package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Exact fixed-point SUM with a primitive-long inner loop.
  *
  * Semantics: `sum(cast(x as decimal(p, digits)))` — each input is
  * HALF_UP-rounded to `digits` decimal places and the rounded values
  * are summed EXACTLY; the result is `decimal(38, digits)` (null for
  * an all-null/empty group, like SQL SUM).
  *
  * Why it exists (measured, BENCH_LAYOUT_r07.json): Spark's Decimal
  * sum allocates and overflow-checks a Decimal per row — 2.3× the
  * cost of the double path on a 6M-row aggregate (0.48 s vs 0.21 s)
  * — while DuckDB sums decimals as native int128. This aggregate
  * keeps the PER-ROW work in primitive long arithmetic inside
  * whole-stage codegen (`round(x·10^digits)` is one double multiply
  * + round + long add) and pays Decimal cost only where it is
  * per-BUFFER, not per-row: `merge` folds the right buffer's long
  * partial into a `decimal(38,0)` carry, and `eval` applies the
  * scale.
  *
  * Exactness at 100 TB: one long partial accumulates one PARTITION's
  * rows — overflow would need |partition| · max(|x|·10^digits) ≥
  * 2^63, i.e. ~10^9 rows of 10^9-cent values in ONE task, far beyond
  * any sane partition size (SURVEY §4 sizes partitions in the
  * 10^6-row range); the cross-partition total lives in the
  * decimal(38,0) carry, exact to 38 digits. The double rounding step
  * is exact for |x|·10^digits < 2^53 — checked by the caller's data
  * contract (cents of TPC-H-scale prices ≤ 10^11).
  *
  * Input contract: values carry at most `digits` decimal places (as
  * all TPC-H-style money/quantity columns do) — there the rounded
  * long equals the decimal cast bit-for-bit (SumScaledSpec). For
  * FINER inputs the two semantics legitimately diverge: a decimal
  * cast rounds the shortest decimal rendering of the double (Spark
  * casts 1.005 → 1.01), while this aggregate rounds the BINARY value
  * (1.005 is stored just below the halfway point, so
  * round(1.005·100) = 100). Callers summing sub-resolution data
  * should pre-round with an explicit policy instead of relying on
  * either implicit one.
  *
  * The reference sums decimals inside its hand-written aggregate
  * executors (`query_engine/src/execution/volcano_executor/aggregate`);
  * graft expresses the same exactness as a Catalyst
  * DeclarativeAggregate so Tungsten's hash aggregate and codegen
  * apply unchanged.
  */
case class SumScaledExact(child: Expression, digits: Int)
    extends DeclarativeAggregate with ImplicitCastInputTypes
    with UnaryLike[Expression] {
  require(digits >= 0 && digits <= 8, s"digits out of range: $digits")

  override def inputTypes: Seq[DataType] = Seq(DoubleType)
  override def nullable: Boolean = true
  override def dataType: DataType = DecimalType(38, digits)

  private lazy val factor = Literal(math.pow(10.0, digits))
  // exact 10^-digits as decimal(digits, digits) — the eval-time scale
  private lazy val recip = Literal(
    Decimal(java.math.BigDecimal.ONE.movePointLeft(digits)),
    if (digits == 0) DecimalType(1, 0) else DecimalType(digits, digits))

  private lazy val partial =
    AttributeReference("partial", LongType, nullable = false)()
  private lazy val carry =
    AttributeReference("carry", DecimalType(38, 0), nullable = false)()
  private lazy val seen =
    AttributeReference("seen", BooleanType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] =
    Seq(partial, carry, seen)

  override lazy val initialValues: Seq[Expression] = Seq(
    Literal(0L), Literal(Decimal(0), DecimalType(38, 0)), Literal(false))

  // per-row: double multiply + HALF_UP round + long add — all
  // primitive inside codegen; no Decimal touches the row loop.
  // The rounding is sign·floor(|x·f| + 0.5), NOT Catalyst's Round:
  // Round on a double codegens to a BigDecimal.valueOf(...).setScale
  // allocation PER ROW, which was the entire measured gap between
  // this aggregate and a plain double sum (r9 lab: q1_agg 0.57 s →
  // 0.26 s, the double-sum ceiling). Equality: under the caller's
  // contract the scaled value sits within half an ulp of an integer,
  // where both forms round to that integer; on an exact .5 both round
  // HALF_UP (away from zero — floor(|x|+0.5) then re-signed).
  private lazy val scaled = Multiply(child, factor)
  private lazy val roundedLong: Expression = {
    val mag = Floor(Add(Abs(scaled), Literal(0.5)))
    Cast(If(LessThan(scaled, Literal(0.0)), UnaryMinus(mag), mag), LongType)
  }
  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(child), partial, Add(partial, roundedLong)),
    carry,
    Or(seen, IsNotNull(child)))

  // per-buffer: fold the right partial into the exact decimal carry
  override lazy val mergeExpressions: Seq[Expression] = Seq(
    partial.left,
    Add(Add(carry.left, carry.right),
      Cast(partial.right, DecimalType(38, 0))),
    Or(seen.left, seen.right))

  override lazy val evaluateExpression: Expression =
    If(Not(seen), Literal(null, dataType),
      Cast(Multiply(Add(carry, Cast(partial, DecimalType(38, 0))), recip),
        dataType))

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
  override def prettyName: String = "graft_sum_scaled"
}

object SumScaledExact {
  /** FunctionRegistry builder: `graft_sum_scaled(x[, digits])`,
    * digits a literal int (default 2 — cents). */
  def build(exprs: Seq[Expression]): Expression = exprs match {
    case Seq(c) => SumScaledExact(c, 2)
    case Seq(c, Literal(d, IntegerType)) =>
      SumScaledExact(c, d.asInstanceOf[Int])
    case _ => throw new IllegalArgumentException(
      "graft_sum_scaled(x[, digits: int literal])")
  }
}
