package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Codegen'd cosine similarity over `array<double>` vectors.
  *
  * Bit-identical to the higher-order-function formulation it
  * replaces (and to DuckDB's `list_cosine_similarity` on DOUBLE[]):
  * dot and squared norms accumulate left-to-right in element order,
  * result = dot / (sqrt(na) · sqrt(nb)) — so oracle hash-compares
  * keep passing. One fused loop, no per-element lambda trees.
  */
object VectorKernels {
  def cosine(a: ArrayData, b: ArrayData): Double = {
    // read elements in place — toDoubleArray would copy 2×d doubles
    // per call, which at millions of pairs is pure allocation churn
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    val n = math.min(a.numElements(), b.numElements())
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  case class CosineSim(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_cosine"
    override protected def nullSafeEval(a: Any, b: Any): Any =
      VectorKernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (a, b) => s"graft.functions.VectorKernels.cosine($a, $b)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): CosineSim =
      copy(left = newLeft, right = newRight)
  }

  def buildCosine(args: Seq[Expression]): Expression = args match {
    case Seq(a, b) => CosineSim(a, b)
    case _ => throw new IllegalArgumentException("graft_cosine(a, b)")
  }
}
