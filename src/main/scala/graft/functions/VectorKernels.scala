package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpectsInputTypes, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

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

  /** The same fold over plain arrays — for executor-local sequential
    * loops (ann_mmr's greedy re-rank). MUST stay in lockstep with the
    * ArrayData overload: the oracle equality of every cosine-based op
    * rests on this exact accumulation order. */
  def cosine(a: Array[Double], b: Array[Double]): Double = {
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      val x = a(i)
      val y = b(i)
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  case class CosineSim(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] =
      Seq(ArrayType(DoubleType), ArrayType(DoubleType))
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

  // ---- random-hyperplane LSH signature ----------------------------

  val HpNumPlanes = 16
  val HpDim = 64
  /** Default band count — the single source for the Column API, the
    * SQL builder's no-arg default and [[graft.operators.Similarity]]. */
  val HpSigBands = 4

  /** Deterministic Gaussian hyperplanes (seed 42), compiled into the
    * kernel as a plan-independent constant — every executor JVM
    * materializes the same planes once; nothing ships with the plan
    * or the data. */
  lazy val hyperplanes: Array[Array[Double]] = {
    val rnd = new scala.util.Random(42)
    Array.fill(HpNumPlanes)(Array.fill(HpDim)(rnd.nextGaussian()))
  }

  /** Hyperplane LSH band signatures of a double vector: bit p = sign
    * of dot(v, plane_p) (accumulated left-to-right, matching DuckDB's
    * `list_dot_product` so oracles can recompute the signs), packed
    * into `bands` longs of numPlanes/bands bits each. The packed bit
    * pattern IS the join key — 4-bit patterns are lossless, so no
    * hash step and no collision caveat in the oracle.
    *
    * Replaces the interpreted `transform(typedLit(planes), dot > 0)`
    * formulation — the round-1 ann_lsh hot spot (interpreted HOFs
    * re-evaluate the lambda expression tree per element: 16 planes ×
    * 64-element dot as interpreted nodes ≈ 3 orders slower than this
    * loop). */
  def hyperplaneBands(v: ArrayData, bands: Int): ArrayData = {
    val r = HpNumPlanes / bands
    val n = math.min(v.numElements(), HpDim)
    val out = new Array[Long](bands)
    var p = 0
    while (p < HpNumPlanes) {
      val plane = hyperplanes(p)
      var dot = 0.0
      var i = 0
      while (i < n) {
        dot += v.getDouble(i) * plane(i)
        i += 1
      }
      if (dot > 0) out(p / r) |= 1L << (p % r)
      p += 1
    }
    new GenericArrayData(out)
  }

  case class HyperplaneBands(child: Expression, bands: Int)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(ArrayType(DoubleType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_hyperplane_bands"
    override protected def nullSafeEval(input: Any): Any =
      VectorKernels.hyperplaneBands(input.asInstanceOf[ArrayData], bands)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.VectorKernels.hyperplaneBands($c, $bands)")
    override protected def withNewChildInternal(newChild: Expression): HyperplaneBands =
      copy(child = newChild)
  }

  // ---- product quantization (PQ) ----------------------------------

  /** PQ encode: split `v` into M contiguous subvectors, emit per
    * subspace the index of the nearest (L2) codebook centroid.
    * `codebook` is flat `[(m·K + k)·subDim + d]`. Output: M codes of
    * log2(K) bits each — the logical `array<long>` form; packed for
    * storage, a 64-float embedding (256 B) becomes M·log2(K)/8 bytes
    * (8 B at M=16, K=16 → 32×). */
  def pqEncode(v: ArrayData, codebook: ArrayData, m: Int, k: Int): ArrayData = {
    val subDim = codebook.numElements() / (m * k)
    // loud failures beat unchecked unsafe reads: a mis-sized codebook
    // truncates subDim silently, a short vector would read off-heap
    // garbage past numElements
    require(subDim >= 1 && codebook.numElements() == m * k * subDim,
      s"pq_encode: codebook length ${codebook.numElements()} != m*k*subDim ($m*$k*$subDim)")
    require(v.numElements() >= m * subDim,
      s"pq_encode: vector has ${v.numElements()} dims, need ${m * subDim}")
    val out = new Array[Long](m)
    var mm = 0
    while (mm < m) {
      var best = 0
      var bestDist = Double.MaxValue
      var kk = 0
      while (kk < k) {
        var dist = 0.0
        var d = 0
        while (d < subDim) {
          val diff = v.getDouble(mm * subDim + d) -
            codebook.getDouble((mm * k + kk) * subDim + d)
          dist += diff * diff
          d += 1
        }
        if (dist < bestDist) { bestDist = dist; best = kk }
        kk += 1
      }
      out(mm) = best
      mm += 1
    }
    new GenericArrayData(out)
  }

  /** Asymmetric distance computation: approximate `dot(query, x)`
    * from x's codes and the query's per-subspace lookup table
    * `lut[m·K + k] = dot(query_sub_m, centroid_{m,k})` — M adds per
    * candidate instead of `dim` multiply-adds. */
  def adcDot(codes: ArrayData, lut: ArrayData, k: Int): Double = {
    val m = codes.numElements()
    require(lut.numElements() >= m * k,
      s"adc_dot: lut has ${lut.numElements()} entries, need ${m * k}")
    var s = 0.0
    var mm = 0
    while (mm < m) {
      val code = codes.getLong(mm).toInt
      require(code >= 0 && code < k, s"adc_dot: code $code out of [0, $k)")
      s += lut.getDouble(mm * k + code)
      mm += 1
    }
    s
  }

  case class PqEncode(left: Expression, right: Expression, m: Int, k: Int)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] =
      Seq(ArrayType(DoubleType), ArrayType(DoubleType))
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_pq_encode"
    override protected def nullSafeEval(v: Any, cb: Any): Any =
      pqEncode(v.asInstanceOf[ArrayData], cb.asInstanceOf[ArrayData], m, k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (v, cb) => s"graft.functions.VectorKernels.pqEncode($v, $cb, $m, $k)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): PqEncode =
      copy(left = newLeft, right = newRight)
  }

  case class AdcDot(left: Expression, right: Expression, k: Int)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] =
      Seq(ArrayType(LongType), ArrayType(DoubleType))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "graft_adc_dot"
    override protected def nullSafeEval(codes: Any, lut: Any): Any =
      adcDot(codes.asInstanceOf[ArrayData], lut.asInstanceOf[ArrayData], k)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        (c, l) => s"graft.functions.VectorKernels.adcDot($c, $l, $k)")
    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): AdcDot =
      copy(left = newLeft, right = newRight)
  }

  def buildPqEncode(args: Seq[Expression]): Expression = args match {
    case Seq(v, cb, Literal(m: Int, IntegerType), Literal(k: Int, IntegerType)) =>
      require(m >= 1 && k >= 1, s"graft_pq_encode: need m,k >= 1 (got $m, $k)")
      PqEncode(v, cb, m, k)
    case _ => throw new IllegalArgumentException(
      "graft_pq_encode(vec, codebook, m, k) — m and k must be int literals")
  }

  def buildAdcDot(args: Seq[Expression]): Expression = args match {
    case Seq(c, l, Literal(k: Int, IntegerType)) =>
      require(k >= 1, s"graft_adc_dot: need k >= 1 (got $k)")
      AdcDot(c, l, k)
    case _ => throw new IllegalArgumentException(
      "graft_adc_dot(codes, lut, k) — k must be an int literal")
  }

  def buildHyperplaneBands(args: Seq[Expression]): Expression = args match {
    case Seq(v, Literal(b: Int, IntegerType)) =>
      // validate at analysis time: a non-divisor would mis-route plane
      // p into out(p/r) past the array end inside generated code
      require(b >= 1 && b <= HpNumPlanes && HpNumPlanes % b == 0,
        s"graft_hyperplane_bands: bands must divide $HpNumPlanes (got $b)")
      HyperplaneBands(v, b)
    case Seq(v) => HyperplaneBands(v, HpSigBands)
    case _ => throw new IllegalArgumentException(
      "graft_hyperplane_bands(vec[, bands]) — bands must be an int literal")
  }
}
