package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom codegen'd Catalyst expressions for the signature hot paths
  * (SURVEY §3: native `Expression` over UDF over interpreted HOFs).
  * Each participates in whole-stage codegen via `defineCodeGen`
  * emitting a single static call into [[TextHashing]] — no
  * row-boxing, no interpreted lambda trees, no UDF serialization.
  *
  * Registered through `SparkSessionExtensions` (see
  * [[graft.plans.GraftExtensions]]); the Column API resolves them by
  * name via `call_function`.
  */
object TextExpressions {

  case class MinHashBands(child: Expression, numHashes: Int, bands: Int)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_minhash_bands"
    override protected def nullSafeEval(input: Any): Any =
      TextHashing.minhashBands(input.asInstanceOf[UTF8String], numHashes, bands)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev,
        c => s"graft.functions.TextHashing.minhashBands($c, $numHashes, $bands)")
    override protected def withNewChildInternal(newChild: Expression): MinHashBands =
      copy(child = newChild)
  }

  case class SimHash64(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_simhash64"
    override protected def nullSafeEval(input: Any): Any =
      TextHashing.simhash64(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextHashing.simhash64($c)")
    override protected def withNewChildInternal(newChild: Expression): SimHash64 =
      copy(child = newChild)
  }

  case class Fingerprint64(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = LongType
    override def prettyName: String = "graft_fingerprint64"
    override protected def nullSafeEval(input: Any): Any =
      TextHashing.fingerprint64(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextHashing.fingerprint64($c)")
    override protected def withNewChildInternal(newChild: Expression): Fingerprint64 =
      copy(child = newChild)
  }

  case class SimHashChunks(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(LongType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_simhash_chunks"
    override protected def nullSafeEval(input: Any): Any =
      TextHashing.simhashChunks(input.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextHashing.simhashChunks($c)")
    override protected def withNewChildInternal(newChild: Expression): SimHashChunks =
      copy(child = newChild)
  }

  /** One-pass `[ws_tokens, re_tokens]` counter — see
    * [[TextHashing.tokenCounts]] for the exact split/regex semantics
    * it replaces. */
  case class TokenCounts(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_token_counts"
    override protected def nullSafeEval(input: Any): Any =
      TextHashing.tokenCounts(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextHashing.tokenCounts($c)")
    override protected def withNewChildInternal(newChild: Expression): TokenCounts =
      copy(child = newChild)
  }

  /** One-pass `[n_char, n_word, n_stop, n_alpha]` counter — see
    * [[TextHashing.qualityCounts]]. */
  case class QualityCounts(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[DataType] = Seq(StringType)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "graft_quality_counts"
    override protected def nullSafeEval(input: Any): Any =
      TextHashing.qualityCounts(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextHashing.qualityCounts($c)")
    override protected def withNewChildInternal(newChild: Expression): QualityCounts =
      copy(child = newChild)
  }

  /** Expression builders (used by the extension registration). */
  def buildMinHashBands(args: Seq[Expression]): Expression = args match {
    case Seq(t, Literal(n: Int, IntegerType), Literal(b: Int, IntegerType)) =>
      MinHashBands(t, n, b)
    case Seq(t) => MinHashBands(t, 64, 16)
    case _ => throw new IllegalArgumentException(
      "graft_minhash_bands(text[, numHashes, bands]) — sizes must be int literals")
  }

  def buildSimHash64(args: Seq[Expression]): Expression = args match {
    case Seq(t) => SimHash64(t)
    case _ => throw new IllegalArgumentException("graft_simhash64(text)")
  }

  def buildSimHashChunks(args: Seq[Expression]): Expression = args match {
    case Seq(h) => SimHashChunks(h)
    case _ => throw new IllegalArgumentException("graft_simhash_chunks(simhash)")
  }

  def buildFingerprint64(args: Seq[Expression]): Expression = args match {
    case Seq(t) => Fingerprint64(t)
    case _ => throw new IllegalArgumentException("graft_fingerprint64(text)")
  }

  def buildTokenCounts(args: Seq[Expression]): Expression = args match {
    case Seq(t) => TokenCounts(t)
    case _ => throw new IllegalArgumentException("graft_token_counts(text)")
  }

  def buildQualityCounts(args: Seq[Expression]): Expression = args match {
    case Seq(t) => QualityCounts(t)
    case _ => throw new IllegalArgumentException("graft_quality_counts(text)")
  }

  /** Column API (requires the graft extensions on the session). */
  def minhash_bands(text: Column, numHashes: Int = 64, bands: Int = 16): Column =
    call_function("graft_minhash_bands", text, lit(numHashes), lit(bands))

  def simhash64(text: Column): Column =
    call_function("graft_simhash64", text)

  def simhash_chunks(simhash: Column): Column =
    call_function("graft_simhash_chunks", simhash)

  def fingerprint64(text: Column): Column =
    call_function("graft_fingerprint64", text)

  def token_counts(text: Column): Column =
    call_function("graft_token_counts", text)

  def quality_counts(text: Column): Column =
    call_function("graft_quality_counts", text)
}
