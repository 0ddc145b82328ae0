package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.TextExpressions

/** graft's `SparkSessionExtensions` hook: registers the custom
  * codegen'd expressions so any session created with
  * `spark.sql.extensions=graft.plans.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`) can use them from
  * SQL and from the Column API (`call_function`).
  *
  * The analog of the reference's function catalog registration
  * (`/root/reference/src/query_engine/src/function/mod.rs`), done
  * through Spark's sanctioned extension point instead of a private
  * registry.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_minhash_bands"),
      new ExpressionInfo(TextExpressions.MinHashBands.getClass.getName,
        "graft_minhash_bands"),
      TextExpressions.buildMinHashBands _))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(TextExpressions.SimHash64.getClass.getName,
        "graft_simhash64"),
      TextExpressions.buildSimHash64 _))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash_chunks"),
      new ExpressionInfo(TextExpressions.SimHashChunks.getClass.getName,
        "graft_simhash_chunks"),
      TextExpressions.buildSimHashChunks _))
    ext.injectFunction((
      FunctionIdentifier("graft_cosine"),
      new ExpressionInfo(graft.functions.VectorKernels.CosineSim.getClass.getName,
        "graft_cosine"),
      graft.functions.VectorKernels.buildCosine _))
    ext.injectFunction((
      FunctionIdentifier("graft_hyperplane_bands"),
      new ExpressionInfo(graft.functions.VectorKernels.HyperplaneBands.getClass.getName,
        "graft_hyperplane_bands"),
      graft.functions.VectorKernels.buildHyperplaneBands _))
    ext.injectFunction((
      FunctionIdentifier("graft_pq_encode"),
      new ExpressionInfo(graft.functions.VectorKernels.PqEncode.getClass.getName,
        "graft_pq_encode"),
      graft.functions.VectorKernels.buildPqEncode _))
    ext.injectFunction((
      FunctionIdentifier("graft_fingerprint64"),
      new ExpressionInfo(TextExpressions.Fingerprint64.getClass.getName,
        "graft_fingerprint64"),
      TextExpressions.buildFingerprint64 _))
    ext.injectFunction((
      FunctionIdentifier("graft_sum_scaled"),
      new ExpressionInfo(classOf[graft.functions.SumScaledExact].getName,
        "graft_sum_scaled"),
      graft.functions.SumScaledExact.build _))
    ext.injectFunction((
      FunctionIdentifier("graft_adc_dot"),
      new ExpressionInfo(graft.functions.VectorKernels.AdcDot.getClass.getName,
        "graft_adc_dot"),
      graft.functions.VectorKernels.buildAdcDot _))
    ext.injectFunction((
      FunctionIdentifier("graft_token_counts"),
      new ExpressionInfo(TextExpressions.TokenCounts.getClass.getName,
        "graft_token_counts"),
      TextExpressions.buildTokenCounts _))
    ext.injectFunction((
      FunctionIdentifier("graft_quality_counts"),
      new ExpressionInfo(TextExpressions.QualityCounts.getClass.getName,
        "graft_quality_counts"),
      TextExpressions.buildQualityCounts _))
    ext.injectFunction((
      FunctionIdentifier("graft_might_contain"),
      new ExpressionInfo(graft.functions.BloomFunctions.getClass.getName,
        "graft_might_contain"),
      graft.functions.BloomFunctions.buildMightContain _))
  }
}
