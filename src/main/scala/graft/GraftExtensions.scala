package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/**
 * `SparkSessionExtensions` installer: registers the engine's native
 * expressions as SQL functions. Activate with
 * `spark.sql.extensions=graft.GraftExtensions` (or
 * `builder.withExtensions(new GraftExtensions)`); SQL then has
 * `graft_vector_dot(a, b)` next to the Column API in
 * [[graft.ml.Similarity]].
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_vector_dot"),
      new ExpressionInfo(classOf[graft.functions.VectorDot].getName,
        "graft_vector_dot"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.VectorDot(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_simhash60"),
      new ExpressionInfo(classOf[graft.functions.SimHash60].getName,
        "graft_simhash60"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) =>
        graft.functions.SimHash60(children.head)))
    // graft_char_ngrams(text, n): n must be a literal — it shapes the
    // kernel, not a per-row input (the model-parameter expressions
    // IvfRankCells/PqEncode/LshBucket64 stay Column-API-only for the
    // same reason: their codebooks are not SQL-expressible values)
    ext.injectFunction((
      FunctionIdentifier("graft_char_ngrams"),
      new ExpressionInfo(classOf[graft.functions.CharNGrams].getName,
        "graft_char_ngrams"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        val n = children(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_char_ngrams requires a literal n-gram size, got $other")
        }
        graft.functions.CharNGrams(children.head, n)
      }))
  }
}
