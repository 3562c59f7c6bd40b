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
  }
}
