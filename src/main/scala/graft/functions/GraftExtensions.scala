package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions hook: registers the custom codegen'd expressions
  * as SQL functions, so `spark.sql("... vec_dot(a, b) ...")` works exactly
  * like a built-in — the full extension path (SURVEY §4: custom Expression
  * via SparkSessionExtensions) without needing the DataFrame API.
  *
  * Wire up with `.withExtensions(new GraftExtensions)` (see
  * graft.Engine.createSession) or `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions", name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product of two array<double>"),
      (children: Seq[Expression]) => DotProduct(children(0), children(1))))
    ext.injectFunction((
      new FunctionIdentifier("bitmap_jaccard"),
      info("bitmap_jaccard", "bitmap_jaccard(a, b) - Jaccard of packed bitmap sets"),
      (children: Seq[Expression]) => BitmapJaccard(children(0), children(1))))
  }
}
