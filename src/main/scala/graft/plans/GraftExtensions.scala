package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Engine extensions, wired via `spark.sql.extensions`
  * (see [[graft.GraftSession]]). This is the public Catalyst extension
  * point — injected functions resolve in SQL text, `expr(...)`, and
  * `functions.call_function`, exactly like builtins, and participate in
  * whole-stage codegen. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val functions: Seq[FunctionDescription] = Seq(
    (FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => VecDot(children.head, children(1))),
    (FunctionIdentifier("word_shingles"),
      new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
      (children: Seq[Expression]) => children(1) match {
        // the shingle length parameterizes the GENERATED CODE (loop
        // bounds), so it must be a compile-time literal, not a column
        case org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
            org.apache.spark.sql.types.IntegerType) =>
          WordShingles(children.head, v)
        case other => throw new IllegalArgumentException(
          s"word_shingles(tokens, n): n must be an integer literal, got $other")
      }))
}
