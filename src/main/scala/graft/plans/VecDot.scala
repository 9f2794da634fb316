package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, NullType}

/** Native dot product over two `array<float>` columns, with whole-stage
  * codegen.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) express the
  * same fold but evaluate the lambda per element through the interpreter —
  * they are excluded from whole-stage codegen, which makes them the
  * hottest instruction in every ANN / embedding-dedup pipeline (millions
  * of candidate pairs × vector length). This expression compiles to a
  * tight primitive loop instead.
  *
  * The fold is left-to-right with a 0.0 accumulator and per-element
  * promotion to double — BIT-IDENTICAL to the
  * [[graft.functions.VectorFunctions.dotFold]] formulation and to the
  * DuckDB oracle's `list_reduce(list_transform(list_zip(a, b), …))`
  * (asserted in `VecDotSpec`), so swapping it into a query cannot change
  * any hash-checked result.
  *
  * Null vector ⇒ null (BinaryExpression default); a null ELEMENT at any
  * position ⇒ null result, matching the HOF form (`zip_with` yields a
  * null product, the `aggregate` fold then propagates it) and DuckDB's
  * `list_reduce`. The per-element null check is emitted ONLY when the
  * input's `containsNull` says nulls are possible — dense embedding
  * arrays (containsNull = false) keep the branch-free hot loop.
  */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // Arrays of float (stored embeddings) or double (literal hyperplanes /
  // pre-promoted math) are both accepted; elements widen to double exactly,
  // matching the HOF form's per-element `cast("double")`.
  private def isFloatArr(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  private def isVec(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case NullType => true // untyped NULL literal; null-propagates to null
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (isVec(left.dataType) && isVec(right.dataType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects (array<float|double>, array<float|double>), " +
        s"got (${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def dataType: DataType = DoubleType

  // nullable even for non-null inputs: ragged arrays produce NULL
  override def nullable: Boolean = true

  override def prettyName: String = "vec_dot"

  // Length mismatch ⇒ NULL: `zip_with` pads the shorter array with null,
  // so the fold yields null, and DuckDB's list_zip does the same — a
  // truncated partial sum would silently diverge from both.
  private def mayContainNull(dt: DataType): Boolean = dt match {
    case ArrayType(_, containsNull) => containsNull
    case _ => true
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    if (x.numElements() != y.numElements()) null
    else {
      val xf = isFloatArr(left.dataType)
      val yf = isFloatArr(right.dataType)
      val checkNulls = mayContainNull(left.dataType) || mayContainNull(right.dataType)
      val n = x.numElements()
      var acc = 0.0
      var i = 0
      while (i < n) {
        if (checkNulls && (x.isNullAt(i) || y.isNullAt(i))) return null
        val xv = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
        val yv = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
        acc += xv * yv
        i += 1
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      def get(arr: String, dt: DataType): String =
        if (isFloatArr(dt)) s"(double) $arr.getFloat($i)" else s"$arr.getDouble($i)"
      // emit the per-element null branch only when the schema admits null
      // elements — dense embeddings keep the branch-free loop
      val nullCheck =
        if (mayContainNull(left.dataType) || mayContainNull(right.dataType))
          s"""if ($a.isNullAt($i) || $b.isNullAt($i)) {
             |      ${ev.isNull} = true; break;
             |    }""".stripMargin
        else ""
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $acc += ${get(a, left.dataType)} * ${get(b, right.dataType)};
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $acc;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}
