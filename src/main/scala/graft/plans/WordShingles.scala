package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native word-level n-gram shingling over a token-array column, with
  * whole-stage codegen.
  *
  * The higher-order-function formulation (a `zip_with` chain over n
  * shifted `slice`s — [[graft.functions.TextFunctions.shinglesFromTokens]]'
  * fallback form) evaluates its lambdas through the interpreter per
  * element; shingling runs on EVERY document of the corpus in every
  * near-dup pipeline (d3/d5/c1/c2), making it the dominant map-side cost.
  * This expression builds the shingle array in one tight generated loop:
  * for each window of n tokens, one `UTF8String.concatWs` — no lambda
  * dispatch, no intermediate sliced arrays.
  *
  * Semantics are IDENTICAL to the HOF form (space-joined windows,
  * duplicates retained, empty array when the document has fewer than n
  * tokens, a window containing a null token yields a null shingle — the
  * HOF's `concat` null-propagation) — asserted element-for-element in
  * `WordShinglesSpec`, so the swap cannot change any oracle-checked
  * result. A null ARRAY propagates null (UnaryExpression default).
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, s"shingle length must be >= 1, got $n")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects array<string>, got ${other.simpleString}")
  }

  // Output elements are null exactly when a window saw a null token, so
  // containsNull mirrors the input's: split-produced arrays keep the
  // tight containsNull=false schema.
  override def dataType: DataType = child.dataType match {
    case ArrayType(_, cn) => ArrayType(StringType, containsNull = cn)
    case _ => ArrayType(StringType, containsNull = true) // unresolved guard
  }

  override def prettyName: String = "word_shingles"

  private val sep = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val a = input.asInstanceOf[ArrayData]
    val cnt = a.numElements() - (n - 1)
    if (cnt <= 0) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](cnt)
      var i = 0
      while (i < cnt) {
        val parts = new Array[UTF8String](n)
        var j = 0
        var anyNull = false
        while (j < n && !anyNull) {
          if (a.isNullAt(i + j)) anyNull = true
          else parts(j) = a.getUTF8String(i + j)
          j += 1
        }
        // null token in the window ⇒ null shingle (HOF concat parity)
        out(i) = if (anyNull) null else UTF8String.concatWs(sep, parts: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val sepRef = ctx.addReferenceObj("sep", sep, classOf[UTF8String].getName)
      val cnt = ctx.freshName("cnt")
      val out = ctx.freshName("out")
      val parts = ctx.freshName("parts")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val anyNull = ctx.freshName("anyNull")
      val u8 = classOf[UTF8String].getName
      val gad = classOf[GenericArrayData].getName
      s"""
         |int $cnt = $a.numElements() - ${n - 1};
         |if ($cnt <= 0) {
         |  ${ev.value} = new $gad(new Object[0]);
         |} else {
         |  Object[] $out = new Object[$cnt];
         |  for (int $i = 0; $i < $cnt; $i++) {
         |    $u8[] $parts = new $u8[$n];
         |    boolean $anyNull = false;
         |    for (int $j = 0; $j < $n && !$anyNull; $j++) {
         |      if ($a.isNullAt($i + $j)) { $anyNull = true; }
         |      else { $parts[$j] = $a.getUTF8String($i + $j); }
         |    }
         |    $out[$i] = $anyNull ? null : $u8.concatWs($sepRef, $parts);
         |  }
         |  ${ev.value} = new $gad($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}
