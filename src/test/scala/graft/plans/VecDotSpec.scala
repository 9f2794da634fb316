package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.VectorFunctions

class VecDotSpec extends SparkSpec {
  import spark.implicits._

  test("vec_dot resolves via the session extension (SQL + call_function)") {
    val sqlGot = spark.sql(
      "SELECT vec_dot(array(1.0f, 2.0f), array(3.0f, 4.0f))")
      .as[Double].head()
    assert(sqlGot == 11.0)
  }

  test("native vec_dot is bit-identical to the higher-order-function fold") {
    // adversarial floats: denormals, rounding-sensitive magnitudes
    val vecs = Seq(
      (Array(1.1f, -2.2f, 3.3f, 4.7f), Array(0.3f, 0.7f, -9.1f, 2.2f)),
      (Array(1e-30f, 1e30f, -1e30f, 1f), Array(1e-30f, 1f, 1f, 0.1f)),
      (Array.fill(64)(0.123456f), Array.fill(64)(-0.654321f)))
    val df = vecs.toDF("a", "b")
    val native = df.select(VectorFunctions.dot(col("a"), col("b")))
      .as[Double].collect()
    val fold = df.select(VectorFunctions.dotFold(col("a"), col("b")))
      .as[Double].collect()
    // exact bit equality, not approximate — the oracle hash requires it
    assert(native.map(java.lang.Double.doubleToLongBits).toSeq ==
      fold.map(java.lang.Double.doubleToLongBits).toSeq)
  }

  test("vec_dot survives whole-stage codegen on a real scan") {
    val df = (1 to 100).map(i =>
      (Array.fill(8)(i.toFloat), Array.fill(8)(2.0f))).toDF("a", "b")
    val got = df.select(VectorFunctions.dot(col("a"), col("b")).as("d"))
      .agg(sum("d")).as[Double].head()
    assert(got == (1 to 100).map(_ * 2.0 * 8).sum)
  }

  test("null vector yields null, not a crash") {
    val got = spark.sql("SELECT vec_dot(NULL, array(1.0f))").collect().head
    assert(got.isNullAt(0))
  }

  test("ragged arrays yield null — matching the zip_with fold, not a truncated sum") {
    val df = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f, 5.0f))).toDF("a", "b")
    val native = df.select(VectorFunctions.dot(col("a"), col("b"))).collect().head
    val fold = df.select(VectorFunctions.dotFold(col("a"), col("b"))).collect().head
    assert(native.isNullAt(0) && fold.isNullAt(0))
  }

  test("null ELEMENT yields null — matching the zip_with fold, not garbage") {
    // array() of boxed Floats with a null slot → containsNull = true
    val df = Seq(1).toDF("x").select(
      array(lit(1.0f), lit(null).cast("float"), lit(3.0f)).as("a"),
      array(lit(2.0f), lit(5.0f), lit(7.0f)).as("b"))
    val native = df.select(VectorFunctions.dot(col("a"), col("b"))).collect().head
    val fold = df.select(VectorFunctions.dotFold(col("a"), col("b"))).collect().head
    assert(native.isNullAt(0) && fold.isNullAt(0))
  }

  test("dot falls back to the builtin fold when vec_dot is not registered") {
    val reg = spark.sessionState.functionRegistry
    val id = org.apache.spark.sql.catalyst.FunctionIdentifier("vec_dot")
    val df = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
    assert(reg.dropFunction(id)) // simulate a session without GraftExtensions
    try {
      val got = df.select(VectorFunctions.dot(col("a"), col("b")))
        .as[Double].head()
      assert(got == 11.0) // resolved via dotFold, no AnalysisException
    } finally graft.plans.GraftExtensions.functions.foreach { case (fid, info, builder) =>
      reg.registerFunction(fid, info, builder)
    }
    assert(spark.catalog.functionExists("vec_dot"))
  }
}
