package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.TextFunctions

class WordShinglesSpec extends SparkSpec {
  import spark.implicits._

  private val fixtures = Seq(
    "the quick brown fox jumps over the lazy dog",
    "a b",                       // shorter than n=3 → empty
    "x y z",                     // exactly n → one shingle
    "dup dup dup dup",           // duplicate windows retained
    "single")

  test("native word_shingles == the zip_with fallback, element for element") {
    for (n <- Seq(2, 3, 5)) {
      val df = fixtures.toDF("text")
        .select(TextFunctions.tokens(col("text")).as("t"))
      val native = df.select(call_function("word_shingles", col("t"), lit(n)))
        .as[Seq[String]].collect().toSeq
      val hof = df.select(TextFunctions.shinglesFromTokensHof(col("t"), n))
        .as[Seq[String]].collect().toSeq
      assert(native == hof, s"n=$n")
    }
  }

  test("word_shingles survives whole-stage codegen on a real aggregation") {
    val total = (1 to 200).map(i => s"tok$i tok${i + 1} tok${i + 2} tok${i + 3}")
      .toDF("text")
      .select(explode(TextFunctions.shinglesFromTokens(
        TextFunctions.tokens(col("text")), 3)).as("s"))
      .count()
    assert(total == 2 * 200) // 4 tokens → 2 trigrams each
  }

  test("null token array propagates null") {
    val got = spark.sql("SELECT word_shingles(CAST(NULL AS ARRAY<STRING>), 3)")
      .collect().head
    assert(got.isNullAt(0))
  }

  test("null token in a window yields a null shingle (HOF concat parity)") {
    val df = Seq(Tuple1(Seq("a", null, "b", "c"))).toDF("t")
    for (n <- Seq(1, 2, 3)) {
      val native = df.select(call_function("word_shingles", col("t"), lit(n)))
        .as[Seq[String]].head().toList
      val hof = df.select(TextFunctions.shinglesFromTokensHof(col("t"), n))
        .as[Seq[String]].head().toList
      assert(native == hof, s"n=$n: native=$native hof=$hof")
    }
    // n=2 concretely: the two windows touching the null are null shingles
    val got = df.select(call_function("word_shingles", col("t"), lit(2)))
      .as[Seq[String]].head().toList
    assert(got == List(null, null, "b c"))
  }

  test("property: native == fallback on arbitrary token arrays (incl. unicode, empties)") {
    import org.scalacheck.{Gen, Test => SCTest}
    import org.scalacheck.Prop.forAll
    val tokenGen = Gen.oneOf(
      Gen.alphaNumStr.suchThat(_.nonEmpty),
      Gen.const("汉字"), Gen.const("ümlaut"), Gen.const("a-b.c"))
    val arrGen = Gen.choose(0, 12).flatMap(n => Gen.listOfN(n, tokenGen))
    // reference implementation of the window-join, driven independently
    def expected(toks: List[String], n: Int): List[String] =
      if (toks.length < n) Nil else toks.sliding(n).map(_.mkString(" ")).toList
    val prop = forAll(arrGen, Gen.choose(2, 5)) { (toks, n) =>
      val df = Seq(Tuple1(toks)).toDF("t")
      val native = df.select(call_function("word_shingles", col("t"), lit(n)))
        .as[Seq[String]].head().toList
      val hof = df.select(TextFunctions.shinglesFromTokensHof(col("t"), n))
        .as[Seq[String]].head().toList
      native == hof && native == expected(toks, n)
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(40), prop)
    assert(res.passed, res.status.toString)
  }
}
