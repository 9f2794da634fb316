package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TextVectorSpec extends SparkSpec {
  import spark.implicits._

  test("tokens + normalized: lowercase, collapse whitespace") {
    val got = Seq("  Foo   BAR\tbaz  ").toDF("text")
      .select(TextFunctions.tokens(TextFunctions.normalized(col("text"))))
      .as[Seq[String]].head()
    assert(got == Seq("foo", "bar", "baz"))
  }

  private def shingled(text: String, n: Int): Seq[String] =
    Seq(text).toDF("text")
      .withColumn("toks",
        TextFunctions.tokens(TextFunctions.normalized(col("text"))))
      .select(TextFunctions.shinglesFromTokens(col("toks"), n))
      .as[Seq[String]].head()

  test("shingles produce exactly the n-grams, distinct") {
    assert(shingled("a b c d a b c d", 3).toSet ==
      Set("a b c", "b c d", "c d a", "d a b"))
  }

  test("shingles of a too-short doc are empty") {
    assert(shingled("a b", 3).isEmpty)
  }

  test("shingles of an exactly-n doc is the single n-gram") {
    assert(shingled("a b c", 3) == Seq("a b c"))
  }

  test("langId picks the language with stopword evidence; CJK wins scripts") {
    val got = Seq(
      "the cat sat on the mat and the dog",
      "der Hund und die Katze und das Haus",
      "el perro y la casa de que",
      "le chat et le chien et les maisons",
      "这是一个中文句子没有空格",
      "xyzzy plugh")
      .toDF("text").select(TextFunctions.langId(col("text")))
      .as[String].collect().toSeq
    assert(got == Seq("en", "de", "es", "fr", "zh", "und"))
  }

  test("fingerprint is whitespace/case-insensitive") {
    val fps = Seq("Hello   World", "hello world", "hello  world ")
      .toDF("text").select(TextFunctions.fingerprint(col("text")))
      .as[String].collect().toSet
    assert(fps.size == 1)
  }

  test("dot and cosine: sequential-fold double math on float arrays") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)))
      .toDF("a", "b")
    val d = df.select(VectorFunctions.dot(col("a"), col("b"))).as[Double].head()
    assert(d == 32.0)
    val c = df.select(VectorFunctions.cosine(col("a"), col("a"))).as[Double].head()
    assert(math.abs(c - 1.0) < 1e-12)
    val z = Seq((Array(0.0f, 0.0f), Array(1.0f, 1.0f))).toDF("a", "b")
      .select(VectorFunctions.cosine(col("a"), col("b"))).as[Double].head()
    assert(z == 0.0)
  }

  test("signBits emits one bit per plane") {
    val planes = Seq(Seq(1.0, 0.0), Seq(-1.0, 0.0), Seq(0.0, 1.0))
    val got = Seq(Array(2.0f, -3.0f)).toDF("v")
      .select(VectorFunctions.signBits(col("v"), planes)).as[String].head()
    assert(got == "100")
  }
}
