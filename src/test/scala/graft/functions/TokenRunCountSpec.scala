package graft.functions

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.Bridge
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** TokenRunCount == size(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]'))
  * — the byte-scan counter must agree with the regex semantics it replaces,
  * including multi-byte code points (one match per code point for the
  * [^a-z0-9 ] class) and the codegen path agreeing with interpreted eval.
  */
class TokenRunCountSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkFixture.spark

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, res.status.toString)
  }

  private def javaRegexCount(s: String): Int = {
    val m = java.util.regex.Pattern.compile("[a-z]+|[0-9]+|[^a-z0-9 ]").matcher(s)
    var n = 0
    while (m.find()) n += 1
    n
  }

  // mixed alphabet: runs, digits, spaces, punctuation, uppercase,
  // accented Latin (2-byte UTF-8), CJK (3-byte), and an emoji (4-byte,
  // non-BMP — the surrogate-pair case)
  private val charGen: Gen[String] = Gen.frequency(
    8 -> Gen.alphaLowerChar.map(_.toString),
    3 -> Gen.numChar.map(_.toString),
    4 -> Gen.const(" "),
    2 -> Gen.oneOf(".", ",", "!", "?", "A", "Z", "_"),
    1 -> Gen.oneOf("é", "ü", "ß", "中", "語", "😀", "🚀"))
  private val textGen: Gen[String] =
    Gen.choose(0, 80).flatMap(n => Gen.listOfN(n, charGen).map(_.mkString))

  test("driver-side count == java regex count on random Unicode strings") {
    check(Prop.forAll(textGen) { s =>
      TokenRunCount.count(org.apache.spark.unsafe.types.UTF8String.fromString(s)) ==
        javaRegexCount(s)
    })
  }

  test("engine column (codegen) == regexp_extract_all size on random strings and the fixture") {
    import spark.implicits._
    val gen = Gen.listOfN(200, textGen)
    val strings = gen.sample.getOrElse(Nil) ++ Seq("", " ", "😀😀", "a1 b2", "ABC", "héllo wörld")
    val df = strings.toDF("text")
    val both = df.select(
      Bridge.column(TokenRunCount(Bridge.childExpr(col("text")))).as("fast"),
      size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).as("ref"))
    assert(both.filter(col("fast") =!= col("ref")).count() == 0)

    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val mism = docs.select(
      Bridge.column(TokenRunCount(Bridge.childExpr(col("text")))).as("fast"),
      size(regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0))).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(mism == 0, "must match the regex count on the real corpus")
  }

  test("registered for SQL users as token_run_count") {
    GraftFunctions.register(spark)
    import spark.implicits._
    Seq("a1 b!").toDF("t").createOrReplaceTempView("trc_t")
    assert(spark.sql("SELECT token_run_count(t) FROM trc_t").head().getInt(0) == 4)
  }
}
