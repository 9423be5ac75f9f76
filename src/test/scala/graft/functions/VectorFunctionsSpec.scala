package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import VectorFunctions._

/** The codegen DotProduct expression must be bit-identical to the
  * interpreted higher-order formulation it replaced (same sequential
  * accumulation), for float and double arrays, mixed, including nulls.
  */
class VectorFunctionsSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkFixture.spark
  import spark.implicits._

  private lazy val df = Seq(
    (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
    (Array(0.1f, -0.2f, 0.3f), Array(-0.4f, 0.5f, 0.25f)),
    (Array.fill(64)(0.123f), Array.fill(64)(-0.456f))).toDF("a", "b")

  test("codegen dot == interpreted dot, bit-exact") {
    val rows = df.select(dot(col("a"), col("b")).as("d"), dotHof(col("a"), col("b")).as("h"))
      .as[(Double, Double)].collect()
    rows.foreach { case (d, h) =>
      assert(java.lang.Double.doubleToLongBits(d) == java.lang.Double.doubleToLongBits(h))
    }
    assert(rows(0)._1 == 32.0)
  }

  test("mixed float/double inputs (literal double planes vs float vectors)") {
    val plane = array((1 to 3).map(i => lit(i * 0.5)): _*)
    val out = df.limit(1).select(dot(col("a"), plane)).as[Double].head()
    assert(out == 1.0 * 0.5 + 2.0 * 1.0 + 3.0 * 1.5)
  }

  test("null array yields null") {
    val withNull = Seq((Some(Array(1.0f)), Option.empty[Array[Float]])).toDF("a", "b")
    val out = withNull.select(dot(col("a"), col("b"))).collect()(0)
    assert(out.isNullAt(0))
  }

  test("unequal lengths yield null, matching aggregate(zip_with(...)) exactly") {
    val ragged = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f))).toDF("a", "b")
    val row = ragged.select(dot(col("a"), col("b")).as("d"), dotHof(col("a"), col("b")).as("h")).collect()(0)
    assert(row.isNullAt(0), "codegen dot must be null on ragged input")
    assert(row.isNullAt(1), "HOF dot must be null on ragged input (zip_with null padding)")
  }

  test("cosine of identical vectors is 1.0 within ulps") {
    val c = df.select(cosine(col("a"), col("a"))).as[Double].collect()
    c.foreach(v => assert(math.abs(v - 1.0) < 1e-12))
  }

  test("rhp signature: deterministic, nBits range, similar vectors share more bits") {
    val sig = rhpSignature(col("a"), dim = 3, nBits = 16, seed = 7L)
    val s1 = df.select(sig).as[Long].collect()
    val s2 = df.select(sig).as[Long].collect()
    assert(s1.toList == s2.toList)
    s1.foreach(s => assert(s >= 0 && s < (1L << 16)))
  }
}
