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

  test("argminL2: nearest index, first-wins tie, null on empty/ragged/null-element") {
    val cents = array(
      array(lit(1.0f), lit(0.0f)), // idx 0
      array(lit(0.0f), lit(1.0f)), // idx 1
      array(lit(0.0f), lit(1.0f))) // idx 2: exact dup of 1 — tie must keep 1
    val vecs = Seq(
      (1L, Array(0.9f, 0.1f)), // nearest 0
      (2L, Array(0.1f, 0.9f)), // nearest 1 (and 2, tied) → first wins: 1
      (3L, Array(0.5f, 0.5f))) // exact tie between ALL → 0
      .toDF("id", "v")
    val out = vecs.select(col("id"), argminL2(col("v"), cents).as("i"))
      .as[(Long, Int)].collect().toMap
    assert(out == Map(1L -> 0, 2L -> 1, 3L -> 0))
    // empty centroid array → null
    val empty = vecs.select(argminL2(col("v"), array().cast("array<array<float>>"))).collect()
    assert(empty.forall(_.isNullAt(0)))
    // ragged centroid (length mismatch) → null
    val ragged = vecs.select(argminL2(col("v"), array(array(lit(1.0f))))).collect()
    assert(ragged.forall(_.isNullAt(0)))
    // null vector → null
    val nv = Seq(Option.empty[Array[Float]]).toDF("v")
      .select(argminL2(col("v"), cents)).collect()
    assert(nv(0).isNullAt(0))
  }

  test("argminL2: null ELEMENT in vector or centroid yields null, not a 0.0-substituted index") {
    val cents = array(
      array(lit(0.0), lit(0.0)),
      array(lit(5.0), lit(5.0)))
    // vector with a null element: reading it as 0.0 would confidently pick
    // centroid 0 — the l2sq poisoned-null contract demands null instead
    val vNull = Seq(Tuple1(Seq[Option[Double]](Some(1.0), None)))
      .toDF("v").select(col("v").cast("array<double>").as("v"))
    assert(vNull.select(argminL2(col("v"), cents)).collect()(0).isNullAt(0))
    // centroid with a null element likewise
    val centsNull = array(
      array(lit(0.0), org.apache.spark.sql.functions.lit(null).cast("double")),
      array(lit(5.0), lit(5.0)))
    val vOk = Seq(Tuple1(Array(0.1, 0.1))).toDF("v")
    assert(vOk.select(argminL2(col("v"), centsNull)).collect()(0).isNullAt(0))
  }

  test("argminL2: interpreted eval matches codegen (double centroids vs float vec)") {
    // double-element centroids (the collect_list path can carry either type)
    val cents = array(
      array(lit(0.25), lit(-0.5)),
      array(lit(0.24), lit(-0.5))) // 0.01 closer on dim 1 for v below
    val df2 = Seq((Array(0.245f, -0.5f))).toDF("v")
    val viaCodegen = df2.select(argminL2(col("v"), cents)).as[Int].head()
    // the same argmin via the interpreted l2sq fold it replaced
    val d0 = df2.select(l2sq(col("v"), array(lit(0.25), lit(-0.5)))).as[Double].head()
    val d1 = df2.select(l2sq(col("v"), array(lit(0.24), lit(-0.5)))).as[Double].head()
    assert(viaCodegen == (if (d0 <= d1) 0 else 1))
  }

  test("rhp signature: deterministic, nBits range, similar vectors share more bits") {
    val sig = rhpSignature(col("a"), dim = 3, nBits = 16, seed = 7L)
    val s1 = df.select(sig).as[Long].collect()
    val s2 = df.select(sig).as[Long].collect()
    assert(s1.toList == s2.toList)
    s1.foreach(s => assert(s >= 0 && s < (1L << 16)))
  }
}
