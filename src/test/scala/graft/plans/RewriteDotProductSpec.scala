package graft.plans

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{DotProduct, VectorFunctions}

class RewriteDotProductSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkFixture.spark
  import spark.implicits._

  // built from range() so the optimizer can't constant-fold the whole plan
  // into a LocalRelation (which would leave no expressions to rewrite)
  private lazy val df = spark.range(1, 3).select(
    array((1 to 3).map(i => (col("id") * 0 + i).cast("float")): _*).as("a"),
    array((4 to 6).map(i => (col("id") * 0 + i).cast("float")): _*).as("b"))

  private def optimizedHasDotProduct(q: org.apache.spark.sql.DataFrame): Boolean =
    q.queryExecution.optimizedPlan.expressions.exists(_.exists(_.isInstanceOf[DotProduct]))

  test("HOF aggregate(zip_with(*)) pattern rewrites to codegen DotProduct with identical results") {
    spark.experimental.extraOptimizations =
      (spark.experimental.extraOptimizations :+ RewriteDotProduct).distinct
    try {
      val q = df.select(VectorFunctions.dotHof(col("a"), col("b")).as("d"))
      assert(optimizedHasDotProduct(q))
      val viaRule = q.as[Double].collect().toList
      val direct = df.select(VectorFunctions.dot(col("a"), col("b"))).as[Double].collect().toList
      assert(viaRule == direct)
      assert(viaRule.head == 32.0)
    } finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == RewriteDotProduct)
  }

  test("non-dot aggregates are left alone") {
    spark.experimental.extraOptimizations =
      (spark.experimental.extraOptimizations :+ RewriteDotProduct).distinct
    try {
      // sum instead of product inside zip_with → must NOT rewrite
      val q = df.select(aggregate(
        zip_with(col("a"), col("b"), (x, y) => x.cast("double") + y.cast("double")),
        lit(0.0), (acc, v) => acc + v).as("s"))
      assert(!optimizedHasDotProduct(q))
      assert(q.as[Double].head() == (1 + 4 + 2 + 5 + 3 + 6).toDouble)
    } finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == RewriteDotProduct)
  }
}
