package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class KMeansSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkFixture.spark
  import spark.implicits._

  // three tight clusters around (0,0), (10,10), (-10,5); seed rows 1-3
  private lazy val vecs = Seq(
    (1L, Array(0.1f, 0.2f)), (4L, Array(-0.1f, 0.1f)), (5L, Array(0.2f, -0.2f)),
    (2L, Array(10.2f, 9.9f)), (6L, Array(9.8f, 10.1f)), (7L, Array(10.0f, 10.2f)),
    (3L, Array(-10.1f, 5.1f)), (8L, Array(-9.9f, 4.8f)), (9L, Array(-10.0f, 5.0f)))
    .toDF("vec_id", "v")

  test("fit recovers cluster means; assignment groups clusters; deterministic") {
    val cents = KMeans.fit(vecs, col("vec_id"), col("v"), k = 3, iters = 3)
    val c = cents.orderBy("cent_id").as[(Long, Seq[Double])].collect()
    assert(c.map(_._1).toSeq == Seq(1L, 2L, 3L))
    def near(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).forall { case (x, y) => math.abs(x - y) < 0.5 }
    assert(near(c(0)._2, Seq(0.0667, 0.0333)))
    assert(near(c(1)._2, Seq(10.0, 10.0667)))
    assert(near(c(2)._2, Seq(-10.0, 4.9667)))
    val assigned = Dedup.assignCells(vecs, col("vec_id"), col("v"), cents)
      .select(col("__id").as[Long], col("cell").as[Long]).collect().toMap
    assert(Set(1L, 4L, 5L).map(assigned) == Set(1L))
    assert(Set(2L, 6L, 7L).map(assigned) == Set(2L))
    assert(Set(3L, 8L, 9L).map(assigned) == Set(3L))
    // deterministic across runs
    val c2 = KMeans.fit(vecs, col("vec_id"), col("v"), k = 3, iters = 3)
      .orderBy("cent_id").as[(Long, Seq[Double])].collect()
    assert(c.toSeq == c2.toSeq)
  }

  test("empty cell keeps its previous centroid (duplicate seed never wins the tie)") {
    // seed 2 duplicates seed 1 exactly: every point ties toward the lower
    // cent_id, so cell 2 captures nothing and must keep its seed centroid
    val dup = Seq(
      (1L, Array(0.0f, 0.0f)), (2L, Array(0.0f, 0.0f)), (3L, Array(5.0f, 5.0f)),
      (4L, Array(0.2f, 0.1f)), (5L, Array(5.1f, 4.9f)))
      .toDF("vec_id", "v")
    val cents = KMeans.fit(dup, col("vec_id"), col("v"), k = 3, iters = 2)
      .orderBy("cent_id").as[(Long, Seq[Double])].collect()
    assert(cents(1)._1 == 2L && cents(1)._2 == Seq(0.0, 0.0)) // unchanged seed
    // cells 1 and 3 moved to their members' means
    assert(cents(0)._2 != Seq(0.0, 0.0))
  }

  test("iters=0 returns the seeds unchanged (as doubles)") {
    val cents = KMeans.fit(vecs, col("vec_id"), col("v"), k = 3, iters = 0)
      .orderBy("cent_id").as[(Long, Seq[Double])].collect()
    assert(cents.map(_._1).toSeq == Seq(1L, 2L, 3L))
    assert(cents(0)._2.zip(Seq(0.1, 0.2)).forall { case (a, b) => math.abs(a - b) < 1e-6 })
  }
}
