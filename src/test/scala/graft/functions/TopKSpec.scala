package graft.functions

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class TopKSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkFixture.spark
  import spark.implicits._

  // deterministic pseudo-random scores over many partitions to force
  // serialize/merge of partial heaps across the shuffle
  private lazy val df = spark.range(0, 2000).repartition(7)
    .select((col("id") % 10).as("g"), col("id").as("rid"),
      pmod(hash(col("id")), lit(10000)).cast("double").as("score"))

  test("heap aggregate == window row_number top-k (incl. cross-partition merge)") {
    val viaAgg = df.groupBy("g")
      .agg(TopK.topK(col("score"), col("rid"), 5).as("tk"))
      .select(col("g"), posexplode(col("tk")).as(Seq("i", "e")))
      .select(col("g"), col("e.id"), col("e.score"), (col("i") + 1).as("rn"))
      .collect().map(_.toSeq).toSet
    val w = Window.partitionBy("g").orderBy(col("score").desc, col("rid"))
    val viaWindow = df.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select(col("g"), col("rid"), col("score"), col("rn").cast("long"))
      .collect().map(_.toSeq).toSet
    assert(viaAgg == viaWindow)
  }

  test("ties break deterministically on lower id") {
    val tied = Seq((1L, 10L, 5.0), (1L, 3L, 5.0), (1L, 7L, 5.0)).toDF("g", "rid", "score")
    val ids = tied.groupBy("g").agg(TopK.topK(col("score"), col("rid"), 2).as("tk"))
      .select(explode(col("tk.id"))).as[Long].collect().toList
    assert(ids == List(3L, 7L))
  }

  test("groups smaller than k return all rows, best-first") {
    val small = Seq((1L, 1L, 1.0), (1L, 2L, 9.0)).toDF("g", "rid", "score")
    val out = small.groupBy("g").agg(TopK.topK(col("score"), col("rid"), 10).as("tk"))
      .select(col("tk.score")).as[Seq[Double]].head()
    assert(out == Seq(9.0, 1.0))
  }

  test("non-numeric score is rejected at analysis time, not mid-job") {
    val df = Seq(("x", 1L)).toDF("s", "id")
    val e = intercept[Exception] {
      df.agg(graft.functions.TopK.topK(col("s"), col("id"), 3)).collect()
    }
    assert(e.getMessage.toLowerCase.contains("topk_by_score") ||
      e.toString.contains("DATATYPE_MISMATCH"), e.toString)
  }

  test("buffer byte round-trip preserves contents") {
    val b = new TopKBuffer(3)
    Seq((1.0, 1L), (5.0, 2L), (3.0, 3L), (9.0, 4L)).foreach { case (s, i) => b.offer(s, i) }
    val back = TopKBuffer.fromBytes(3, b.toBytes)
    assert(back.sorted.toSeq == b.sorted.toSeq)
    assert(back.sorted.head == ((9.0, 4L)))
  }
}
