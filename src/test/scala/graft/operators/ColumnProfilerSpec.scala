package graft.operators

import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ColumnProfiler.{Approx, ColSpec, ExactLowCard}

/** The hybrid profiler's contract on data the driver fixtures never
  * exercise: NULL-bearing columns (fixtures are null-free, so the gate
  * alone would leave the null path untested), tiny/empty frames, and the
  * HLL-vs-exact agreement at low cardinality.
  */
class ColumnProfilerSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkFixture.spark

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  private val rowGen: Gen[(Option[String], Option[Long])] = for {
    s <- Gen.option(Gen.oneOf("a", "b", "c", "d"))
    k <- Gen.option(Gen.choose(0L, 50L))
  } yield (s, k)

  test("profile == direct per-column queries on arbitrary null-bearing frames") {
    import spark.implicits._
    check(Prop.forAll(Gen.choose(1, 60).flatMap(n => Gen.listOfN(n, rowGen))) { rows =>
      val df = rows.toDF("flag", "key")
        .select(col("flag"), col("key"))
      val out = ColumnProfiler.profile(df, Seq(
        ColSpec("flag", ExactLowCard),
        ColSpec("key", Approx(0.02))))
        .collect().map(r => r.getString(0) -> r).toMap
      val flags = rows.flatMap(_._1)
      val keys = rows.flatMap(_._2)
      val f = out("flag")
      val k = out("key")
      val nRowsOk = f.getLong(1) == rows.length && k.getLong(1) == rows.length
      val nullsOk = f.getLong(2) == rows.count(_._1.isEmpty) &&
        k.getLong(2) == rows.count(_._2.isEmpty)
      val exactOk = f.getLong(3) == flags.distinct.length && f.getBoolean(4)
      // HLL++ at rsd=0.02 is exact for cardinalities this small
      val approxOk = k.getLong(3) == keys.distinct.length && !k.getBoolean(4)
      val minMaxOk =
        (if (flags.isEmpty) f.isNullAt(5) && f.isNullAt(6)
         else f.getString(5) == flags.min && f.getString(6) == flags.max) &&
          (if (keys.isEmpty) k.isNullAt(5) && k.isNullAt(6)
           else k.getString(5) == keys.min.toString && k.getString(6) == keys.max.toString)
      nRowsOk && nullsOk && exactOk && approxOk && minMaxOk
    })
  }

  test("empty frame profiles to zero counts and null min/max, not an empty result") {
    import spark.implicits._
    val df = Seq.empty[(String, Long)].toDF("flag", "key")
    val rows = ColumnProfiler.profile(df, Seq(
      ColSpec("flag", ExactLowCard), ColSpec("key", Approx(0.02))))
      .collect()
    assert(rows.map(_.getString(0)).toSeq == Seq("flag", "key"))
    rows.foreach { r =>
      assert(r.getLong(1) == 0L && r.getLong(2) == 0L && r.getLong(3) == 0L)
      assert(r.isNullAt(5) && r.isNullAt(6))
    }
  }
}
