package graft.queries

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** text_ccnet_buckets ranks on the integer-quantized surprisal sum; the
  * only cross-engine risk left is a per-token quantization flip — a value
  * of -ln(g/total)·1e6 landing within libm's ~1-ulp disagreement of a
  * rounding boundary. The per-token value set is tiny (one per distinct
  * corpus frequency g), so the margin to the nearest boundary is measurable
  * exactly; assert it leaves >10³× headroom over the worst-case libm error.
  */
class TextQueriesSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkFixture.spark
  import spark.implicits._

  test("quality model: keep flag is the sign of the logit, and scoring is map-only") {
    val dir = "/root/testdata/sf0.001"
    val out = TextQueries.queries("text_quality_model")(spark, dir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // keep is derived from the UNROUNDED logit; the rounded column agrees
    // everywhere except within half an ulp of the last rounded digit
    rows.foreach { r =>
      val logit = r.getAs[Double]("quality_logit")
      val keep = r.getAs[Boolean]("keep")
      if (math.abs(logit) > 1e-6)
        assert(keep == (logit >= 0), s"keep flag disagrees with logit sign: $r")
    }
    // both classes occur — a degenerate all-keep/all-drop model would make
    // the gate (and the threshold semantics) vacuous
    assert(rows.count(_.getAs[Boolean]("keep")) > 0)
    assert(rows.count(!_.getAs[Boolean]("keep")) > 0)
    // map-only inference: no aggregation/join shuffle anywhere — the only
    // exchange is the output sort's rangepartitioning (which AQE's plan
    // string may print twice, so assert on kind rather than count)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning") && !plan.contains("Join"),
      s"expected shuffle-free map-side scoring, got:\n$plan")
  }

  test("ccnet quantization margin: every distinct per-token surprisal sits far from a boundary") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      val toks = docs.select(explode(split(col("text"), " ")).as("tok"))
      val counts = toks.groupBy(col("tok")).agg(count(lit(1)).as("g"))
      val total = counts.agg(sum(col("g")).cast("double")).as[Double].head()
      val gs = counts.select(col("g")).distinct().as[Long].collect()
      // x·1e6 + 0.5 crosses an integer when x·1e6 is at a half-integer:
      // margin = distance of frac(x·1e6) from 0.5
      val margins = gs.map { g =>
        val x = -math.log(g / total) * 1e6
        math.abs((x - math.floor(x)) - 0.5)
      }
      val worst = margins.min
      // worst-case libm disagreement on ln is ~1 ulp of x (~x·2^-52);
      // at x·1e6 ≈ 2e7 that is ~5e-9 — require 1e-5, >10³× headroom
      assert(worst > 1e-5, s"$dir: quantization margin $worst too tight")
    }
  }

  test("ccnet buckets: terciles are contiguous and exhaustive per language") {
    val out = TextQueries.queries("text_ccnet_buckets")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val langs = out.keys.map(_._1).toSet
    assert(langs.nonEmpty)
    langs.foreach { l =>
      val n = Seq("head", "middle", "tail").map(b => out.getOrElse((l, b), 0L))
      assert(n.forall(_ > 0), s"$l buckets $n")
      assert(n.max - n.min <= 1, s"$l tercile sizes must differ by <=1: $n")
    }
  }
}
