package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkFixture.spark
  import spark.implicits._

  test("salted inner join is result-identical to the plain join, skew spread over salts") {
    // heavily skewed big side: 90% of rows share key 1
    val big = (1 to 1000).map(i => (if (i <= 900) 1L else i.toLong % 7, s"v$i")).toDF("k", "payload")
    val small = Seq((1L, "one"), (2L, "two"), (3L, "three")).toDF("k", "name")
    val plain = big.join(small, "k").collect().map(_.toSeq).toSet
    val salted = SkewJoin.saltedInner(big, small, Seq("k"), nSalts = 8)
    assert(salted.collect().map(_.toSeq).toSet == plain)
    assert(salted.columns.toSeq == Seq("k", "payload", "name")) // salt dropped
    // the hot key's rows really spread across >1 salt bucket
    val spread = big.filter(col("k") === 1)
      .withColumn("__salt", pmod(hash(big.columns.map(col).toIndexedSeq: _*), lit(8)))
      .select("__salt").distinct().count()
    assert(spread > 1)
  }

  test("identical duplicate rows of a hot key spread across salts (per-row counter, not row hash)") {
    // 200 IDENTICAL rows: a row-content hash gives them all one salt and
    // the hot mass still lands on one reducer; the per-row counter spreads
    // them. Observed via the same salt expression the operator uses.
    val big = spark.range(0, 200).select(lit(1L).as("k"), lit("same").as("v"))
    val salts = big.withColumn("__salt",
        pmod(monotonically_increasing_id(), lit(8L)).cast("int"))
      .select("__salt").distinct().count()
    assert(salts > 1, s"expected identical rows spread over >1 salt, got $salts")
    // and the result is still exactly the plain join
    val small = Seq((1L, "dim")).toDF("k", "d")
    val out = SkewJoin.saltedInner(big, small, Seq("k"), nSalts = 8)
    assert(out.count() == 200)
  }

  test("empty small side yields empty result, not an error") {
    val big = Seq((1L, "a")).toDF("k", "v")
    val small = Seq.empty[(Long, String)].toDF("k", "name")
    assert(SkewJoin.saltedInner(big, small, Seq("k"), 4).count() == 0)
  }
}
