package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.SparkFixture

/** Guards against driver-side fixture regeneration drift (round 8: events.ts
  * went `timestamp[ns]` → `timestamp[us]` and silently killed 14 gates).
  * Pins three behaviors:
  *   1. `QueryPack.t` normalizes BOTH events-ts vintages (nanos-as-long and
  *      TIMESTAMP_NTZ micros) to identical UTC TimestampType values;
  *   2. an unrecognized ts dtype fails loudly, naming the type;
  *   3. `FixtureSchemas.assertMatches` reports missing/extra/mistyped
  *      columns by name, and accepts the real on-disk fixtures as-is.
  */
class FixtureSchemaSpec extends AnyFunSuite {
  private lazy val spark = SparkFixture.spark
  private val real = "/root/testdata/sf0.001"

  private object Pack extends QueryPack {
    val queries = Map.empty[String, (org.apache.spark.sql.SparkSession, String) => DataFrame]
    val oracles = Map.empty[String, String]
    def read(dir: String, name: String): DataFrame = t(spark, dir, name)
  }

  private def tmpDir(): String =
    Files.createTempDirectory("fixture-spec").toString

  /** Write an events table with `ts` produced by `tsCol` over micros. */
  private def writeEvents(dir: String, tsCol: org.apache.spark.sql.Column): Unit = {
    import spark.implicits._
    Seq((1L, 1700000000000000L, 10L, "click", 1.5, "{}"),
      (2L, 1700000000500000L, 11L, "view", 2.5, "{}"))
      .toDF("event_id", "us", "user_id", "event_type", "value", "props")
      .withColumn("ts", tsCol)
      .select("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  test("both events-ts vintages normalize to the same UTC timestamps") {
    val nanosDir = tmpDir()
    val microsDir = tmpDir()
    // vintage A: raw long nanos (what nanosAsLong made of TIMESTAMP(NANOS))
    writeEvents(nanosDir, (col("us") * lit(1000L)).as("ts"))
    // vintage B: TIMESTAMP_NTZ micros (the current driver fixtures)
    writeEvents(microsDir, timestamp_micros(col("us")).cast(TimestampNTZType).as("ts"))

    val a = Pack.read(nanosDir, "events")
    val b = Pack.read(microsDir, "events")
    assert(a.schema("ts").dataType == TimestampType)
    assert(b.schema("ts").dataType == TimestampType)
    val va = a.select(unix_micros(col("ts")).as("us")).orderBy("us")
      .collect().map(_.getLong(0)).toSeq
    val vb = b.select(unix_micros(col("ts")).as("us")).orderBy("us")
      .collect().map(_.getLong(0)).toSeq
    assert(va == Seq(1700000000000000L, 1700000000500000L))
    assert(va == vb, "nanos-long and NTZ-micros vintages must read identically")
  }

  test("an unrecognized ts dtype fails loudly, naming the type") {
    val dir = tmpDir()
    writeEvents(dir, col("us").cast(StringType).as("ts"))
    val e = intercept[IllegalStateException](Pack.read(dir, "events"))
    assert(e.getMessage.contains("string") || e.getMessage.contains("String"))
  }

  test("schema drift reports missing, extra, and mistyped columns by name") {
    val dir = tmpDir()
    import spark.implicits._
    // drop `props`, add `bogus`, mistype `value` as string
    Seq((1L, 1700000000000000L, 10L, "click", "oops", 7))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "bogus")
      .withColumn("ts", timestamp_micros(col("ts")))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](Pack.read(dir, "events"))
    assert(e.getMessage.contains("events"))
    assert(e.getMessage.contains("props"), "must name the missing column")
    assert(e.getMessage.contains("bogus"), "must name the unexpected column")
    assert(e.getMessage.contains("value"), "must name the mistyped column")
  }

  test("column-order drift is flagged even when names and types all match") {
    val dir = tmpDir()
    import spark.implicits._
    // same six events columns, ts swapped after user_id
    Seq((1L, 10L, 1700000000000000L, "click", 1.5, "{}"))
      .toDF("event_id", "user_id", "ts", "event_type", "value", "props")
      .withColumn("ts", timestamp_micros(col("ts")))
      .select("event_id", "user_id", "ts", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val e = intercept[IllegalStateException](Pack.read(dir, "events"))
    assert(e.getMessage.contains("order"), s"must flag order drift: ${e.getMessage}")
  }

  test("date columns normalize across vintages too (not only events.ts)") {
    val dir = tmpDir()
    import spark.implicits._
    // orders with o_orderdate as raw long NANOS — the same drift events.ts
    // had; the guard accepts it, so t() must also normalize it
    Seq((1L, 2L, "O", 10.5, 1700000000000000L * 1000L, "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val df = Pack.read(dir, "orders")
    assert(df.schema("o_orderdate").dataType == TimestampType,
      "long-nanos o_orderdate must normalize to TimestampType")
    assert(df.select(unix_micros(col("o_orderdate"))).head().getLong(0)
      == 1700000000000000L)
  }

  test("timestampColumns covers exactly the vintage-flexible columns") {
    assert(FixtureSchemas.timestampColumns("events") == Seq("ts"))
    assert(FixtureSchemas.timestampColumns("orders") == Seq("o_orderdate"))
    assert(FixtureSchemas.timestampColumns("lineitem") == Seq("l_shipdate"))
    assert(FixtureSchemas.timestampColumns("documents").isEmpty)
  }

  test("the real driver fixtures pass the assertion for every table") {
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings")) {
      val df = Pack.read(real, t)
      assert(df.columns.nonEmpty, s"$t read")
    }
  }
}
